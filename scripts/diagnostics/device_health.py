#!/usr/bin/env python
"""Device health diagnostic (reference: scripts/diagnostics GPU crash
checks): probes device availability, a compile smoke test, and memory
headroom, reporting typed failures instead of crashing."""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import pcr_tpu as pcr  # noqa: E402


def main():
    print(f"tpu_is_compiled:        {pcr.tpu_is_compiled()}")
    print(f"tpu_device_available:   {pcr.tpu_device_available()}")
    print(f"tpu_device_count:       {pcr.tpu_device_count()}")
    if not pcr.tpu_device_available():
        print("no device; CPU fallback would be used (exec_mode=Auto)")
        return 0
    print(f"tpu_device_name:        {pcr.tpu_device_name()}")
    mem = pcr.tpu_memory_info()
    if mem:
        free, total = mem
        print(f"tpu_memory_info:        free={free / 1e9:.2f} GB "
              f"total={total / 1e9:.2f} GB")
    else:
        print("tpu_memory_info:        unavailable on this platform")

    import jax
    import jax.numpy as jnp

    dev = [d for d in jax.devices() if d.platform != "cpu"][0]
    try:
        x = jax.device_put(np.arange(1 << 20, dtype=np.float32), dev)
        y = jax.jit(lambda v: (v * 2.0).sum())(x)
        val = float(np.asarray(y))
        expect = float((1 << 20) * ((1 << 20) - 1))
        ok = abs(val - expect) < 1e-4 * expect   # f32 accumulation rounds
        print(f"compile smoke test:     {'OK' if ok else f'BAD ({val})'}")
    except Exception as e:  # noqa: BLE001 - diagnostic surface
        print(f"compile smoke test:     FAILED: {e}")
        return 1
    try:
        big = jnp.zeros((512, 1024, 1024), jnp.float32)  # 2 GB probe
        big.block_until_ready()
        del big
        print("2 GB allocation probe:  OK")
    except Exception as e:  # noqa: BLE001
        print(f"2 GB allocation probe:  failed (headroom?): {e}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
