#!/usr/bin/env python
"""Does byte-plane transposition make the wire effectively wider?

The axon tunnel transport compresses frames (probe_overlap/probe_d2h:
random 24 MB = 58.6 MB/s, constant = 92 MB/s). Wire buffers have
structured byte planes (cell high bytes near-constant, f32 exponent
bytes clustered) even when the values look random, so shipping each
byte plane contiguously should compress — this measures real put time
for representative segments, raw vs byte-planed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = 4_000_000


def planes(a):
    return np.ascontiguousarray(
        a.view(np.uint8).reshape(-1, a.dtype.itemsize).T).view(np.int8)


def main():
    import jax
    dev = [d for d in jax.devices() if d.platform != "cpu"][0]
    head = jax.jit(lambda x: x[:1])
    np.asarray(head(jax.device_put(np.ones(8, np.float32), dev)))

    rng = np.random.default_rng(0)
    # representative segments
    grid_cells = (rng.integers(0, 1000, N) * 1000
                  + rng.integers(0, 1000, N)).astype(np.int32)
    tile_cells = ((rng.integers(1000, 1500, N)) * 4000
                  + rng.integers(2000, 2500, N)).astype(np.int32)
    uni_vals = rng.random(N, np.float64).astype(np.float32)
    z_vals = (60 + 8 * np.sin(np.arange(N) / 300.0)
              + rng.normal(0, 0.05, N)).astype(np.float32)

    def put_time(a):
        besz = float("inf")
        for i in range(3):
            b = a.copy()
            t0 = time.perf_counter()
            d = jax.device_put(b, dev)
            np.asarray(head(d.reshape(-1)[:1] if d.ndim else d))
            besz = min(besz, time.perf_counter() - t0)
        return besz

    for label, seg in (("grid_cells", grid_cells),
                       ("tile_cells", tile_cells),
                       ("uni_vals", uni_vals),
                       ("z_vals", z_vals)):
        raw = put_time(seg)
        t0 = time.perf_counter()
        pl = planes(seg)
        tx = time.perf_counter() - t0
        planed = put_time(pl)
        mb = seg.nbytes / 1e6
        print(f"{label:11s} raw {raw * 1e3:7.1f} ms ({mb / raw:5.1f} MB/s)"
              f"  planed {planed * 1e3:7.1f} ms ({mb / planed:5.1f} MB/s)"
              f"  host transpose {tx * 1e3:5.1f} ms"
              f"  win {raw / planed:4.2f}x", flush=True)


if __name__ == "__main__":
    main()
