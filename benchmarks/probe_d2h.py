#!/usr/bin/env python
"""How should a 4 MB result cross the tunnel D2H?

wall_decomposition shows d2h_4mb = 94 ms but d2h_strips(2MB x2-ish)
= 173 ms — per-strip round trips. This probes whether CONCURRENT
fetches (2 threads) pipeline on the wire, which decides the finalize
strip strategy:

  one4       single 4 MB fetch (the packed path)
  two_serial 2 x 2 MB fetches, same thread
  two_conc   2 x 2 MB fetches, 2 threads
  four_conc  4 x 1 MB fetches, 2 threads
  eight_conc 8 x 512 KB fetches, 2 threads
  two_conc3  2 x 2 MB fetches, 3 threads
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = [d for d in jax.devices() if d.platform != "cpu"][0]
    np.asarray(jax.device_put(np.ones(8, np.float32), dev))  # honest mode

    big = jax.device_put(np.random.default_rng(0).random(
        (1024, 1024), np.float32), dev)
    big.block_until_ready()

    def strips(k):
        rows = 1024 // k
        return [jax.jit(lambda a, i=i: a[i * rows:(i + 1) * rows] * 1.0
                        ).lower(big).compile()(big) for i in range(k)]

    def timed(name, fn):
        fn()   # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:10s} {best * 1e3:8.1f} ms   "
              f"{4.0 / best:6.1f} MB/s", flush=True)

    def one4():
        np.asarray(big)

    parts2 = strips(2)
    parts4 = strips(4)
    parts8 = strips(8)
    for p in parts2 + parts4 + parts8:
        p.block_until_ready()

    def two_serial():
        for p in parts2:
            np.asarray(p)

    def conc(parts, nthreads):
        with ThreadPoolExecutor(max_workers=nthreads) as ex:
            list(ex.map(np.asarray, parts))

    timed("one4", one4)
    timed("two_serial", two_serial)
    timed("two_conc", lambda: conc(parts2, 2))
    timed("four_conc", lambda: conc(parts4, 2))
    timed("eight_conc", lambda: conc(parts8, 2))
    timed("two_conc3", lambda: conc(parts2, 3))
    timed("four_conc4", lambda: conc(parts4, 4))


if __name__ == "__main__":
    main()
