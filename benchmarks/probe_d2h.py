#!/usr/bin/env python
"""How should a 4 MB result cross the tunnel D2H?

wall_decomposition shows d2h_4mb = 94 ms but d2h_strips(2MB-ish)
= 173 ms — per-strip round trips. This probes whether CONCURRENT
fetches (2 threads) pipeline on the wire, which decides the finalize
strip strategy. jax caches fetched host copies, so every rep fetches
FRESH device arrays (strips recomputed with a new scalar first,
excluded from the timed window).

  one4       single 4 MB fetch (the packed path)
  two_serial 2 x 2 MB fetches, same thread
  two_conc   2 x 2 MB fetches, 2 threads
  four_conc  4 x 1 MB fetches, 2 threads
  eight_conc 8 x 512 KB fetches, 2 threads
  four_conc4 4 x 1 MB fetches, 4 threads
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

    fns = {}

    def fresh(k, s):
        fn = fns.get(k)
        if fn is None:
            rows = 1024 // k
            fn = jax.jit(lambda a, s: [a[i * rows:(i + 1) * rows] * s
                                       for i in range(k)])
            fns[k] = fn
        parts = fn(big, jnp.float32(s))
        for p in parts:
            p.block_until_ready()
        # force the journal to drain so the timed fetch is pure D2H
        np.asarray(parts[0].ravel()[:1])
        return parts

    seq = [0]

    def timed(name, k, fetch):
        fetch(fresh(k, 1.0))   # warm the programs
        best = float("inf")
        for _ in range(3):
            seq[0] += 1
            parts = fresh(k, 1.0 + seq[0])
            t0 = time.perf_counter()
            fetch(parts)
            best = min(best, time.perf_counter() - t0)
        print(f"  {name:10s} {best * 1e3:8.1f} ms   "
              f"{4.0 / best:6.1f} MB/s", flush=True)

    def serial(parts):
        for p in parts:
            np.asarray(p)

    def conc(n):
        def run(parts):
            with ThreadPoolExecutor(max_workers=n) as ex:
                list(ex.map(np.asarray, parts))
        return run

    timed("one4", 1, serial)
    timed("two_serial", 2, serial)
    timed("two_conc", 2, conc(2))
    timed("four_conc", 4, conc(2))
    timed("eight_conc", 8, conc(2))
    timed("four_conc4", 4, conc(4))
    timed("eight_conc8", 8, conc(8))


if __name__ == "__main__":
    main()
