#!/usr/bin/env python
"""Does the axon tunnel overlap wire with compute / host pack?

The stage profiler (profile_hybrid_stages.py) shows a hybrid chunk's
ingest wall == pack + h2d + update, exactly serial. This probes which
scheduling recovers overlap, using the production line_hl1 chunk:

  serial     pack -> put -> commit, per chunk (today's code, 1 worker)
  threads2   2-worker prep pool (pack+put in threads), commit in order
  uploader   main thread packs, a dedicated thread puts+commits
  putfirst   pack all, put all, commit all (tests pure wire pipelining)
  wire3      3 back-to-back puts + sync (the 3-chunk wire floor)
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = 6_000_000        # 3 x 2M chunks
CH = 2_000_000


def main():
    import jax
    import pcr_tpu as pcr
    from pcr_tpu.engine import routing

    rng = np.random.default_rng(0)
    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0, 0, 1000, 1000
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()

    x = rng.uniform(0, 1000, N)
    y = rng.uniform(0, 1000, N)
    vs = rng.random(N, np.float64).astype(np.float32)
    col, row, valid = routing.assign(gc, x, y)

    dev = [d for d in jax.devices() if d.platform != "cpu"][0]
    np.asarray(jax.device_put(np.ones(8, np.float32), dev))  # honest mode

    spec = pcr.line_splat_spec("value", default_half_length=1.0)
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [spec]
    cfg.exec_mode = pcr.ExecutionMode.Hybrid
    pipe = pcr.Pipeline.create(cfg)
    eng = pipe._engine

    def prep(k):
        sl = slice(k * CH, (k + 1) * CH)
        return eng.prepare_line_raw(0, spec.glyph, x[sl], y[sl],
                                    valid[sl], vs[sl], col[sl], row[sl])

    def sync():
        st = eng._states[0][0]
        np.asarray(st[:1, :1] if st.ndim == 2 else st[:1])

    # warm all programs once
    eng.commit(0, prep(0))
    sync()

    def run(label, fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            sync()
            best = min(best, time.perf_counter() - t0)
        print(f"  {label:10s} {best * 1e3:9.1f} ms   "
              f"{N / best / 1e6:8.2f} Mpts/s", flush=True)

    def serial():
        for k in range(3):
            eng.commit(0, prep(k))

    def threads2():
        with ThreadPoolExecutor(max_workers=2) as ex:
            futs = [ex.submit(prep, k) for k in range(3)]
            for f in futs:
                eng.commit(0, f.result())

    def uploader():
        # main thread packs (CPU); one helper thread uploads + commits
        host = []
        orig_put = eng._put
        eng._put = lambda b: b
        try:
            packed = [prep(k) for k in range(3)]
        finally:
            eng._put = orig_put

        def upload_commit():
            for chunks in packed:
                staged = [type(c)(c.key, orig_put(c.buf), c.builder,
                                  c.npoints) for c in chunks]
                eng.commit(0, staged)
        upload_commit()

    def uploader_pipelined():
        orig_put = eng._put
        q = []

        def pack_all():
            eng._put = lambda b: b
            try:
                for k in range(3):
                    q.append(prep(k))
            finally:
                eng._put = orig_put
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = ex.submit(pack_all)
            done = 0
            while done < 3:
                if len(q) > done:
                    chunks = q[done]
                    staged = [type(c)(c.key, orig_put(c.buf), c.builder,
                                      c.npoints) for c in chunks]
                    eng.commit(0, staged)
                    done += 1
                else:
                    time.sleep(0.001)
            fut.result()

    def putfirst():
        orig_put = eng._put
        eng._put = lambda b: b
        try:
            packed = [prep(k) for k in range(3)]
        finally:
            eng._put = orig_put
        staged_all = [[type(c)(c.key, orig_put(c.buf), c.builder,
                               c.npoints) for c in chunks]
                      for chunks in packed]
        for staged in staged_all:
            eng.commit(0, staged)

    # pure wire floor: 3 puts back-to-back
    orig_put = eng._put
    eng._put = lambda b: b
    try:
        packed = [prep(k) for k in range(3)]
    finally:
        eng._put = orig_put
    bufs = [c.buf for chunks in packed for c in chunks]
    nbytes = sum(b.nbytes for b in bufs)
    print(f"wire bytes: {nbytes / 1e6:.1f} MB over {len(bufs)} buffers")

    def wire3():
        arrs = [jax.device_put(b, dev) for b in bufs]
        for a in arrs:
            a.block_until_ready()
        np.asarray(arrs[-1].ravel()[:1])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        wire3()
        best = min(best, time.perf_counter() - t0)
    print(f"  {'wire3':10s} {best * 1e3:9.1f} ms   "
          f"{N / best / 1e6:8.2f} Mpts/s  "
          f"({nbytes / best / 1e6:.1f} MB/s)", flush=True)

    run("serial", serial)
    run("threads2", threads2)
    run("uploader", uploader)
    run("upl_pipe", uploader_pipelined)
    run("putfirst", putfirst)


if __name__ == "__main__":
    main()
