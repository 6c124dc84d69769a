#!/usr/bin/env python
"""Sweep PCR_GAUSS_TH (row-block height) per sigma for the staged
Gaussian accumulate, on the live device.

The adaptive model in pallas_kernels.gauss_row_block picks TH from a
halo/duplication cost model over {32, 64, 128}; this sweep validates the
model against measurement (including TH=8/16 for small windows) so the
default stays the measured optimum.  Protocol matches
benchmark_wall_decomposition.py: stage once, K back-to-back ingests, sync
on a 1-element fetch, best of 3.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PCR_BENCH_N", 5_000_000))
SIGMAS = [float(s) for s in os.environ.get("PCR_SWEEP_SIGMAS", "1,4,16").split(",")]
THS = [int(t) for t in os.environ.get("PCR_SWEEP_THS", "8,16,32,64,128").split(",")]


def main():
    import pcr_tpu as pcr

    rng = np.random.default_rng(42)
    cloud = pcr.PointCloud.create(N)
    cloud.set_x_array(rng.uniform(0, 1000, N))
    cloud.set_y_array(rng.uniform(0, 1000, N))
    cloud.add_channel("value", pcr.DataType.Float32)
    cloud.set_channel_array_f32("value",
                                rng.uniform(0, 1, N).astype(np.float32))

    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0.0, 0.0, 1000.0, 1000.0
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()

    results = {}
    for sigma in SIGMAS:
        for th in THS:
            os.environ["PCR_GAUSS_TH"] = str(th)
            spec = pcr.gaussian_splat_spec("value", default_sigma=sigma)
            cfg = pcr.PipelineConfig()
            cfg.grid = gc
            cfg.reductions = [spec]
            cfg.exec_mode = pcr.ExecutionMode.GPU
            pipe = pcr.Pipeline.create(cfg)
            staged = pipe.stage(cloud)
            pipe.ingest(staged)
            eng = pipe._engine

            def sync():
                eng.flush_pending()
                st = eng._states[0][0]
                h = st[:1, :1] if st.ndim == 2 else st[:1]
                return float(np.asarray(h).ravel()[0])

            sync()
            K = 5
            bacc = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(K):
                    pipe.ingest(staged)
                sync()
                bacc = min(bacc, (time.perf_counter() - t0) / K)
            rate = N / bacc / 1e6
            # non-default column routing (PCR_GAUSS_NARROW_MAX) gets its
            # own key so a wide-tile sweep can't clobber the narrow rows
            wt_tag = ("_wide" if os.environ.get("PCR_GAUSS_NARROW_MAX")
                      == "0" else "")
            results[f"s{sigma:g}_th{th}{wt_tag}"] = round(rate, 2)
            print(f"sigma={sigma:<4g} TH={th:<4d} acc {bacc*1e3:6.1f} ms  "
                  f"{rate:6.2f} Mpts/s", flush=True)
    os.environ.pop("PCR_GAUSS_TH", None)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmark_results", "gauss_th_sweep.json")
    # MERGE into the existing record (advisor r4: a partial re-run used
    # to overwrite the whole file and erase earlier sigmas' data);
    # results key by sigma/TH so repeated configs update in place.
    prev = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                prev = json.load(f)
        except (OSError, json.JSONDecodeError):
            prev = {}
    merged = dict(prev.get("results", {}))
    merged.update(results)
    with open(out, "w") as f:
        json.dump({"n_points": N, "results": merged}, f, indent=1)
        f.write("\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
