#!/usr/bin/env python
"""Small-cloud (default 1M) hybrid wall decomposition on the live chip.

The 5M hybrid rows run at 72-86 % of the wire ceiling; 1M rows sit much
lower because the fixed tail (result D2H + encode + dispatch round
trips) stops amortizing (VERDICT r4 #4). This script times the three
phases of one ingest+finalize cycle separately:

  dispatch   host pack + async device_put + commit enqueue (returns
             before the wire drains)
  drain      everything the dispatch deferred: the upload's wire time
             plus the device expand/sort/splat (forced by a 1-element
             state fetch)
  tail       finalize after the state is materialized: fused finalize
             dispatch, result-band D2H, LZW GeoTIFF encode

Writes benchmark_results/hybrid_1m_decomposition.json (merged per
glyph). PCR_BENCH_N overrides the cloud size.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(os.environ.get("PCR_BENCH_N", 1_000_000))
REPEATS = 3


def main():
    import jax
    import pcr_tpu as pcr

    rng = np.random.default_rng(42)
    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0, 0, 1000, 1000
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()
    x = rng.uniform(0, 1000, N)
    y = rng.uniform(0, 1000, N)
    vs = rng.uniform(0, 1, N).astype(np.float32)
    dev = [d for d in jax.devices() if d.platform != "cpu"][0]
    np.asarray(jax.device_put(np.ones(8, np.float32), dev))  # honest mode

    cloud = pcr.PointCloud.create(N)
    cloud.set_x_array(x)
    cloud.set_y_array(y)
    cloud.add_channel("value", pcr.DataType.Float32)
    cloud.set_channel_array_f32("value", vs)

    out = {}
    for label, spec in (
        ("point", pcr.ReductionSpec(value_channel="value",
                                    type=pcr.ReductionType.Average)),
        ("line_hl1", pcr.line_splat_spec("value", default_half_length=1.0)),
        ("gauss_s4", pcr.gaussian_splat_spec("value", default_sigma=4.0)),
    ):
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [spec]
        cfg.exec_mode = pcr.ExecutionMode.Hybrid
        tmp = tempfile.mkdtemp()
        cfg.output_path = os.path.join(tmp, "out.tif")
        pipe = pcr.Pipeline.create(cfg)
        pipe.ingest(cloud)
        pipe.finalize()                      # warm / compile
        best = [float("inf")] * 4
        for _ in range(REPEATS):
            p2 = pcr.Pipeline.create(cfg)
            t0 = time.perf_counter()
            p2.ingest(cloud)
            t1 = time.perf_counter()
            p2._engine.flush_pending()
            st = p2._engine._states[0][0]
            head = st[:1, :1] if st.ndim == 2 else st[:1]
            float(np.asarray(head).ravel()[0])
            t2 = time.perf_counter()
            p2.finalize()
            t3 = time.perf_counter()
            for k, v in enumerate((t1 - t0, t2 - t1, t3 - t2, t3 - t0)):
                best[k] = min(best[k], v)
        out[label] = {
            "dispatch_ms": round(best[0] * 1e3, 1),
            "drain_wire_plus_compute_ms": round(best[1] * 1e3, 1),
            "finalize_tail_ms": round(best[2] * 1e3, 1),
            "total_ms": round(best[3] * 1e3, 1),
            "mpts_per_s": round(N / best[3] / 1e6, 2),
        }
        print(f"{label:9s} dispatch {best[0]*1e3:6.0f}  "
              f"drain {best[1]*1e3:6.0f}  tail {best[2]*1e3:6.0f}  "
              f"total {best[3]*1e3:6.0f} ms", flush=True)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmark_results",
        "hybrid_1m_decomposition.json")
    rec = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, json.JSONDecodeError):
            rec = {}
    rec.setdefault("n_points", N)
    rec.setdefault("glyphs", {}).update(out)
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print("wrote", path)


if __name__ == "__main__":
    main()
