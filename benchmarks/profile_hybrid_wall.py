#!/usr/bin/env python
"""Where does the 5M hybrid wall go? ingest vs finalize vs host routing.

probe_overlap.py proved the serial prep->put->commit loop already rides
within ~20% of the pure wire floor. The glyph sweep's hybrid rows are
much further from the ceiling, so the residual must be in the pipeline
wrapper (routing.assign, channel prep) and the finalize tail. Times the
production pieces at 5M on the 1000x1000 bench grid.
"""

import os
import sys
import time
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N = int(os.environ.get("PCR_BENCH_N", 5_000_000))


def main():
    import jax
    import pcr_tpu as pcr
    from pcr_tpu.engine import routing

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

    t0 = time.perf_counter()
    col, row, valid = routing.assign(gc, x, y)
    t_assign = time.perf_counter() - t0
    print(f"routing.assign @5M: {t_assign * 1e3:.0f} ms", flush=True)

    for label, spec in (
        ("line_hl1", pcr.line_splat_spec("value", default_half_length=1.0)),
        ("gauss_s4", pcr.gaussian_splat_spec("value", default_sigma=4.0)),
        ("point", None),
    ):
        if spec is None:
            spec = pcr.ReductionSpec()
            spec.value_channel = "value"
            spec.type = pcr.ReductionType.Average
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [spec]
        cfg.exec_mode = pcr.ExecutionMode.Hybrid
        with tempfile.TemporaryDirectory() as tmp:
            cfg.output_path = os.path.join(tmp, "out.tif")
            pipe = pcr.Pipeline.create(cfg)
            cloud = pcr.PointCloud.create(N)
            cloud.set_x_array(x)
            cloud.set_y_array(y)
            cloud.add_channel("value", pcr.DataType.Float32)
            cloud.set_channel_array_f32("value", vs)
            pipe.ingest(cloud)
            pipe.finalize()          # warm everything
            bi = bf = bt = float("inf")
            for _ in range(3):
                pipe2 = pcr.Pipeline.create(cfg)
                t0 = time.perf_counter()
                pipe2.ingest(cloud)
                t1 = time.perf_counter()
                pipe2.finalize()
                t2 = time.perf_counter()
                bi = min(bi, t1 - t0)
                bf = min(bf, t2 - t1)
                bt = min(bt, t2 - t0)
            print(f"{label:10s} ingest {bi * 1e3:7.0f} ms  "
                  f"finalize {bf * 1e3:6.0f} ms  total {bt * 1e3:7.0f} ms  "
                  f"{N / bt / 1e6:6.2f} Mpts/s", flush=True)


if __name__ == "__main__":
    main()
