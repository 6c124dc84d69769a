#!/usr/bin/env python
"""Gaussian and Line glyph splatting on a sparse cloud."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import pcr

gc = pcr.GridConfig()
gc.bounds = pcr.BBox()
gc.bounds.min_x, gc.bounds.min_y = 0.0, 0.0
gc.bounds.max_x, gc.bounds.max_y = 500.0, 500.0
gc.crs = pcr.CRS.from_epsg(3857)
gc.compute_dimensions()

n = 2_000
rng = np.random.default_rng(0)
cloud = pcr.PointCloud.create(n)
cloud.set_x_array(rng.uniform(0, 500, n))
cloud.set_y_array(rng.uniform(0, 500, n))
for name, arr in [("value", rng.uniform(0, 1, n)),
                  ("sigma", rng.uniform(1.0, 5.0, n)),
                  ("direction", rng.uniform(0, 2 * np.pi, n)),
                  ("half_length", rng.uniform(2.0, 10.0, n))]:
    cloud.add_channel(name, pcr.DataType.Float32)
    cloud.set_channel_array_f32(name, arr.astype(np.float32))

for label, spec in [
    ("gaussian", pcr.gaussian_splat_spec("value", sigma_x_channel="sigma",
                                         sigma_y_channel="sigma")),
    ("line", pcr.line_splat_spec("value", direction_channel="direction",
                                 half_length_channel="half_length")),
]:
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [spec]
    cfg.exec_mode = pcr.ExecutionMode.Auto
    cfg.output_path = f"/tmp/pcr_{label}.tif"
    pipe = pcr.Pipeline.create(cfg)
    pipe.ingest(cloud)
    pipe.finalize()
    band = pipe.result().band_array(0)
    print(f"{label:10s} coverage {100 * np.isfinite(band).mean():5.1f}%  "
          f"-> {cfg.output_path}")
