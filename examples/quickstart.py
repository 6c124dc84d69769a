#!/usr/bin/env python
"""README quickstart: 1M random points -> Average raster -> GeoTIFF."""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import pcr

bbox = pcr.BBox()
bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0, 0, 1000, 1000
gc = pcr.GridConfig()
gc.bounds = bbox
gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
gc.crs = pcr.CRS.from_epsg(3857)
gc.compute_dimensions()

N = 1_000_000
rng = np.random.default_rng(42)
cloud = pcr.PointCloud.create(N)
cloud.set_x_array(rng.uniform(0, 1000, N))
cloud.set_y_array(rng.uniform(0, 1000, N))
cloud.add_channel("value", pcr.DataType.Float32)
cloud.set_channel_array_f32("value", rng.uniform(0, 1, N).astype(np.float32))

spec = pcr.ReductionSpec()
spec.value_channel = "value"
spec.type = pcr.ReductionType.Average
spec.output_band_name = "mean_value"

cfg = pcr.PipelineConfig()
cfg.grid = gc
cfg.reductions = [spec]
cfg.exec_mode = pcr.ExecutionMode.Auto
cfg.output_path = "/tmp/pcr_quickstart.tif"

pipe = pcr.Pipeline.create(cfg)
pipe.ingest(cloud)
pipe.finalize()
band = pipe.result().band_array(0)
print(f"wrote {cfg.output_path}; coverage "
      f"{100 * np.isfinite(band).mean():.1f}%, "
      f"mean {np.nanmean(band):.4f}")
