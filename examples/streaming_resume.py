#!/usr/bin/env python
"""Streaming ingest with checkpoint/resume via tile-state files."""
import sys, os, shutil
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import pcr

STATE = "/tmp/pcr_resume_state"
shutil.rmtree(STATE, ignore_errors=True)

gc = pcr.GridConfig()
gc.bounds = pcr.BBox()
gc.bounds.min_x, gc.bounds.min_y = 0.0, 0.0
gc.bounds.max_x, gc.bounds.max_y = 200.0, 200.0
gc.crs = pcr.CRS.from_epsg(3857)
gc.compute_dimensions()

def make_cfg():
    spec = pcr.ReductionSpec()
    spec.value_channel = "v"
    spec.type = pcr.ReductionType.Sum
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [spec]
    cfg.exec_mode = pcr.ExecutionMode.Auto
    cfg.state_dir = STATE
    return cfg

def cloud(seed):
    rng = np.random.default_rng(seed)
    c = pcr.PointCloud.create(100_000)
    c.set_x_array(rng.uniform(0, 200, 100_000))
    c.set_y_array(rng.uniform(0, 200, 100_000))
    c.add_channel("v", pcr.DataType.Float32)
    c.set_channel_array_f32("v", np.ones(100_000, np.float32))
    return c

# session 1: ingest half, flush state, "crash"
p1 = pcr.Pipeline.create(make_cfg())
p1.ingest(cloud(1))
p1.finalize()
print("session 1 total:", np.nansum(p1.result().band_array(0)))

# session 2: resumes from the PCRT checkpoint and keeps accumulating
p2 = pcr.Pipeline.create(make_cfg())
p2.ingest(cloud(2))
p2.finalize()
print("session 2 total:", np.nansum(p2.result().band_array(0)),
      "(both clouds)")
