#!/usr/bin/env python
"""Boundary-point diagnostic (reference: scripts/diagnostics boundary
checks): points exactly on bbox edges/corners and on tile seams must land
in clamped edge cells identically on both backends."""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import pcr_tpu as pcr  # noqa: E402


def build_cloud(gc):
    b = gc.bounds
    tile_x = b.min_x + gc.tile_width * gc.cell_size_x
    tile_y = b.min_y - gc.tile_height * gc.cell_size_y
    xs = [b.min_x, b.max_x, b.min_x, b.max_x,           # corners
          (b.min_x + b.max_x) / 2, b.min_x, b.max_x,    # edge midpoints
          tile_x, tile_x - 1e-9, tile_x + 1e-9,         # tile seam
          b.min_x - 1.0, b.max_x + 1.0]                 # out of bounds
    ys = [b.min_y, b.min_y, b.max_y, b.max_y,
          b.min_y, (b.min_y + b.max_y) / 2, (b.min_y + b.max_y) / 2,
          tile_y, tile_y, tile_y,
          b.min_y, b.max_y + 1.0]
    c = pcr.PointCloud.create(len(xs))
    c.set_x_array(np.asarray(xs, np.float64))
    c.set_y_array(np.asarray(ys, np.float64))
    c.add_channel("value", pcr.DataType.Float32)
    c.set_channel_array_f32("value", np.ones(len(xs), np.float32))
    return c


def main():
    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0, 0, 512, 512
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
    gc.tile_width = gc.tile_height = 256
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()
    cloud = build_cloud(gc)
    bands = {}
    for mode in (pcr.ExecutionMode.CPU, pcr.ExecutionMode.GPU):
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [pcr.ReductionSpec(value_channel="value",
                                            type=pcr.ReductionType.Count)]
        cfg.exec_mode = mode
        p = pcr.Pipeline.create(cfg)
        p.ingest(cloud)
        p.finalize()
        bands[mode] = p.result().band_array(0).copy()
        touched = int(np.count_nonzero(np.isfinite(bands[mode])))
        total = float(np.nansum(bands[mode]))
        print(f"{mode.name}: {touched} cells touched, count sum {total:g} "
              f"(expected 10 in-bounds points)")
    a, b = bands.values()
    same = (np.isnan(a) == np.isnan(b)).all() and np.array_equal(
        a[~np.isnan(a)], b[~np.isnan(b)])
    print("PASS" if same else "FAIL", "- backends agree" if same
          else "- backend mismatch at boundaries")
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
