#!/usr/bin/env python
"""Grid-size sweep diagnostic (reference: scripts/diagnostics grid-size
checks): odd, tiny, non-tile-aligned, and large grids must all ingest and
finalize correctly; prints per-size timing and cell-count sanity."""

import argparse
import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import pcr_tpu as pcr  # noqa: E402


def run_size(w, h, n, mode):
    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0, 0, float(w), float(h)
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()
    rng = np.random.default_rng(0)
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(0, w, n))
    c.set_y_array(rng.uniform(0, h, n))
    c.add_channel("value", pcr.DataType.Float32)
    c.set_channel_array_f32("value", rng.uniform(0, 1, n).astype(np.float32))
    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [pcr.ReductionSpec(value_channel="value",
                                        type=pcr.ReductionType.Count)]
    cfg.exec_mode = mode
    t0 = time.perf_counter()
    p = pcr.Pipeline.create(cfg)
    p.ingest(c)
    p.finalize()
    dt = time.perf_counter() - t0
    total = float(np.nansum(p.result().band_array(0)))
    ok = total == n
    print(f"{w:>6}x{h:<6} n={n:<8} {mode.name:3s} {dt:7.2f}s "
          f"count={total:.0f} {'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="CPU", choices=["CPU", "GPU", "Auto"])
    ap.add_argument("--points", type=int, default=100_000)
    args = ap.parse_args()
    mode = getattr(pcr.ExecutionMode, args.mode)
    sizes = [(1, 1), (7, 3), (100, 100), (129, 257), (1000, 1000),
             (1, 4096), (4096, 1), (3001, 1999)]
    ok = all(run_size(w, h, args.points, mode) for w, h in sizes)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
