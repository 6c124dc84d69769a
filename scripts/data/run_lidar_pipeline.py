#!/usr/bin/env python
"""
Real-data streaming pipeline harness — rebuild of
scripts/data/test_dc_lidar.py: streams a directory of LAS/PCRP/CSV tiles
through one Pipeline with per-phase timing (io_read_s / ingest_s /
finalize_s), coverage stats, and a stats JSON — the reference's de-facto
large-scale integration test.

Unlike the reference (which shells out to laspy), LAS reading here is
native to the framework (pcr_tpu/io/point_cloud_io.py).

Usage:
    python scripts/data/run_lidar_pipeline.py --input /data/las_tiles \
        --cell 1.0 --mode tpu --value-channel z --out /tmp/lidar.tif

With --synthesize N_FILES, generates synthetic LAS-like PCRP tiles first
(useful for exercising the streaming path without a dataset).
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import pcr_tpu as pcr  # noqa: E402
from pcr_tpu.utils.profiling import PhaseTimer  # noqa: E402


def synthesize(directory, n_files, pts_per_file=500_000, extent=4000.0):
    os.makedirs(directory, exist_ok=True)
    rng = np.random.default_rng(0)
    side = int(np.ceil(np.sqrt(n_files)))
    tile_w = extent / side
    for i in range(n_files):
        tx, ty = i % side, i // side
        c = pcr.PointCloud.create(pts_per_file)
        c.set_x_array(rng.uniform(tx * tile_w, (tx + 1) * tile_w,
                                  pts_per_file))
        c.set_y_array(rng.uniform(ty * tile_w, (ty + 1) * tile_w,
                                  pts_per_file))
        c.add_channel("z", pcr.DataType.Float32)
        c.set_channel_array_f32(
            "z", (50 + 30 * rng.random(pts_per_file)).astype(np.float32))
        c.set_crs(pcr.CRS.from_epsg(32110))
        pcr.write_point_cloud(os.path.join(directory, f"tile_{i:04d}.pcrp"),
                              c)
    return extent


def scan_bounds(files):
    """First pass: union of per-file bounds (header-only where possible)."""
    bbox = pcr.BBox()
    total = 0
    for path in files:
        info = pcr.read_point_cloud_info(path)
        total += info.num_points
        if info.bounds.valid():
            bbox.expand(info.bounds)
        else:
            cloud = pcr.read_point_cloud(path)
            bbox.expand(float(cloud.x_array().min()),
                        float(cloud.y_array().min()))
            bbox.expand(float(cloud.x_array().max()),
                        float(cloud.y_array().max()))
    return bbox, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--synthesize", type=int, default=0)
    ap.add_argument("--cell", type=float, default=1.0)
    ap.add_argument("--mode", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--value-channel", default="z")
    ap.add_argument("--reduction", default="Average")
    ap.add_argument("--glyph", default="point",
                    choices=["point", "gauss"])
    ap.add_argument("--sigma", type=float, default=3.0)
    ap.add_argument("--chunk", type=int, default=2_000_000)
    ap.add_argument("--out", default="/tmp/pcr_lidar.tif")
    ap.add_argument("--stats-json", default="")
    args = ap.parse_args()

    if args.synthesize:
        synthesize(args.input, args.synthesize)

    files = sorted(sum((glob.glob(os.path.join(args.input, pat))
                        for pat in ("*.las", "*.pcrp", "*.csv")), []))
    if not files:
        print(f"no point cloud files in {args.input}", file=sys.stderr)
        sys.exit(2)

    timer = PhaseTimer()
    with timer.phase("scan_bounds"):
        bbox, total_pts = scan_bounds(files)
    print(f"{len(files)} files, {total_pts / 1e6:.1f}M points, "
          f"bounds [{bbox.min_x:.0f},{bbox.min_y:.0f}]–"
          f"[{bbox.max_x:.0f},{bbox.max_y:.0f}]")

    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = args.cell, -args.cell
    gc.crs = pcr.CRS.from_epsg(32110)
    gc.compute_dimensions()
    print(f"grid {gc.width}x{gc.height} = "
          f"{gc.total_cells() / 1e6:.1f}M cells")

    if args.glyph == "gauss":
        spec = pcr.gaussian_splat_spec(args.value_channel,
                                       default_sigma=args.sigma)
    else:
        spec = pcr.ReductionSpec()
        spec.value_channel = args.value_channel
        spec.type = getattr(pcr.ReductionType, args.reduction)

    cfg = pcr.PipelineConfig()
    cfg.grid = gc
    cfg.reductions = [spec]
    cfg.exec_mode = (pcr.ExecutionMode.CPU if args.mode == "cpu"
                     else pcr.ExecutionMode.GPU)
    cfg.output_path = args.out
    pipe = pcr.Pipeline.create(cfg)

    t_start = time.perf_counter()
    buf = pcr.PointCloud.create(args.chunk)
    done = 0
    for path in files:
        reader = pcr.PointCloudReader.open(path)
        while not reader.eof():
            with timer.phase("io_read"):
                n = reader.read_chunk(buf, args.chunk)
            if n == 0:
                break
            with timer.phase("ingest"):
                pipe.ingest(buf)
            done += n
        elapsed = time.perf_counter() - t_start
        print(f"{os.path.basename(path):24s} total {done / 1e6:8.1f}M  "
              f"lib {done / max(timer.seconds('ingest'), 1e-9) / 1e6:7.2f} "
              f"Mpts/s  wall {done / elapsed / 1e6:6.2f} Mpts/s", flush=True)

    with timer.phase("finalize"):
        pipe.finalize()

    band = pipe.result().band_array(0)
    coverage = 100.0 * float(np.isfinite(band).mean())
    wall = time.perf_counter() - t_start
    print("\n" + timer.report())
    print(f"\ncoverage {coverage:.1f}%  wall {wall:.1f}s  "
          f"library {done / timer.seconds('ingest') / 1e6:.2f} Mpts/s")
    print(f"output: {args.out}")

    if args.stats_json:
        with open(args.stats_json, "w") as f:
            json.dump({
                "files": len(files), "points": done,
                "coverage_pct": coverage, "wall_s": wall,
                "phases": timer.summary(),
                "grid": [gc.width, gc.height],
            }, f, indent=2)


if __name__ == "__main__":
    main()
