#!/usr/bin/env python
"""
Visual glyph pattern generator — rebuild of
scripts/patterns/generate_glyph_patterns.py: renders known glyph patterns
(gap-fill, sigma progression, anisotropic rotation, line directions, flow
field, per-point sigma, bullseye) to GeoTIFF + PNG for eyeballing and for
the CPU↔TPU comparator (compare_cpu_tpu_patterns.py).

Usage:
    python scripts/patterns/generate_glyph_patterns.py --out /tmp/patterns \
        --mode cpu
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import pcr_tpu as pcr  # noqa: E402


def make_grid(size=256):
    bbox = pcr.BBox()
    bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0.0, 0.0, float(size), float(size)
    gc = pcr.GridConfig()
    gc.bounds = bbox
    gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
    gc.crs = pcr.CRS.from_epsg(3857)
    gc.compute_dimensions()
    return gc


def sparse_cloud(rng, size, n=800, channels=()):
    c = pcr.PointCloud.create(n)
    c.set_x_array(rng.uniform(0, size, n))
    c.set_y_array(rng.uniform(0, size, n))
    c.add_channel("value", pcr.DataType.Float32)
    c.set_channel_array_f32("value", rng.uniform(0, 1, n).astype(np.float32))
    for name, arr in channels:
        c.add_channel(name, pcr.DataType.Float32)
        c.set_channel_array_f32(name, arr.astype(np.float32))
    return c


def patterns(size, rng):
    n = 800
    xy = rng.uniform(0, size, (2, n))

    def base(channels=()):
        c = pcr.PointCloud.create(n)
        c.set_x_array(xy[0])
        c.set_y_array(xy[1])
        c.add_channel("value", pcr.DataType.Float32)
        c.set_channel_array_f32("value",
                                (xy[0] / size).astype(np.float32))
        for name, arr in channels:
            c.add_channel(name, pcr.DataType.Float32)
            c.set_channel_array_f32(name, arr.astype(np.float32))
        return c

    out = []
    # 1. gap fill: sparse points, sigma progression
    for s in (1.0, 3.0, 6.0):
        out.append((f"gauss_gapfill_s{s:g}", base(),
                    pcr.gaussian_splat_spec("value", default_sigma=s,
                                            max_radius_cells=24.0)))
    # 2. anisotropic rotated gaussian
    rot = np.full(n, np.pi / 4)
    out.append(("gauss_aniso_rot45",
                base([("rot", rot)]),
                pcr.gaussian_splat_spec("value", default_sigma_x=6.0,
                                        default_sigma_y=1.5,
                                        rotation_channel="rot",
                                        max_radius_cells=24.0)))
    # 3. per-point sigma
    sig = rng.uniform(0.5, 6.0, n)
    out.append(("gauss_perpoint_sigma",
                base([("sig", sig)]),
                pcr.gaussian_splat_spec("value", sigma_x_channel="sig",
                                        sigma_y_channel="sig",
                                        max_radius_cells=24.0)))
    # 4. line directions (8 fixed angles)
    for k, ang in enumerate(np.linspace(0, np.pi, 4, endpoint=False)):
        out.append((f"line_dir{k}",
                    base(),
                    pcr.line_splat_spec("value", default_direction=float(ang),
                                        default_half_length=6.0,
                                        max_radius_cells=12.0)))
    # 5. flow field: direction = angle around the center
    cx = cy = size / 2
    ang = np.arctan2(xy[1] - cy, xy[0] - cx) + np.pi / 2
    out.append(("line_flowfield",
                base([("dir", ang)]),
                pcr.line_splat_spec("value", direction_channel="dir",
                                    default_half_length=5.0,
                                    max_radius_cells=12.0)))
    # 6. point baseline
    spec = pcr.ReductionSpec()
    spec.value_channel = "value"
    spec.type = pcr.ReductionType.Average
    out.append(("point_baseline", base(), spec))
    return out


def save_png(path, band):
    try:
        from PIL import Image
    except ImportError:
        return
    a = band.copy()
    m = np.isfinite(a)
    if m.any():
        lo, hi = np.nanmin(a), np.nanmax(a)
        a = (a - lo) / max(hi - lo, 1e-9)
    a = np.where(m, a, 0.0)
    Image.fromarray((a * 255).astype(np.uint8)).save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/pcr_patterns")
    ap.add_argument("--mode", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    rng = np.random.default_rng(0)
    gc = make_grid(args.size)
    mode = (pcr.ExecutionMode.CPU if args.mode == "cpu"
            else pcr.ExecutionMode.GPU)
    for name, cloud, spec in patterns(args.size, rng):
        cfg = pcr.PipelineConfig()
        cfg.grid = gc
        cfg.reductions = [spec]
        cfg.exec_mode = mode
        cfg.output_path = os.path.join(args.out, f"{name}_{args.mode}.tif")
        pipe = pcr.Pipeline.create(cfg)
        pipe.ingest(cloud)
        pipe.finalize()
        band = pipe.result().band_array(0)
        save_png(os.path.join(args.out, f"{name}_{args.mode}.png"), band)
        cov = 100.0 * np.isfinite(band).mean()
        print(f"{name:24s} coverage {cov:5.1f}%  -> "
              f"{cfg.output_path}")


if __name__ == "__main__":
    main()
