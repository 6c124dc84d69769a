#!/usr/bin/env python
"""Tune the rotated-Gaussian dense kernel (VERDICT r2 #4: >= 21.59 Mpts/s).

The rot kernel evaluates each point's quadratic form over a full
(ROT_ROW_BLOCK x ROT_COL_TILE) tile; a sigma=4 window is ~25x25 cells, so
most of a 32x128 tile is wasted VPU work. Sweep the tile shape + unroll
in fresh subprocesses (the knobs are read at kernel build) and report
accumulate + wall for each.

    python benchmarks/benchmark_rot_tuning.py [--n 5000000]

Writes benchmark_results/rot_tuning.json with the winner.
"""

import argparse
import itertools
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import os, sys, time, tempfile
sys.path.insert(0, {repo!r})
import numpy as np
import pcr_tpu as pcr

N = {n}
bbox = pcr.BBox(); bbox.min_x = bbox.min_y = 0.0
bbox.max_x = bbox.max_y = 1000.0
gc = pcr.GridConfig(); gc.bounds = bbox
gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
gc.crs = pcr.CRS.from_epsg(3857); gc.compute_dimensions()
rng = np.random.default_rng(42)
cloud = pcr.PointCloud.create(N)
cloud.set_x_array(rng.uniform(0, 1000, N))
cloud.set_y_array(rng.uniform(0, 1000, N))
cloud.add_channel("value", pcr.DataType.Float32)
cloud.set_channel_array_f32("value", rng.uniform(0, 1, N).astype(np.float32))
cfg = pcr.PipelineConfig(); cfg.grid = gc
cfg.reductions = [pcr.gaussian_splat_spec(
    "value", default_sigma_x=4.0, default_sigma_y=1.5,
    default_rotation=0.6)]
cfg.exec_mode = pcr.ExecutionMode.GPU
cfg.output_path = os.path.join(tempfile.mkdtemp(), "o.tif")
pipe = pcr.Pipeline.create(cfg)
staged = pipe.stage(cloud)
pipe.ingest(staged); pipe.finalize()

def sync():
    pipe._engine.flush_pending()
    st = pipe._engine._states[0][0]
    head = st[:1, :1] if st.ndim == 2 else st[:1]
    return float(np.asarray(head).ravel()[0])

K = 4
best_acc = 0.0
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(K):
        pipe.ingest(staged)
    sync()
    best_acc = max(best_acc, N * K / (time.perf_counter() - t0) / 1e6)
best_wall = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    pipe.ingest(staged); pipe.finalize()
    best_wall = min(best_wall, time.perf_counter() - t0)
print(f"ACC={{best_acc:.2f}} WALL={{N/best_wall/1e6:.2f}}")
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--grid", default="")
    args = ap.parse_args()
    combos = [(th, wt, u)
              for th in (16, 32, 64)
              for wt in (128, 256)
              for u in (64,)]
    results = []
    for th, wt, u in combos:
        env = dict(os.environ,
                   PCR_ROT_ROW_BLOCK=str(th),
                   PCR_ROT_COL_TILE=str(wt),
                   PCR_ROT_UNROLL=str(u))
        try:
            r = subprocess.run(
                [sys.executable, "-c", CHILD.format(repo=REPO, n=args.n)],
                capture_output=True, text=True, timeout=1200, env=env)
        except subprocess.TimeoutExpired:
            print(f"TH={th} WT={wt} U={u}: timeout")
            continue
        acc = wall = None
        for line in r.stdout.splitlines():
            if line.startswith("ACC="):
                acc = float(line.split()[0].split("=")[1])
                wall = float(line.split()[1].split("=")[1])
        if acc is None:
            print(f"TH={th} WT={wt} U={u}: failed "
                  f"({r.stderr.strip().splitlines()[-1:] or 'no output'})")
            continue
        print(f"TH={th:3d} WT={wt:3d} U={u:3d}: accumulate {acc:7.2f} "
              f"wall {wall:7.2f} Mpts/s", flush=True)
        results.append({"row_block": th, "col_tile": wt, "unroll": u,
                        "accumulate_mpts": acc, "wall_mpts": wall})
    if results:
        best = max(results, key=lambda r: r["wall_mpts"])
        out = {"n_points": args.n, "results": results, "best": best}
        os.makedirs(os.path.join(REPO, "benchmark_results"), exist_ok=True)
        with open(os.path.join(REPO, "benchmark_results",
                               "rot_tuning.json"), "w") as f:
            json.dump(out, f, indent=2)
        print("best:", json.dumps(best))


if __name__ == "__main__":
    main()
