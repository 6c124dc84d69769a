"""Targeted accumulate benchmark for the packed rotated-Gaussian splat.

Mirrors benchmark_wall_decomposition's gauss_rot_s4 row (5M points,
1000x1000 grid, Average reduction, staged mode, ingest-dispatch timing
synced by a 1-element state fetch) so numbers are comparable to the
committed wall_decomposition.json.  Sweeps the rotp knobs via env.

    python benchmarks/benchmark_rotp.py --configs 16:32 32:32 0:0
        (TH:GU pairs; 0:0 = the old unpacked 'rot' kernel)
"""
from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def run_one(TH: int, GU: int, n: int, reps: int) -> dict:
    os.environ["PCR_ROT_PACKED"] = "1" if TH else "0"
    if TH:
        os.environ["PCR_ROTP_ROW_BLOCK"] = str(TH)
        os.environ["PCR_ROTP_GU"] = str(GU)
    import subprocess
    import sys
    code = f"""
import time, numpy as np, json
import pcr_tpu as pcr
n = {n}
bbox = pcr.BBox(); bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0,0,1000.,1000.
gc = pcr.GridConfig(); gc.bounds = bbox
gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
gc.crs = pcr.CRS.from_epsg(3857); gc.compute_dimensions()
rng = np.random.default_rng(42)
c = pcr.PointCloud.create(n)
c.set_x_array(rng.uniform(0, 1000, n)); c.set_y_array(rng.uniform(0, 1000, n))
c.add_channel("value", pcr.DataType.Float32)
c.set_channel_array_f32("value", rng.uniform(0, 1, n).astype(np.float32))
spec = pcr.gaussian_splat_spec("value", default_sigma_x=4.0,
                               default_sigma_y=1.5, default_rotation=0.6)
cfg = pcr.PipelineConfig(); cfg.grid = gc; cfg.reductions = [spec]
cfg.exec_mode = pcr.ExecutionMode.GPU
cfg.gpu_require_strict = True
p = pcr.Pipeline.create(cfg)
t0 = time.perf_counter()
staged = p.stage(c)
stage_s = time.perf_counter() - t0
p.ingest(staged); p.finalize()
eng = p._engine
def sync():
    eng.flush_pending()
    st = eng._states[0][0]
    return float(np.asarray(st[:1, :1]).ravel()[0])
K = {reps}
bacc = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(K):
        p.ingest(staged)
    sync()
    bacc = min(bacc, (time.perf_counter() - t0) / K)
print("RESULT " + json.dumps(dict(
    accumulate_s=round(bacc, 5),
    accumulate_mpts=round(n / bacc / 1e6, 2),
    stage_s=round(stage_s, 3))))
"""
    t0 = time.perf_counter()
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=900, env=os.environ.copy())
    wall = time.perf_counter() - t0
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            d = json.loads(line[7:])
            d["proc_wall_s"] = round(wall, 1)
            return d
    return {"error": (out.stdout[-400:] + out.stderr[-800:])[-1000:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["16:32", "32:32"])
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="benchmark_results/rotp_tuning.json")
    args = ap.parse_args()
    results = {}
    for cfgs in args.configs:
        parts = cfgs.split(":")
        TH, GU = int(parts[0]), int(parts[1])
        os.environ["PCR_ROTP_STUB"] = parts[2] if len(parts) > 2 else ""
        label = (f"rotp_TH{TH}_GU{GU}" if TH else "rot_unpacked")
        if len(parts) > 2:
            label += f"_{parts[2]}"
        r = run_one(TH, GU, args.n, args.reps)
        results[label] = r
        print(label, r, flush=True)
    with open(args.out, "w") as f:
        json.dump({"n": args.n, "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
