#!/usr/bin/env python
"""Prove the persistent compile cache across PROCESSES (VERDICT r2 #9).

Round 2's billion-point artifact recorded warmup_s=480.5 — nearly all of
it remote XLA/Mosaic compiles — without evidence that a second process on
the same shapes skips it. This bench runs the same Pipeline.warmup in
fresh subprocesses against the billion-point grid shapes (4000x4000, 1 m
cells, Average + chunked ingest buckets):

  run 1: cold  — compile cache directory emptied first
  run 2: warm  — same shapes, persistent cache populated by run 1
  run 3: warm  — repeat, to separate cache-hit cost from noise

Done = warm-process warmup in seconds, not minutes.  Output:
benchmark_results/warmup_persistence.json
"""

import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import numpy as np
import pcr_tpu as pcr

t_import = time.perf_counter()
bbox = pcr.BBox()
bbox.min_x, bbox.min_y, bbox.max_x, bbox.max_y = 0.0, 0.0, 4000.0, 4000.0
gc = pcr.GridConfig()
gc.bounds = bbox
gc.cell_size_x, gc.cell_size_y = 1.0, -1.0
gc.crs = pcr.CRS.from_epsg(32610)
gc.compute_dimensions()
cfg = pcr.PipelineConfig()
cfg.grid = gc
cfg.reductions = [pcr.ReductionSpec(value_channel="value",
                                    type=pcr.ReductionType.Average)]
cfg.exec_mode = pcr.ExecutionMode.GPU
pipe = pcr.Pipeline.create(cfg)
t0 = time.perf_counter()
pipe.warmup(chunk_points=2_000_000)
warm = time.perf_counter() - t0
print(f"WARMUP_S={{warm:.2f}} SETUP_S={{t0 - t_import:.2f}}")
"""


def run_child():
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", CHILD.format(repo=REPO)],
                       capture_output=True, text=True, timeout=3600)
    wall = time.time() - t0
    warm = None
    for line in r.stdout.splitlines():
        if line.startswith("WARMUP_S="):
            warm = float(line.split("=")[1].split()[0])
    if warm is None:
        print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
        raise SystemExit("child failed")
    return warm, wall


def main():
    cache = os.environ.get("PCR_JAX_CACHE",
                           os.path.expanduser("~/.cache/pcr_jax_cache"))
    out = {"cache_dir": cache}
    if os.environ.get("PCR_WARMUP_KEEP_CACHE", "0") != "1":
        shutil.rmtree(cache, ignore_errors=True)
    w, wall = run_child()
    out["cold_warmup_s"] = round(w, 2)
    out["cold_process_wall_s"] = round(wall, 2)
    for i in (1, 2):
        w, wall = run_child()
        out[f"warm{i}_warmup_s"] = round(w, 2)
        out[f"warm{i}_process_wall_s"] = round(wall, 2)
    out["speedup"] = round(out["cold_warmup_s"]
                           / max(out["warm1_warmup_s"], 1e-9), 1)
    os.makedirs(os.path.join(REPO, "benchmark_results"), exist_ok=True)
    path = os.path.join(REPO, "benchmark_results",
                        "warmup_persistence.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
