#!/usr/bin/env bash
# Chip-bound validation queue for a flaky remote-TPU link: waits for a
# HEALTHY link (fast probe fetch), then runs every TPU-bound artifact in
# sequence, re-checking health between steps and continuing on failure.
# Each step logs to $OUT/queue/<step>.log.
#
#   scripts/tpu_queue.sh [OUT_DIR]
set -uo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-benchmark_results}
QL="$OUT/queue"
mkdir -p "$QL"

wait_healthy() {
  for _ in $(seq 1 240); do   # up to 2h
    if timeout 120 python - <<'EOF' >/dev/null 2>&1
import time, numpy as np, jax
d = [x for x in jax.devices() if x.platform != "cpu"]; assert d
y = jax.jit(lambda a: a + 1)(jax.device_put(np.ones(256, np.float32), d[0]))
t0 = time.time(); np.asarray(y); assert time.time() - t0 < 5.0
EOF
    then return 0; fi
    sleep 30
  done
  return 1
}

step() {
  name=$1; shift
  echo "== $name =="
  wait_healthy || { echo "link never became healthy; skipping $name"; return 1; }
  ( "$@" ) > "$QL/$name.log" 2>&1
  rc=$?
  tail -5 "$QL/$name.log"
  echo "-- $name rc=$rc"
  return 0
}

step glyph_sweep    python benchmarks/benchmark_glyph_full.py \
                      --points 1000000 5000000 --modes tpu-staged hybrid \
                      --repeats 2 --csv "$OUT/glyph_sweep.csv"
step walldec        python benchmarks/benchmark_wall_decomposition.py
step lidar_modes    bash -c 'D=$(mktemp -d /tmp/pcr_lidar_XXXX); \
  python scripts/data/run_lidar_pipeline.py --input "$D" --synthesize 10 \
    --pts-per-file 1000000 --cell 1.0 --modes cpu tpu hybrid \
    --out benchmark_results/lidar.tif \
    --csv benchmark_results/mode_comparison.csv \
    --stats-json benchmark_results/lidar_stats.json; rm -rf "$D"'
step warmup_persist python benchmarks/benchmark_warmup_persistence.py
step rot_tuning     python benchmarks/benchmark_rot_tuning.py --n 5000000
step lidar100m_tpu  python scripts/data/run_lidar_pipeline.py \
                      --input /root/lidar100m --modes tpu hybrid \
                      --glyph gauss --sigma 3.0 --value-channel z \
                      --chunk 2000000 --out /tmp/lidar100m_tpu.tif \
                      --csv benchmark_results/lidar100m.csv \
                      --stats-json benchmark_results/lidar100m.json
step patterns_tpu   bash -c 'python scripts/patterns/generate_glyph_patterns.py \
    --out benchmark_results/patterns --mode tpu && \
  python scripts/patterns/compare_cpu_tpu_patterns.py \
    --dir benchmark_results/patterns | tee benchmark_results/patterns/parity.txt'
step bench          python bench.py
echo "queue done"
