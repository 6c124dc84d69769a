#!/usr/bin/env bash
# Run the benchmark suite and assemble the report
# (reference: scripts/shell/run_benchmarks.sh).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/pcr_bench_results}
mkdir -p "$OUT"

echo "== one-line JSON benchmark (bench.py) =="
python bench.py | tee "$OUT/bench.json"

echo "== glyph sweep =="
python benchmarks/benchmark_glyph_full.py \
    --points "${PCR_BENCH_POINTS:-1000000}" \
    --modes cpu tpu-staged --repeats "${PCR_BENCH_REPEATS:-2}" \
    --csv "$OUT/glyph_sweep.csv"

echo "== report =="
python benchmarks/generate_report.py "$OUT/glyph_sweep.csv" \
    -o "$OUT/report.md"
echo "results in $OUT"
