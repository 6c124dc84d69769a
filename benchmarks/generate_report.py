#!/usr/bin/env python
"""
Benchmark report generator — rebuild of
scripts/benchmarks/generate_report.py: turns benchmark CSVs into a Markdown
report with throughput tables and baseline comparisons.

Usage:
    python benchmarks/generate_report.py results.csv -o REPORT.md
"""

import argparse
import csv
import sys
from collections import defaultdict

# Reference GPU baselines at N=5M (README.md:195-201)
REFERENCE_5M = {
    "point": 60.26, "line_hl1": 50.60, "line_hl4": 50.41,
    "line_hl16": 46.61, "gauss_s1": 47.40, "gauss_s4": 21.59,
    "gauss_s16": 2.43,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_files", nargs="+")
    ap.add_argument("-o", "--output", default="BENCHMARK_REPORT.md")
    args = ap.parse_args()

    rows = []
    for path in args.csv_files:
        with open(path) as f:
            rows.extend(csv.DictReader(f))
    if not rows:
        print("no rows", file=sys.stderr)
        sys.exit(1)

    by_glyph = defaultdict(dict)
    points = sorted({int(r["points"]) for r in rows})
    modes = sorted({r["mode"] for r in rows})
    for r in rows:
        by_glyph[r["glyph"]][(int(r["points"]), r["mode"])] = float(
            r["mpts_per_s"])

    lines = ["# PCR-TPU benchmark report", ""]
    lines.append("## Throughput (Mpts/s)")
    header = ["glyph"] + [f"N={n // 1000}k {m}" if n < 1_000_000
                          else f"N={n // 1_000_000}M {m}"
                          for n in points for m in modes]
    lines.append("| " + " | ".join(header) + " |")
    lines.append("|" + "---|" * len(header))
    for glyph, cells in by_glyph.items():
        row = [glyph]
        for n in points:
            for m in modes:
                v = cells.get((n, m))
                row.append(f"{v:.2f}" if v is not None else "—")
        lines.append("| " + " | ".join(row) + " |")

    lines += ["", "## vs reference GPU baseline (N=5M, RTX 2060)", ""]
    lines.append("| glyph | this build (best mode) | reference | speedup |")
    lines.append("|---|---|---|---|")
    for glyph, base in REFERENCE_5M.items():
        vals = [v for (n, m), v in by_glyph.get(glyph, {}).items()
                if n == 5_000_000]
        if not vals:
            continue
        best = max(vals)
        lines.append(f"| {glyph} | {best:.2f} | {base:.2f} "
                     f"| {best / base:.2f}x |")

    with open(args.output, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
