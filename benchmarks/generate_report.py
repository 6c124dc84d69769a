#!/usr/bin/env python
"""
Benchmark report generator — rebuild of the reference's
scripts/benchmarks/generate_report.py (Markdown + plots): turns benchmark
CSVs into a Markdown report and a self-contained HTML report with embedded
SVG charts (no plotting dependencies).

Inputs:
  * glyph sweep CSVs from benchmarks/benchmark_glyph_full.py
    (columns: glyph, points, mode, best_seconds, mpts_per_s)
  * optional --lidar-csv from scripts/data/run_lidar_pipeline.py --csv
  * optional --bench-json (the driver bench.py JSON line)

Usage:
    python benchmarks/generate_report.py results.csv -o REPORT.md \
        --html REPORT.html [--lidar-csv mode_comparison.csv] \
        [--bench-json BENCH.json]
"""

import argparse
import csv
import html
import json
import sys
from collections import defaultdict

# Reference GPU baselines at N=5M (README.md:195-201; rotated: the
# reference window loop runs rotated at unrotated sigma=4 speed)
REFERENCE_5M = {
    "point": 60.26, "line_hl1": 50.60, "line_hl4": 50.41,
    "line_hl16": 46.61, "gauss_s1": 47.40, "gauss_s4": 21.59,
    "gauss_s16": 2.43, "gauss_rot_s4": 21.59,
}

MODE_COLORS = {
    "cpu": "#9aa5b1", "tpu": "#5a9bd5", "hybrid": "#8fbc62",
    "tpu-staged": "#e3893b",
}
BASELINE_COLOR = "#c65461"


def fmt_n(n):
    if n >= 1_000_000:
        return f"{n // 1_000_000}M" if n % 1_000_000 == 0 else f"{n / 1e6:g}M"
    return f"{n // 1000}k" if n >= 1000 else str(n)


# ---------------------------------------------------------------------------
# SVG helpers
# ---------------------------------------------------------------------------

def svg_grouped_bars(title, groups, series, values, unit="Mpts/s",
                     baseline=None, width=860, height=300):
    """Grouped bar chart. groups: x labels; series: legend entries;
    values[(group, series)] -> float; baseline[group] -> float draws a
    reference tick per group."""
    pad_l, pad_r, pad_t, pad_b = 64, 16, 34, 54
    plot_w = width - pad_l - pad_r
    plot_h = height - pad_t - pad_b
    vmax = max([v for v in values.values() if v is not None] +
               ([v for v in (baseline or {}).values()] or [0.0]) + [1e-9])
    vmax *= 1.08
    ng, ns = len(groups), len(series)
    group_w = plot_w / max(ng, 1)
    bar_w = min(26.0, group_w * 0.8 / max(ns, 1))

    def y(v):
        return pad_t + plot_h * (1 - v / vmax)

    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
             f'height="{height}" font-family="system-ui,sans-serif" '
             f'font-size="11">']
    parts.append(f'<text x="{pad_l}" y="16" font-size="13" '
                 f'font-weight="600">{html.escape(title)}</text>')
    # y grid
    for i in range(5):
        v = vmax * i / 4
        yy = y(v)
        parts.append(f'<line x1="{pad_l}" y1="{yy:.1f}" '
                     f'x2="{width - pad_r}" y2="{yy:.1f}" '
                     f'stroke="#e3e6ea"/>')
        parts.append(f'<text x="{pad_l - 6}" y="{yy + 4:.1f}" '
                     f'text-anchor="end" fill="#667">{v:.3g}</text>')
    parts.append(f'<text x="12" y="{pad_t - 10}" fill="#667">{unit}</text>')
    # bars
    for gi, g in enumerate(groups):
        x0 = pad_l + gi * group_w + (group_w - bar_w * ns) / 2
        for si, s in enumerate(series):
            v = values.get((g, s))
            if v is None:
                continue
            xx = x0 + si * bar_w
            yy = y(v)
            c = MODE_COLORS.get(s, "#888")
            parts.append(
                f'<rect x="{xx:.1f}" y="{yy:.1f}" width="{bar_w - 3:.1f}" '
                f'height="{pad_t + plot_h - yy:.1f}" fill="{c}">'
                f'<title>{html.escape(str(g))} {html.escape(s)}: '
                f'{v:.2f} {unit}</title></rect>')
        if baseline and baseline.get(g) is not None:
            yb = y(baseline[g])
            parts.append(
                f'<line x1="{x0 - 4:.1f}" y1="{yb:.1f}" '
                f'x2="{x0 + bar_w * ns + 1:.1f}" y2="{yb:.1f}" '
                f'stroke="{BASELINE_COLOR}" stroke-width="2" '
                f'stroke-dasharray="5,3"><title>reference GPU: '
                f'{baseline[g]:.2f}</title></line>')
        parts.append(
            f'<text x="{pad_l + gi * group_w + group_w / 2:.1f}" '
            f'y="{height - pad_b + 16}" text-anchor="middle">'
            f'{html.escape(str(g))}</text>')
    # legend
    lx = pad_l
    ly = height - 18
    for s in series:
        c = MODE_COLORS.get(s, "#888")
        parts.append(f'<rect x="{lx}" y="{ly - 9}" width="10" height="10" '
                     f'fill="{c}"/>')
        parts.append(f'<text x="{lx + 14}" y="{ly}">{html.escape(s)}</text>')
        lx += 14 + 7 * len(s) + 24
    if baseline:
        parts.append(f'<line x1="{lx}" y1="{ly - 4}" x2="{lx + 18}" '
                     f'y2="{ly - 4}" stroke="{BASELINE_COLOR}" '
                     f'stroke-width="2" stroke-dasharray="5,3"/>')
        parts.append(f'<text x="{lx + 22}" y="{ly}">reference GPU '
                     f'(RTX 2060)</text>')
    parts.append("</svg>")
    return "".join(parts)


def svg_speedup(title, labels, speedups, width=860, height=260):
    """Horizontal log-scale speedup-vs-baseline bars (1x line marked)."""
    import math
    pad_l, pad_r, pad_t, pad_b = 110, 60, 34, 24
    plot_w = width - pad_l - pad_r
    row_h = (height - pad_t - pad_b) / max(len(labels), 1)
    lo = min(min(speedups), 0.1)
    hi = max(max(speedups), 2.0)
    lmin, lmax = math.log10(lo / 1.3), math.log10(hi * 1.3)

    def x(v):
        return pad_l + plot_w * (math.log10(v) - lmin) / (lmax - lmin)

    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
             f'height="{height}" font-family="system-ui,sans-serif" '
             f'font-size="11">',
             f'<text x="{pad_l}" y="16" font-size="13" font-weight="600">'
             f'{html.escape(title)}</text>']
    for tick in (0.1, 0.25, 0.5, 1, 2, 5, 10):
        if lo / 1.3 <= tick <= hi * 1.3:
            xx = x(tick)
            parts.append(f'<line x1="{xx:.1f}" y1="{pad_t}" x2="{xx:.1f}" '
                         f'y2="{height - pad_b}" stroke="#e3e6ea"/>')
            parts.append(f'<text x="{xx:.1f}" y="{height - 8}" '
                         f'text-anchor="middle" fill="#667">{tick:g}x</text>')
    x1 = x(1)
    parts.append(f'<line x1="{x1:.1f}" y1="{pad_t}" x2="{x1:.1f}" '
                 f'y2="{height - pad_b}" stroke="{BASELINE_COLOR}" '
                 f'stroke-width="2" stroke-dasharray="5,3"/>')
    for i, (lab, v) in enumerate(zip(labels, speedups)):
        yy = pad_t + i * row_h + row_h * 0.15
        hh = row_h * 0.7
        xx = x(v)
        left, w = (min(x1, xx), abs(xx - x1))
        color = "#8fbc62" if v >= 1 else "#5a9bd5"
        parts.append(f'<rect x="{left:.1f}" y="{yy:.1f}" width="{w:.1f}" '
                     f'height="{hh:.1f}" fill="{color}">'
                     f'<title>{html.escape(lab)}: {v:.2f}x</title></rect>')
        parts.append(f'<text x="{pad_l - 6}" y="{yy + hh * 0.75:.1f}" '
                     f'text-anchor="end">{html.escape(lab)}</text>')
        parts.append(f'<text x="{max(xx, x1) + 6:.1f}" '
                     f'y="{yy + hh * 0.75:.1f}">{v:.2f}x</text>')
    parts.append("</svg>")
    return "".join(parts)


# ---------------------------------------------------------------------------
# report assembly
# ---------------------------------------------------------------------------

def load_rows(paths):
    rows = []
    for path in paths:
        with open(path) as f:
            rows.extend(csv.DictReader(f))
    return rows


def wire_rows(rows):
    """(glyph, N, mpts, ceiling, pct) for hybrid rows that carry the
    measured wire-ceiling columns (benchmark_glyph_full.py)."""
    out = []
    for r in rows:
        if r.get("mode") == "hybrid" and r.get("pct_of_wire_ceiling"):
            out.append((r["glyph"], int(r["points"]),
                        float(r["mpts_per_s"]),
                        float(r["wire_ceiling_mpts"]),
                        float(r["pct_of_wire_ceiling"])))
    return out


def build_markdown(by_glyph, points, modes, lidar_rows, bench,
                   mesh_rows=(), wires=(), walldec=None):
    lines = ["# PCR-TPU benchmark report", ""]
    lines.append("## Throughput (Mpts/s)")
    header = ["glyph"] + [f"N={fmt_n(n)} {m}" for n in points for m in modes]
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

    if wires:
        lines += ["", "## Hybrid (host-sourced) rows vs this link's wire "
                  "ceiling", "",
                  "The hybrid pipeline streams a minimal wire record per "
                  "point over the host link (8 B points, 12 B glyphs); on "
                  "this tunnel the wire itself bounds throughput, so the "
                  "fraction of that ceiling is the engineering figure of "
                  "merit (the reference's Hybrid rides a PCIe link ~200x "
                  "wider).", ""]
        lines.append("| glyph | N | Mpts/s | wire ceiling | % of ceiling |")
        lines.append("|---|---|---|---|---|")
        for g, n, v, c, p in wires:
            lines.append(f"| {g} | {fmt_n(n)} | {v:.2f} | {c:.2f} "
                         f"| {p:.0f}% |")

    if lidar_rows:
        lines += ["", "## LiDAR streaming pipeline (mode comparison)", ""]
        cols = list(lidar_rows[0])
        lines.append("| " + " | ".join(cols) + " |")
        lines.append("|" + "---|" * len(cols))
        for r in lidar_rows:
            lines.append("| " + " | ".join(str(r[c]) for c in cols) + " |")

    if mesh_rows:
        lines += ["", "## Multi-chip dp x sp scaling "
                  "(jax.sharding mesh; virtual CPU devices unless run "
                  "on a pod — numbers then measure the sharding "
                  "machinery, not hardware)", ""]
        cols = list(mesh_rows[0])
        lines.append("| " + " | ".join(cols) + " |")
        lines.append("|" + "---|" * len(cols))
        for r in mesh_rows:
            lines.append("| " + " | ".join(str(r[c]) for c in cols) + " |")

    if bench:
        lines += ["", "## Driver bench (bench.py)", "",
                  f"Primary metric: **{bench['value']} {bench['unit']}** "
                  f"({bench['vs_baseline']}x baseline) — "
                  f"{bench['metric']}", ""]
        det = bench.get("details", {})
        mirror = [(k, v) for k, v in det.items()
                  if k.startswith("point_device")]
        if mirror:
            lines += ["", "### Apples-to-apples: the reference's own "
                      "GPU-Device harness, mirrored exactly", "",
                      "160x160 grid, Average, state_dir + GeoTIFF output, "
                      "cloud staged on device before timing "
                      "(benchmark_cpu_gpu.py protocol). These rows are the "
                      "honest like-for-like comparison; the 1000x1000 "
                      "sweep above additionally pays result D2H + LZW "
                      "encode on a 1-core host over a ~50 MB/s tunnel "
                      "(see the wall decomposition below for that floor).",
                      ""]
            lines.append("| row | this build | reference RTX 2060 "
                         "| speedup |")
            lines.append("|---|---|---|---|")
            for k, v in mirror:
                lines.append(
                    f"| {k} | {v['mpts_per_s']:.2f} | {v['baseline']:.2f} "
                    f"| {v['vs_baseline']:.2f}x |")

    if walldec:
        lines += ["", "## Staged wall decomposition: every wall at its "
                  "link floor", "",
                  f"Link measured in-run: RTT {walldec['rtt_s'] * 1e3:.0f}"
                  f" ms, 4 MB result D2H {walldec['d2h_4mb_s'] * 1e3:.0f} "
                  f"ms, LZW encode {walldec['encode_lzw_s'] * 1e3:.0f} ms "
                  "(1-core host). Floor = device accumulate + max(D2H, "
                  "encode) + 2 RTT; the unexplained tail is the "
                  "engineering slack left.", ""]
        lines.append("| glyph | accumulate Mpts/s | wall Mpts/s | floor "
                     "Mpts/s | unexplained tail (ms) |")
        lines.append("|---|---|---|---|---|")
        for g, d in walldec.get("glyphs", {}).items():
            lines.append(
                f"| {g} | {d['accumulate_mpts_per_s']:.1f} "
                f"| {d['mpts_per_s_wall']:.2f} "
                f"| {d['floor_mpts_per_s']:.2f} "
                f"| {d['tail_unexplained_s'] * 1e3:.0f} |")
    return "\n".join(lines) + "\n"


def build_html(by_glyph, points, modes, lidar_rows, bench,
               mesh_rows=()):
    sections = []

    def table(headers, rows):
        h = "".join(f"<th>{html.escape(str(c))}</th>" for c in headers)
        body = "".join(
            "<tr>" + "".join(f"<td>{html.escape(str(c))}</td>" for c in r)
            + "</tr>" for r in rows)
        return (f'<table><thead><tr>{h}</tr></thead>'
                f'<tbody>{body}</tbody></table>')

    if bench:
        sections.append(
            f'<div class="tiles">'
            f'<div class="tile"><div class="v">{bench["value"]}</div>'
            f'<div class="l">{html.escape(bench["unit"])} primary</div></div>'
            f'<div class="tile"><div class="v">{bench["vs_baseline"]}x</div>'
            f'<div class="l">vs reference GPU</div></div></div>'
            f'<p class="note">{html.escape(bench["metric"])}</p>')

    glyphs = list(by_glyph)
    for n in points:
        values = {(g, m): by_glyph[g].get((n, m)) for g in glyphs
                  for m in modes}
        baseline = (REFERENCE_5M if n == 5_000_000 else None)
        sections.append(svg_grouped_bars(
            f"Throughput at N={fmt_n(n)} (1000x1000 grid, "
            f"ingest+finalize)", glyphs, modes, values,
            baseline={g: REFERENCE_5M.get(g) for g in glyphs}
            if baseline else None))

    labels, speeds = [], []
    for glyph, base in REFERENCE_5M.items():
        vals = [v for (n, m), v in by_glyph.get(glyph, {}).items()
                if n == 5_000_000]
        if vals:
            labels.append(glyph)
            speeds.append(max(vals) / base)
    if labels:
        sections.append(svg_speedup(
            "Best-mode speedup vs reference GPU at N=5M (log scale)",
            labels, speeds))

    header = ["glyph"] + [f"{fmt_n(n)} {m}" for n in points for m in modes]
    rows = []
    for glyph, cells in by_glyph.items():
        rows.append([glyph] + [
            f"{cells[(n, m)]:.2f}" if cells.get((n, m)) is not None else "—"
            for n in points for m in modes])
    sections.append("<h2>Throughput table (Mpts/s)</h2>" +
                    table(header, rows))

    if lidar_rows:
        cols = list(lidar_rows[0])
        sections.append(
            "<h2>LiDAR streaming pipeline (mode comparison)</h2>" +
            table(cols, [[r[c] for c in cols] for r in lidar_rows]))

    if mesh_rows:
        cols = list(mesh_rows[0])
        sections.append(
            "<h2>Multi-chip dp&times;sp scaling</h2>" +
            table(cols, [[r[c] for c in cols] for r in mesh_rows]))

    env = ""
    if bench and bench.get("env"):
        env = (f'<p class="note">env: '
               f'{html.escape(bench["env"].get("note", ""))}</p>')

    return f"""<!doctype html><html><head><meta charset="utf-8">
<title>PCR-TPU benchmark report</title><style>
body {{ font-family: system-ui, sans-serif; margin: 2rem auto;
       max-width: 920px; color: #1d2733; }}
h1 {{ font-size: 1.5rem; }} h2 {{ font-size: 1.1rem; margin-top: 2rem; }}
table {{ border-collapse: collapse; font-size: 0.85rem; margin: .8rem 0; }}
th, td {{ border: 1px solid #dfe3e8; padding: .3rem .55rem;
          text-align: right; }}
th:first-child, td:first-child {{ text-align: left; }}
thead {{ background: #f2f4f7; }}
svg {{ display: block; margin: 1.2rem 0; }}
.tiles {{ display: flex; gap: 1rem; margin: 1rem 0; }}
.tile {{ background: #f2f4f7; border-radius: 8px; padding: .9rem 1.4rem; }}
.tile .v {{ font-size: 1.6rem; font-weight: 700; }}
.tile .l {{ color: #566; font-size: .8rem; }}
.note {{ color: #566; font-size: .85rem; }}
</style></head><body>
<h1>PCR-TPU benchmark report</h1>
{''.join(sections)}
{env}
</body></html>
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv_files", nargs="+")
    ap.add_argument("-o", "--output", default="BENCHMARK_REPORT.md")
    ap.add_argument("--html", default="")
    ap.add_argument("--lidar-csv", default="")
    ap.add_argument("--multichip-csv", default="")
    ap.add_argument("--bench-json", default="")
    ap.add_argument("--walldec-json", default="")
    args = ap.parse_args()

    rows = load_rows(args.csv_files)
    if not rows:
        print("no rows", file=sys.stderr)
        sys.exit(1)
    by_glyph = defaultdict(dict)
    points = sorted({int(r["points"]) for r in rows})
    modes = sorted({r["mode"] for r in rows})
    for r in rows:
        by_glyph[r["glyph"]][(int(r["points"]), r["mode"])] = float(
            r["mpts_per_s"])

    lidar_rows = load_rows([args.lidar_csv]) if args.lidar_csv else []
    mesh_rows = (load_rows([args.multichip_csv])
                 if args.multichip_csv else [])
    bench = None
    if args.bench_json:
        with open(args.bench_json) as f:
            bench = json.load(f)
    walldec = None
    if args.walldec_json:
        with open(args.walldec_json) as f:
            walldec = json.load(f)

    with open(args.output, "w") as f:
        f.write(build_markdown(by_glyph, points, modes, lidar_rows, bench,
                               mesh_rows, wire_rows(rows), walldec))
    print(f"wrote {args.output}")
    if args.html:
        with open(args.html, "w") as f:
            f.write(build_html(by_glyph, points, modes, lidar_rows, bench,
                           mesh_rows))
        print(f"wrote {args.html}")


if __name__ == "__main__":
    main()
