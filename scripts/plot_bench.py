#!/usr/bin/env python3
"""Render a graft bench artifact (bench_latest.json) as an SVG report.

The reference ships result plotters (/root/reference/scripts/plot.py,
matplotlib over its runtime CSVs); this is the engine's analog, kept
dependency-free (pure stdlib -> SVG) because the build environment has no
plotting libraries.

Two single-series horizontal bar charts, one file:
  1. lane wall seconds (min across repeats — the artifact's `queries`);
  2. per-iteration throughput for the iterative lanes (`throughput`
     *_edges_per_sec keys), log-scaled in the label, linear bars on Ge/s.

Design notes (single series per chart): one hue, direct value labels in
text ink (never series-colored text), recessive grid, no legend (the chart
title names the series), plus the exact numbers echoed to stdout as a
table for the no-SVG reader.

Usage: python3 scripts/plot_bench.py [bench_latest.json] [out.svg]
"""
import json
import sys

HUE = "#2f6fd6"          # one mid-lightness blue, AA-contrast on white
INK = "#1a1a1a"
MUTED = "#6b6b6b"
GRID = "#e3e3e3"
SURFACE = "#ffffff"
BAR_H = 14
GAP = 10
LABEL_W = 300
PLOT_W = 560
PAD = 16


def esc(s):
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def bar_chart(title, rows, unit, fmt):
    """rows: [(label, value)] -> (svg fragment, height)."""
    if not rows:
        return "", 0
    vmax = max(v for _, v in rows) or 1.0
    h = PAD + 22 + len(rows) * (BAR_H + GAP) + PAD
    out = [f'<text x="{PAD}" y="{PAD + 8}" fill="{INK}" font-size="14" '
           f'font-weight="600">{esc(title)}</text>']
    # recessive quarter grid
    for q in (0.25, 0.5, 0.75, 1.0):
        x = PAD + LABEL_W + q * PLOT_W
        out.append(f'<line x1="{x:.1f}" y1="{PAD + 16}" x2="{x:.1f}" '
                   f'y2="{h - PAD}" stroke="{GRID}" stroke-width="1"/>')
        out.append(f'<text x="{x:.1f}" y="{PAD + 14}" fill="{MUTED}" '
                   f'font-size="9" text-anchor="middle">'
                   f'{fmt(q * vmax)}{unit}</text>')
    y = PAD + 24
    for label, v in rows:
        w = max(1.5, v / vmax * PLOT_W)
        out.append(f'<text x="{PAD + LABEL_W - 8}" y="{y + BAR_H - 3}" '
                   f'fill="{INK}" font-size="11" text-anchor="end">'
                   f'{esc(label)}</text>')
        out.append(f'<rect x="{PAD + LABEL_W}" y="{y}" width="{w:.1f}" '
                   f'height="{BAR_H}" rx="3" fill="{HUE}"/>')
        out.append(f'<text x="{PAD + LABEL_W + w + 6:.1f}" '
                   f'y="{y + BAR_H - 3}" fill="{INK}" font-size="11">'
                   f'{fmt(v)}{unit}</text>')
        y += BAR_H + GAP
    return "\n".join(out), h


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_latest.json"
    dst = sys.argv[2] if len(sys.argv) > 2 else "bench_latest.svg"
    d = json.load(open(src))

    lanes = sorted(d.get("queries", {}).items(), key=lambda kv: -kv[1])
    eps = sorted(((k[: -len("_edges_per_sec")], v / 1e9)
                  for k, v in d.get("throughput", {}).items()
                  if k.endswith("_edges_per_sec")), key=lambda kv: -kv[1])

    frag1, h1 = bar_chart(
        f"lane wall seconds (min of repeats; total {d.get('value', 0):.1f} s, "
        f"{d.get('cores', '?')} cores)",
        lanes, " s", lambda v: f"{v:.2f}")
    frag2, h2 = bar_chart(
        "per-iteration throughput (steady-state, 10⁹ edges/s)",
        eps, " Ge/s", lambda v: f"{v:.2f}")

    width = PAD * 2 + LABEL_W + PLOT_W + 90
    total_h = h1 + h2 + PAD
    svg = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
           f'height="{total_h}" font-family="system-ui, sans-serif">',
           f'<rect width="{width}" height="{total_h}" fill="{SURFACE}"/>',
           frag1,
           f'<g transform="translate(0,{h1})">', frag2, "</g>",
           "</svg>"]
    with open(dst, "w") as f:
        f.write("\n".join(svg))

    # table view (accessibility: the numbers without the SVG)
    print(f"{'lane':36s} {'wall_s':>10s}")
    for k, v in lanes:
        print(f"{k:36s} {v:10.3f}")
    print(f"\n{'iterative lane':36s} {'Ge/s':>10s}")
    for k, v in eps:
        print(f"{k:36s} {v:10.2f}")
    print(f"\nwrote {dst}")


if __name__ == "__main__":
    main()
