#!/usr/bin/env python3
"""Render the BENCH.md per-pair markdown table for a scaling jsonl file.

One row per N->4N pair: each leg's min steady iteration, the paired
min-iteration efficiency, the wall-clock (sum-of-steady) efficiency, and
each leg's start load — so every table number is recomputable from the
committed evidence file by eye.

Usage: scaling_table.py <file.jsonl> [label]
"""
import json, statistics, sys


def main(path, label=""):
    runs = [json.loads(l) for l in open(path) if l.strip().startswith("{")]
    lo = min(r["cores"] for r in runs)
    pairs, i, skipped = [], 0, []
    while i + 1 < len(runs):
        a, b = runs[i], runs[i + 1]
        if a["cores"] == lo and b["cores"] == 4 * lo:
            pairs.append((a, b)); i += 2
        else:
            skipped.append((i, a)); i += 1
    if i < len(runs):
        skipped.append((i, runs[i]))
    # no silent caps (ADVICE r05): every record the adjacency pairing drops
    # is disclosed, so an orphan/retried leg can never vanish from the table
    for idx, r in skipped:
        print(f"WARNING: record {idx} (cores={r['cores']}, "
              f"seconds={r.get('seconds', float('nan')):.2f}, "
              f"min_iter={r.get('min_iter_secs', float('nan')):.2f}) "
              f"is unpaired and EXCLUDED from the table", file=sys.stderr)
    print(f"| pair | N min-iter (s) | 4N min-iter (s) | min-iter eff | "
          f"wall eff | loads N/4N |")
    print("|---|---|---|---|---|---|")
    ieffs = []
    for k, (a, b) in enumerate(pairs, 1):
        ieff = (a["min_iter_secs"] / b["min_iter_secs"]) / 4
        weff = (a["seconds"] / b["seconds"]) / 4
        ieffs.append(ieff)
        print(f"| {k} | {a['min_iter_secs']:.2f} | {b['min_iter_secs']:.2f} "
              f"| **{ieff:.3f}** | {weff:.3f} "
              f"| {a['load_before']:.1f} / {b['load_before']:.1f} |")
    med = statistics.median(ieffs)
    na = min(a["min_iter_secs"] for a, _ in pairs)
    nb = min(b["min_iter_secs"] for _, b in pairs)
    print(f"\n{label or path}: pairs={len(pairs)}  "
          f"median min-iter eff={med:.3f}  "
          f"min-of-mins={na / nb / 4:.3f}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else "")
