#!/usr/bin/env python3
"""Paired N->4N scaling-efficiency summary over scaling_pair.sh output.

Pairs consecutive (N-cores, 4N-cores) lines, computes per-pair efficiency
eff = (seconds_N / seconds_4N) / 4 (and the min-iteration variant), prints
each pair with its load context plus the median/min/max across pairs.

Usage: scaling_eff.py <file.jsonl> [...more files]
"""
import json, statistics, sys


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    runs.append(json.loads(line))
    lo = min(r["cores"] for r in runs)
    pairs = []
    i = 0
    while i + 1 < len(runs):
        a, b = runs[i], runs[i + 1]
        if a["cores"] == lo and b["cores"] == 4 * lo:
            pairs.append((a, b))
            i += 2
        else:
            i += 1
    effs, ieffs = [], []
    for a, b in pairs:
        eff = (a["seconds"] / b["seconds"]) / 4.0
        ieff = (a["min_iter_secs"] / b["min_iter_secs"]) / 4.0
        effs.append(eff)
        ieffs.append(ieff)
        print(f"pair: N={a['seconds']:7.1f}s (load {a['load_before']:.1f})  "
              f"4N={b['seconds']:6.1f}s (load {b['load_before']:.1f})  "
              f"eff={eff:.3f}  min-iter eff={ieff:.3f}")
    if effs:
        print(f"\npairs={len(effs)}  "
              f"median eff={statistics.median(effs):.3f}  "
              f"min={min(effs):.3f}  max={max(effs):.3f}")
        print(f"          median min-iter eff={statistics.median(ieffs):.3f}")
        # min-of-mins estimator (quietest window per level across all runs)
        na = min(a["seconds"] for a, _ in pairs)
        nb = min(b["seconds"] for _, b in pairs)
        print(f"min-of-mins eff={(na / nb) / 4.0:.3f}")


if __name__ == "__main__":
    main(sys.argv[1:] or ["scripts/scaling_evidence_r4.jsonl"])
