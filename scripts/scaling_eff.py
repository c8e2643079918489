#!/usr/bin/env python3
"""Paired N->4N scaling-efficiency summary over scaling_pair.sh output.

Pairs consecutive (N-cores, 4N-cores) lines, computes per-pair efficiency
eff = (seconds_N / seconds_4N) / 4 (and the min-iteration variant), prints
each pair with its load context plus the median/min/max across pairs.

Also reports a bootstrap 95% CI on the paired min-iteration efficiency
median (VERDICT r04 #7: state the criterion met only if the CI's lower
bound clears 0.75 — a median that lands exactly on 0.8 is not evidence by
itself). Deterministic seed so the printed CI is reproducible.

Usage: scaling_eff.py <file.jsonl> [...more files]
"""
import json, random, statistics, sys


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
        ia = min(a["min_iter_secs"] for a, _ in pairs)
        ib = min(b["min_iter_secs"] for _, b in pairs)
        print(f"min-of-mins min-iter eff={(ia / ib) / 4.0:.3f}")
        # bootstrap 95% CI of the paired min-iter median (10k resamples,
        # fixed seed): resample PAIRS with replacement, take each
        # resample's median, report the 2.5/97.5 percentiles
        rng = random.Random(42)
        meds = sorted(
            statistics.median(rng.choices(ieffs, k=len(ieffs)))
            for _ in range(10000))
        lo95, hi95 = meds[249], meds[9749]
        print(f"bootstrap 95% CI of median min-iter eff: "
              f"[{lo95:.3f}, {hi95:.3f}]  (n={len(ieffs)} pairs, seed 42)")


if __name__ == "__main__":
    main(sys.argv[1:] or ["scripts/scaling_evidence_r4.jsonl"])
