#!/usr/bin/env python3
"""Paired N->4N scaling-efficiency summary over scaling_pair.sh output.

Pairs consecutive (N-cores, 4N-cores) lines, computes per-pair efficiency
eff = (seconds_N / seconds_4N) / 4 (and the min-iteration variant), prints
each pair with its load context plus the median/min/max across pairs.

r05 upgrade — per-ITERATION interference classification: runs now carry
`walls` (every iteration's seconds, in order, warm runs included),
`t_return` (elapsed seconds when the algorithm returned) and `cpu_samples`
([elapsed, busy_cores, load1m] every ~2 s from /proc/stat diffs — sharp,
unlike the 60-s-smoothed loadavg). Iteration windows are reconstructed
backwards from t_return; an iteration is QUIET when no overlapping sample
shows more than QUIET_EXT busy cores beyond the leg's own core count.
The quiet-min estimator takes each leg's fastest QUIET iteration — the
same filter applied to BOTH levels, so external interference (which hits
the wide 4N legs ~4x harder than the narrow N legs on this shared box)
cannot bias the ratio in either direction.

Also reports a bootstrap 95% CI on the paired min-iteration efficiency
median (VERDICT r04 #7: state the criterion met only if the CI's lower
bound clears 0.75 — a median that lands exactly on 0.8 is not evidence by
itself). Deterministic seed so the printed CI is reproducible.

Usage: scaling_eff.py <file.jsonl> [...more files]
"""
import json, random, statistics, sys

QUIET_EXT = 1.5  # busy cores beyond own allocation tolerated as "quiet"
WARM = 3         # cold iterations discarded by Scaling (JIT/codegen/cache)


def quiet_min_iter(r):
    """Fastest steady iteration with no overlapping external-load sample
    above QUIET_EXT, or None if the run lacks samples / has no quiet
    iteration. Windows reconstructed backwards from t_return (iterations
    run back-to-back and end at ~t_return; driver gaps are ~ms)."""
    walls, samples = r.get("walls"), r.get("cpu_samples")
    if not walls or not samples or "t_return" not in r:
        return None
    own = r["cores"]
    end = r["t_return"]
    spans = []  # (start, end, wall) newest-first
    for w in reversed(walls):
        spans.append((end - w, end, w))
        end -= w
    steady = spans[: max(0, len(walls) - WARM)]  # newest-first: skips warm
    samples = [s for s in samples if s[1] >= 0]
    best = None
    for (t0, t1, w) in steady:
        # samples overlapping [t0, t1], padded one sample-interval on the
        # left so a burst straddling the boundary still counts
        near = [s for s in samples if t0 - 2.5 <= s[0] <= t1 + 2.5]
        if not near:
            continue  # sub-sample-interval iteration: unclassifiable
        ext = max(s[1] - own for s in near)
        if ext < QUIET_EXT and (best is None or w < best):
            best = w
    return best


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
    effs, ieffs, qeffs = [], [], []
    for a, b in pairs:
        eff = (a["seconds"] / b["seconds"]) / 4.0
        ieff = (a["min_iter_secs"] / b["min_iter_secs"]) / 4.0
        effs.append(eff)
        ieffs.append(ieff)
        qa, qb = quiet_min_iter(a), quiet_min_iter(b)
        q = f"  QUIET eff={(qa / qb) / 4.0:.3f} ({qa:.2f}/{qb:.2f})" \
            if qa and qb else "  quiet: n/a"
        if qa and qb:
            qeffs.append((qa / qb) / 4.0)
        print(f"pair: N={a['seconds']:7.1f}s (load {a['load_before']:.1f})  "
              f"4N={b['seconds']:6.1f}s (load {b['load_before']:.1f})  "
              f"eff={eff:.3f}  min-iter eff={ieff:.3f}{q}")
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
        # quiet-filtered min-of-mins: fastest QUIET iteration per level
        qn = [q for q in (quiet_min_iter(a) for a, _ in pairs) if q]
        q4 = [q for q in (quiet_min_iter(b) for _, b in pairs) if q]
        if qn and q4:
            print(f"quiet min-of-mins min-iter eff="
                  f"{(min(qn) / min(q4)) / 4.0:.3f}  "
                  f"(quiet N legs {len(qn)}/{len(pairs)}, "
                  f"4N {len(q4)}/{len(pairs)}; ext<{QUIET_EXT} cores)")
        # bootstrap 95% CI of the paired min-iter median (10k resamples,
        # fixed seed): resample PAIRS with replacement, take each
        # resample's median, report the 2.5/97.5 percentiles
        for label, xs in (("min-iter", ieffs), ("QUIET min-iter", qeffs)):
            if not xs:
                continue
            rng = random.Random(42)
            meds = sorted(
                statistics.median(rng.choices(xs, k=len(xs)))
                for _ in range(10000))
            lo95, hi95 = meds[249], meds[9749]
            print(f"bootstrap 95% CI of median {label} eff: "
                  f"[{lo95:.3f}, {hi95:.3f}]  (n={len(xs)} pairs, seed 42)")


if __name__ == "__main__":
    main(sys.argv[1:] or ["scripts/scaling_evidence_r4.jsonl"])
