#!/usr/bin/env python3
"""Sample-wise host-speed-normalized bench comparison (round-17 task 2).

Usage: python3 tools/benchnorm.py OLD_BENCH_DETAIL.json NEW_BENCH_DETAIL.json [threshold]

Each BENCH_DETAIL since round 17 carries `cal_s` — a per-sample
single-shot calibration probe run immediately before the matching
`samples_s` entry. The normalized value of a sample is
samples_s[i] / cal_s[i] (dimensionless multiples of the probe), which
cancels host speed AT THE SAMPLE'S OWN MOMENT — the in-suite-drift
class (six recorded instances in PLANS.md) becomes arithmetic instead
of a judgment call. For pre-round-17 files without cal_s, every sample
falls back to the file's run-level `calibration_s`.

Per query we report the MEDIAN and MIN of the normalized samples:
the median is the headline (same statistic the raw record medians);
the min is the noise floor — GC pauses, shared-artifact builds, and
state-store commit jitter only ever ADD time, so a min-vs-min swing is
the strongest regression signal. Queries above `threshold` (default
1.5x) on BOTH statistics are flagged; median-only movers are listed as
noise-suspect.
"""
import json
import signal
import sys

# piping into `head` must not stack-trace
signal.signal(signal.SIGPIPE, signal.SIG_DFL)


def norm_samples(detail, name, per_sample, fallbacks=None):
    """per_sample=False forces the run-level scalar for BOTH files:
    mixing per-sample cals on one side with a run-level scalar on the
    other is a systematic bias, not a comparison (a run-level cal that
    over/under-states most sample moments shifts every query by the
    same factor — the first r16-vs-r17 attempt showed a uniform ~2.7x
    phantom shift exactly this way). The same rule holds PER QUERY: in
    per-sample mode a query whose cal list is missing/mismatched/
    non-positive on either side is SKIPPED (recorded in `fallbacks`),
    never silently normalized run-level on one side only."""
    samples = detail["samples_s"].get(name)
    if not samples:
        return None
    cals = detail.get("cal_s", {}).get(name) if per_sample else None
    if not cals or len(cals) != len(samples) or any(c <= 0 for c in cals):
        if per_sample:
            if fallbacks is not None:
                fallbacks.add(name)
            return None
        run_cal = detail.get("calibration_s")
        if not run_cal or run_cal <= 0:
            return None
        cals = [run_cal] * len(samples)
    return sorted(s / c for s, c in zip(samples, cals))


def med(xs):
    n = len(xs)
    return xs[n // 2] if n % 2 == 1 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def main(old_path, new_path, threshold=1.5):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    shared = sorted(set(old["samples_s"]) & set(new["samples_s"]))
    per_sample = bool(old.get("cal_s")) and bool(new.get("cal_s"))
    print(f"common queries: {len(shared)}  "
          f"(old n={len(old['samples_s'])}, new n={len(new['samples_s'])}; "
          f"mode={'per-sample' if per_sample else 'RUN-LEVEL on both sides'})")
    if not per_sample:
        print("WARNING: one file predates cal_s - normalizing both by their")
        print("run-level calibration_s; intra-run host drift is NOT cancelled,")
        print("treat flags as candidates for the isolated fresh-JVM A/B only.")
    rows = []
    fallbacks = set()
    for name in shared:
        o = norm_samples(old, name, per_sample, fallbacks)
        n = norm_samples(new, name, per_sample, fallbacks)
        if not o or not n:
            continue
        # samples serialize at 3 decimals, so a sub-ms sample reads
        # 0.000 — floor the OLD side's stats to keep ratios finite
        rows.append((name, max(med(o), 1e-6), med(n), max(o[0], 1e-6), n[0]))
    if fallbacks:
        print(f"skipped (unusable cal_s in per-sample mode): {sorted(fallbacks)}")
    rows.sort(key=lambda r: r[2] / r[1], reverse=True)
    flagged, suspect = [], []
    for name, om, nm, omin, nmin in rows:
        d_med, d_min = nm / om, nmin / omin
        if d_med > threshold and d_min > threshold:
            flagged.append(name)
        elif d_med > threshold:
            suspect.append(name)
    print(f"{'query':42s} {'old_med':>8s} {'new_med':>8s} {'d_med':>6s} {'d_min':>6s}")
    for name, om, nm, omin, nmin in rows[:25]:
        print(f"{name:42s} {om:8.2f} {nm:8.2f} {nm/om:6.2f} {nmin/omin:6.2f}")
    tot_o = sum(r[1] for r in rows)
    tot_n = sum(r[2] for r in rows)
    print(f"\nnormalized common-set total (median): {tot_o:.1f} -> {tot_n:.1f} "
          f"({tot_n/tot_o:.2f}x)")
    print(f"regressions (>{threshold}x on BOTH median and min): "
          f"{flagged if flagged else 'none'}")
    if suspect:
        print(f"median-only movers (noise-suspect, min moved <{threshold}x): {suspect}")
    return 0


if __name__ == "__main__":
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], thr))
