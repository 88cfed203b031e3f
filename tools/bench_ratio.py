#!/usr/bin/env python3
"""Compare two full-registry bench maps (run2 vs run1).

Prints the median per-query ratio, the count of queries >2x between the
runs, and the worst offenders -- the VERDICT r7 task-5 acceptance check
(median ratio <= 1.05 AND no query >2x between consecutive runs).

Usage: bench_ratio.py run1.json run2.json [--min-sec 0.2]
Queries faster than --min-sec in BOTH runs are excluded from the >2x
check (sub-200ms timings are scheduler noise, not plan behavior) but
still counted in the median.

If the two maps carry a "regime" stamp (best-of-2 threshold, cold mode,
table caching, repeat count) and the stamps differ -- or only one map
has a stamp -- a WARNING is printed: cross-regime ratios are not
comparable and can report spurious speedups or regressions.
"""
import argparse
import json
import statistics


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = {k: v for k, v in d["queries"].items()
          if v >= 0 and not k.startswith("warm:")}
    return qs, d["value"], d.get("regime")


def main():
    ap = argparse.ArgumentParser(
        description="Per-query ratio report between two bench maps")
    ap.add_argument("run1", help="baseline bench_queries.json")
    ap.add_argument("run2", help="candidate bench_queries.json")
    ap.add_argument("--min-sec", type=float, default=0.2,
                    help="exclude from the >2x check queries faster than "
                         "this in both runs (default 0.2)")
    args = ap.parse_args()
    q1, t1, reg1 = load(args.run1)
    q2, t2, reg2 = load(args.run2)
    if reg1 != reg2:
        print(f"WARNING: timing regimes differ between inputs -- ratios "
              f"are not comparable\n  run1 regime: {reg1}\n"
              f"  run2 regime: {reg2}")
    common = sorted(set(q1) & set(q2))
    ratios = {k: q2[k] / q1[k] for k in common if q1[k] > 0}
    med = statistics.median(ratios.values())
    min_sec = args.min_sec
    big = [(k, q1[k], q2[k], ratios[k]) for k in ratios
           if (ratios[k] > 2.0 or ratios[k] < 0.5)
           and max(q1[k], q2[k]) >= min_sec]
    print(f"run1 total={t1:.1f}s  run2 total={t2:.1f}s  "
          f"n_common={len(common)}  median_ratio={med:.3f}")
    print(f"queries >2x (either direction, max>={min_sec}s): {len(big)}")
    for k, a, b, r in sorted(big, key=lambda x: -abs(x[3] - 1)):
        print(f"  {k}: {a:.2f}s -> {b:.2f}s  (x{r:.2f})")
    worst = sorted(((k, q1[k], q2[k], ratios[k]) for k in ratios
                    if max(q1[k], q2[k]) >= 1.0),
                   key=lambda x: -max(x[3], 1 / x[3]))[:10]
    print("top-10 least stable (>=1s):")
    for k, a, b, r in worst:
        print(f"  {k}: {a:.2f}s -> {b:.2f}s  (x{r:.2f})")
    ok = med <= 1.05 and not big
    print(f"ACCEPT(task5): {'PASS' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
