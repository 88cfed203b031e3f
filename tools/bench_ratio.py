#!/usr/bin/env python3
"""Compare two full-registry bench maps (run2 vs run1).

Prints the median per-query ratio, the count of queries >2x between the
runs, and the worst offenders -- the VERDICT r7 task-5 acceptance check
(median ratio <= 1.05 AND no query >2x between consecutive runs).

Usage: bench_ratio.py run1.json run2.json [--min-sec 0.2]
Queries faster than --min-sec in BOTH runs are excluded from the >2x
check (sub-200ms timings are scheduler noise, not plan behavior) but
still counted in the median.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in d["queries"].items()
            if v >= 0 and not k.startswith("warm:")}, d["value"]


def main():
    argv = sys.argv[1:]
    args = []
    min_sec = 0.2
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--min-sec"):
            if "=" in a:
                min_sec = float(a.split("=", 1)[1])
            else:
                i += 1
                min_sec = float(argv[i])
        else:
            args.append(a)
        i += 1
    q1, t1 = load(args[0])
    q2, t2 = load(args[1])
    common = sorted(set(q1) & set(q2))
    ratios = {k: q2[k] / q1[k] for k in common if q1[k] > 0}
    med = statistics.median(ratios.values())
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
