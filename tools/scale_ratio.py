#!/usr/bin/env python3
"""Scale-ladder report: per-query wall-time ratios between two bench maps
taken at different data scales (default: sf0.1 -> sf1, a 10x data jump).

Emits a markdown section for SCALE.md: headline distribution stats, the
queries scaling worse than --flag-ratio (default 12 = 10x data + 20%
overhead -- the adjudication threshold from the round-9 verdict), and
the full per-query table sorted by ratio.

Queries faster than --min-sec at BOTH scales are reported but not
flagged (sub-second timings are dominated by fixed per-query overhead,
so their "ratio" measures constant cost, not scaling).

Usage: scale_ratio.py small.json big.json [--data-ratio 10]
       [--flag-ratio 12] [--min-sec 1.0] [--md out.md]
"""
import argparse
import json
import statistics


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = {k: v for k, v in d["queries"].items() if v >= 0}
    warm = {k: v for k, v in qs.items() if k.startswith("warm:")}
    run = {k: v for k, v in qs.items() if not k.startswith("warm:")}
    return run, warm, d["value"], d.get("regime")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("small")
    ap.add_argument("big")
    ap.add_argument("--data-ratio", type=float, default=10.0)
    ap.add_argument("--flag-ratio", type=float, default=12.0)
    ap.add_argument("--min-sec", type=float, default=1.0)
    ap.add_argument("--md", default=None)
    a = ap.parse_args()
    qs, ws, ts, regs = load(a.small)
    qb, wb, tb, regb = load(a.big)
    if regs != regb:
        print(f"WARNING: regimes differ: {regs} vs {regb}")
    common = sorted(set(qs) & set(qb))
    rows = []
    for k in common:
        s, b = qs[k], qb[k]
        r = b / s if s > 0 else float("inf")
        flagged = r > a.flag_ratio and max(s, b) >= a.min_sec
        rows.append((k, s, b, r, flagged))
    # s == 0 (sub-ms timing rounded to 0.0) would yield ratio inf and
    # corrupt the median/at-or-below stats — exclude, as bench_ratio does.
    ratios_big = [r for _, s, b, r, _ in rows
                  if max(s, b) >= a.min_sec and s > 0]
    flagged = [x for x in rows if x[4]]
    lines = []
    w = lines.append
    w(f"Inputs: `{a.small}` (total {ts:.1f}s) -> `{a.big}` "
      f"(total {tb:.1f}s); {len(common)} common queries; data ratio "
      f"{a.data_ratio:g}x; flag threshold {a.flag_ratio:g}x on queries "
      f">= {a.min_sec:g}s at either scale.")
    w("")
    if ratios_big:
        med = statistics.median(ratios_big)
        w(f"- total wall ratio: **{tb / ts:.2f}x**")
        w(f"- median per-query ratio (>= {a.min_sec:g}s): **{med:.2f}x**"
          f" over {len(ratios_big)} queries")
        subl = sum(1 for r in ratios_big if r <= a.data_ratio)
        w(f"- at-or-below data ratio ({a.data_ratio:g}x): {subl}"
          f"/{len(ratios_big)}")
    w(f"- flagged (> {a.flag_ratio:g}x): **{len(flagged)}**")
    w("")
    if flagged:
        w(f"| query | {a.small.split('/')[-1]} s | "
          f"{a.big.split('/')[-1]} s | ratio |")
        w("|---|---|---|---|")
        for k, s, b, r, _ in sorted(flagged, key=lambda x: -x[3]):
            w(f"| `{k}` | {s:.2f} | {b:.2f} | {r:.1f}x |")
        w("")
    # warm-line comparison (shared memo builds scale too)
    wcommon = sorted(set(ws) & set(wb))
    if wcommon:
        w("Warm (shared-memo) lines:")
        w("")
        w("| warm line | small s | big s | ratio |")
        w("|---|---|---|---|")
        for k in wcommon:
            r = wb[k] / ws[k] if ws[k] > 0 else float("inf")
            w(f"| `{k}` | {ws[k]:.2f} | {wb[k]:.2f} | {r:.1f}x |")
        w("")
    w("<details><summary>Full per-query table (sorted by ratio)</summary>")
    w("")
    w("| query | small s | big s | ratio |")
    w("|---|---|---|---|")
    for k, s, b, r, fl in sorted(rows, key=lambda x: -x[3]):
        mark = " ⚠" if fl else ""
        w(f"| `{k}`{mark} | {s:.3f} | {b:.3f} | {r:.2f}x |")
    w("")
    w("</details>")
    out = "\n".join(lines)
    print(out)
    if a.md:
        with open(a.md, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
