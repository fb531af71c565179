#!/usr/bin/env python3
"""Compare a ~sf1 (ScaleUp 10x) bench artifact against the clean sf0.1
artifact and print the per-query scaling ratio table SCALING.md records.

Usage: python3 tools/sf1_ratios.py <sf01.json> <sfx10.json> [flag_ratio]

Ratios are sf1_time / sf0.1_time for 10x the fact data. < ~10 is
sub-linear (fixed overheads amortize, or the plan's reduced side doesn't
grow); > flag_ratio (default 3.0 per the round-9 verdict; linear would be
~10 only for queries whose WORK is all data-proportional, which local
timings at these sizes rarely are — most of a 0.3 s query is fixed cost)
is printed in the FLAGGED section for adjudication.
"""
import json
import sys


def main():
    sf01 = json.load(open(sys.argv[1]))["queries"]
    sfx = json.load(open(sys.argv[2]))
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    rows = []
    for q, t10 in sfx["queries"].items():
        t1 = sf01.get(q)
        if t1 is None or t1 <= 0:
            continue
        rows.append((t10 / t1, q, t1, t10))
    rows.sort(reverse=True)
    print(f"| query | sf0.1 s | ~sf1 s | ratio |")
    print(f"|---|---|---|---|")
    for r, q, t1, t10 in rows:
        print(f"| {q} | {t1:.2f} | {t10:.2f} | {r:.1f}x |")
    flagged = [x for x in rows if x[0] > flag]
    print(f"\n{len(rows)} shared queries; total {sum(x[2] for x in rows):.1f}s"
          f" -> {sum(x[3] for x in rows):.1f}s"
          f" ({sum(x[3] for x in rows)/sum(x[2] for x in rows):.2f}x for 10x"
          f" fact data); median ratio"
          f" {sorted(x[0] for x in rows)[len(rows)//2]:.2f}x")
    print(f"\nFLAGGED (> {flag}x): {len(flagged)}")
    for r, q, t1, t10 in flagged:
        print(f"  {q}: {t1:.2f}s -> {t10:.2f}s = {r:.1f}x")


if __name__ == "__main__":
    main()
