#!/usr/bin/env python3
"""Join two Bench full-inventory records (e.g. sf0.1 and the sf1
stand-in) and print per-query scaling factors, worst first.

Usage: python3 scripts/scaling_report.py BENCH_FULL_r08.json BENCH_FULL_SF1.json [flag_ratio]
"""
import json
import sys

lo = json.load(open(sys.argv[1]))
hi = json.load(open(sys.argv[2]))
flag = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0

rows = []
for q, tlo in lo["queries"].items():
    thi = hi["queries"].get(q)
    if thi is None:
        continue
    rows.append((thi / tlo if tlo > 0 else float("inf"), q, tlo, thi))
rows.sort(reverse=True)

print(f"| query | sf0.1 s | sf1 s | ratio | flag |")
print(f"|---|---|---|---|---|")
for r, q, tlo, thi in rows:
    mark = "SUPERLINEAR" if r > flag else ""
    print(f"| {q} | {tlo:.2f} | {thi:.2f} | {r:.1f}x | {mark} |")
tot_lo = sum(t for _, _, t, _ in rows)
tot_hi = sum(t for _, _, _, t in rows)
print(f"\ntotal: sf0.1 {tot_lo:.1f}s -> sf1 {tot_hi:.1f}s "
      f"({tot_hi / tot_lo:.1f}x for 10x data); "
      f"{sum(1 for r, *_ in rows if r > flag)} queries above {flag}x")
