#!/usr/bin/env python3
"""Compare an sf1 bench record against a quiet sf0.1 close: per-query
ratios, bucket histogram, failures — the COVERAGE scaling-table feeder.
Usage: tools/sf1_compare.py <bench_sf1.json> <bench_sf01.json> [topN]"""
import json
import sys

with open(sys.argv[1]) as f:
    sf1 = json.load(f)
with open(sys.argv[2]) as f:
    sf01 = json.load(f)
top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25

q1, q0 = sf1["queries"], sf01["queries"]
shared = sorted(set(q1) & set(q0))
ratios = {k: q1[k] / q0[k] for k in shared if q0[k] > 0}
# older bench records lack load_avg_start — don't crash the comparator
print(f"sf1 total {sf1['value']:.1f}s / {len(q1)} rows (failed={sf1.get('failed')}, "
      f"load_start={sf1.get('load_avg_start', float('nan')):.2f}) vs sf0.1 {sf01['value']:.1f}s")
agg = sum(q1[k] for k in shared) / sum(q0[k] for k in shared)
med = sorted(ratios.values())[len(ratios) // 2]
print(f"shared {len(shared)} rows: aggregate {agg:.1f}x, median {med:.2f}x")
buckets = [(1.5, 0), (3, 0), (10, 0), (1e9, 0)]
counts = [0, 0, 0, 0]
for r in ratios.values():
    for i, (lim, _) in enumerate(buckets):
        if r <= lim:
            counts[i] += 1
            break
print(f"buckets: <=1.5x: {counts[0]}, 1.5-3x: {counts[1]}, "
      f"3-10x: {counts[2]}, >10x: {counts[3]}")
print(f"\ntop {top_n} ratios:")
for k in sorted(ratios, key=ratios.get, reverse=True)[:top_n]:
    print(f"  {k:45s} {q0[k]:8.2f} -> {q1[k]:9.2f}  {ratios[k]:6.1f}x")
