#!/usr/bin/env python3
"""Join two bench_full.json artifacts (base SF vs scaled SF) into a
per-query ratio table for BASELINE.md's scale triage.

Usage: python3 tools/ratio_table.py <base.json> <scaled.json> [threshold]
Prints every query sorted by ratio desc, flags ratios > threshold
(default 15 — the super-linear smell at one decade per the round-11
verdict), and a markdown table of the flagged set.
"""
import json, sys

base = json.load(open(sys.argv[1]))
scaled = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
bq, sq = base["queries"], scaled["queries"]
rows = []
for name in sorted(bq):
    if name not in sq:
        continue
    b, s = bq[name], sq[name]
    if b <= 0 or s <= 0:
        rows.append((float("inf"), name, b, s))
        continue
    rows.append((s / b, name, b, s))
rows.sort(reverse=True)
flagged = [r for r in rows if r[0] > thr]
print(f"base total {base['value']}s  scaled total {scaled['value']}s  "
      f"queries {len(rows)}  flagged>{thr}x: {len(flagged)}")
for ratio, name, b, s in rows:
    mark = "  <-- FLAG" if ratio > thr else ""
    print(f"{ratio:8.1f}x  {name:28s} {b:8.2f} -> {s:8.2f}{mark}")
if flagged:
    print("\n| query | base (s) | scaled (s) | ratio |")
    print("|---|---|---|---|")
    for ratio, name, b, s in flagged:
        print(f"| {name} | {b:.2f} | {s:.2f} | {ratio:.1f}x |")
