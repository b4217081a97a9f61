#!/usr/bin/env python3
"""Regenerate the BASELINE.md scaling-exponent table from full Bench runs.

usage: exponents.py sf01_run1.json sf01_run2.json x10_run1.json x10_run2.json

Each scale column is the per-query MINIMUM of its two runs (the standard
JIT-stall mitigation documented in BASELINE.md); the total row sums the
columns. Also reports the worst single-run/min-of-two ratio per scale —
the bench-robustness check (warm-up is adequate when no query's official
single run exceeds ~2x its min-of-two).
"""
import json, math, sys

def load(p):
    return json.load(open(p))["queries"]

a1, a2, b1, b2 = map(load, sys.argv[1:5])
names = sorted(set(a1) & set(a2) & set(b1) & set(b2))
rows = []
for n in names:
    t1 = min(a1[n], a2[n])
    t2 = min(b1[n], b2[n])
    rows.append((n, t1, t2, t2 / t1, math.log10(t2 / t1)))
rows.sort(key=lambda r: -r[2])
tot1 = sum(r[1] for r in rows)
tot2 = sum(r[2] for r in rows)
print(f"TOTAL sf0.1={tot1:.1f}s x10={tot2:.1f}s "
      f"exponent={math.log10(tot2 / tot1):.2f} queries={len(rows)}")
worst1 = max(((max(a1[n], a2[n]) / min(a1[n], a2[n]), n) for n in names))
worst2 = max(((max(b1[n], b2[n]) / min(b1[n], b2[n]), n) for n in names))
print(f"worst run/min ratio: sf0.1 {worst1[0]:.2f}x ({worst1[1]}), "
      f"x10 {worst2[0]:.2f}x ({worst2[1]})")
over1 = [(n, max(a1[n], a2[n]) / min(a1[n], a2[n])) for n in names
         if max(a1[n], a2[n]) / min(a1[n], a2[n]) > 2.0]
print(f"sf0.1 queries exceeding 2x their min-of-two: {over1 or 'none'}")
print()
print("| query | sf0.1 (s) | x10 (s) | ratio | exponent |")
print("|---|---|---|---|---|")
for n, t1, t2, r, e in rows:
    print(f"| {n} | {t1:.2f} | {t2:.2f} | {r:.1f} | {e:.2f} |")
