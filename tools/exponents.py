#!/usr/bin/env python3
"""Regenerate the BASELINE.md scaling-exponent table from full Bench runs.

usage: exponents.py sf01_run1.json [sf01_run2.json ...] -- x10_run1.json [...]

Each scale column is the per-query MINIMUM of its runs (the standard
JIT-stall mitigation documented in BASELINE.md). The table also records
the per-query single-run MAX at sf0.1 — the variance column the driver's
one-shot bench run is compared against: any query whose max exceeds 2x
its min is flagged here, BEFORE the driver can report it as a `weak`
perf row, and needs either a warm-up fix or a named cause in BASELINE.md.
"""
import json, math, sys

sep = sys.argv.index("--")
sf_paths, x10_paths = sys.argv[1:sep], sys.argv[sep + 1:]

def load(p):
    return json.load(open(p))["queries"]

sf_runs = [load(p) for p in sf_paths]
x10_runs = [load(p) for p in x10_paths]
names = sorted(set.intersection(*(set(r) for r in sf_runs + x10_runs)))
rows = []
for n in names:
    t1 = min(r[n] for r in sf_runs)
    t1max = max(r[n] for r in sf_runs)
    t2 = min(r[n] for r in x10_runs)
    rows.append((n, t1, t1max, t2, t2 / t1, math.log10(t2 / t1)))
rows.sort(key=lambda r: -r[3])
tot1 = sum(r[1] for r in rows)
tot1max = sum(r[2] for r in rows)
tot2 = sum(r[3] for r in rows)
print(f"TOTAL sf0.1 min={tot1:.1f}s max={tot1max:.1f}s x10 min={tot2:.1f}s "
      f"exponent={math.log10(tot2 / tot1):.2f} queries={len(rows)}")
over = [(n, round(t1max / t1, 2)) for n, t1, t1max, *_ in rows
        if t1max / t1 > 2.0]
print(f"sf0.1 queries whose single-run max exceeds 2x their min: "
      f"{over or 'none'}")
print()
print("| query | sf0.1 min (s) | sf0.1 max (s) | x10 min (s) | ratio | exponent |")
print("|---|---|---|---|---|---|")
for n, t1, t1max, t2, r, e in rows:
    print(f"| {n} | {t1:.2f} | {t1max:.2f} | {t2:.2f} | {r:.1f} | {e:.2f} |")
