#!/usr/bin/env python3
"""Regenerate the BASELINE.md scaling-exponent table from full Bench runs.

usage: exponents.py sf01_run1.json [sf01_run2.json ...] -- x10_run1.json [...]

Each scale column is the per-query MINIMUM of its runs (the standard
JIT-stall mitigation documented in BASELINE.md). The table also records
the per-query single-run MAX at both scales — the variance columns the
driver's one-shot bench run is compared against: any query whose max
exceeds 2x its min is flagged here, BEFORE the driver can report it as a
`weak` perf row, and needs either a warm-up fix or a named cause in
BASELINE.md.

Empty or unparsable run files (a killed campaign leaves partial
artifacts) are skipped with a warning rather than crashing the whole
regeneration.
"""
import json, math, sys


def usage(msg):
    sys.exit(f"error: {msg}\nusage: exponents.py sf_run1.json [...] -- x10_run1.json [...]")


if "--" not in sys.argv:
    usage("missing '--' separator between sf0.1 runs and x10 runs")
sep = sys.argv.index("--")
sf_paths, x10_paths = sys.argv[1:sep], sys.argv[sep + 1:]


def load(p):
    """Return the per-query dict from a Bench run file, or None if the
    file is empty/partial. Bench prints the full per-query line first and
    a compact total line last; keep the line carrying "queries"."""
    try:
        with open(p) as f:
            lines = [ln for ln in f if '"queries"' in ln]
        if not lines:
            print(f"warning: skipping {p}: no full bench line", file=sys.stderr)
            return None
        return json.loads(lines[-1])["queries"]
    except (OSError, json.JSONDecodeError, KeyError) as e:
        print(f"warning: skipping {p}: {e}", file=sys.stderr)
        return None


sf_runs = [r for r in (load(p) for p in sf_paths) if r]
x10_runs = [r for r in (load(p) for p in x10_paths) if r]
if not sf_runs or not x10_runs:
    usage(f"need at least one usable run per scale "
          f"(got {len(sf_runs)} sf, {len(x10_runs)} x10)")
print(f"using {len(sf_runs)}/{len(sf_paths)} sf runs, "
      f"{len(x10_runs)}/{len(x10_paths)} x10 runs", file=sys.stderr)

names = sorted(set.intersection(*(set(r) for r in sf_runs + x10_runs)))
rows = []
for n in names:
    t1 = min(r[n] for r in sf_runs)
    t1max = max(r[n] for r in sf_runs)
    t2 = min(r[n] for r in x10_runs)
    t2max = max(r[n] for r in x10_runs)
    rows.append((n, t1, t1max, t2, t2max, t2 / t1, math.log10(t2 / t1)))
rows.sort(key=lambda r: -r[3])
tot1 = sum(r[1] for r in rows)
tot1max = sum(r[2] for r in rows)
tot2 = sum(r[3] for r in rows)
tot2max = sum(r[4] for r in rows)
print(f"TOTAL sf0.1 min={tot1:.1f}s max={tot1max:.1f}s "
      f"x10 min={tot2:.1f}s max={tot2max:.1f}s "
      f"exponent={math.log10(tot2 / tot1):.2f} queries={len(rows)}")
for scale, idx in (("sf0.1", (1, 2)), ("x10", (3, 4))):
    over = [(r[0], round(r[idx[1]] / r[idx[0]], 2)) for r in rows
            if r[idx[1]] / r[idx[0]] > 2.0]
    print(f"{scale} queries whose single-run max exceeds 2x their min: "
          f"{over or 'none'}")
print()
print("| query | sf0.1 min (s) | sf0.1 max (s) | x10 min (s) | x10 max (s) | ratio | exponent |")
print("|---|---|---|---|---|---|---|")
for n, t1, t1max, t2, t2max, r, e in rows:
    print(f"| {n} | {t1:.2f} | {t1max:.2f} | {t2:.2f} | {t2max:.2f} | {r:.1f} | {e:.2f} |")
