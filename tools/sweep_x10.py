#!/usr/bin/env python3
"""x10 oracle sweep (round-13 verdict #6): replay each oracle in DuckDB
over the x10 corpus and compare with the Verify dump taken there,
recording pass/skip per query — scale-dependent oracle bugs (the
round-11 epoch-mix class) are invisible at small scale by construction.

Each oracle replays in its OWN subprocess under a wall-clock budget:
a replay that exceeds the budget is recorded as a skip with the reason
(DuckDB's brute-force reformulations of the banded/LSH operators are
quadratic in pairs and legitimately cannot follow one decade up), never
as a failure. Known-heavy oracles can be pre-skipped by name to save
the budget wait.

Usage: sweep_x10.py <x10Dir> <verifyOutDir> [budgetSec]
Writes a markdown table to stdout; exits 1 only on real mismatches.
"""
import json
import math
import subprocess
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# oracles whose DuckDB form is brute force over pairs (quadratic at x10)
# or rebuilds a corpus-wide intermediate DuckDB must fully materialize —
# pre-skipped with the reason recorded in the table. Round 15: empty —
# q_semdedup / q_hash_embed_neardup now replay the operator's SRP banded
# candidate generation (Extra.srpReplayCtes) instead of all-pairs brute
# force, the same reformulation that unblocked q_mm_phash in round 14.
PRE_SKIP = {}

# the worker imports compare.py's TABLES/norm/cmp so the x10 sweep
# validates with the SAME semantics as the sf-scale gate — no drifting
# inline copy of the comparator
WORKER = r"""
import duckdb, json, sys
sys.path.insert(0, %r)
from compare import TABLES, norm, cmp
sf, out, name, sql = sys.argv[1], sys.argv[2], sys.argv[3], sys.stdin.read()
con = duckdb.connect()
con.sql("SET enable_progress_bar = false")  # keep stdout JSON-only
for t in TABLES:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
got = con.sql(f"select * from read_parquet('{out}/{name}/*.parquet')").df()
exp = con.sql(sql).df()
diff = cmp(norm(got), norm(exp))
if diff:
    print(json.dumps({"status": "FAIL", "why": diff}))
else:
    print(json.dumps({"status": "OK", "rows": len(got)}))
""" % (str(__import__("pathlib").Path(__file__).resolve().parent),)


def main():
    sf, out = sys.argv[1], sys.argv[2]
    budget = int(sys.argv[3]) if len(sys.argv) > 3 else 300
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    rows, failures = [], 0
    for name in sorted(oracles):
        if name in PRE_SKIP:
            rows.append((name, "skip", PRE_SKIP[name]))
            continue
        try:
            p = subprocess.run(
                [sys.executable, "-c", WORKER, sf, out, name],
                input=oracles[name], capture_output=True, text=True,
                timeout=budget)
            if p.returncode == -9:
                # SIGKILL is the OOM-killer signature on a too-heavy
                # replay: a resource limit, not a mismatch — skip, per
                # the documented too-heavy-is-a-skip policy
                rows.append((name, "skip",
                             "replay worker OOM-killed (SIGKILL)"))
                continue
            if p.returncode < 0:
                # any OTHER signal (SIGSEGV/SIGABRT…) is a real crash —
                # e.g. DuckDB faulting on a malformed oracle — and must
                # count as a failure, not vanish into the skip column
                rows.append((name, "FAIL",
                             f"replay worker crashed (signal {-p.returncode})"))
                failures += 1
                continue
            if p.returncode != 0 or not p.stdout.strip():
                rows.append((name, "FAIL",
                             (p.stderr.strip() or "worker died")[-200:]))
                failures += 1
                continue
            r = json.loads(p.stdout.strip().splitlines()[-1])
            if r["status"] == "OK":
                rows.append((name, "pass", f"{r['rows']} rows"))
            else:
                rows.append((name, "FAIL", r["why"][:200]))
                failures += 1
        except subprocess.TimeoutExpired:
            rows.append((name, "skip",
                         f"oracle replay exceeded {budget}s budget"))
    npass = sum(1 for _, s, _ in rows if s == "pass")
    nskip = sum(1 for _, s, _ in rows if s == "skip")
    print(f"x10 sweep: {npass} pass, {nskip} skip, {failures} fail "
          f"of {len(rows)}\n")
    print("| query | status | detail |")
    print("|---|---|---|")
    for name, s, why in rows:
        print(f"| {name} | {s} | {why} |")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
