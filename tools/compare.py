#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: replay oracle_sql.json
in DuckDB over the same parquet tables and compare with the Verify dumps.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cmp(a, b):
    if list(a.columns) != list(b.columns):
        return f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn or x != y:
                return f"col {c} row {i}: {x!r} vs {y!r}"
    return None

def main(sf, out):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output")
            failures += 1
            continue
        try:
            got = con.sql(f"select * from read_parquet('{out}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"[FAIL] {name}: {str(e)[:300]}")
            failures += 1
            continue
        # schema check (names + dtypes)
        gs = {c: str(t) for c, t in zip(got.columns, got.dtypes)}
        es = {c: str(t) for c, t in zip(exp.columns, exp.dtypes)}
        diff = cmp(norm(got), norm(exp))
        if gs != es:
            print(f"[WARN] {name}: dtypes {gs} vs {es}")
        if diff:
            print(f"[FAIL] {name}: {diff}")
            failures += 1
        else:
            print(f"[ OK ] {name}: {len(got)} rows")
    # spark-only queries (rows-only)
    for d in sorted(glob.glob(f"{out}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracles:
            n = con.sql(f"select count(*) from read_parquet('{d}*.parquet')").fetchone()[0]
            print(f"[ROWS] {name}: {n} rows (no oracle)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
