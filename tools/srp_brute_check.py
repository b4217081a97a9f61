#!/usr/bin/env python3
"""Algorithm-independent cross-check for the two SRP-replay oracles.

The registry oracles for q_hash_embed_neardup / q_semdedup replay the
operator's own SRP banded candidate generation (queries/Extra.scala
srpReplayCtes) so the x10 sweep can follow them; that makes the gate
verify a DuckDB replay of the same construction, so a conceptual error
in the SHARED construction (sizing, sign family, hamming gate) would
pass compare.py in both engines. This tool restores the pre-round-15
ALL-PAIRS brute-force oracle — quadratic in documents, fine at sf0.01 —
and compares it against the Spark operator's Verify dump, giving an
engine- and algorithm-independent pin at the cheap scale (the Spark-side
counterpart is tools/SrpCheck, which brute-forces in Spark up to x10).

Usage: python3 tools/srp_brute_check.py <sfDir> <verifyOutDir>
  (run after `runMain graft.Verify <sfDir> <verifyOutDir>`; sf0.01 takes
  a few seconds, sf0.1 works but is the quadratic regime — not needed.)
"""
import sys, glob, math
import duckdb

SHINGLES_CTE = """
    t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM documents),
    sh AS (SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                 i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                      || ' ' || list_extract(toks, i + 2))
               ELSE [] END) AS shingle
           FROM t),
    sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)"""

# the shared dense-embedding build (hashing trick, integer-exact) + the
# quadratic all-pairs cosine — verbatim the pre-round-15 oracle core
BRUTE_CORE = """
    f AS (SELECT doc_id,
            CAST(('0x' || substr(md5(shingle), 1, 8)) AS BIGINT) % 128 AS dim,
            (CAST(('0x' || substr(md5(shingle), 9, 1)) AS INT) & 1) * 2 - 1 AS sgn
          FROM sh),
    v AS (SELECT doc_id, dim, CAST(sum(sgn) AS DOUBLE) AS x FROM f GROUP BY 1, 2),
    dims AS (SELECT t.doc_id, r.i AS dim FROM t CROSS JOIN range(128) r(i)),
    dense AS MATERIALIZED (SELECT dims.doc_id,
                list(coalesce(v.x, 0.0) ORDER BY dims.dim) AS vec
              FROM dims LEFT JOIN v
                ON v.doc_id = dims.doc_id AND v.dim = dims.dim
              GROUP BY dims.doc_id),
    -- zero-norm docs have no cosine direction; the operator drops them
    nr2 AS MATERIALIZED (SELECT doc_id, sqrt(list_dot_product(vec, vec)) AS nrm
            FROM dense WHERE list_dot_product(vec, vec) > 0)"""

QUERIES = {
    "q_hash_embed_neardup": f"""
        WITH {SHINGLES_CTE}, {BRUTE_CORE},
        pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      list_dot_product(a.vec, b.vec) / (na.nrm * nb.nrm) AS cos
               FROM dense a JOIN dense b ON a.doc_id < b.doc_id
               JOIN nr2 na ON na.doc_id = a.doc_id
               JOIN nr2 nb ON nb.doc_id = b.doc_id)
        SELECT doc_a, doc_b, round(cos, 6) AS sim FROM pr WHERE cos >= 0.6""",
    "q_semdedup": f"""
        WITH {SHINGLES_CTE}, {BRUTE_CORE},
        pr AS (SELECT a.doc_id AS a, b.doc_id AS b
               FROM dense a JOIN dense b ON a.doc_id < b.doc_id
               JOIN nr2 na ON na.doc_id = a.doc_id
               JOIN nr2 nb ON nb.doc_id = b.doc_id
               WHERE list_dot_product(a.vec, b.vec) / (na.nrm * nb.nrm) >= 0.6),
        e AS (SELECT a, b FROM pr
              UNION ALL SELECT b, a FROM pr
              UNION ALL SELECT doc_id, doc_id FROM documents),
        h1 AS (SELECT a, min(b) AS m FROM e GROUP BY a),
        h2 AS (SELECT e.a, min(h1.m) AS m FROM e JOIN h1 ON h1.a = e.b GROUP BY e.a),
        h3 AS (SELECT e.a, min(h2.m) AS m FROM e JOIN h2 ON h2.a = e.b GROUP BY e.a)
        SELECT a AS doc_id, m AS cluster_root, a = m AS keep FROM h3""",
}


def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def cmp(a, b):
    if list(a.columns) != list(b.columns):
        return f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: {len(a)} vs {len(b)}"
    for c in a.columns:
        for i, (x, y) in enumerate(zip(a[c].tolist(), b[c].tolist())):
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn and yn:
                continue
            if xn != yn or x != y:
                return f"col {c} row {i}: {x!r} vs {y!r}"
    return None


def main(sf, out):
    con = duckdb.connect()
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    failures = 0
    for name, sql in sorted(QUERIES.items()):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: no spark output under {out}")
            failures += 1
            continue
        got = con.sql(f"select * from read_parquet('{out}/{name}/*.parquet')").df()
        exp = con.sql(sql).df()
        diff = cmp(norm(got), norm(exp))
        if diff:
            print(f"[FAIL] {name}: operator vs ALL-PAIRS brute force: {diff}")
            failures += 1
        else:
            print(f"[OK]   {name}: {len(got)} rows match the all-pairs brute force")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1], sys.argv[2])
