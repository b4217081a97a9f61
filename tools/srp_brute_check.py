#!/usr/bin/env python3
"""Algorithm-independent cross-check for the two SRP-replay oracles.

The registry oracles for q_hash_embed_neardup / q_semdedup replay the
operator's own SRP banded candidate generation (queries/Extra.scala
srpReplayCtes) so the x10 sweep can follow them; that makes the gate
verify a DuckDB replay of the same construction, so a conceptual error
in the SHARED construction (sizing, sign family, hamming gate) would
pass compare.py in both engines. This tool restores the pre-round-15
ALL-PAIRS brute-force oracle and compares it against the Spark
operator's Verify dump, giving an engine- and algorithm-independent pin
(the Spark-side counterpart is tools/SrpCheck, which brute-forces in
Spark up to x10).

Comparison semantics (round-17 hardening):
  - sim values computed independently by Spark and DuckDB are compared
    with EPS=1e-6 tolerance, not bit equality — the two engines sum the
    dot product in different orders, so round(cos, 6) can differ in the
    last digit at a rounding boundary;
  - a pair present on one side only whose brute cosine lies within EPS
    of the 0.6 threshold is a WARNING, not a failure (legitimate
    boundary flutter after a corpus regen), and is printed;
  - q_semdedup's brute clustering iterates min-label propagation to a
    FIXPOINT (cheap at sf0.01), so cluster chains of any length are
    pinned — the registry oracle's fixed 3 rounds are not replicated
    here, keeping the check independent of clustering convergence too.

Modes:
  full (default)  — both queries, exact pair set + clustering, for
                    sf0.01 where the quadratic all-pairs is cheap.
  --sample M      — q_hash_embed_neardup only: brute-force verify the
                    docs with doc_id % M == 0 against the FULL corpus
                    (deterministic ~1/M sample), keeping an
                    algorithm-independent check alive at x10 where the
                    full quadratic is unaffordable. Precision must be
                    1 (no non-near-threshold false pairs); recall over
                    the sampled true pairs must reach --recall-floor
                    (default 0.9 — the operator's LSH banding has
                    DOCUMENTED probabilistic boundary misses at x10,
                    see SrpCheck/gates.sh).

Usage:
  python3 tools/srp_brute_check.py <sfDir> <verifyOutDir>
  python3 tools/srp_brute_check.py <x10Dir> <verifyOutDir> --sample 50
    (run after `runMain graft.Verify <dir> <verifyOutDir>` covering
     q_hash_embed_neardup[,q_semdedup])
"""
import sys, glob, math
import duckdb

EPS = 1e-6
THRESH = 0.6

SHINGLES_CTE = """
    t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
          FROM documents),
    sh AS (SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                 i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)
                      || ' ' || list_extract(toks, i + 2))
               ELSE [] END) AS shingle
           FROM t)"""

# the shared dense-embedding build (hashing trick, integer-exact) —
# verbatim the pre-round-15 oracle core
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


def setup(con, sf):
    con.sql(f"create view documents as select * from '{sf}/documents.parquet'")
    # all-pairs (or sample-vs-corpus) brute cosine, kept down to
    # THRESH-EPS so near-threshold set differences can be classified
    con.sql(f"""
        CREATE TEMP TABLE brute AS
        WITH {SHINGLES_CTE}, {BRUTE_CORE}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               list_dot_product(a.vec, b.vec) / (na.nrm * nb.nrm) AS cos
        FROM dense a JOIN dense b ON a.doc_id < b.doc_id
        JOIN nr2 na ON na.doc_id = a.doc_id
        JOIN nr2 nb ON nb.doc_id = b.doc_id
        WHERE list_dot_product(a.vec, b.vec) / (na.nrm * nb.nrm)
              >= {THRESH} - {EPS}""")


def load_spark_pairs(con, out):
    files = glob.glob(f"{out}/q_hash_embed_neardup/*.parquet")
    if not files:
        return None
    return {(int(r[0]), int(r[1])): float(r[2]) for r in con.sql(
        f"select doc_a, doc_b, sim from "
        f"read_parquet('{out}/q_hash_embed_neardup/*.parquet')").fetchall()}


def check_pairs(con, out, sample_mod=None, recall_floor=0.9):
    """Compare operator pairs against the brute table. Returns #failures."""
    got = load_spark_pairs(con, out)
    if got is None:
        print(f"[FAIL] q_hash_embed_neardup: no spark output under {out}")
        return 1
    brute = {(int(a), int(b)): float(c)
             for a, b, c in con.sql("select doc_a, doc_b, cos from brute").fetchall()}
    if sample_mod is not None:
        in_sample = lambda p: p[0] % sample_mod == 0 or p[1] % sample_mod == 0
        got = {p: s for p, s in got.items() if in_sample(p)}
        brute = {p: c for p, c in brute.items() if in_sample(p)}
    expected = {p: c for p, c in brute.items() if c >= THRESH}

    failures = 0
    warns = 0
    # precision: every operator pair must be a true pair (near-threshold
    # brute cosine is a warning — boundary flutter, not a wrong pair)
    for p, s in sorted(got.items()):
        c = brute.get(p)
        if c is None:
            print(f"[FAIL] q_hash_embed_neardup: operator pair {p} (sim={s}) "
                  f"has brute cosine < {THRESH - EPS}")
            failures += 1
        elif c < THRESH:
            print(f"[WARN] q_hash_embed_neardup: operator pair {p} sits on "
                  f"the threshold boundary (brute cos={c:.8f})")
            warns += 1
        elif abs(s - round(c, 6)) > EPS:
            print(f"[FAIL] q_hash_embed_neardup: pair {p} sim differs: "
                  f"spark {s} vs brute {round(c, 6)}")
            failures += 1
    # recall over the true pairs
    missing = {p: c for p, c in expected.items() if p not in got}
    boundary_missing = {p: c for p, c in missing.items() if c - THRESH < EPS}
    real_missing = {p: c for p, c in missing.items() if p not in boundary_missing}
    for p, c in sorted(boundary_missing.items()):
        print(f"[WARN] q_hash_embed_neardup: threshold-boundary pair {p} "
              f"(brute cos={c:.8f}) not emitted")
        warns += 1
    n_exp = len(expected)
    recall = 1.0 if n_exp == 0 else (n_exp - len(missing)) / n_exp
    if sample_mod is None:
        for p, c in sorted(real_missing.items()):
            print(f"[FAIL] q_hash_embed_neardup: true pair {p} "
                  f"(brute cos={c:.6f}) missing from operator output")
            failures += 1
    else:
        for p, c in sorted(real_missing.items()):
            print(f"[info] q_hash_embed_neardup: sampled miss {p} "
                  f"(brute cos={c:.6f}) — LSH boundary regime")
        if recall < recall_floor:
            print(f"[FAIL] q_hash_embed_neardup: sampled recall "
                  f"{recall:.4f} < floor {recall_floor}")
            failures += 1
    mode = (f"sampled 1/{sample_mod}" if sample_mod is not None else "full")
    if failures == 0:
        print(f"[OK]   q_hash_embed_neardup ({mode}): {len(got)} operator "
              f"pairs vs {n_exp} brute pairs, recall {recall:.4f}, "
              f"{warns} boundary warning(s)")
    return failures


def check_clusters(con, out):
    """q_semdedup vs brute pairs + FIXPOINT min-label propagation."""
    files = glob.glob(f"{out}/q_semdedup/*.parquet")
    if not files:
        print(f"[FAIL] q_semdedup: no spark output under {out}")
        return 1
    con.sql(f"""CREATE TEMP TABLE edges AS
        WITH pr AS (SELECT doc_a AS a, doc_b AS b FROM brute
                    WHERE cos >= {THRESH})
        SELECT a, b FROM pr
        UNION ALL SELECT b, a FROM pr
        UNION ALL SELECT doc_id, doc_id FROM documents""")
    con.sql("CREATE TEMP TABLE lab AS SELECT a, min(b) AS m FROM edges GROUP BY a")
    # min-label propagation to a FIXPOINT: chains of any length converge
    # (each round the label is the min over the round before, decreasing
    # and bounded), unlike the registry oracle's fixed 3 rounds
    for _ in range(1000):
        con.sql("""CREATE OR REPLACE TEMP TABLE nxt AS
            SELECT e.a, least(min(l.m), min(l2.m)) AS m
            FROM edges e JOIN lab l ON l.a = e.b
                         JOIN lab l2 ON l2.a = e.a
            GROUP BY e.a""")
        changed = con.sql(
            "SELECT count(*) FROM nxt JOIN lab ON lab.a = nxt.a "
            "WHERE lab.m <> nxt.m").fetchone()[0]
        con.sql("CREATE OR REPLACE TEMP TABLE lab AS SELECT * FROM nxt")
        if changed == 0:
            break
    else:
        print("[FAIL] q_semdedup: propagation did not converge in 1000 rounds")
        return 1
    exp = {int(a): int(m) for a, m in
           con.sql("SELECT a, m FROM lab").fetchall()}
    got = {int(r[0]): (int(r[1]), bool(r[2])) for r in con.sql(
        f"select doc_id, cluster_root, keep from "
        f"read_parquet('{out}/q_semdedup/*.parquet')").fetchall()}
    # pairs straddling the threshold by summation-order noise change the
    # edge set and hence cluster roots — but only for the CONNECTED
    # COMPONENTS the flutter edge touches. A mismatch is downgraded to
    # WARN only when its component (under either labeling: the brute
    # root, or the operator's root) contains an endpoint of a boundary
    # pair; a root difference in a component with no boundary pair in
    # play is a genuine clustering regression and FAILs even when
    # unrelated boundary pairs exist elsewhere in the corpus.
    boundary = con.sql(
        f"SELECT doc_a, doc_b, cos FROM brute "
        f"WHERE abs(cos - {THRESH}) < {EPS}").fetchall()
    boundary_roots = set()
    for a, b, _ in boundary:
        for e in (int(a), int(b)):
            if e in exp:
                boundary_roots.add(exp[e])
            if e in got:
                boundary_roots.add(got[e][0])
    failures = 0
    mismatches = []
    if set(exp) != set(got):
        print(f"[FAIL] q_semdedup: doc sets differ "
              f"({len(exp)} brute vs {len(got)} operator)")
        failures += 1
    else:
        warned = []
        for d in sorted(exp):
            root, keep = got[d]
            if root != exp[d] or keep != (d == exp[d]):
                msg = (f"doc {d}: operator (root={root}, keep={keep}) "
                       f"vs brute fixpoint root={exp[d]}")
                if exp[d] in boundary_roots or root in boundary_roots:
                    warned.append(msg)
                else:
                    mismatches.append(msg)
        if warned:
            print(f"[WARN] q_semdedup: {len(warned)} cluster-root "
                  f"difference(s) in components touched by "
                  f"{len(boundary)} threshold-boundary pair(s) — "
                  f"boundary flutter, inspect:")
            for m in warned[:10]:
                print(f"[WARN]   {m}")
            for a, b, c in boundary[:10]:
                print(f"[WARN]   boundary pair ({a}, {b}) cos={c:.8f}")
        for m in mismatches:
            print(f"[FAIL] q_semdedup: {m} (component has no boundary "
                  f"pair — not flutter)")
        failures += len(mismatches)
        mismatches = mismatches + warned
    if failures == 0 and not mismatches:
        print(f"[OK]   q_semdedup: {len(got)} rows match the all-pairs "
              f"brute force + fixpoint clustering")
    return failures


def main(argv):
    sf, out = argv[0], argv[1]
    sample_mod = None
    recall_floor = 0.9
    rest = argv[2:]
    while rest:
        try:
            if rest[0] == "--sample":
                sample_mod = int(rest[1]); rest = rest[2:]
            elif rest[0] == "--recall-floor":
                recall_floor = float(rest[1]); rest = rest[2:]
            else:
                print(__doc__); sys.exit(2)
        except (IndexError, ValueError):
            print(__doc__); sys.exit(2)
    con = duckdb.connect()
    if sample_mod is not None:
        # sample-vs-corpus brute. The embedding build stays in DuckDB
        # (integer-exact hashing trick, linear in the corpus); the
        # sample x corpus cosine runs as a numpy float64 matmul —
        # a DuckDB join materializing two 128-double lists per candidate
        # row needed ~70 GB at x10, the matmul needs the 50 MB matrix
        import numpy as np
        con.sql(f"create view documents as "
                f"select * from '{sf}/documents.parquet'")
        rows = con.sql(f"""
            WITH {SHINGLES_CTE}, {BRUTE_CORE}
            SELECT dense.doc_id, vec FROM dense
            JOIN nr2 ON nr2.doc_id = dense.doc_id
            ORDER BY dense.doc_id""").fetchall()
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        mat = np.array([r[1] for r in rows], dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        sample_pos = np.nonzero(ids % sample_mod == 0)[0]
        cand = set()
        for i0 in range(0, len(sample_pos), 256):
            chunk = sample_pos[i0:i0 + 256]
            sims = mat[chunk] @ mat.T
            si, ci = np.nonzero(sims >= THRESH - EPS)
            for s_i, c_i in zip(chunk[si], ci):
                if ids[s_i] != ids[c_i]:
                    a, b = sorted((int(ids[s_i]), int(ids[c_i])))
                    cand.add((a, b))
        # exact sim per surviving pair (the candidate set is tiny)
        idx = {int(d): k for k, d in enumerate(ids)}
        cand = sorted(cand)
        con.sql("CREATE TEMP TABLE brute (doc_a BIGINT, doc_b BIGINT, cos DOUBLE)")
        if cand:
            vals = [(a, b, float(mat[idx[a]] @ mat[idx[b]])) for a, b in cand]
            con.executemany("INSERT INTO brute VALUES (?, ?, ?)", vals)
        failures = check_pairs(con, out, sample_mod, recall_floor)
    else:
        setup(con, sf)
        failures = check_pairs(con, out)
        failures += check_clusters(con, out)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    main(sys.argv[1:])
