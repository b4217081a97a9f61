package graft.queries

import graft.ext.{Similarity, TextOps}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Second-wave coverage: distinct aggregates, ROLLUP, embedding near-dup
  * pairs, TF-IDF. */
object Extra {

  /** DuckDB replay of [[Similarity.srpNearDup]]'s banded candidate
    * generation over the hashing-trick text embeddings — the shared
    * oracle core for q_hash_embed_neardup and q_semdedup (round-15
    * reformulation; the previous dense all-pairs brute force was
    * quadratic in documents and could not follow the x10 sweep). Every
    * stage replays the operator exactly, and exactly is achievable
    * because the chain is integer-valued end to end: the hashed
    * embedding entries are ±1 counts, the hyperplanes are the md5-
    * derived ±1 family ([[Similarity.srpHyperplanes]] — same md5
    * formula both engines), so each projection is an exact integer in
    * double and every sign bit matches bit-for-bit regardless of
    * accumulation order. Sizing replays srpAutoBits/srpAutoBands/
    * srpHamMax from live counts with the operator's own formulas (the
    * only float risk is a count n where LN(n/2)/LN(2) lands exactly on
    * an integer — n/2 an exact power of two — where a 1-ulp libm
    * difference could flip CEIL; no testdata scale sits on one).
    * Algorithm-INDEPENDENT verification stays with tools/SrpCheck,
    * which compares the operator against true brute-force cosine at
    * sf0.01/sf0.1/x10 — same division of labor as q_dup_clusters /
    * tools/ClusterExactCheck. Defines srp_pairs(doc_a, doc_b, cos);
    * composes after Text.shinglesCte (t/sh). Plane budget: range(4096)
    * covers h = bits*bands beyond x100 (2934).
    *
    * Parameterized for the index-probe split (q_stream_semdedup):
    * `sizeFilter` restricts the count that SIZES the signature to the
    * index-corpus side ([[graft.ext.SrpIndex.build]] auto-sizes from
    * the CORPUS count and probes reuse the stored parameters), and
    * `candPred` selects which (a, b) doc pairs the banding may emit
    * (self-join default; batch x corpus for the probe split). Defaults
    * reproduce the original self-join text. */
  private def srpReplayCtes(
      sizeFilter: String = "TRUE",
      candPred: String = "a.doc_id < b.doc_id"): String = s"""
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
    -- (srpNearDup's nrm > 0 filter) BEFORE the count that sizes the
    -- signature, so the filter must precede srp_sz here too
    nr2 AS MATERIALIZED (SELECT doc_id, sqrt(list_dot_product(vec, vec)) AS nrm FROM dense
            WHERE list_dot_product(vec, vec) > 0),
    srp_sz AS (SELECT bits,
                 CAST(CEIL(32.0 * POWER(0.85, 8 - bits)) AS INT) AS bands
               FROM (SELECT GREATEST(8,
                       CAST(CEIL(LN(n / 2.0) / LN(2.0)) AS INT)) AS bits
                     FROM (SELECT CAST(count(*) AS DOUBLE) AS n FROM nr2
                           WHERE $sizeFilter))),
    -- the CASE errors LOUDLY (and names the budget) if a future corpus
    -- sizes bits*bands past the range(4096) plane budget — without it
    -- the signature would silently truncate and sweep mismatches would
    -- carry no diagnostic pointing here
    planes AS (SELECT r.j,
                 list_transform(range(128), d -> CAST(
                   (CAST(('0x' || substr(md5('srp:42:' || r.j || ':' || d), 1, 1))
                      AS INT) & 1) * 2 - 1 AS DOUBLE)) AS pl
               FROM range(4096) r(j), srp_sz
               WHERE r.j < CASE WHEN srp_sz.bits * srp_sz.bands > 4096
                 THEN error('srpReplayCtes: bits*bands = ' ||
                   CAST(srp_sz.bits * srp_sz.bands AS VARCHAR) ||
                   ' exceeds the range(4096) plane budget — raise it')
                 ELSE srp_sz.bits * srp_sz.bands END),
    proj AS MATERIALIZED (SELECT dense.doc_id, planes.j,
                    list_dot_product(dense.vec, planes.pl) AS pr
             FROM dense JOIN nr2 USING (doc_id) CROSS JOIN planes),
    -- band b packs projection signs [b*bits, (b+1)*bits) (VectorKernels
    -- .signBands layout); the band VALUE encoding only needs equality,
    -- so an ordered bit string replays the kernel's packed int
    bitsb AS MATERIALIZED (SELECT doc_id, band, string_agg(bit, '' ORDER BY j) AS bval
              FROM (SELECT doc_id, j, CAST(j // srp_sz.bits AS INT) AS band,
                           CASE WHEN pr > 0 THEN '1' ELSE '0' END AS bit
                    FROM proj, srp_sz)
              GROUP BY doc_id, band),
    cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bitsb a JOIN bitsb b
               ON a.band = b.band AND a.bval = b.bval AND ($candPred)),
    -- hamming prefilter on the full h-bit signature (packSigns replay):
    -- BIT xor + bit_count keeps the per-pair cost flat at x10 volumes
    sigbit AS MATERIALIZED (SELECT doc_id, CAST(string_agg(
                 CASE WHEN pr > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS BIT) AS s
               FROM proj GROUP BY doc_id),
    surv AS MATERIALIZED (SELECT doc_a, doc_b FROM cand
             JOIN sigbit sa ON sa.doc_id = cand.doc_a
             JOIN sigbit sb ON sb.doc_id = cand.doc_b, srp_sz
             WHERE bit_count(xor(sa.s, sb.s)) <=
               CAST(CEIL(srp_sz.bits * srp_sz.bands * ACOS(0.6) / PI()
                 + 3.0 * SQRT(CAST(srp_sz.bits * srp_sz.bands AS DOUBLE))) AS INT)),
    srp_pairs AS MATERIALIZED (SELECT doc_a, doc_b,
                    list_dot_product(da.vec, db.vec) / (na.nrm * nb.nrm) AS cos
                  FROM surv
                  JOIN dense da ON da.doc_id = surv.doc_a
                  JOIN dense db ON db.doc_id = surv.doc_b
                  JOIN nr2 na ON na.doc_id = surv.doc_a
                  JOIN nr2 nb ON nb.doc_id = surv.doc_b)"""

  val defs: Seq[QueryDef] = Seq(

    // ---- distinct aggregates + min/max ------------------------------------
    QueryDef(
      "q_agg_distinct",
      Some("""
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part,
               min(l_quantity) AS min_qty,
               max(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_returnflag"""),
      (s, dir) => Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))),

    // ---- ROLLUP (grouping sets) -------------------------------------------
    QueryDef(
      "q_rollup",
      Some("""
        SELECT o_orderpriority, o_orderstatus,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders
        GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"""),
      (s, dir) => Tables.load(s, dir, "orders")
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(expr("cast(round(o_totalprice * 100) as bigint)")).cast("bigint").as("total_cents"))),

    // ---- embedding-cosine near-dup pairs (bucketed by label) --------------
    // Exact cosine baseline over a FIXED probe set (vec_a < 50) against the
    // full corpus within each label bucket — the same probe-cap treatment
    // q_ivf_nn got: candidate volume is O(|probes| * corpus/label), linear
    // in corpus, not the O(n^2/|labels|) of an uncapped all-pairs self-join.
    // The probe side is tiny, so Catalyst broadcasts it and the scan of the
    // candidate side is one pass with no shuffle. The uncapped all-pairs
    // form survives as the recall oracle inside SemDedupSpec fixtures; the
    // production-scale path for full-corpus near-dup is
    // q_hash_embed_neardup (SRP-LSH candidates, exponent 0.54).
    // Threshold 0.32 (not the 0.4 the synthetic corpus never reaches from
    // this probe set): measured pair counts are 11 / 12 / 46 / 905 at
    // sf0.001 / sf0.01 / sf0.1 / x10, and the nearest actual cosine sits
    // >= 7e-5 from the cut at every scale, so the oracle witnesses real
    // pairs (a 0-row result can't catch a broken pair predicate) with no
    // float-boundary risk — both sides run the same double arithmetic in
    // the same index order.
    QueryDef(
      "q_embed_neardup",
      Some("""
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        s AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                     list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
              FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
              WHERE a.vec_id < 50)
        SELECT vec_a, vec_b, round(cos, 6) AS sim FROM s WHERE cos >= 0.32"""),
      (s, dir) => {
        val p = Similarity.prepared(Tables.load(s, dir, "embeddings"), Seq("label"))
        val a = p.select(col("vec_id").as("vec_a"), col("label"), col("v"), col("nrm"))
          .where(col("vec_a") < 50)
        val b = p.select(col("vec_id").as("vec_b"), col("label").as("__l"),
          col("v").as("bv"), col("nrm").as("bnrm"))
        broadcast(a)
          .join(b, col("label") === col("__l") && col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b"),
            (Similarity.dot(col("v"), col("bv")) / (col("nrm") * col("bnrm"))).as("cos"))
          .where(col("cos") >= 0.32)
          .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("sim"))
      }),

    // ---- feature-hash embedding near-dup via SRP-LSH ----------------------
    // The scale path for embedding-cosine near-dup: documents are embedded
    // with the deterministic md5 hashing trick (graft_feature_hash — one
    // map pass, no exchange), then sign-random-projection LSH generates
    // candidates and only candidates get exact cosine verification. True
    // near-dups land at cosine 0.89-1.0 and unrelated pairs below 0.32 on
    // this corpus, so threshold 0.6 splits a wide margin and the exact
    // oracle (DuckDB rebuilds the embedding from shingles — integer
    // feature counts make every dot product exact, accumulation-order
    // independent) pins LSH recall 1, like q_minhash_lsh does for MinHash.
    // q_embed_neardup stays the label-bucketed exact baseline on the
    // synthetic `embeddings` table.
    QueryDef(
      "q_hash_embed_neardup",
      Some(s"""
        WITH ${Text.shinglesCte},
        ${srpReplayCtes()}
        SELECT doc_a, doc_b, round(cos, 6) AS sim
        FROM srp_pairs WHERE cos >= 0.6"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val vecs = docs.select(col("doc_id"),
          graft.functions.FeatureHash(s, col("text"), 128).as("v"))
        Similarity.srpNearDup(vecs, threshold = 0.6, dim = 128)
      }),

    // ---- semantic dedup (SemDeDup: embedding-cluster keep-one) ------------
    // srpNearDup pairs -> connected components -> keep min-id per
    // cluster. The oracle replays the operator's SRP banded candidate
    // generation (srpReplayCtes — see its scaladoc for why the replay is
    // bit-exact) and closes components over 3 hops — exact because
    // cosine near-dup clusters are near-cliques (same bet q_dup_clusters
    // makes, while the engine computes TRUE components via fixpoint).
    QueryDef(
      "q_semdedup",
      Some(s"""
        WITH ${Text.shinglesCte},
        ${srpReplayCtes()},
        pr AS (SELECT doc_a AS a, doc_b AS b FROM srp_pairs WHERE cos >= 0.6),
        e AS (SELECT a, b FROM pr
              UNION ALL SELECT b, a FROM pr
              UNION ALL SELECT doc_id, doc_id FROM documents),
        h1 AS (SELECT a, min(b) AS m FROM e GROUP BY a),
        h2 AS (SELECT e.a, min(h1.m) AS m FROM e JOIN h1 ON h1.a = e.b GROUP BY e.a),
        h3 AS (SELECT e.a, min(h2.m) AS m FROM e JOIN h2 ON h2.a = e.b GROUP BY e.a)
        SELECT a AS doc_id, m AS cluster_root, a = m AS keep FROM h3"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val vecs = docs.select(col("doc_id"),
          graft.functions.FeatureHash(s, col("text"), 128).as("v"))
        Similarity.semanticDedup(vecs, threshold = 0.6, dim = 128)
      }),

    // ---- streaming semantic dedup vs the persisted SRP index --------------
    // The paraphrase-dup crawl shape: arriving (odd-id) docs are hashed
    // to embeddings and probe a persisted SRP band index built from the
    // even-id corpus, per microbatch — the embedding analog of
    // q_stream_dedup_against, and the last on-ingest form the dedup
    // matrix lacked. Stream ∪ batches == the batch probe side and the
    // index is static, so the result is batching-invariant and the
    // oracle replays the whole stream as ONE batch: srpReplayCtes with
    // the signature SIZED on the corpus count (SrpIndex.build auto-sizes
    // from the corpus; probes reuse the stored parameters) and
    // candidates restricted to batch x corpus pairs.
    QueryDef(
      "q_stream_semdedup",
      Some(s"""
        WITH ${Text.shinglesCte},
        ${srpReplayCtes(
          sizeFilter = "doc_id % 2 = 0",
          candPred = "a.doc_id % 2 = 1 AND b.doc_id % 2 = 0")}
        SELECT doc_a AS doc_id, doc_b AS dup_of, round(cos, 6) AS sim
        FROM srp_pairs WHERE cos >= 0.6"""),
      (s, dir) => {
        Tables.prepare(s)
        val docs = Tables.load(s, dir, "documents")
        val path = s.conf.get("spark.sql.warehouse.dir") + "/graft_srp_index_s"
        val idx = graft.ext.SrpIndex.build(
          docs.where(col("doc_id") % 2 === 0).select(col("doc_id"),
            graft.functions.FeatureHash(s, col("text"), 128).as("v")),
          path, dim = 128)
        val stream = Tables.documentsStream(s, dir)
          .where(col("doc_id") % 2 === 1)
          .select(col("doc_id"),
            graft.functions.FeatureHash(s, col("text"), 128).as("v"))
        graft.ext.SrpIndex.semanticDedupOnIngest(stream, idx, 0.6)
      }),

    // ---- window-function family (lag/lead/rank/running max) ---------------
    QueryDef(
      "q_window_funcs",
      Some("""
        SELECT o_orderkey, o_custkey,
               lag(o_totalprice) OVER w AS prev_price,
               lead(o_totalprice) OVER w AS next_price,
               CAST(row_number() OVER w AS INT) AS rn,
               CAST(dense_rank() OVER w AS INT) AS drnk,
               max(o_totalprice) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
        FROM orders
        WHERE o_custkey < 100
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.load(s, dir, "orders")
          .where(col("o_custkey") < 100)
          .select(
            col("o_orderkey"), col("o_custkey"),
            lag(col("o_totalprice"), 1).over(w).as("prev_price"),
            lead(col("o_totalprice"), 1).over(w).as("next_price"),
            row_number().over(w).as("rn"),
            dense_rank().over(w).as("drnk"),
            max(col("o_totalprice"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("run_max"))
      }),

    // ---- string functions --------------------------------------------------
    QueryDef(
      "q_string_funcs",
      Some("""
        SELECT p_partkey,
               upper(p_brand) AS brand_u,
               substr(p_name, 1, 10) AS name10,
               concat(p_brand, ':', p_type) AS bt,
               CAST(length(p_name) AS INT) AS name_len,
               CASE WHEN p_size >= 30 THEN 'large'
                    WHEN p_size >= 10 THEN 'medium'
                    ELSE 'small' END AS size_class,
               replace(p_type, ' ', '_') AS type_u
        FROM part WHERE p_name LIKE '%a%'"""),
      (s, dir) => Tables.load(s, dir, "part")
        .where(col("p_name").like("%a%"))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 10).as("name10"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("bt"),
          length(col("p_name")).as("name_len"),
          when(col("p_size") >= 30, "large")
            .when(col("p_size") >= 10, "medium")
            .otherwise("small").as("size_class"),
          regexp_replace(col("p_type"), " ", "_").as("type_u"))),

    // ---- date/time extraction ----------------------------------------------
    QueryDef(
      "q_dates",
      Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS y,
               CAST(month(o_orderdate) AS INT) AS m,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM orders GROUP BY 1, 2"""),
      (s, dir) => Tables.load(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(
          count(lit(1)).as("n"),
          sum(expr("cast(round(o_totalprice * 100) as bigint)")).cast("bigint").as("cents"))),

    // ---- TF-IDF over a bounded doc subset ---------------------------------
    QueryDef(
      "q_tfidf",
      Some("""
        WITH tok AS (SELECT doc_id,
                            unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                     FROM documents),
        tf AS (SELECT doc_id, token, count(*) AS tf FROM tok
               WHERE doc_id < 50 GROUP BY doc_id, token),
        df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT tf.doc_id, tf.token,
               round(tf.tf * ln(CAST(n.n_docs + 1 AS DOUBLE) / (df.df + 1)), 6) AS tfidf
        FROM tf JOIN df ON tf.token = df.token CROSS JOIN n"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val tok = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        val tf = tok.where(col("doc_id") < 50)
          .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val dfreq = tok.groupBy("token").agg(countDistinct(col("doc_id")).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        tf.join(dfreq, "token")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("token"),
            round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6)
              .as("tfidf"))
      })
  )
}
