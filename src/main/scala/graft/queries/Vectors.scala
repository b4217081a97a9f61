package graft.queries

import graft.ext.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Similarity-search extension queries over `embeddings` (64-dim float
  * vectors). Dot products are sequential left-to-right folds on both sides;
  * similarities are rounded to 6 decimals in the OUTPUT only (ranking uses
  * the raw value — random-vector gaps are far larger than any FP noise). */
object Vectors {

  val defs: Seq[QueryDef] = Seq(

    // ---- brute-force cosine top-k (probes broadcast over the corpus) ------
    QueryDef(
      "q_cosine_topk",
      Some("""
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        s AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                     list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
              FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        r AS (SELECT qid, cid, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
              FROM s)
        SELECT qid, cid, round(cos, 6) AS sim FROM r WHERE rn <= 5"""),
      (s, dir) => Similarity.cosineTopK(
        Tables.load(s, dir, "embeddings"), col("vec_id") < 10, 5)),

    // ---- bucketed (IVF-style) nearest neighbor within label cells ---------
    // Probe side capped to a fixed probe set (vec_id < 50); candidates stay
    // the FULL label cell, so every answer is exact. The uncapped self-join
    // is all-pairs within each cell — O(sum cell^2), measured x10 exponent
    // 1.79 — while the capped form is O(|probes| * cell) = linear, the only
    // shape that survives 100 TB. The uncapped form still runs inside the
    // calibration harnesses (tools/IvfProfile, tools/KmeansRecall).
    QueryDef(
      "q_ivf_nn",
      Some("""
        WITH e AS (SELECT vec_id, label,
                          list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        s AS (SELECT a.vec_id, a.label, b.vec_id AS nn_cand,
                     list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
              FROM n a JOIN n b ON a.label = b.label AND b.vec_id <> a.vec_id
              WHERE a.vec_id < 50),
        r AS (SELECT vec_id, label, nn_cand, cos,
                     row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nn_cand) AS rn
              FROM s)
        SELECT vec_id, label, nn_cand AS nn_id, round(cos, 6) AS sim
        FROM r WHERE rn = 1"""),
      (s, dir) => Similarity.bucketedNN(
        Tables.load(s, dir, "embeddings"), "label",
        probeFilter = col("vec_id") < 50)),

    // ---- per-group vector pooling through the custom aggregate -------------
    // Class centroids (in sum form) via graft_vec_sum, the
    // TypedImperativeAggregate: per-label elementwise sums cross the
    // shuffle as ONE buffer per label — a posexplode formulation shuffles
    // n*dim rows. Inputs are rounded to integer micro-units BEFORE
    // summing (values stay far below 2^53, so double addition of them is
    // exact and order-independent), which is what lets the custom
    // aggregate be HASH-gated here rather than recall-gated as in
    // Lloyd's refinement. The oracle replays the sums relationally
    // (unnest + group by dimension + ordered re-aggregation).
    QueryDef(
      "q_vec_pool",
      Some("""
        WITH nz AS (SELECT label, embedding FROM embeddings
                    WHERE len(embedding) > 0),
        e AS (SELECT label, i,
                CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0)
                  AS BIGINT) AS xm
              FROM nz, unnest(range(1, len(embedding) + 1)) r(i)),
        s AS (SELECT label, i, CAST(sum(xm) AS BIGINT) AS sm
              FROM e GROUP BY label, i),
        v AS (SELECT label,
                array_to_string(list(sm ORDER BY i), ',') AS sum_micros
              FROM s GROUP BY label),
        n AS (SELECT label, count(*) AS n_vecs FROM nz GROUP BY label)
        SELECT n.label, n.n_vecs, v.sum_micros
        FROM n JOIN v ON v.label = n.label"""),
      // both sides pool NON-EMPTY embeddings only (and count the pooled
      // rows): without the filter an all-empty label diverges — the
      // engine would emit a null sum while the oracle's unnest generates
      // no rows and its join drops the label — and a mixed empty/d-dim
      // label would crash VecSumAgg's length check
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
          .where(size(col("embedding")) > 0)
        val micros = transform(col("embedding"),
          x => round(x.cast("double") * lit(1000000), 0).cast("double"))
        emb.groupBy("label")
          .agg(count(lit(1)).as("n_vecs"),
            graft.functions.VecAgg.vecSum(s, micros).as("sv"))
          .select(col("label"), col("n_vecs"),
            // stringified per the q_array_agg convention: the driver's
            // pandas comparator cannot sort raw array cells
            concat_ws(",",
              transform(col("sv"), x => x.cast("long").cast("string")))
              .as("sum_micros"))
      })
  )
}
