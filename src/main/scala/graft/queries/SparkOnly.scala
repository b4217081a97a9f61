package graft.queries

import graft.ext.{Dedup, IvfKMeans, Multimodal, ProductQuantize, Quantize, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Operators that are (mostly) Spark-native with a weak or partial
  * ANSI-SQL oracle: Lloyd's-trained quantizers produce centroids static
  * SQL cannot reproduce, and the xxhash64 SimHash scale variant has no
  * portable hash (the md5-portable variant is oracle-checked as q_simhash
  * in [[Text]]). Two oracle tiers here:
  *  - q_sq8_rerank is FULLY oracle-checked — its quantizer is closed-form
  *    (per-dim min/max over a deterministic sample), so DuckDB rebuilds
  *    the whole encode/score/re-rank pipeline;
  *  - the learned-quantizer searches (q_pq/q_opq/q_ivfpq/q_ivfopq_rerank,
  *    q_ivf_index) run through [[Similarity.recallGate]]: the emitted
  *    rows carry the SQL-reproducible exact-top-k ranking plus an
  *    engine-measured aggregate-recall floor boolean, so the gate
  *    hash-checks the exact kernel AND catches any recall collapse —
  *    only the codebook values themselves stay SQL-inexpressible.
  * Every query here is gated — no rows-only rows remain: the learned-
  * assignment searches (q_ivf_kmeans / q_ivf_multiprobe / q_imi_nn) and
  * the engine-specific functions (q_simhash_fast / q_compress_quality)
  * all emit SQL-reproducible ground truth beside a self-validating
  * aggregate boolean. */
object SparkOnly {

  /** Oracle for the self-validating ANN recall gates
    * ([[Similarity.recallGate]]): the exact-top-5 ranking is fully
    * reproducible in SQL (so the hash checks the engine's exact kernel),
    * and `recall_ok` asserts the engine-measured aggregate recall floor —
    * a learned-quantizer regression flips it and fails the gate, which is
    * as much of the ANN pipeline as ANSI SQL can possibly pin (the
    * Lloyd's-trained codebooks themselves remain SQL-inexpressible). */
  private val annRecallOracle = """
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        s AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                     list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
              FROM n q, n c WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id),
        r AS (SELECT qid, cid,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
              FROM s)
        SELECT qid, string_agg(CAST(cid AS VARCHAR), ',' ORDER BY rn) AS exact_topk,
               true AS recall_ok
        FROM r WHERE rn <= 5 GROUP BY qid"""

  /** Aggregate recall@5 floor for the gates: measured recall across the
    * five exact-reranked ANN queries is 0.28-0.66 over sf0.001-sf0.1
    * (synthetic-random embeddings — the hardest case for quantizers, with
    * no cluster structure to exploit), while a broken quantizer scores
    * ~0 (random candidates almost never contain true top-5). 0.2 sits
    * below every measured value with >= 1.4x margin and far above noise. */
  private val RecallFloor = 0.2

  val defs: Seq[QueryDef] = Seq(

    // xxhash64 SimHash (the scale path — no portable hash, so the
    // signature VALUES can't cross the oracle; q_simhash pins the
    // md5-portable variant bit-for-bit). Self-validating gate instead:
    // emits the exact Jaccard>=0.7 pairs (SQL-reproducible ground truth)
    // plus an aggregate recall boolean over them — see
    // Dedup.simhashRecallGate for the measured calibration.
    QueryDef(
      "q_simhash_fast",
      Some(s"""
        WITH ${Text.shinglesCte},
        inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
                  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
        SELECT i.doc_a, i.doc_b, true AS recall_ok
        FROM inter i
        JOIN sz sa ON sa.doc_id = i.doc_a
        JOIN sz sb ON sb.doc_id = i.doc_b
        WHERE CAST(i.c AS DOUBLE) / (sa.n_sh + sb.n_sh - i.c) >= 0.7"""),
      (s, dir) => Dedup.simhashRecallGate(Tables.load(s, dir, "documents"))),

    // IVF ANN with a LEARNED coarse quantizer: sample-trained KMeans cells
    // (driver-side Lloyd's on a TakeOrdered sample — the 100 TB design:
    // no cluster-wide training jobs), assignment as a broadcast map-side
    // expression pass, neighbor search only within the cell (one shuffle
    // on the cell id; candidate volume |cell|^2 instead of n^2). The
    // self-search still runs over the FULL corpus (the structure under
    // test); the gate then checks its top-5 rows for the 10 probe
    // vectors against the SQL-reproducible exact top-5 with an aggregate
    // recall floor — closing the last no_oracle row. Floor calibration
    // (tools/KmeansRecall): single-probe within-cell recall@5 measured
    // 0.20-0.30 across sf0.001-0.1 (scaled-k cells on synthetic-random
    // embeddings — recall tightens as cells multiply), while a broken
    // assignment scores ~0.001 (chance); 0.08 sits >= 2.5x below every
    // measured value and ~80x above noise.
    QueryDef(
      "q_ivf_kmeans",
      Some(annRecallOracle),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        // cell count scales with the corpus (sqrt(n)) — fixed k turns
        // 10x data into 100x within-cell pairs; see IvfKMeans.scaledK
        val kCells = IvfKMeans.scaledK(emb.count())
        val centroids = IvfKMeans.trainCentroids(
          emb, kCells, sampleN = math.max(2048, 16 * kCells))
        // persist: cell is an expression-derived join key; see
        // Similarity.multiProbeNN for why the barrier is load-bearing.
        // Lineage-cut the small top-5 result, then release the corpus-sized
        // cache — the query leaks neither blocks nor an unpersist
        // obligation to the next one.
        val assigned = IvfKMeans.assignCells(emb, centroids)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nn = graft.ext.Lineage.cut(
          Similarity.bucketedNN(assigned, "cell", k = 5))
        assigned.unpersist()
        val ann = nn.select(col("vec_id").as("qid"), col("nn_id").as("cid"))
        Similarity.recallGate(emb, ann, col("vec_id") < 10, 5, floor = 0.08)
      }),

    // SQ8 quantized search + exact re-rank: 8-bit scalar-quantized corpus
    // (8x smaller resident vectors — the 100 TB memory budget), asymmetric
    // first-pass scoring via the graft_sq8_dot codegen kernel, exact
    // re-ranking only for the short candidate list. The quantizer is
    // DETERMINISTIC (per-dim min/max over the first 2048 vectors by
    // vec_id), so unlike the Lloyd's-trained IVF/PQ variants the full
    // pipeline is reproducible in ANSI SQL: the oracle rebuilds lo/step
    // from the same sample, re-encodes (same Math.round + clamp rules,
    // step==0 -> lo), scores the dequantized corpus, and re-ranks.
    QueryDef(
      "q_sq8_rerank",
      Some("""
        WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        samp AS (SELECT v FROM e ORDER BY vec_id LIMIT 2048),
        sx AS (SELECT unnest(v) AS x, generate_subscripts(v, 1) AS d FROM samp),
        q AS (SELECT d, min(x) AS lo, (max(x) - min(x)) / 255.0 AS step
              FROM sx GROUP BY d),
        cx AS (SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS d FROM e),
        dqd AS (SELECT cx.vec_id, cx.d,
                  CASE WHEN q.step = 0 THEN q.lo
                       ELSE q.lo + q.step *
                            least(255.0, greatest(0.0, round((cx.x - q.lo) / q.step)))
                  END AS y
                FROM cx JOIN q USING (d)),
        dqv AS (SELECT vec_id, list(y ORDER BY d) AS dq FROM dqd GROUP BY vec_id),
        c AS (SELECT vec_id, dq, sqrt(list_dot_product(dq, dq)) AS dqnrm FROM dqv),
        probes AS (SELECT vec_id AS qid, v AS qv, nrm AS qnrm FROM n WHERE vec_id < 10),
        ap AS (SELECT p.qid, c.vec_id AS cid, p.qv, p.qnrm,
                      list_dot_product(p.qv, c.dq) / (p.qnrm * c.dqnrm) AS acos
               FROM c, probes p WHERE c.vec_id <> p.qid),
        ar AS (SELECT qid, cid, qv, qnrm,
                      row_number() OVER (PARTITION BY qid ORDER BY acos DESC, cid) AS rn
               FROM ap),
        cand AS (SELECT qid, cid, qv, qnrm FROM ar WHERE rn <= 15),
        ex2 AS (SELECT cand.qid, cand.cid,
                       list_dot_product(cand.qv, n.v) / (cand.qnrm * n.nrm) AS cos
                FROM cand JOIN n ON n.vec_id = cand.cid),
        r AS (SELECT qid, cid, cos,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
              FROM ex2)
        SELECT qid, cid, round(cos, 6) AS sim FROM r WHERE rn <= 5"""),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val sq = Quantize.train(emb)
        Quantize.rerankTopK(emb, sq, col("vec_id") < 10, k = 5, rerank = 15)
      }),

    // Compression-ratio quality signal (deflate length / raw length) —
    // the classic corpus-filter heuristic: boilerplate compresses away,
    // high-entropy noise doesn't. The ratio VALUE is engine-specific
    // (DuckDB has no deflate), so the gate is self-validating instead of
    // rows-only: per doc it emits the SQL-reproducible byte length plus
    // two property booleans the real deflate must satisfy — the ratio
    // lands in (0, 1.1] (measured [0.37, 1.0] corpus-wide), and
    // compressing text||text at most 0.7x the single-copy ratio (the
    // window back-reference collapses the second copy: measured max
    // 0.57, while a deflate that missed the repetition would sit at
    // ~1.0x). A broken kernel flips a boolean and fails the hash.
    QueryDef(
      "q_compress_quality",
      Some("""
        SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
               true AS ratio_bounded, true AS doubling_ok
        FROM documents"""),
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val r = graft.functions.CompressionRatio(s, col("text"))
        val r2 = graft.functions.CompressionRatio(s, concat(col("text"), col("text")))
        docs.select(
          col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          (r > 0.0 && r <= 1.1).as("ratio_bounded"),
          // empty text deflates to ratio 1.0 on both sides by convention;
          // the doubling property only applies to non-empty payloads
          (octet_length(col("text")) === 0 || r2 <= r * 0.7).as("doubling_ok"))
      }),

    // Product quantization + exact re-rank: m=8 subspace codebooks, 8 B
    // codes per vector (64x smaller — the coarser, further-compressed
    // sibling of q_sq8_rerank), ADC first pass via the graft_pq_dot
    // kernel, exact re-rank for the candidate list.
    QueryDef(
      "q_pq_rerank",
      Some(annRecallOracle),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val pq = ProductQuantize.train(emb)
        val ann = ProductQuantize.rerankTopK(
          emb, pq, col("vec_id") < 10, k = 5, rerank = 25)
        Similarity.recallGate(emb, ann, col("vec_id") < 10, 5, RecallFloor)
      }),

    // OPQ: learned orthogonal rotation before PQ, decorrelating subspaces
    // so the same 8 B codes quantize tighter (parametric eigenbasis init +
    // alternating Procrustes refinement; 28% lower quantization error than
    // plain PQ on this corpus). Rotation is one map-side graft_matvec
    // kernel pass; the rest is the PQ-ADC + exact-re-rank plan above.
    // Rows-only (Lloyd's codebooks); invariants pinned in OpqSpec.
    QueryDef(
      "q_opq_rerank",
      Some(annRecallOracle),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val opq = graft.ext.Opq.trainRefined(emb, iters = 3)
        val ann = graft.ext.Opq.rerankTopK(
          emb, opq, col("vec_id") < 10, k = 5, rerank = 25)
        Similarity.recallGate(emb, ann, col("vec_id") < 10, 5, RecallFloor)
      }),

    // IVF x PQ (IVFADC): cells partition the corpus AND absorb each
    // vector's coarse component, so the 8 B PQ code only carries the
    // residual — tighter reconstruction at the same compression, searched
    // cell-locally with ADC + exact re-rank. The canonical billion-scale
    // ANN layout. Rows-only (two Lloyd's stages); invariants in IvfPqSpec.
    QueryDef(
      "q_ivfpq_rerank",
      Some(annRecallOracle),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val model = graft.ext.IvfPq.train(emb, kCells = IvfKMeans.scaledK(emb.count()))
        val ann = graft.ext.IvfPq.search(
          emb, model, col("vec_id") < 10, nprobe = 4, k = 5, rerank = 25)
        Similarity.recallGate(emb, ann, col("vec_id") < 10, 5, RecallFloor)
      }),

    // IVF x OPQ-rotated residual PQ: the full IVFADC+OPQ stack — the
    // rotation is trained (alternating refinement) on RESIDUALS, where the
    // variance actually is after the coarse quantizer absorbs the cell
    // component. ADC rotates only the probe ((Rq).y_hat identity), so
    // per-corpus-row cost equals plain IVFADC. Rows-only; reconstruction
    // improvement + recall pinned in IvfOpqSpec.
    QueryDef(
      "q_ivfopq_rerank",
      Some(annRecallOracle),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val model = graft.ext.IvfOpq.train(emb, kCells = IvfKMeans.scaledK(emb.count()))
        val ann = graft.ext.IvfOpq.search(
          emb, model, col("vec_id") < 10, nprobe = 4, k = 5, rerank = 25)
        Similarity.recallGate(emb, ann, col("vec_id") < 10, 5, RecallFloor)
      }),

    // Persisted ANN index: IVFADC codes written ONCE as cell-partitioned
    // parquet; the search turns probed cells into a partition-pruning
    // IN-predicate so the scan touches only probed cell directories — the
    // at-rest layout a 100 TB deployment uses (encode once, not per
    // query). Search-from-index == in-memory search (IvfIndexSpec), so
    // rows-only here like the other learned-quantizer queries.
    QueryDef(
      "q_ivf_index",
      Some(annRecallOracle),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val model = graft.ext.IvfPq.train(emb, kCells = IvfKMeans.scaledK(emb.count()))
        val path = s.conf.get("spark.sql.warehouse.dir") + "/graft_ivf_index"
        graft.ext.IvfIndex.build(emb, model, path)
        val ann = graft.ext.IvfIndex.search(
          emb, path, col("vec_id") < 10, nprobe = 4, k = 5, rerank = 25)
        Similarity.recallGate(emb, ann, col("vec_id") < 10, 5, RecallFloor)
      }),

    // Inverted multi-index (IMI): per-half codebooks give k^2 effective
    // cells from 2k driver-trainable centroids — the continuation past
    // flat IVF's sqrt(n) cell cap (16M cells from k=4096 per half at
    // billion-vector scale). Grid-probed (perHalf^2 cells), same
    // cell-equi-join shape. The corpus side still indexes EVERY vector
    // (the structure under test); the probe side is the gate's 10 probes,
    // wrapped in the same recall gate as the other learned-quantizer
    // searches (the all-probes self-search shape stays covered by the
    // exact q_ivf_nn baseline and q_ivf_kmeans).
    QueryDef(
      "q_imi_nn",
      Some(annRecallOracle),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val model = graft.ext.Imi.train(emb, k = graft.ext.Imi.scaledK(emb.count()))
        val ann = graft.ext.Imi.nn(
            emb, model, perHalf = 3, k = 5, probeFilter = col("vec_id") < 10)
          .withColumnRenamed("nn_id", "cid")
        Similarity.recallGate(emb, ann, col("vec_id") < 10, 5, RecallFloor)
      }),

    // Hierarchical two-level IVF: k1 top cells each owning k2 sub-cells
    // trained on their own sample residents — k1·k2 effective cells from
    // bounded per-cell driver training, the continuation past flat
    // Lloyd's cell cap (the other classic route besides the IMI's
    // product structure; unlike the IMI the sub-codebooks are
    // resident-conditioned). Probes take the nprobeSub closest subs in
    // each of the nprobeTop closest top cells. Recall-gated like the
    // other learned-cell searches; measured recall@5 0.32-0.64 across
    // sf0.001-0.1 (tools/KmeansRecall) — >= 1.6x above the 0.2 floor.
    QueryDef(
      "q_hier_nn",
      Some(annRecallOracle),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val (k1, k2) = graft.ext.HierIvf.scaledKs(emb.count())
        val model = graft.ext.HierIvf.train(emb, k1, k2)
        val ann = graft.ext.HierIvf.nn(
            emb, model, k = 5, probeFilter = col("vec_id") < 10)
          .withColumnRenamed("nn_id", "cid")
        Similarity.recallGate(emb, ann, col("vec_id") < 10, 5, RecallFloor)
      }),

    // Multi-probe IVF: each query probes its `nprobe` nearest cells, not
    // just its own — recovers recall lost at cell boundaries. Corpus side
    // stays single-cell (one shuffle on cell); the probe side explodes to
    // nprobe rows per probe before the same cell-equi-join. Recall-gated
    // like q_imi_nn above.
    QueryDef(
      "q_ivf_multiprobe",
      Some(annRecallOracle),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val kCells = IvfKMeans.scaledK(emb.count())
        val centroids = IvfKMeans.trainCentroids(
          emb, kCells, sampleN = math.max(2048, 16 * kCells))
        val ann = Similarity.multiProbeNN(
            emb, centroids, nprobe = 4, k = 5, probeFilter = col("vec_id") < 10)
          .withColumnRenamed("nn_id", "cid")
        Similarity.recallGate(emb, ann, col("vec_id") < 10, 5, RecallFloor)
      }),

    // ---- FILTERED ANN: top-k under a metadata predicate -------------------
    // Search only candidates with label IN (0,1,2) (~29% of the corpus)
    // while the probes and the trained cells stay corpus-wide — the
    // shared-index / per-query-predicate scenario. Exact filtered top-5 is
    // SQL-reproduced (hash-pinning the kernel + predicate semantics); the
    // engine's multi-probe filtered recall is floor-gated like its
    // unfiltered siblings.
    QueryDef(
      "q_ivf_filtered",
      Some("""
        WITH e AS (SELECT vec_id, label,
                     list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                   FROM embeddings),
        n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        s AS (SELECT q.vec_id AS qid, c.vec_id AS cid,
                     list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
              FROM n q, n c
              WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
                AND c.label IN (0, 1, 2)),
        r AS (SELECT qid, cid,
                     row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rn
              FROM s)
        SELECT qid, string_agg(CAST(cid AS VARCHAR), ',' ORDER BY rn) AS exact_topk,
               true AS recall_ok
        FROM r WHERE rn <= 5 GROUP BY qid"""),
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val pred = col("label").isin(0, 1, 2)
        val kCells = IvfKMeans.scaledK(emb.count())
        val centroids = IvfKMeans.trainCentroids(
          emb, kCells, sampleN = math.max(2048, 16 * kCells))
        val ann = Similarity.multiProbeNN(
            emb, centroids, nprobe = 4, k = 5,
            probeFilter = col("vec_id") < 10, candFilter = pred)
          .withColumnRenamed("nn_id", "cid")
        Similarity.recallGate(
          emb, ann, col("vec_id") < 10, 5, RecallFloor, candFilter = pred)
      })
  )
}
