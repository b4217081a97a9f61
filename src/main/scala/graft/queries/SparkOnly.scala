package graft.queries

import graft.ext.{Dedup, IvfKMeans, Multimodal, ProductQuantize, Quantize, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Operators with no ANSI-SQL oracle (driver records a rows-only check):
  * learned-quantizer approximate nearest neighbor (centroids are
  * data-dependent, so no static oracle SQL can reproduce them) and the
  * xxhash64 SimHash scale variant (the md5-portable variant is
  * oracle-checked as q_simhash in [[Text]]). */
object SparkOnly {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_simhash_fast",
      None,
      (s, dir) => Dedup.simhash(Tables.load(s, dir, "documents"))),

    // IVF ANN with a LEARNED coarse quantizer: sample-trained KMeans cells
    // (driver-side Lloyd's on a TakeOrdered sample — the 100 TB design:
    // no cluster-wide training jobs), assignment as a broadcast map-side
    // expression pass, neighbor search only within the cell (one shuffle
    // on the cell id; candidate volume |cell|^2 instead of n^2).
    QueryDef(
      "q_ivf_kmeans",
      None,
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val centroids = IvfKMeans.trainCentroids(emb, k = 8)
        // persist: cell is an expression-derived join key; see
        // Similarity.multiProbeNN for why the barrier is load-bearing.
        // Lineage-cut the small top-1 result, then release the corpus-sized
        // cache — the query leaks neither blocks nor an unpersist
        // obligation to the next one.
        val assigned = IvfKMeans.assignCells(emb, centroids)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nn = graft.ext.Lineage.cut(Similarity.bucketedNN(assigned, "cell"))
        assigned.unpersist()
        nn
      }),

    // SQ8 quantized search + exact re-rank: 8-bit scalar-quantized corpus
    // (8x smaller resident vectors — the 100 TB memory budget), asymmetric
    // first-pass scoring via the graft_sq8_dot codegen kernel, exact
    // re-ranking only for the short candidate list. Quantizer params are
    // data-dependent -> rows-only check; recall pinned in QuantizeSpec.
    QueryDef(
      "q_sq8_rerank",
      None,
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val sq = Quantize.train(emb)
        Quantize.rerankTopK(emb, sq, col("vec_id") < 10, k = 5, rerank = 15)
      }),

    // Compression-ratio quality signal (deflate length / raw length) —
    // the classic corpus-filter heuristic: boilerplate compresses away,
    // high-entropy noise doesn't. Deterministic but engine-specific
    // (DuckDB has no deflate) -> rows-only; behavior pinned in unit tests.
    QueryDef(
      "q_compress_quality",
      None,
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        docs.select(
          col("doc_id"),
          octet_length(col("text")).cast("long").as("n_bytes"),
          round(graft.functions.CompressionRatio(s, col("text")), 6).as("compress_ratio"))
      }),

    // Product quantization + exact re-rank: m=8 subspace codebooks, 8 B
    // codes per vector (64x smaller — the coarser, further-compressed
    // sibling of q_sq8_rerank), ADC first pass via the graft_pq_dot
    // kernel, exact re-rank for the candidate list.
    QueryDef(
      "q_pq_rerank",
      None,
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val pq = ProductQuantize.train(emb)
        ProductQuantize.rerankTopK(emb, pq, col("vec_id") < 10, k = 5, rerank = 25)
      }),

    // Multi-probe IVF: each query probes its `nprobe` nearest cells, not
    // just its own — recovers recall lost at cell boundaries. Corpus side
    // stays single-cell (one shuffle on cell); the probe side explodes to
    // nprobe rows per query before the same cell-equi-join.
    QueryDef(
      "q_ivf_multiprobe",
      None,
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings").select("vec_id", "embedding")
        val centroids = IvfKMeans.trainCentroids(emb, k = 8)
        Similarity.multiProbeNN(emb, centroids, nprobe = 2, k = 3)
      })
  )
}
