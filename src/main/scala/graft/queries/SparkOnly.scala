package graft.queries

import graft.ext.{Dedup, Multimodal, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Operators with no ANSI-SQL oracle (driver records a rows-only check):
  * SimHash near-dup signatures, the multimodal feature-extraction plumbing
  * (stub decoder — see [[graft.ext.Multimodal.decodeStub]]), and
  * KMeans-bucketed approximate nearest neighbor. */
object SparkOnly {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_simhash",
      None,
      (s, dir) => Dedup.simhash(Tables.load(s, dir, "documents"))),

    QueryDef(
      "q_mm_features",
      None,
      (s, dir) => Multimodal.extractFeatures(
        Multimodal.documentsAsMedia(Tables.load(s, dir, "documents")))),

    // IVF ANN with a LEARNED coarse quantizer: seeded KMeans assigns each
    // vector to a centroid cell; neighbor search runs only within the
    // cell (one shuffle on the cell id). The 100 TB path: centroids train
    // on a sample, assignment is a broadcast map-side pass, candidate
    // volume is |cell|^2 instead of n^2. Deterministic via fixed seed,
    // but KMeans is not ANSI-expressible -> rows-only check.
    QueryDef(
      "q_ivf_kmeans",
      None,
      (s, dir) => {
        import org.apache.spark.ml.clustering.KMeans
        import org.apache.spark.ml.functions.array_to_vector
        val emb = Tables.load(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        val withVec = emb.withColumn("features", array_to_vector(col("v")))
        val model = new KMeans().setK(8).setSeed(42L).setMaxIter(5).fit(withVec)
        val assigned = model.transform(withVec)
          .select(col("vec_id"), col("v").as("embedding"), col("prediction").as("cell"))
        // reuse the bucketed-NN operator with the learned cell as bucket
        Similarity.bucketedNN(
          assigned.select(col("vec_id"), col("embedding"), col("cell")), "cell")
      })
  )
}
