package graft.tools

import graft.ext.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Algorithm-independent small-scale gate for the cluster-resolution
  * queries: the q_dup_clusters / q_dedup_keep_best REGISTRY oracles
  * replay the operator's own (3,3) LSH banding in DuckDB (deliberate —
  * exact-vs-LSH pair sets legitimately diverge at x10's S-curve
  * boundary, see the round-14 note in queries/Text.scala), which means
  * the driver gate no longer catches a conceptual banding error
  * reproduced in both formulations. This tool restores the independent
  * check where it is cheap and exact == LSH (sf0.01 / sf0.1, where
  * MinhashCheck reads zero missed/extra pairs): it derives the expected
  * clustering from EXACT all-pairs Jaccard ([[Dedup.jaccardNearDup]],
  * shingle-inverted-index, no banding) closed by a from-scratch
  * union-find here — sharing neither candidate generation nor component
  * resolution with the operator — and asserts both
  * [[Dedup.duplicateClusters]] (cluster_root + keep) and
  * [[Dedup.keepBestPerCluster]] (root + score + keep) match it exactly.
  *
  * usage: ClusterExactCheck <sfDir...>   (exits 1 on any mismatch —
  * at these scales exact and LSH agree, so divergence is a defect) */
object ClusterExactCheck {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: ClusterExactCheck <sfDir...>")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = 0

    args.foreach { dir =>
      val docs = Tables.load(spark, dir, "documents")

      // ---- independent expected clustering: exact pairs + union-find ----
      val pairs = Dedup.jaccardNearDup(docs, 0.7)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val ids = docs.select("doc_id").collect().map(_.getLong(0))
      val parent = scala.collection.mutable.Map[Long, Long](
        ids.map(i => i -> i).toSeq: _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // root label = min doc_id in the component (find already unions
      // larger roots under smaller, so find IS the min label)
      val expectedRoot: Map[Long, Long] = ids.map(i => i -> find(i)).toMap

      // ---- gate 1: duplicateClusters roots + keep flags ----
      val got = Dedup.duplicateClusters(docs, 0.7)
        .select("doc_id", "cluster_root", "keep").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
      val badClusters = ids.filter { i =>
        val want = (expectedRoot(i), expectedRoot(i) == i)
        got.get(i) != Some(want)
      }
      val c1 = if (badClusters.isEmpty && got.size == ids.length) "OK" else "FAIL"
      println(s"[clusterexact] $dir duplicateClusters: docs=${ids.length} " +
        s"exact_pairs=${pairs.length} mismatched=${badClusters.length} $c1")
      badClusters.take(10).foreach(i => println(
        s"[clusterexact]   doc $i: got ${got.get(i)} want " +
          s"(${expectedRoot(i)}, ${expectedRoot(i) == i})"))
      if (c1 != "OK") failed += 1

      // ---- gate 2: keepBestPerCluster (root, score, keep) ----
      // score definition (alpha-num char count, ties to smaller id) is
      // the operator's documented contract; recomputed here from the
      // raw text rather than taken from the operator's output
      val scores: Map[Long, Long] = docs.select(
          col("doc_id"),
          length(regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
            .cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expectedKeep: Map[Long, Boolean] = ids.groupBy(expectedRoot)
        .flatMap { case (_, members) =>
          val best = members.minBy(i => (-scores(i), i))
          members.map(i => i -> (i == best))
        }
      val gotKb = Dedup.keepBestPerCluster(docs, 0.7)
        .select("doc_id", "cluster_root", "score", "keep").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .toMap
      val badKb = ids.filter { i =>
        gotKb.get(i) != Some((expectedRoot(i), scores(i), expectedKeep(i)))
      }
      val c2 = if (badKb.isEmpty && gotKb.size == ids.length) "OK" else "FAIL"
      println(s"[clusterexact] $dir keepBestPerCluster: " +
        s"mismatched=${badKb.length} $c2")
      badKb.take(10).foreach(i => println(
        s"[clusterexact]   doc $i: got ${gotKb.get(i)} want " +
          s"(${expectedRoot(i)}, ${scores(i)}, ${expectedKeep(i)})"))
      if (c2 != "OK") failed += 1
    }
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
