package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators for corpus curation (SURVEY.md §2.9
  * extension surface). The motivating use is link-graph authority for
  * crawl-quality weighting (a PageRank-family score per domain is a
  * standard crawl-filtering signal alongside text quality), but the
  * operator is generic over any (src, dst) edge frame.
  */
object GraphOps {

  /** PageRank over an edge list, in exact integer micro-units — the
    * canonical ITERATIVE JOIN workload (contrast [[TextOps.bpeMergeLoop]]'s
    * iterative aggregation): each iteration joins the rank frame to the
    * edges on src, aggregates contributions by dst, and rebases.
    *
    * Arithmetic is integer throughout so an independent engine replays
    * it bit-for-bit: ranks start at `unit` per node; each iteration a
    * node's share is `rank div outdeg` per out-edge (multi-edges count
    * multiply), and the new rank is
    * `(unit * (dampDen - dampNum)) div dampDen
    *  + (dampNum * Σ inbound shares) div dampDen`.
    * Truncating division loses mass (as does the standard dangling-node
    * simplification — nodes without out-edges leak their rank), which is
    * fine for a RANKING signal and is exactly mirrored by the oracle.
    *
    * Scale shape: `outdeg` is computed once; each iteration costs one
    * equi-join of edges to the rank frame on src plus one aggregation on
    * dst — both shuffles on graph keys, the plan Spark runs PageRank
    * with at any scale. The rank frame is |nodes| rows (≪ |edges| for a
    * domain graph), so AQE broadcasts it under the threshold and the
    * per-iteration cost degenerates to one map-side join + one agg;
    * ranks re-persist per iteration so iteration i never replays
    * iterations 1..i-1. The edge/node caches (the corpus-scale memory)
    * are unpersisted before returning; the returned frame itself stays
    * cached — it is |nodes| rows, already materialized, and unpersisting
    * it would make every downstream action replay the whole loop against
    * uncached inputs. Callers that are done with it can `unpersist()`.
    * Input: (src, dst) strings. Output: (domain, rank_micro), one row
    * per distinct node. */
  def pageRank(
      edges: DataFrame, iters: Int = 3, unit: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col("src"), col("dst")).persist(lvl)
    val nodes = e.select(col("src").as("d"))
      .union(e.select(col("dst").as("d")))
      .distinct().persist(lvl)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val base = (unit * (dampDen - dampNum)) / dampDen
    var ranks = nodes.select(col("d"), lit(unit).as("r"))
    var prevCached: Option[DataFrame] = None
    var i = 0
    while (i < iters) {
      val contrib = e
        .join(deg, "src")
        .join(ranks.select(col("d").as("src"), col("r")), "src")
        .select(col("dst").as("d"), expr("r div outdeg").as("share"))
        .groupBy("d").agg(sum("share").as("s"))
      val next = nodes.join(contrib, Seq("d"), "left")
        .select(col("d"),
          (lit(base) +
            expr(s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen"))
            .as("r"))
        .persist(lvl)
      next.count()
      prevCached.foreach(_.unpersist())
      prevCached = Some(next)
      ranks = next
      i += 1
    }
    // the final rank frame is materialized in cache, so the corpus-scale
    // edge/node frames can be dropped before handing the result back
    e.unpersist()
    nodes.unpersist()
    ranks.select(col("d").as("domain"), col("r").as("rank_micro"))
  }
}
