package graft

import graft.ext.{Dedup, IvfKMeans, Similarity}
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for the third-wave operators: portable SimHash parity
  * properties, multi-probe IVF vs single-cell NN, and the time-range join. */
class AdvancedSpec extends AnyFunSuite with SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("portable (md5) simhash separates near-dups from random pairs like the xxhash64 one") {
    val docs = Tables.load(spark, sfDir, "documents")
    val sims = Dedup.simhashPortable(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val nearDupPairs = Dedup.jaccardNearDup(docs, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDupPairs.nonEmpty)
    assert(nearDupPairs.forall { case (a, b) => hamming(sims(a), sims(b)) <= 12 })
    val ids = sims.keys.toArray.sorted.take(40)
    val nearSet = nearDupPairs.toSet
    val randomDists = for {
      a <- ids; b <- ids if a < b && !nearSet.contains((a, b))
    } yield hamming(sims(a), sims(b))
    assert(randomDists.sum.toDouble / randomDists.length > 20.0)
  }

  test("identical documents get identical portable simhash") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different content about spark engines and parquet"))
      .toDF("doc_id", "text")
    val sig = Dedup.simhashPortable(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) === sig(2L))
    assert(sig(1L) !== sig(3L))
  }

  test("multiProbeNN with nprobe=1, k=1 equals bucketedNN over the same learned cells") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val centroids = IvfKMeans.trainCentroids(emb, k = 4)
    val assigned = IvfKMeans.assignCells(emb, centroids).persist()
    val viaBucket = Similarity.bucketedNN(assigned, "cell")
      .select("vec_id", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaProbe = Similarity.multiProbeNN(emb, centroids, nprobe = 1, k = 1)
      .select("qid", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assigned.unpersist()
    assert(viaProbe === viaBucket)
  }

  test("filtered ANN: candFilter excludes out-of-predicate vectors even " +
      "when one is the global nearest neighbor") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sfDir, "embeddings")
    val pred = col("label").isin(0, 1, 2)
    val centroids = IvfKMeans.trainCentroids(
      emb.select("vec_id", "embedding"), k = 4)
    // probe ALL cells: the filtered result is then EXACTLY the filtered
    // brute-force top-k — predicate semantics pinned with zero recall slack
    val filtered = Similarity.multiProbeNN(emb, centroids, nprobe = 4, k = 3,
        probeFilter = col("vec_id") < 5, candFilter = pred)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // filtered brute-force reference, computed locally (sf0.001 corpus)
    def vecs(df: org.apache.spark.sql.DataFrame) = df
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    def cos(a: Array[Double], b: Array[Double]) = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cands = vecs(emb.where(pred))
    val exact = vecs(emb.where(col("vec_id") < 5)).flatMap { case (qid, qv) =>
      cands.filter(_._1 != qid)
        .map { case (cid, cv) => (cid, cos(qv, cv)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(3)
        .map { case (cid, _) => (qid, cid) }
    }.toSet
    val allowed = cands.map(_._1).toSet
    assert(filtered === exact)
    assert(filtered.forall { case (_, cid) => allowed.contains(cid) })
    // the unfiltered global top-1 of at least one probe is outside the
    // predicate on this corpus (sanity that the test bites)
    val global = Similarity.cosineTopK(emb, col("vec_id") < 5, 1)
      .collect().map(_.getLong(1)).toSet
    assert(global.exists(cid => !allowed.contains(cid)))
  }

  test("multi-probe recall: nprobe=2 finds neighbors at least as close as nprobe=1") {
    val emb = Tables.load(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val centroids = IvfKMeans.trainCentroids(emb, k = 4)
    def best(nprobe: Int) = Similarity.multiProbeNN(emb, centroids, nprobe, k = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val one = best(1)
    val two = best(2)
    assert(two.keySet.size >= one.keySet.size) // more cells -> never fewer answered probes
    one.foreach { case (q, sim1) => assert(two(q) >= sim1 - 1e-9, s"probe $q lost recall") }
  }

  test("minhashNearDupAgainst == self-join near-dup restricted to cross " +
      "pairs (incremental == from-scratch on the split)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.where(col("doc_id") % 2 === 1)
    val incr = graft.ext.Dedup.minhashNearDupAgainst(corpus, batch, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = graft.ext.Dedup.minhashNearDup(docs, 0.7)
      .collect().flatMap { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        // self-join emits doc_a < doc_b; keep (batch=odd, corpus=even)
        if (a % 2 == 1 && b % 2 == 0) Some((a, b) -> j)
        else if (b % 2 == 1 && a % 2 == 0) Some((b, a) -> j)
        else None
      }.toMap
    assert(incr.keySet == full.keySet)
    incr.foreach { case (k, j) => assert(math.abs(j - full(k)) < 1e-12) }
  }

  test("duplicateClusters equals a reference union-find on random pair graphs") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rng = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      val nDocs = 60
      val nPairs = 10 + rng.nextInt(25)
      // random "near-dup pair" graph, including chains and larger comps
      val pairs = Seq.fill(nPairs) {
        val a = rng.nextInt(nDocs).toLong
        val b = rng.nextInt(nDocs).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct

      // reference: classic union-find with min-root relabeling
      val parent = Array.tabulate(nDocs)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until nDocs).map(i => i.toLong -> find(i).toLong).toMap

      // operator under test, with the pair generation stubbed to the same
      // random pairs (jaccard itself is oracle-pinned elsewhere)
      val docs = (0 until nDocs).map(_.toLong).toDF("doc_id")
      val pairsDf = pairs.toDF("doc_a", "doc_b")
      // driver fast path (default) AND the distributed min-label fixpoint
      // (forced with driverLimit = 0) must both match the reference
      val got = graft.ext.Dedup.resolveClusters(docs, pairsDf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial pairs=$pairs")
      val gotDistributed = graft.ext.Dedup
        .resolveClusters(docs, pairsDf, driverLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDistributed === expected, s"trial $trial (distributed path)")
      // keep flag: true exactly for cluster roots
      val keeps = graft.ext.Dedup.resolveClusters(docs, pairsDf)
        .where(col("keep")).collect().map(_.getLong(0)).toSet
      assert(keeps === expected.values.toSet, s"trial $trial")
    }
  }

  test("approx aggregates stay within error bounds of the exact answers") {
    // The error-bound comparison now lives IN the query (self-validating
    // gate): it emits the exact answers plus booleans asserting the HLL
    // and quantile sketches landed within tolerance. Here: every boolean
    // true, and the exact columns match an independent exact aggregation.
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val events = graft.sources.Tables.events(spark, sfDir)
    val gate = graft.queries.Registry.queries("q_approx_agg")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getBoolean(4))).toMap
    val exact = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gate.keySet === exact.keySet)
    exact.foreach { case (et, (n, users)) =>
      val (gn, gu, usersOk, medianOk) = gate(et)
      assert(gn === n && gu === users, s"$et: exact columns diverge")
      assert(usersOk, s"$et: HLL outside 10% of exact distinct count")
      assert(medianOk, s"$et: quantile sketch outside 5% of exact median")
    }
  }

  test("resolveClusters on an EMPTY pair set yields all-singleton clusters") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = (0L until 7L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = graft.ext.Dedup.resolveClusters(docs, noPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length === 7)
    got.foreach { case (id, root, keep) =>
      assert(root === id && keep, s"doc $id should be its own singleton root")
    }
    // and the keep filter returns everything
    assert(graft.ext.Dedup.resolveClusters(docs, noPairs)
      .where(col("keep")).count() === 7)
  }

  test("compression-ratio quality signal orders texts by entropy") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(7)
    val docs = Seq(
      (1L, "spam spam spam " * 50),                                     // boilerplate
      (2L, "The quick brown fox jumps over the lazy dog. " +
        "A different sentence with varied vocabulary follows here."),   // prose
      (3L, Seq.fill(600)(rng.nextPrintableChar()).mkString))            // noise
      .toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
      graft.functions.CompressionRatio(spark, col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) < 0.1, s"boilerplate ratio ${got(1L)}")
    assert(got(2L) > got(1L) && got(2L) < got(3L), got.toString)
    assert(got(3L) > 0.7, s"noise ratio ${got(3L)}")
    // deterministic + matches a direct call
    val direct = graft.functions.CompressionRatio.ratio(
      ("spam spam spam " * 50).getBytes("UTF-8"))
    assert(got(1L) === direct)
  }

  test("time-range join counts exactly the events inside the window") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = Seq(
      (1L, ts("10:00"), 7L, "error", 1.0),    // inside (10:30 - 1h, 10:30]
      (2L, ts("10:30"), 7L, "purchase", 0.0), // the probe
      (3L, ts("09:30"), 7L, "error", 2.0),    // boundary: exactly -1h -> excluded (strict >)
      (4L, ts("10:30"), 7L, "error", 4.0),    // boundary: exactly at purchase -> included
      (5L, ts("11:00"), 7L, "error", 8.0),    // after -> excluded
      (6L, ts("10:15"), 9L, "error", 16.0))   // other user -> excluded
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
    val e = ev.where(col("event_type") === "error")
      .select(col("user_id").as("__u"), col("ts").as("ets"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
    val got = p.join(e,
        col("user_id") === col("__u") &&
          col("ets") > col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
          col("ets") <= col("purchase_ts"), "left")
      .groupBy("purchase_id").agg(count(col("ets")).as("n"), sum(col("cents")).as("c"))
      .collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 2L)   // events 1 and 4
    assert(got.head.getLong(2) === 500L) // 100 + 400 cents
  }
}
