package graft

import graft.ext.GraphOps
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite with SparkSpec {

  test("pageRank: two hand-computed integer iterations on a 3-cycle") {
    import spark.implicits._
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    // unit 1e6, damp 85/100, base 150000.
    // iter1 shares: a gives 500000 per edge, b 1000000, c 1000000
    //   r1: a = 150000 + 850000 = 1000000
    //       b = 150000 + 425000 = 575000
    //       c = 150000 + (85 * 1500000) div 100 = 1425000
    // iter2 shares: a 500000, b 575000, c 1425000
    //   r2: a = 150000 + (85 * 1425000) div 100 = 1361250
    //       b = 150000 + 425000 = 575000
    //       c = 150000 + (85 * (500000 + 575000)) div 100 = 1063750
    val got = GraphOps.pageRank(edges, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 1361250L, "b" -> 575000L, "c" -> 1063750L))
  }

  test("pageRank: dangling nodes leak mass, every rank keeps the base, " +
      "multi-edges count multiply") {
    import spark.implicits._
    // d has no out-edges (dangling); a->b twice (multi-edge)
    val edges = Seq(
      ("a", "b"), ("a", "b"), ("b", "d")).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, iters = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set("a", "b", "d"))
    // base floor: a never receives, so it sits exactly at base
    assert(r("a") === 150000L)
    // multi-edge: b receives BOTH of a's shares —
    // 150000 + (85 * 2 * (150000 div 2)) div 100 = 277500
    assert(r("b") === 277500L)
    // dangling d soaks b's whole prior rank (277500) and leaks it:
    // 150000 + (85 * 277500) div 100 = 385875
    assert(r("d") === 385875L)
    // dangling leak: total mass strictly below the lossless 3 * unit
    assert(r.values.sum < 3000000L)
  }
}
