package graft.queries

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.2-2.4, §2.8) over the TPC-H-ish
  * tables: projection/filter/scalar exprs, grouped aggregation, joins
  * (broadcast + shuffle), window top-k, sort/limit, set ops, semi/anti. */
object Relational {

  /** Exact money sum: per-row scaled to integer cents (deterministic per-row
    * IEEE product + round), summed as BIGINT — order-independent, so Spark
    * and DuckDB agree bit-for-bit regardless of partial-aggregation order. */
  private def cents(e: String, scale: Int = 100): Column =
    sum(expr(s"cast(round(($e) * $scale) as bigint)"))

  val defs: Seq[QueryDef] = Seq(

    // ---- grouped aggregation (A1/A2 batch form; TPC-H Q1 shape) ----------
    QueryDef(
      "q_pricing",
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""),
      (s, dir) => Tables.load(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          (cents("l_quantity").cast("double") / lit(100)).as("sum_qty"),
          (cents("l_extendedprice").cast("double") / lit(100)).as("sum_base_price"),
          (cents("l_extendedprice * (1 - l_discount)", 10000).cast("double") / lit(10000)).as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // ---- join + agg + deterministic top-k (broadcast dimension) ----------
    QueryDef(
      "q_top_customers",
      Some("""
        SELECT c.c_custkey, c.c_name,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
               count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY total_cents DESC, c.c_custkey
        LIMIT 10"""),
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        // orders is the big side at scale; customer joins broadcast.
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(
            cents("o_totalprice").cast("bigint").as("total_cents"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("total_cents").desc, col("c_custkey"))
          .limit(10)
      }),

    // ---- multi-way join through small dims (broadcast chain) -------------
    QueryDef(
      "q_nation_revenue",
      Some("""
        SELECT r.r_name, n.n_name,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name"""),
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val c = Tables.load(s, dir, "customer")
        val n = Tables.load(s, dir, "nation")
        val r = Tables.load(s, dir, "region")
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            cents("o_totalprice").cast("bigint").as("revenue_cents"),
            count(lit(1)).as("n_orders"))
      }),

    // ---- filter + projection + NULLIF (P4) + interval arithmetic (P5) ----
    QueryDef(
      "q_filter_expr",
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity,
               nullif(l_returnflag, 'N') AS flag,
               l_shipdate + INTERVAL 90 DAY AS due
        FROM lineitem
        WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 10"""),
      (s, dir) => Tables.load(s, dir, "lineitem")
        .where(col("l_discount") >= 0.05 && col("l_discount") <= 0.07 && col("l_quantity") < 10)
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          nullif(col("l_returnflag"), lit("N")).as("flag"),
          expr("l_shipdate + INTERVAL 90 DAY").as("due"))),

    // ---- window function top-k per group (SURVEY §2.8 extension) ---------
    QueryDef(
      "q_window_rank",
      Some("""
        SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
        FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY o_orderpriority
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rn
              FROM orders)
        WHERE rn <= 3"""),
      (s, dir) => Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_orderpriority"))
            .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
        .where(col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")),

    // ---- set operations: EXCEPT ------------------------------------------
    QueryDef(
      "q_setops",
      Some("""
        SELECT DISTINCT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        WHERE s_acctbal > 8000"""),
      (s, dir) => Tables.load(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey")).distinct()
        .except(Tables.load(s, dir, "supplier")
          .where(col("s_acctbal") > 8000)
          .select(col("s_nationkey").as("nationkey")).distinct())),

    // ---- set operations: UNION + INTERSECT -------------------------------
    QueryDef(
      "q_union_intersect",
      Some("""
        SELECT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          UNION
          SELECT s_nationkey AS nationkey FROM supplier)
        INTERSECT
        SELECT n_nationkey AS nationkey FROM nation WHERE n_regionkey <> 0"""),
      (s, dir) => Tables.load(s, dir, "customer")
        .select(col("c_nationkey").as("nationkey"))
        .union(Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct()
        .intersect(Tables.load(s, dir, "nation")
          .where(col("n_regionkey") =!= 0)
          .select(col("n_nationkey").as("nationkey")))),

    // ---- anti join (NOT EXISTS) ------------------------------------------
    QueryDef(
      "q_anti_join",
      Some("""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')"""),
      (s, dir) => {
        val c = Tables.load(s, dir, "customer")
        val o = Tables.load(s, dir, "orders")
          .where(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
      }),

    // ---- semi join (EXISTS) ----------------------------------------------
    QueryDef(
      "q_semi_join",
      Some("""
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
                      AND l.l_quantity >= 49)"""),
      (s, dir) => {
        val sup = Tables.load(s, dir, "supplier")
        val l = Tables.load(s, dir, "lineitem").where(col("l_quantity") >= 49)
        sup.join(l, sup("s_suppkey") === l("l_suppkey"), "left_semi")
          .select("s_suppkey", "s_name")
      })
  )
}
