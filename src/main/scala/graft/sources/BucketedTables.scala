package graft.sources

import graft.core.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-call setup for the ZERO-EXCHANGE as-of layout: persist both join
  * sides as bucketed + sorted tables (`bucketBy(key).sortBy(key, time)`),
  * and every subsequent [[graft.ops.AsOfJoin.asofMerge]] between them
  * reads straight off disk with NO Exchange and NO Sort — bucketing
  * satisfies the merge join's distribution requirement and the sort order
  * its ordering requirement (proven in AsOfMergeSpec's bucketed tests).
  * This is the at-rest layout a 100 TB pipeline maintains for tables that
  * are probed repeatedly: pay the shuffle once at write time, never at
  * query time.
  *
  * Versioned tables round-trip their (key, time, values) metadata through
  * table properties, so a reader needs only the table name. */
object BucketedTables {

  /** Persist `df` bucketed on `key` and sorted by (key, time) — the
    * layout [[graft.plans.AsOfMergeJoinExec]] consumes exchange-free.
    * `buckets` must match on both sides of a join to co-locate. */
  def saveForAsOf(
      df: DataFrame, table: String, key: String, time: String,
      buckets: Int = 32): Unit =
    df.write.bucketBy(buckets, key).sortBy(key, time)
      .mode("overwrite").saveAsTable(table)

  /** [[saveForAsOf]] for a [[VersionedTable]], recording its column roles
    * in table properties for [[loadVersioned]]. */
  def saveVersioned(
      vt: VersionedTable, table: String, buckets: Int = 32): Unit = {
    saveForAsOf(vt.df, table, vt.keyCol, vt.timeCol, buckets)
    vt.df.sparkSession.sql(
      s"ALTER TABLE $table SET TBLPROPERTIES(" +
        s"'graft.key'='${vt.keyCol}'," +
        s"'graft.time'='${vt.timeCol}'," +
        s"'graft.values'='${vt.valueCols.mkString(",")}')")
  }

  /** Rehydrate a [[VersionedTable]] saved by [[saveVersioned]] — bucket
    * layout and column roles both come from the catalog. */
  def loadVersioned(spark: SparkSession, table: String): VersionedTable = {
    val props = spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    VersionedTable(
      spark.table(table), props("graft.key"), props("graft.time"),
      props("graft.values").split(",").toIndexedSeq)
  }
}
