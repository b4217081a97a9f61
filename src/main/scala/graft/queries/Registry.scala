package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation and (when ANSI-expressible)
  * the DuckDB oracle SQL the driver replays over the same parquet tables.
  *
  * Parity rules (driver hash-compares values after sorting columns by name):
  *   - column names identical on both sides;
  *   - column TYPES identical (DuckDB sum(int)→HUGEINT must be cast to
  *     BIGINT; Spark size()→INT is cast to LONG);
  *   - money/value sums use exact integer arithmetic ("cents" trick:
  *     sum(cast(round(x*100) as bigint))) so results are independent of
  *     summation order — double sums would differ between engines;
  *   - remaining double math keeps the identical operation order on both
  *     sides (IEEE ops are deterministic given identical operands).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object Registry {
  lazy val all: Seq[QueryDef] =
    Relational.defs ++ Events.defs ++ Text.defs ++ Vectors.defs ++
      Extra.defs ++ Advanced.defs ++ SparkOnly.defs ++ Pipeline.defs ++
      Mix.defs

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
