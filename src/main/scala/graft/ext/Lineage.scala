package graft.ext

import org.apache.spark.sql.DataFrame

/** Materialization barriers that TRUNCATE LINEAGE, not just cache it.
  *
  * `persist()` keeps the full recompute plan inside the resulting
  * `InMemoryRelation`, so every downstream action still analyzes/optimizes
  * the whole upstream tree — and iterative algorithms (connected
  * components) nest those trees one level deeper per round, making
  * driver-side planning the dominant cost (measured: 2-5 s PER ACTION on a
  * 256-row cached pair set whose plan embedded the full MinHash-LSH DAG).
  * Checkpointing replaces the plan with a `LogicalRDD` over the computed
  * rows: constant-size plans per round, and on a real cluster it also
  * bounds the recompute horizon after executor loss — the same reason
  * GraphX checkpoints periodically inside Pregel.
  */
object Lineage {

  /** Compute `df` now and return a frame backed by the materialized rows
    * (plan = `LogicalRDD`). Uses a RELIABLE checkpoint (shared storage,
    * survives executor loss) when the session has a checkpoint dir
    * configured, else a local checkpoint (executor block storage — the
    * right default for bounded intermediates like near-dup pair sets).
    * Blocks are released by the ContextCleaner once the frame is
    * unreferenced, so callers inherit no unpersist obligation.
    *
    * NOT idempotence-checked on purpose: a plan whose root is a
    * LogicalRDD is not necessarily materialized — foreachBatch hands
    * its transform a LogicalRDD-planned frame that has NOT been
    * evaluated yet, and skipping the checkpoint there leaves stateful
    * operators' partitions unprocessed (Spark 4's state-store commit
    * validation fails the batch with "expected N commits but got 0").
    * A composed double cut costs one extra pass over the (small) result
    * rows; correctness beats that. */
  /** Diagnostic hook: GRAFT_EXPLAIN_CUTS=1 prints the formatted physical
    * plan of every frame passing through [[cut]] BEFORE it executes —
    * the only way to see the internal plan shape of operators that
    * return checkpointed frames (their .explain is just a LogicalRDD
    * scan). Read once; unset in bench/driver runs, so the hot path pays
    * one boolean. */
  private val explainCuts: Boolean = sys.env.contains("GRAFT_EXPLAIN_CUTS")

  def cut(df: DataFrame): DataFrame = {
    if (explainCuts) {
      val site = Thread.currentThread.getStackTrace
        .find(e => e.getClassName.startsWith("graft.") &&
          !e.getClassName.contains("Lineage"))
        .map(e => s"${e.getClassName}.${e.getMethodName}:${e.getLineNumber}")
        .getOrElse("?")
      println(s"==== lineage-cut @ $site ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()
  }
}
