package graft.functions

import org.apache.spark.sql.SparkSession

/** One-call registration of every statically-named graft kernel
  * function. Needed wherever a plan is ANALYZED in a session other than
  * the one the operator registered into at Column-construction time —
  * concretely, `foreachBatch` transforms: Structured Streaming clones
  * the session at query start and analyzes each microbatch plan against
  * the clone's own function registry, so a kernel first registered
  * after the clone exists (or into the outer session) is unresolvable
  * there. [[graft.streaming.StreamingOps.runBatchesToParquet]] calls
  * this on each batch's session before applying the transform — eight
  * registry inserts, microseconds. Content-addressed dynamic functions
  * ([[BloomMembership.countHits]]/`countSetHits`) are not listed: they
  * register at Column-construction time into the session of the frame
  * they are built for, which is the analyzing session by construction. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    CompressionRatio.register(spark)
    FeatureHash.register(spark)
    Md5Sim.register(spark)
    PlanBarrier.register(spark)
    SortedIntersect.register(spark)
    TextKernels.register(spark)
    VecAgg.register(spark)
    VectorExpressions.register(spark)
    Winnow.register(spark)
  }
}
