package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit storage release for `localCheckpoint()`-backed frames.
  *
  * Dropping a cached DataFrame reference only makes the checkpoint blocks
  * *collectable*: actually freeing executor storage memory then waits on a
  * driver GC cycle feeding the ContextCleaner. A long-lived session walking
  * several dirs (Bench warmup → target) would hold stale blocks for the
  * whole gap. Releasing the backing RDD eagerly at eviction time bounds
  * storage to the one hot dir regardless of GC timing.
  */
object CheckpointUtil {

  /** Unpersist the checkpoint blocks backing `df`'s `LogicalRDD` leaves.
    * No-op for plans without one. Non-blocking: block removal completes
    * asynchronously, which is fine for eviction (nothing re-reads them).
    *
    * Safe only when no downstream plan still references the frame:
    * localCheckpoint blocks are non-recomputable, so a consumer running
    * after release fails instead of recomputing (the same caveat applies
    * to executor loss mid-query — see the verify skill notes).
    */
  def release(df: DataFrame): Unit =
    df.queryExecution.logical.collect { case r: LogicalRDD => r.rdd }
      .foreach(_.unpersist(blocking = false))
}
