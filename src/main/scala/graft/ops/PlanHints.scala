package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.internal.SQLConf

/** Plan-time size-gated broadcast hints.
  *
  * A raw `broadcast(df)` is an UNCONDITIONAL override: it bypasses both the
  * planner's size check and AQE's runtime re-plan, so hinting a dimension
  * that scales with the fact data (customer, supplier) turns into a
  * multi-GB driver collect and executor OOM at the 100 TB target — the hint
  * has no fallback. Reserve raw hints for tables whose size is bounded by
  * SCHEMA (nation = 25 rows, region = 5 rows) or by a prior reduction
  * (a HAVING-filtered key set); everything else goes through
  * [[broadcastIfSmall]].
  *
  * The gate consults Catalyst's plan-time size estimate
  * (`optimizedPlan.stats.sizeInBytes`: file sizes for scans, propagated
  * through filters and projections — no job is run) and compares it against
  * the session's own `spark.sql.autoBroadcastJoinThreshold`. Below the
  * threshold the hint is attached (pinning the plan the planner would pick
  * anyway, robust to stats drift); above it the frame is returned UNHINTED,
  * so the static planner falls back to a shuffle join and AQE may still
  * promote to broadcast at runtime if the actual post-filter size fits.
  * Setting the threshold to -1 disables the hint entirely.
  */
object PlanHints {

  /** Rows per partition for COMPUTE-DENSE, byte-light frames (vector /
    * document grain feeding md5-shingle, plane-projection, CDC or
    * edit-distance kernels, measured 0.05–1.5 ms of CPU per row at
    * sf0.1). Byte-based sizing — AQE's coalescing rule and the 128 MB
    * scan split — is the wrong unit for these: a few MB of vectors can
    * carry seconds of kernel CPU. 256 rows/task keeps each task well
    * above the ~5 ms scheduling cost for the heavy kernels while a
    * near-empty fixture doesn't fan out into dozens of no-op tasks. */
  val ComputeRowsPerPartition = 256L

  /** Absolute fan-out ceiling — the [[MaxComputeFanout]] twin of
    * SimilarityQueries.MaxDerivedPartitions: these frames are
    * checkpointed index artifacts, so their partition count bounds the
    * block count a session pins, not the scan parallelism of the raw
    * corpus. */
  val MaxComputeFanout = 4096L

  /** Explicit partition count for a compute-dense frame of `n` rows: an
    * EXPLICIT count (AQE cannot coalesce it — a bare repartition(col)
    * is folded back to ~total-bytes/1MB partitions, which serialized
    * these kernels at fixture scale), scaling with the data instead of
    * pinned to the local core count — full cluster parallelism arrives
    * naturally once n ≥ cores·[[ComputeRowsPerPartition]]. */
  def computeFanout(n: Long): Int = {
    val want = (n + ComputeRowsPerPartition - 1) / ComputeRowsPerPartition
    math.max(1L, math.min(want, MaxComputeFanout)).toInt
  }

  /** Attach a broadcast hint only when the plan-time size estimate fits
    * the session's autoBroadcastJoinThreshold (or an explicit override). */
  def broadcastIfSmall(df: DataFrame, maxBytes: Long = -2L): DataFrame = {
    val gate =
      if (maxBytes == -2L) SQLConf.get.autoBroadcastJoinThreshold
      else maxBytes
    if (gate >= 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= gate)
      broadcast(df)
    else df
  }
}
