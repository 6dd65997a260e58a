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
