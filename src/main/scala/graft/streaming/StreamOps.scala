package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Parsed stedi risk event (FIXTURES.md A3 after StediOps.parseRiskEvent). */
case class RiskEvent(customer: String, score: Double, riskDate: String)

/** Running per-customer aggregate emitted by [[StreamOps.runningRiskTotals]]. */
case class CustomerRunning(customer: String, n_events: Long, total_score: Double)

/** Stateful streaming operators the reference lacks (SURVEY §2.8): event-time
  * windows, watermarked dedup, and arbitrary keyed state. These are the
  * bounded-state building blocks for running the stedi pipelines at scale —
  * every one of them evicts state at the watermark instead of growing
  * forever like the reference's windowless join.
  */
object StreamOps {

  /** Tumbling event-time window aggregation over parsed risk events, with a
    * watermark so closed windows emit in append mode and their state is
    * evicted. */
  def windowedRiskStats(
      risk: DataFrame,
      windowLen: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    risk
      .withColumn("riskTs", to_timestamp(col("riskDate")))
      .withWatermark("riskTs", watermark)
      .groupBy(window(col("riskTs"), windowLen), col("customer"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg(col("score")), 6).as("avg_score"),
        max(col("score")).as("max_score"))
      .select(
        col("window.start").as("window_start"),
        col("customer"), col("n_events"), col("avg_score"), col("max_score"))

  /** Streaming exact dedup on (customer, riskDate) with watermark-bounded
    * state — re-delivered Kafka records (the at-least-once sink's
    * duplicates) collapse to one row. */
  def dedupRiskEvents(risk: DataFrame, watermark: String = "30 minutes"): DataFrame =
    risk
      .withColumn("riskTs", to_timestamp(col("riskDate")))
      .withWatermark("riskTs", watermark)
      .dropDuplicatesWithinWatermark("customer", "riskDate")
      .select(col("customer"), col("score"), col("riskDate"))

  /** Arbitrary keyed state via mapGroupsWithState: running (count, sum of
    * score) per customer, updated each micro-batch (Update output mode).
    * The state is two scalars per key — the streaming analog of a
    * map-side-combined aggregate. */
  def runningRiskTotals(spark: SparkSession, risk: DataFrame): Dataset[CustomerRunning] = {
    import spark.implicits._
    risk.as[RiskEvent]
      .groupByKey(_.customer)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (customer: String, events: Iterator[RiskEvent], state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          val (n, s) = events.foldLeft((n0, s0)) { case ((cn, cs), e) =>
            (cn + 1, cs + e.score)
          }
          state.update((n, s))
          CustomerRunning(customer, n, s)
      }
  }
}
