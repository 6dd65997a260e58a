package graft

import graft.ops.RankOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence proofs for the distributed rank/prefix-sum primitives: each
  * must reproduce its single-partition window counterpart bit-for-bit —
  * that equivalence is what lets p2/p6/p9/m7 keep their DuckDB oracles
  * while dropping the single-task global window. */
class RankOpsSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def events = Tables.load(spark, dir, "events")
    .select(col("event_id"), col("user_id"), col("value"))

  test("global rank is the window row_number under the same total order") {
    val got = RankOps.withGlobalRank(events, 8, "r0", col("value"), col("event_id"))
      .select(col("event_id"), col("r0")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = events
      .withColumn("r0", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("value"), col("event_id"))).cast("long") - 1)
      .select(col("event_id"), col("r0")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("prefix sum is the exclusive running window sum under the same order") {
    val weighted = events.withColumn("w", (col("user_id") % 7 + 1).cast("long"))
    val got = RankOps.withGlobalPrefixSum(weighted, 8, "ps", col("w"), col("event_id"))
      .select(col("event_id"), col("ps")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = weighted
      .withColumn("ps", coalesce(sum(col("w")).over(
        Window.partitionBy(lit(0)).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("event_id"), col("ps")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("group rank is the per-group row_number, including skewed groups") {
    val grouped = events.withColumn("g",
      when(col("user_id") % 10 === 0, "rare").otherwise("common"))
    val got = RankOps.withGroupRank(grouped, 8, "gr", Seq("g"), Seq(col("event_id")))
      .select(col("event_id"), col("gr")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = grouped
      .withColumn("gr", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("event_id"))).cast("long") - 1)
      .select(col("event_id"), col("gr")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("ntileFromRank reproduces SQL NTILE for uneven and degenerate splits") {
    // n=10 k=4 → tiles 3,3,2,2; n=3 k=4 → 1,1,1 (tile 4 empty)
    for ((n, k) <- Seq((10, 4), (3, 4), (16, 4), (1, 1))) {
      val df = spark.range(n.toLong).toDF("id")
        .withColumn("r0", col("id"))            // identity rank
        .withColumn("n", lit(n.toLong))
        .withColumn("tile", RankOps.ntileFromRank("r0", "n", k))
      val got = df.select(col("id"), col("tile")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = spark.range(n.toLong).toDF("id")
        .withColumn("tile", ntile(k).over(
          Window.partitionBy(lit(0)).orderBy(col("id"))).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("rank and prefix sum of an empty relation are empty, not an error") {
    val empty = events.filter(col("event_id") < 0)
    assert(RankOps.withGlobalRank(empty, 4, "r0", col("event_id")).count() == 0)
    assert(RankOps.withGlobalPrefixSum(empty, 4, "ps", col("value"), col("event_id"))
      .count() == 0)
    assert(RankOps.withGroupRank(empty, 4, "gr", Seq("user_id"), Seq(col("event_id")))
      .count() == 0)
  }

  test("rank assignment is deterministic across repeated evaluations") {
    def run() = RankOps
      .withGlobalRank(events, 8, "r0", col("value"), col("event_id"))
      .select(col("event_id"), col("r0")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run() == run())
  }
}
