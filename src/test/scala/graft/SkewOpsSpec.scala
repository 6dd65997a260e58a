package graft

import graft.ops.SkewOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted/sharded operators must be result-identical to their direct
  * formulations — the whole point is changing the plan, not the answer. */
class SkewOpsSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("sharded exact distinct count equals direct countDistinct per key") {
    val ev = Tables.load(spark, dir, "events")
    val direct = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_distinct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sharded = SkewOps.shardedCountDistinct(ev, "event_type", "user_id", 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sharded == direct)
  }

  test("salted join is multiset-identical to the plain join") {
    val ev = Tables.load(spark, dir, "events")
    val c = Tables.load(spark, dir, "customer")
    val direct = ev.join(c, ev("user_id") === c("c_custkey"))
      .select(col("event_id"), col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val salted = SkewOps.saltedJoin(ev, c, "user_id", "c_custkey", "event_id", 4)
      .select(col("event_id"), col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(salted == direct)
    assert(salted.nonEmpty)
  }
}
