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

  test("bloom semi-join reduction is exact and actually prunes the fact side") {
    val ev = Tables.load(spark, dir, "events")
    // Selective dimension: 10 of ~150 users.
    val dim = Tables.load(spark, dir, "customer")
      .filter(col("c_custkey") % 15 === 0)
      .select(col("c_custkey"), col("c_name"))
    val direct = ev.join(dim, ev("user_id") === dim("c_custkey"))
      .select(col("event_id"), col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val bloomed = SkewOps.bloomSemiJoin(ev, dim, "user_id", "c_custkey",
        expectedKeys = 1000L)
      .select(col("event_id"), col("c_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(bloomed == direct)
    assert(direct.nonEmpty)
    // Non-integral keys must fail loudly, not silently drop every row.
    val err = intercept[IllegalArgumentException] {
      SkewOps.bloomSemiJoin(ev, dim.withColumn("c_key_s", col("c_custkey").cast("string")),
        "user_id", "c_key_s")
    }
    assert(err.getMessage.contains("integral"))
  }

  test("bloom build honors the requested size past the optimizer's conf caps") {
    import spark.implicits._
    // a 10M-key / 1% FPP request needs ~96M bits — 11x the default
    // maxNumBits cap (67,108,864). Without the temporary cap raise the
    // sketch silently clamps to ~8 MB and the requested FPP is not
    // honored; the serialized length proves which happened.
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val wantBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(10000000L, 0.01)
    val before = (
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems"),
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits"))
    val sketch = SkewOps.buildBloom(dim, "k", 10000000L, 0.01)
    assert(sketch.length.toLong * 8 >= wantBits,
      s"sketch is ${sketch.length} bytes — the conf cap clamped it")
    // and the session confs are restored after the build
    val after = (
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumItems"),
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.maxNumBits"))
    assert(after == before, s"caps must be restored: $before -> $after")
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // Force the sort-merge path and make the skew detector fire on
      // fixture-sized data (production defaults: factor 5 / 256 MB).
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 50k rows on ONE hot key vs 100 rows spread over 100 keys.
      val fact = (1 to 50000).map(i => (1L, i.toLong)) ++
        (1 to 100).map(i => (i.toLong % 100 + 2, i.toLong))
      val dim = (1 to 200).map(i => (i.toLong, s"d$i"))
      val joined = fact.toDF("k", "v").join(dim.toDF("k", "name"), "k")
      // Execute THIS dataframe's plan (count() would plan a separate
      // query execution and leave this one un-finalized).
      assert(joined.collect().length == 50100)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark the hot partition's SMJ as skew-handled:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
