package graft

import graft.io.BatchIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BatchIOSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft-$name")
    p.toFile.deleteOnExit()
    s"$p/out"
  }

  test("parquet round-trip preserves schema and rows; partitionBy prunes") {
    val orders = Tables.load(spark, dir, "orders")
    val path = tmp("pq")
    BatchIO.writeParquet(orders, path, partitionBy = Seq("o_orderstatus"))
    val back = BatchIO.readParquet(spark, path)
    assert(back.count() == orders.count())
    // partition pruning: the filtered plan must carry a PartitionFilter
    val plan = back.filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"))
  }

  test("csv round-trip with explicit schema") {
    val nation = Tables.load(spark, dir, "nation")
    val path = tmp("csv")
    BatchIO.writeCsv(nation, path)
    val back = BatchIO.readCsv(spark, path,
      "n_nationkey INT, n_name STRING, n_regionkey INT")
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      nation.orderBy("n_nationkey").collect().toSeq)
  }

  test("json-lines round-trip with explicit schema") {
    val region = Tables.load(spark, dir, "region")
    val path = tmp("json")
    BatchIO.writeJsonLines(region, path)
    val back = BatchIO.readJsonLines(spark, path, "r_regionkey INT, r_name STRING")
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      region.orderBy("r_regionkey").collect().toSeq)
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    val orders = Tables.load(spark, dir, "orders")
    val path = tmp("orc")
    BatchIO.writeOrc(orders, path)
    val back = BatchIO.readOrc(spark, path)
    assert(back.count() == orders.count())
    val plan = back.filter(col("o_custkey") === 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("o_custkey"), plan)
  }

  test("binaryFile source ingests opaque payloads with glob pruning") {
    val root = tmp("bin")
    new java.io.File(root).mkdirs()
    val payload = Array[Byte](0x7f, 0x45, 0x4c, 0x46)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/a.img"), payload)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/b.txt"),
      "not an image".getBytes)
    val imgs = BatchIO.readBinaryFiles(spark, root, glob = "*.img").collect()
    assert(imgs.length == 1, "glob must prune at listing time")
    assert(imgs.head.getAs[Long]("length") == payload.length.toLong)
    assert(imgs.head.getAs[Array[Byte]]("content").toSeq == payload.toSeq)
  }

  test("text source reads one row per raw corpus line") {
    val root = tmp("txt")
    new java.io.File(root).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/corpus.txt"),
      "line one\nline two\n".getBytes)
    val lines = BatchIO.readText(spark, root).collect().map(_.getString(0))
    assert(lines.sorted.toSeq == Seq("line one", "line two"))
  }

  test("bucketed tables co-locate the join: sort-merge with zero shuffle") {
    val wh = tmp("bucketed")
    val orders = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
    orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    cust.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/cust_b").saveAsTable("cust_b")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // Disable broadcast so the plan must rely on bucket co-location —
    // the 100 TB shape, where neither side fits in a broadcast.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b")
        .join(spark.table("cust_b"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(j.count() ==
        orders.join(cust, orders("o_custkey") === cust("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS cust_b")
    }
  }

  test("registered scala UDF matches the codegen builtin it mirrors") {
    // The UDF API surface works; the engine's own queries still prefer
    // builtins (codegen'd, optimizer-transparent) — this proves parity.
    spark.udf.register("my_upper", (s: String) => if (s == null) null else s.toUpperCase)
    val df = Tables.load(spark, dir, "part")
      .select(org.apache.spark.sql.functions.expr("my_upper(p_name)").as("u"),
        org.apache.spark.sql.functions.upper(col("p_name")).as("b"))
    assert(df.filter(col("u") =!= col("b")).count() == 0)
    assert(df.count() > 0)
  }

  test("seeded sample is deterministic and lands near the target fraction") {
    val orders = Tables.load(spark, dir, "orders")
    val s1 = orders.sample(withReplacement = false, 0.2, seed = 42)
    val s2 = orders.sample(withReplacement = false, 0.2, seed = 42)
    assert(s1.collect().toSeq == s2.collect().toSeq) // same seed → same rows
    val frac = s1.count().toDouble / orders.count()
    assert(frac > 0.1 && frac < 0.3, s"fraction=$frac")
  }

  test("approx_percentile sketch lands within 2% of the exact percentile") {
    val li = Tables.load(spark, dir, "lineitem")
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5D)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5D, 10000)").as("approx")).collect()(0)
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.02, s"approx=$approx exact=$exact")
  }

  test("approx_count_distinct sketch lands within 5% of exact") {
    val li = Tables.load(spark, dir, "lineitem")
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }
}
