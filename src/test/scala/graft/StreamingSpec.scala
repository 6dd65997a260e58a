package graft

import graft.ops.StediOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, lit, to_timestamp, when}
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming semantics tests over MemoryStream — the same
  * `DataFrame => DataFrame` ops the Kafka pipelines run, driven without a
  * broker (SURVEY §5.2). */
class StreamingSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def mkEnvelope(name: String, email: String, birthDay: String): String = {
    val customer = java.util.Base64.getEncoder.encodeToString(
      s"""{"customerName":"$name","email":"$email","phone":"555","birthDay":"$birthDay"}"""
        .getBytes("UTF-8"))
    s"""{"key":"Q3VzdG9tZXI=","existType":"NONE","Ch":false,"Incr":false,"zSetEntries":[{"element":"$customer","score":"0.0"}]}"""
  }

  private def mkRisk(email: String, score: Double): String =
    s"""{"customer":"$email","score":$score,"riskDate":"2020-09-14T07:54:06.417Z"}"""

  test("streaming customer chain decodes envelopes in append mode") {
    val input = MemoryStream[String]
    val q = StediOps.customerChain(input.toDF().select(col("value")))
      .writeStream.format("memory").queryName("cust_stream").outputMode("append").start()
    try {
      input.addData(mkEnvelope("A", "a@test.com", "1990-05-01"))
      input.addData(mkEnvelope("B", "b@test.com", "1985-01-02"), "garbage not json")
      q.processAllAvailable()
      val rows = spark.table("cust_stream").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(rows == Set(("a@test.com", "1990"), ("b@test.com", "1985")))
    } finally q.stop()
  }

  test("windowless stream-stream join emits the per-email cross product over full history") {
    val customers = MemoryStream[String]
    val risks = MemoryStream[String]
    val joined = StediOps.joinRiskWithCustomer(
      StediOps.parseRiskEvent(risks.toDF().select(col("value"))),
      StediOps.customerChain(customers.toDF().select(col("value"))))
    val q = joined.writeStream.format("memory").queryName("join_stream")
      .outputMode("append").start()
    try {
      customers.addData(mkEnvelope("A", "a@test.com", "1990-05-01"))
      risks.addData(mkRisk("a@test.com", 1.0), mkRisk("a@test.com", 2.0))
      q.processAllAvailable()
      assert(spark.table("join_stream").count() == 2)

      // A second customer record for the same email: the symmetric join
      // matches it against BOTH risk events already in state (+2), and the
      // new risk event then matches both customer records (+2) — unbounded
      // state, no dedup, reference semantics (README.md:26).
      customers.addData(mkEnvelope("A2", "a@test.com", "1990-05-01"))
      risks.addData(mkRisk("a@test.com", 3.0))
      q.processAllAvailable()
      assert(spark.table("join_stream").count() == 2 + 2 + 2)

      // unmatched email joins nothing
      risks.addData(mkRisk("nobody@test.com", 9.0))
      q.processAllAvailable()
      assert(spark.table("join_stream").count() == 6)
    } finally q.stop()
  }

  test("kafka output projection serializes score and birthYear as JSON strings") {
    val customers = MemoryStream[String]
    val risks = MemoryStream[String]
    val out = StediOps.toKafkaOutput(StediOps.joinRiskWithCustomer(
      StediOps.parseRiskEvent(risks.toDF().select(col("value"))),
      StediOps.customerChain(customers.toDF().select(col("value")))))
    val q = out.writeStream.format("memory").queryName("kafka_out")
      .outputMode("append").start()
    try {
      customers.addData(mkEnvelope("S", "s@test.com", "1963-07-01"))
      risks.addData(mkRisk("s@test.com", 28.5))
      q.processAllAvailable()
      val row = spark.table("kafka_out").collect()(0)
      assert(row.getAs[String]("key") == "s@test.com")
      assert(row.getAs[String]("value") ==
        """{"customer":"s@test.com","score":"28.5","email":"s@test.com","birthYear":"1963"}""")
    } finally q.stop()
  }

  test("watermarked join variant runs with bounded state and joins in-window events") {
    val customers = MemoryStream[String]
    val risks = MemoryStream[String]
    val cust = StediOps.customerChain(customers.toDF().select(col("value")))
    val risk = StediOps.parseRiskEvent(risks.toDF().select(col("value")))
    val joined = StediOps.joinRiskWithCustomerWatermarked(risk, cust, "1 HOUR")
    val q = joined.writeStream.format("memory").queryName("wm_join")
      .outputMode("append").start()
    try {
      customers.addData(mkEnvelope("A", "a@test.com", "1990-05-01"))
      risks.addData(mkRisk("a@test.com", 1.0))
      q.processAllAvailable()
      // customer custTs = ingestion (now); riskDate is 2020 → outside the
      // 1-hour band, so nothing joins; the plan must still run with
      // watermarks + state eviction wired in.
      assert(spark.table("wm_join").count() == 0)
      val recent = java.time.Instant.now().toString
      risks.addData(s"""{"customer":"a@test.com","score":5.0,"riskDate":"$recent"}""")
      q.processAllAvailable()
      assert(spark.table("wm_join").count() == 1)
    } finally q.stop()
  }

  test("left-semi watermarked join emits each matched risk once, never multiplied") {
    val customers = MemoryStream[String]
    val risks = MemoryStream[String]
    val t0 = java.time.Instant.now()
    val cust = StediOps.customerChain(customers.toDF().select(col("value")))
      .withColumn("custTs", to_timestamp(lit(t0.toString)))
    val risk = StediOps.parseRiskEvent(risks.toDF().select(col("value")))
    val joined = StediOps.joinRiskWithCustomerSemi(risk, cust, "1 HOUR")
    val q = joined.writeStream.format("memory").queryName("semi_join")
      .outputMode("append").start()
    try {
      // TWO customer records for the same email: inner join would emit the
      // risk row twice; semi must emit exactly one row with risk columns.
      customers.addData(mkEnvelope("A", "a@test.com", "1990-05-01"))
      customers.addData(mkEnvelope("A2", "a@test.com", "1991-06-02"))
      customers.addData(mkEnvelope("B", "b@test.com", "1970-01-01"))
      risks.addData(s"""{"customer":"a@test.com","score":5.0,"riskDate":"$t0"}""")
      risks.addData(s"""{"customer":"ghost@test.com","score":9.0,"riskDate":"$t0"}""")
      q.processAllAvailable()
      val rows = spark.table("semi_join").collect()
        .map(r => (r.getString(0), r.getDouble(1)))
      assert(rows.toSeq == Seq(("a@test.com", 5.0)))
      assert(spark.table("semi_join").columns.toSeq == Seq("customer", "score"))
    } finally q.stop()
  }

  test("left-outer watermarked join emits unmatched risk rows null-padded after the watermark closes") {
    val customers = MemoryStream[String]
    val risks = MemoryStream[String]
    val t0 = java.time.Instant.now()
    val t1 = t0.plusSeconds(3600)
    // Drive BOTH watermarks from event time we control: customers carry an
    // explicit custTs (watermarkedJoin honors it over ingestion time).
    val cust = StediOps.customerChain(customers.toDF().select(col("value")))
      .withColumn("custTs", to_timestamp(
        when(col("email") === "later@test.com", lit(t1.toString))
          .otherwise(lit(t0.toString))))
    val risk = StediOps.parseRiskEvent(risks.toDF().select(col("value")))
    val joined = StediOps.joinRiskWithCustomerLeftOuter(risk, cust, "10 SECONDS")
    val q = joined.writeStream.format("memory").queryName("lo_join")
      .outputMode("append").start()
    try {
      // A risk event for an email no customer record ever arrives for.
      risks.addData(s"""{"customer":"ghost@test.com","score":9.0,"riskDate":"$t0"}""")
      customers.addData(mkEnvelope("A", "a@test.com", "1990-05-01"))
      q.processAllAvailable()
      // Outer result cannot emit yet: state is only closeable once the
      // watermark passes the event's join window.
      // Advance event time far past the 10s bound on BOTH streams.
      risks.addData(s"""{"customer":"later@test.com","score":1.0,"riskDate":"$t1"}""")
      customers.addData(mkEnvelope("B", "later@test.com", "1980-01-01"))
      q.processAllAvailable()
      // One more batch so the state-store eviction that followed the
      // watermark bump surfaces the null-padded row.
      risks.addData(s"""{"customer":"later2@test.com","score":1.0,"riskDate":"$t1"}""")
      q.processAllAvailable()
      val ghost = spark.table("lo_join")
        .filter(col("customer") === "ghost@test.com").collect()
      assert(ghost.length == 1)
      assert(ghost.head.isNullAt(ghost.head.fieldIndex("email")),
        "unmatched risk row must be null-padded")
    } finally q.stop()
  }
}
