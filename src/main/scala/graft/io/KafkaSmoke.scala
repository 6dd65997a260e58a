package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Guarded end-to-end Kafka round-trip smoke (SURVEY §2.1/§2.2 S1/K2).
  *
  * The sandbox ships no Kafka connector or broker, so the streaming I/O
  * surface (KafkaIO) is otherwise validated only at the plan level plus
  * MemoryStream semantics tests. This main keeps the runtime path honest
  * without breaking sandboxed builds:
  *
  *   - `spark-sql-kafka-0-10` absent from the classpath → prints
  *     `KAFKA SMOKE SKIPPED (connector absent)` and exits 0.
  *   - connector present but no broker reachable at `SPARK_GRAFT_KAFKA`
  *     (default `localhost:9092`) → prints `SKIPPED (broker unreachable)`
  *     and exits 0.
  *   - connector + broker present → writes one batch of stedi-shaped risk
  *     JSON to `graft-smoke-in`, streams it through the reference parse
  *     chain (cast → from_json → filter) into `graft-smoke-out`, reads
  *     that topic back in batch mode, and asserts the row count survives
  *     → `KAFKA SMOKE OK (n rows)`, exit 0; any mismatch exits 1.
  *
  * Detection is by classloading, not config: `DataSource.lookupDataSource`
  * would throw at `load()` time anyway — checking for the provider class
  * up front gives the clean skip path.
  */
object KafkaSmoke {

  def connectorPresent: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch { case _: ClassNotFoundException => false }

  /** Probe the broker's TCP endpoint. A malformed SPARK_GRAFT_KAFKA value
    * (no colon, non-numeric port) must take the clean skip path rather
    * than crash the smoke with a MatchError. */
  private def brokerReachable(broker: String): Boolean =
    broker.split(":", 2) match {
      case Array(host, port) if port.nonEmpty && port.forall(_.isDigit) &&
          host.nonEmpty =>
        val s = new java.net.Socket()
        try {
          s.connect(new java.net.InetSocketAddress(host, port.toInt), 2000)
          true
        } catch { case _: java.io.IOException => false }
        finally s.close()
      case _ => false
    }

  def main(args: Array[String]): Unit = {
    if (!connectorPresent) {
      println("KAFKA SMOKE SKIPPED (connector absent)")
      return
    }
    val broker = sys.env.getOrElse("SPARK_GRAFT_KAFKA", "localhost:9092")
    if (!brokerReachable(broker)) {
      println(s"KAFKA SMOKE SKIPPED (broker unreachable at $broker)")
      return
    }
    // Per-run topic suffix: earliest-offset reads accumulate rows across
    // runs against the same broker, so a rerun on the shared topic names
    // could satisfy the count check with a PRIOR run's output even if this
    // run's streaming leg processed nothing. Fresh topics per run keep the
    // assertion about THIS run (pass an explicit suffix as args(0) to
    // reuse a namespace).
    val nonce = args.headOption.getOrElse(
      java.lang.Long.toHexString(System.currentTimeMillis()))
    val InTopic = s"graft-smoke-in-$nonce"
    val OutTopic = s"graft-smoke-out-$nonce"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 100
    // Batch write of stedi risk JSON to the input topic (K2's batch twin).
    val risk = (1 to n).map(i =>
      s"""{"customer":"user$i@test.com","score":${i % 40}.5,"riskDate":"2020-09-14T07:${"%02d".format(i % 60)}:00.000Z"}""")
    risk.toDF("value").select(col("value").cast("binary").as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("topic", InTopic)
      .save()

    // Stream S1 → parse chain → K2 sink, bounded by availableNow so the
    // smoke terminates once the backlog drains.
    val checkpoint = java.nio.file.Files
      .createTempDirectory("graft-kafka-smoke").toString
    val parsed = graft.ops.StediOps.parseRiskEvent(
      KafkaIO.readTopic(spark, broker, InTopic)
        .selectExpr("CAST(value AS STRING) as value"))
    val q = parsed
      .select(col("customer").as("key"),
        to_json(struct(col("customer"), col("score"), col("riskDate"))).as("value"))
      .writeStream
      .format("kafka")
      .outputMode("append")
      .option("kafka.bootstrap.servers", broker)
      .option("topic", OutTopic)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.read.format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("subscribe", OutTopic)
      .option("startingOffsets", "earliest")
      .load()
      .selectExpr("CAST(value AS STRING) as value")
      .count()
    spark.stop()
    if (got >= n) println(s"KAFKA SMOKE OK ($got rows)")
    else { System.err.println(s"KAFKA SMOKE FAILED: $got < $n rows"); sys.exit(1) }
  }
}
