package graft.pipelines

import graft.io.KafkaIO
import graft.ops.StediOps
import org.apache.spark.sql.SparkSession

private[pipelines] object PipelineSession {
  def build(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
    // spark-submit injects spark.master; a bare `sbt runMain` does not —
    // default to local so the quick-start commands run on a stock
    // checkout without overriding a real cluster deployment.
    val spark = (if (sys.props.contains("spark.master")) builder
                 else builder.master(s"local[$cpus]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
  def broker(args: Array[String]): String =
    args.headOption.getOrElse("localhost:9092")
}

/** Pipeline 1 — `redis-server` topic → decoded (email, birthYear) →
  * console. Re-expresses reference sparkpyrediskafkastreamtoconsole.py
  * end-to-end: stateless narrow chain, one whole-stage-codegen span per
  * micro-batch, no shuffle, no state store. */
object RedisToConsole {
  def main(args: Array[String]): Unit = {
    val spark = PipelineSession.build("graft-redis-to-console")
    val raw = KafkaIO.readTopic(spark, PipelineSession.broker(args), "redis-server")
    val out = StediOps.customerChain(StediOps.castValueAsString(raw))
    KafkaIO.writeConsole(out).awaitTermination()
  }
}

/** Pipeline 2 — `stedi-events` topic → parsed risk events → console
  * (reference sparkpyeventskafkastreamtoconsole.py). */
object EventsToConsole {
  def main(args: Array[String]): Unit = {
    val spark = PipelineSession.build("graft-events-to-console")
    val raw = KafkaIO.readTopic(spark, PipelineSession.broker(args), "stedi-events")
    val out = StediOps.parseRiskEvent(StediOps.castValueAsString(raw))
    KafkaIO.writeConsole(out).awaitTermination()
  }
}

/** Pipeline 3 (flagship) — stream-stream inner join of risk events with
  * customer birth years on email, enriched JSON published to
  * `customer-risk` (reference sparkpykafkajoin.py).
  *
  * Faithful to the reference: windowless join, NO watermark — state on
  * both sides grows forever (reference README.md:26). That is correct to
  * spec but fatal at scale; [[graft.ops.StediOps.joinRiskWithCustomerWatermarked]]
  * is the bounded-state opt-in (pass a third arg with the max event-time
  * skew, e.g. "1 hour").
  */
object JoinToKafka {
  def main(args: Array[String]): Unit = {
    val spark = PipelineSession.build("graft-kafka-join")
    val broker = PipelineSession.broker(args)
    val checkpoint = args.lift(1).getOrElse("/tmp/spark-checkpoints/kafkajoin")
    val customers = StediOps.customerChain(StediOps.castValueAsString(
      KafkaIO.readTopic(spark, broker, "redis-server")))
    val risk = StediOps.parseRiskEvent(StediOps.castValueAsString(
      KafkaIO.readTopic(spark, broker, "stedi-events")))
    val joined = args.lift(2) match {
      case Some(delay) =>
        StediOps.joinRiskWithCustomerWatermarked(risk, customers, delay)
      case None =>
        StediOps.joinRiskWithCustomer(risk, customers)
    }
    KafkaIO.writeKafka(StediOps.toKafkaOutput(joined), broker,
      "customer-risk", checkpoint).awaitTermination()
  }
}

/** Pipeline 4 — the BASELINE approach line ("Kafka source + Redis sink")
  * as a runnable pipeline: the same stream-stream join as [[JoinToKafka]],
  * but the enriched customer-risk JSON upserts into Redis keyed by
  * customer email (`SET customer-risk:<email> <json>`), via the
  * zero-dependency RESP writer. In the reference deployment the STEDI
  * webapp owns the Redis writes; this closes the loop from the Spark
  * side so a consumer reads the freshest score with one GET instead of
  * tailing the `customer-risk` topic. Payload is byte-identical to the
  * Kafka sink's ([[graft.ops.StediOps.toKafkaOutput]] — score/birthYear
  * as JSON strings, the reference quirk). Idempotent SET + checkpoint =
  * exactly-once from the reader's view across replays.
  *
  * args: [broker] [checkpoint] [joinDelay] ; Redis target from
  * SPARK_GRAFT_REDIS (default localhost:6379). */
object JoinToRedis {
  def main(args: Array[String]): Unit = {
    val spark = PipelineSession.build("graft-kafka-join-redis")
    val broker = PipelineSession.broker(args)
    val checkpoint = args.lift(1).getOrElse("/tmp/spark-checkpoints/redisjoin")
    val (rHost, rPort) = sys.env.getOrElse("SPARK_GRAFT_REDIS", "localhost:6379")
      .split(":", 2) match {
        case Array(h, p) if p.nonEmpty && p.forall(_.isDigit) => (h, p.toInt)
        case Array(h) => (h, 6379)
        case other => (other.head, 6379)
      }
    val customers = StediOps.customerChain(StediOps.castValueAsString(
      KafkaIO.readTopic(spark, broker, "redis-server")))
    val risk = StediOps.parseRiskEvent(StediOps.castValueAsString(
      KafkaIO.readTopic(spark, broker, "stedi-events")))
    val joined = args.lift(2) match {
      case Some(delay) =>
        StediOps.joinRiskWithCustomerWatermarked(risk, customers, delay)
      case None =>
        StediOps.joinRiskWithCustomer(risk, customers)
    }
    graft.io.RedisSink.upsertKvForeachBatch(
        StediOps.toKafkaOutput(joined), checkpoint, rHost, rPort,
        keyPrefix = "customer-risk:")
      .start().awaitTermination()
  }
}

/** Quick-start smoke — all three reference-twin pipelines end-to-end with
  * NO Kafka broker: MemoryStream feeds stand in for the two topics
  * (binary `value` column, exactly the Kafka wire shape), console sinks
  * stand in for console/Kafka. Feeds the documented FIXTURES.md payloads
  * through each chain and exits; `sbt "runMain graft.pipelines.LocalDemo"`. */
object LocalDemo {
  def main(args: Array[String]): Unit = {
    val spark = PipelineSession.build("graft-local-demo")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def b64(s: String): String =
      java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
    def envelope(name: String, email: String, birthDay: String): String = {
      val el = b64(s"""{"customerName":"$name","email":"$email",""" +
        s""""phone":"8015551212","birthDay":"$birthDay"}""")
      s"""{"key":"Q3VzdG9tZXI=","existType":"NONE","ch":false,"incr":false,""" +
        s""""zSetEntries":[{"element":"$el","score":0.0}]}"""
    }
    def risk(email: String, score: Double): String =
      s"""{"customer":"$email","score":$score,"riskDate":"2020-09-14T07:54:06.417Z"}"""

    val customerFeed = Seq(
      envelope("Sam Test", "sam.test@test.com", "2001-01-03"),
      envelope("Lily Vale", "lily.vale@test.com", "1995-05-05"))
    val riskFeed = Seq(
      risk("sam.test@test.com", 7.0),
      risk("lily.vale@test.com", -2.5))
    // Kafka delivers `value` as binary; the chains start at the P1 cast.
    def asWire(s: MemoryStream[String]) =
      StediOps.castValueAsString(
        s.toDF().select(col("value").cast("binary").as("value")))

    println("=== pipeline 1: redis-server -> decoded customers -> console ===")
    val redis1 = MemoryStream[String]
    redis1.addData(customerFeed: _*)
    val q1 = KafkaIO.writeConsole(StediOps.customerChain(asWire(redis1)))
    q1.processAllAvailable(); q1.stop()

    println("=== pipeline 2: stedi-events -> parsed risk events -> console ===")
    val events2 = MemoryStream[String]
    events2.addData(riskFeed: _*)
    val q2 = KafkaIO.writeConsole(StediOps.parseRiskEvent(asWire(events2)))
    q2.processAllAvailable(); q2.stop()

    println("=== pipeline 3: stream-stream join -> customer-risk JSON -> console ===")
    val redis3 = MemoryStream[String]; val events3 = MemoryStream[String]
    redis3.addData(customerFeed: _*); events3.addData(riskFeed: _*)
    val joined = StediOps.joinRiskWithCustomer(
      StediOps.parseRiskEvent(asWire(events3)),
      StediOps.customerChain(asWire(redis3)))
    val q3 = KafkaIO.writeConsole(StediOps.toKafkaOutput(joined))
    q3.processAllAvailable(); q3.stop()

    spark.stop()
  }
}
