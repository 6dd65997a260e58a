package graft.pipelines

import graft.io.KafkaIO
import graft.ops.StediOps
import org.apache.spark.sql.SparkSession

private[pipelines] object PipelineSession {
  def build(appName: String): SparkSession = {
    val spark = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
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
