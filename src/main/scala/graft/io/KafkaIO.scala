package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Kafka source/sink builders mirroring the reference's streaming I/O
  * (reference sparkpykafkajoin.py:66-73,193-200,286-294), parameterized by
  * broker/topic/offsets/checkpoint instead of the reference's hardcoded
  * `localhost:9092` (its docs mandate `kafka:19092` — the address belongs
  * in config, SURVEY §2.1).
  *
  * Requires spark-sql-kafka-0-10 on the classpath at runtime (not shipped
  * in this container — exercised via MemoryStream in tests; the builders
  * construct the identical logical plan).
  */
object KafkaIO {

  /** S1/S2/S3 — streaming scan of a topic, full-history replay on first
    * start (`startingOffsets=earliest`). */
  def readTopic(spark: SparkSession, broker: String, topic: String,
      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", broker)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()

  /** K2 — append-mode Kafka sink with checkpointed offsets (at-least-once,
    * matching the reference's delivery contract). */
  def writeKafka(df: DataFrame, broker: String, topic: String,
      checkpoint: String): StreamingQuery =
    df.writeStream
      .format("kafka")
      .outputMode("append")
      .option("kafka.bootstrap.servers", broker)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .start()

  /** K1 — untruncated console sink, append mode. */
  def writeConsole(df: DataFrame): StreamingQuery =
    df.writeStream
      .outputMode("append")
      .format("console")
      .option("truncate", "false")
      .start()
}
