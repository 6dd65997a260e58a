package graft.queries

import graft.Tables
import graft.ops.StediOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch re-expressions of the reference's full operator surface
  * (SURVEY.md §2), driven by the driver's parquet fixtures so the DuckDB
  * oracle can differentially verify every step.
  *
  * The flagship `stedi_pipeline` synthesizes the exact wire format of the
  * reference (Kafka-Connect Redis envelope wrapping a base64 customer JSON;
  * stedi-events risk JSON) from the `customer` and `events` tables, then
  * runs the verbatim reference chain: cast → from_json → flatten →
  * zSetEntries[0].element → unbase64 → from_json → null-filter → split
  * birthYear → inner equi-join on email → to_json output
  * (reference sparkpykafkajoin.py:66-294).
  *
  * Every query ends in a total-order `orderBy` so output files are
  * byte-deterministic for the driver's hash compare.
  */
object ReferenceQueries {

  /** Deterministic birthDay string (yyyy-MM-dd) derived from the customer key. */
  private def birthDayCol = concat(
    (lit(1950) + col("c_custkey") % 50).cast("string"), lit("-"),
    lpad((lit(1) + col("c_custkey") % 12).cast("string"), 2, "0"), lit("-"),
    lpad((lit(1) + col("c_custkey") % 28).cast("string"), 2, "0"))

  private def emailCol(key: String) =
    concat(lit("user"), col(key), lit("@test.com"))

  /** Wire-format Redis CDC envelopes synthesized from `customer` — a
    * single-column `value: string` frame shaped exactly like the
    * `redis-server` Kafka topic (FIXTURES.md A1).
    */
  def syntheticEnvelopes(spark: SparkSession, dir: String): DataFrame = {
    val customerJson = to_json(struct(
      col("c_name").as("customerName"),
      emailCol("c_custkey").as("email"),
      lpad((col("c_custkey") * 7919 % 1000000000).cast("string"), 10, "0").as("phone"),
      birthDayCol.as("birthDay")))
    Tables.load(spark, dir, "customer").select(to_json(struct(
      lit("Q3VzdG9tZXI=").as("key"),
      lit("NONE").as("existType"),
      lit(false).as("Ch"),
      lit(false).as("Incr"),
      array(struct(
        base64(customerJson.cast("binary")).as("element"),
        lit("0.0").as("score"))).as("zSetEntries")
    )).as("value"))
  }

  /** Wire-format stedi-events risk JSON synthesized from `events`
    * (FIXTURES.md A3): customer email from user_id, score from value. */
  def syntheticRiskEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events").select(to_json(struct(
      emailCol("user_id").as("customer"),
      col("value").as("score"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("riskDate")
    )).as("value"))

  /** Flagship: the complete reference pipeline in batch. */
  def stediPipeline(spark: SparkSession, dir: String): DataFrame = {
    val customers = StediOps.customerChain(syntheticEnvelopes(spark, dir))
    val risk = StediOps.parseRiskEvent(syntheticRiskEvents(spark, dir))
    StediOps.joinRiskWithCustomer(risk, customers)
      .select(
        col("customer"), col("score"), col("email"), col("birthYear"),
        col("customer").as("kafka_key"),
        to_json(struct(
          col("customer").as("customer"),
          col("score").cast("string").as("score"),
          col("email").as("email"),
          col("birthYear").cast("string").as("birthYear"))).as("kafka_value"))
      .orderBy("customer", "score", "kafka_value")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stedi_pipeline" -> ((s, d) => stediPipeline(s, d))
  )

  /** DuckDB oracles state the *semantics* of each query (the encode→decode
    * legs are identities, so the oracle derives the same final relation
    * directly); a mismatch anywhere in the Spark chain breaks hash equality.
    */
  val oracles: Map[String, String] = Map(
    "stedi_pipeline" ->
      """WITH cust AS (
        |  SELECT 'user' || c_custkey || '@test.com' AS email,
        |         CAST(1950 + c_custkey % 50 AS VARCHAR) AS birthYear
        |  FROM customer
        |), risk AS (
        |  SELECT 'user' || user_id || '@test.com' AS customer, value AS score
        |  FROM events
        |)
        |SELECT r.customer, r.score, c.email, c.birthYear,
        |       r.customer AS kafka_key,
        |       CAST(to_json(struct_pack(
        |         customer := r.customer,
        |         score := CAST(r.score AS VARCHAR),
        |         email := c.email,
        |         birthYear := c.birthYear)) AS VARCHAR) AS kafka_value
        |FROM risk r JOIN cust c ON r.customer = c.email
        |ORDER BY customer, score, kafka_value""".stripMargin
  )
}
