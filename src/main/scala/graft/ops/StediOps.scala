package graft.ops

import graft.Schemas
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The reference's transformation surface as pure `DataFrame => DataFrame`
  * functions, written once and reused in three contexts: batch over parquet
  * (Verify/Bench harness), Structured Streaming over Kafka
  * (graft.pipelines), and unit tests over literal frames.
  *
  * Each function cites the reference call site it re-expresses
  * (reference paths are into /root/reference/project/starter/).
  * All of it is stock Catalyst — whole-stage codegen fuses the
  * cast/parse/filter/split chain into a single generated function per
  * stage, and nothing here shuffles except the final join.
  */
object StediOps {

  /** P1 — Kafka `value: binary` → String (sparkpykafkajoin.py:79-81). */
  def castValueAsString(df: DataFrame): DataFrame =
    df.selectExpr("CAST(value AS STRING) as value")

  /** F1+P2 — parse the Redis CDC envelope and flatten its 8 fields
    * (sparkpykafkajoin.py:115-126). PERMISSIVE parsing: malformed JSON or
    * missing fields yield nulls, never failures.
    */
  def parseRedisEnvelope(df: DataFrame): DataFrame =
    df.select(from_json(col("value"), Schemas.redisServer).as("data"))
      .select(
        col("data.key").as("key"),
        col("data.value").as("value"),
        col("data.expiredType").as("expiredType"),
        col("data.expiredValue").as("expiredValue"),
        col("data.existType").as("existType"),
        col("data.Ch").as("ch"),
        col("data.Incr").as("incr"),
        col("data.zSetEntries").as("zSetEntries"))

  /** P3+P5 — `zSetEntries[0].element AS encodedCustomer WHERE zSetEntries
    * IS NOT NULL` (sparkpykafkajoin.py:133-138). Only the first array entry
    * is read; non-zset Redis events (null array) are dropped.
    */
  def extractEncodedCustomer(df: DataFrame): DataFrame =
    df.filter(col("zSetEntries").isNotNull)
      .select(expr("zSetEntries[0].element").as("encodedCustomer"))

  /** F2 — base64-decode the customer payload to a UTF-8 JSON string
    * (sparkpykafkajoin.py:156-158). */
  def decodeCustomer(df: DataFrame): DataFrame =
    df.select(unbase64(col("encodedCustomer")).cast(StringType).as("customer"))

  /** F1+P2 — parse the customer JSON and flatten (sparkpykafkajoin.py:163-165). */
  def parseCustomer(df: DataFrame): DataFrame =
    df.select(from_json(col("customer"), Schemas.customer).as("customer"))
      .select("customer.*")

  /** P4 — keep only complete records; JSON parsing set non-existent fields
    * to null (sparkpykafkajoin.py:171-178). */
  def emailAndBirthDay(df: DataFrame): DataFrame =
    df.filter(col("email").isNotNull && col("birthDay").isNotNull)
      .select("email", "birthDay")

  /** F3 — birth year = first `-`-separated token of the `yyyy-MM-dd` string
    * (sparkpykafkajoin.py:184-187). */
  def emailAndBirthYear(df: DataFrame): DataFrame =
    df.select(col("email"), split(col("birthDay"), "-").getItem(0).as("birthYear"))

  /** Full customer-side chain: raw envelope JSON string → (email, birthYear). */
  def customerChain(rawValue: DataFrame): DataFrame =
    emailAndBirthYear(emailAndBirthDay(parseCustomer(decodeCustomer(
      extractEncodedCustomer(parseRedisEnvelope(rawValue))))))

  /** F1+P2+P6 — risk-event side: parse stedi-events JSON, drop null
    * customers (sparkpykafkajoin.py:226-241). */
  def parseRiskEvent(df: DataFrame): DataFrame =
    df.select(from_json(col("value"), Schemas.stediEvents).as("event"))
      .select("event.*")
      .filter(col("customer").isNotNull)

  /** J1+J2 — inner equi-join risk events with customer birth years on
    * email (sparkpykafkajoin.py:246-257). In streaming mode Spark plans a
    * StreamingSymmetricHashJoinExec with a hash shuffle on each key; in
    * batch mode Catalyst is free to broadcast the smaller side.
    */
  def joinRiskWithCustomer(risk: DataFrame, customer: DataFrame): DataFrame =
    risk.join(customer, risk("customer") === customer("email"), "inner")
      .select(col("customer"), col("score"), col("email"), col("birthYear"))

  /** Opt-in bounded-state variant of the join (the 100 TB scale path the
    * reference lacks): watermarks on both sides plus a time-bounded join
    * condition let Spark evict state older than `delay` (e.g. "1 HOUR").
    * Event time: `riskDate` on the risk side; `custTs` on the customer
    * side if present, else ingestion time (micro-batch timestamp).
    * Semantics differ from the reference's windowless join only for events
    * arriving more than `delay` apart — which is exactly the point.
    */
  def joinRiskWithCustomerWatermarked(
      risk: DataFrame, customer: DataFrame, delay: String): DataFrame =
    watermarkedJoin(risk, customer, delay, "inner")

  /** Left-outer variant: risk events with no matching customer record
    * inside the time bound still emit (null email/birthYear) once the
    * watermark passes — the unmatched-events audit stream a production
    * pipeline runs alongside the enrichment join. Outer stream-stream
    * joins REQUIRE the watermark + time-bound condition (state must be
    * provably closeable before a null-padded row can be emitted), which
    * is why the reference's windowless join could never express this. */
  def joinRiskWithCustomerLeftOuter(
      risk: DataFrame, customer: DataFrame, delay: String): DataFrame =
    watermarkedJoin(risk, customer, delay, "leftOuter")

  /** Left-semi variant: risk events that HAVE an in-window customer match,
    * emitted once each (never multiplied by match count) and carrying only
    * risk-side columns — the streaming filter-by-existence that completes
    * the stream-stream join taxonomy (inner / left-outer / left-semi are
    * the three Spark supports). State bounds exactly as the inner
    * variant's. */
  def joinRiskWithCustomerSemi(
      risk: DataFrame, customer: DataFrame, delay: String): DataFrame =
    boundedJoin(risk, customer, delay, "left_semi")
      .select(col("customer"), col("score"))

  /** Shared join construction for all three watermarked variants: event
    * time parse, custTs ingestion-time fallback, symmetric watermarks and
    * the time-bounded equi-join condition — only the join type and the
    * output projection differ per variant. */
  private def boundedJoin(
      risk: DataFrame, customer: DataFrame, delay: String,
      joinType: String): DataFrame = {
    val r = risk.withColumn("riskTs", to_timestamp(col("riskDate")))
      .withWatermark("riskTs", delay)
    val cBase =
      if (customer.columns.contains("custTs")) customer
      else customer.withColumn("custTs", current_timestamp())
    val c = cBase.withWatermark("custTs", delay)
    r.as("r").join(c.as("c"),
      expr(s"r.customer = c.email AND " +
        s"r.riskTs >= c.custTs - INTERVAL $delay AND " +
        s"r.riskTs <= c.custTs + INTERVAL $delay"), joinType)
  }

  private def watermarkedJoin(
      risk: DataFrame, customer: DataFrame, delay: String,
      joinType: String): DataFrame =
    boundedJoin(risk, customer, delay, joinType)
      .select(col("r.customer").as("customer"), col("r.score").as("score"),
        col("c.email").as("email"), col("c.birthYear").as("birthYear"))

  /** F4+F5 — Kafka sink projection: key = customer, value = JSON with
    * `score`/`birthYear` deliberately cast to JSON *strings*, matching the
    * reference byte-for-byte (sparkpykafkajoin.py:274-284).
    */
  def toKafkaOutput(df: DataFrame): DataFrame =
    df.select(
      col("customer").as("key"),
      to_json(struct(
        col("customer").as("customer"),
        col("score").cast(StringType).as("score"),
        col("email").as("email"),
        col("birthYear").cast(StringType).as("birthYear")
      )).as("value"))
}
