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
  /** `fanout` > 1 spreads the RAW table BEFORE the JSON/base64 encode:
    * projections don't migrate across a user repartition, so an outer
    * `.repartition(par)` (the old shape) left the encode in the
    * single-split scan task — 0.7–0.9 s of serial CPU per side at sf0.1
    * while 31 cores idled. Default 1 keeps the wire-format feeds
    * byte-stable for the stream specs. */
  def syntheticEnvelopes(spark: SparkSession, dir: String,
      fanout: Int = 1): DataFrame = {
    val customerJson = to_json(struct(
      col("c_name").as("customerName"),
      emailCol("c_custkey").as("email"),
      lpad((col("c_custkey") * 7919 % 1000000000).cast("string"), 10, "0").as("phone"),
      birthDayCol.as("birthDay")))
    val src = Tables.load(spark, dir, "customer")
    (if (fanout > 1) src.repartition(fanout) else src).select(to_json(struct(
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
  def syntheticRiskEvents(spark: SparkSession, dir: String,
      fanout: Int = 1): DataFrame = {
    val src = Tables.load(spark, dir, "events")
    (if (fanout > 1) src.repartition(fanout) else src).select(to_json(struct(
      emailCol("user_id").as("customer"),
      col("value").as("score"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("riskDate")
    )).as("value"))
  }

  /** Flagship: the complete reference pipeline in batch. The customer side
    * (the dimension) is broadcast: the risk stream is the fact side and
    * never shuffles — the exact plan we'd want at 100 TB of events. */
  def stediPipeline(spark: SparkSession, dir: String): DataFrame = {
    // Both feeds come from the per-(session, dir) checkpointed parse
    // caches below. Two reasons beyond plain reuse (r16, plan-audited):
    // the encode→parse chain is the pipeline's whole CPU, and (a)
    // PushDownPredicates substitutes the chain's isnotnull gates BELOW
    // the fan-out repartition, re-evaluating the full
    // from_json(base64(to_json(...))) tower per row inside the
    // single-split scan task (0.7–0.9 s serial per side at sf0.1, plus a
    // second evaluation in the post-exchange projection — the guide §4.4
    // duplication); (b) in the real pipeline these ARE the standing
    // parsed streams (Kafka feeds), re-read per consumer, not re-parsed.
    // The checkpoint is the stage boundary: filters stay above the
    // materialized rows and the parse runs once, fanned out.
    val customers = broadcast(envCustomers(spark, dir))
    val risk = wmRisk(spark, dir)
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

  /** P1 — binary→string cast projection (the Kafka `CAST(value AS STRING)`
    * leg), exercised as a binary round-trip over `documents.text`. */
  def castBinaryString(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").cast("string").as("value"))
      .orderBy("doc_id")

  /** F1 — PERMISSIVE from_json over the `events.props` JSON column. */
  def jsonParse(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"), from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
      .orderBy("event_id")

  /** P3 — array element access (`zSetEntries[0].element` analog). */
  def arrayAccess(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        expr("split(text, ' ')[0]").as("first_token"),
        size(split(col("text"), " ")).as("n_tokens"))
      .orderBy("doc_id")

  /** F2 — base64 encode + unbase64 decode round-trip (the customer-payload
    * decode leg). */
  def base64Roundtrip(spark: SparkSession, dir: String): DataFrame = {
    // Spark's base64 MIME-chunks at 76 chars with CRLF (commons-codec
    // heritage); strip the wrapping to canonical RFC 4648 so the encoding
    // matches every other engine. unbase64 accepts both forms.
    val enc = regexp_replace(base64(col("text").cast("binary")), "[\\r\\n]", "")
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        enc.as("encoded"),
        unbase64(enc).cast("string").as("decoded"))
      .orderBy("doc_id")
  }

  /** P4/P5/P6 — NOT NULL + predicate filters below a JSON parse. */
  def nullFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
      .filter(col("k").isNotNull && col("event_type") =!= "error")
      .orderBy("event_id")

  /** F3 — birth-year style `split(date_str, '-')[0]` extraction. */
  def splitYear(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        split(date_format(col("o_orderdate"), "yyyy-MM-dd"), "-").getItem(0).as("order_year"))
      .orderBy("o_orderkey")

  /** J1/J2 — batch inner equi-join (risk×customer analog). The dimension
    * side is explicitly broadcast: at 100 TB the fact side (`events`)
    * streams through while the small side ships once per executor —
    * no shuffle of the big side at all. */
  def joinEventsCustomer(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val c = Tables.load(spark, dir, "customer")
    e.join(broadcast(c), e("user_id") === c("c_custkey"), "inner")
      .select(col("event_id"), col("c_name"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** J1 bounded-state variant — batch twin of
    * `StediOps.joinRiskWithCustomerWatermarked`: the SAME operator
    * function on batch inputs. Catalyst's EliminateEventTimeWatermark
    * drops the watermark nodes over batch children, leaving exactly the
    * time-bounded equi-join algebra that the streaming variant evicts
    * state by — so the DuckDB oracle pins the join-condition semantics
    * the streaming specs assert only pointwise. custTs is synthesized
    * DETERMINISTICALLY (key-spread hourly across the events month) to
    * exercise the custTs-present branch; the ingestion-time fallback is
    * nondeterministic by design and stays streaming-only. The ±36 h bound
    * keeps roughly a tenth of each customer's events, so the time
    * predicate does real filtering at every scale factor. */
  def joinWatermarked(spark: SparkSession, dir: String): DataFrame =
    StediOps.joinRiskWithCustomerWatermarked(
      wmRisk(spark, dir), broadcast(wmCustomers(spark, dir)), "36 HOURS")
      .orderBy("customer", "score", "email", "birthYear")

  /** Shared deterministic frames for the watermarked-join twins. The
    * parsed risk frame is checkpointed once per (session, dir): the JSON
    * synth+parse chain dominates all three twins' cost (BASELINE.md
    * residual attribution) and is identical across them — the same
    * build-once DirCaches discipline the ext indexes use. */
  private val caches = new graft.ext.DirCaches
  private val wmRiskCache = caches.newCache()

  /** Bench/Verify teardown hook (see [[graft.ext.DedupQueries.clearCaches]]). */
  def clearCaches(): Unit = caches.clear()

  private def wmRisk(spark: SparkSession, dir: String): DataFrame = {
    caches.evictOtherDirs(spark, dir)
    wmRiskCache.getOrElseUpdate((spark, dir), {
      StediOps.parseRiskEvent(syntheticRiskEvents(spark, dir,
          fanout = spark.sparkContext.defaultParallelism))
        .localCheckpoint()
    })
  }

  /** The parsed customer-envelope chain (decode → parse → project), the
    * dimension-side twin of [[wmRisk]]: built and checkpointed once per
    * (session, dir) — the standing parsed customer table the reference
    * pipeline maintains. Row count bounded by `customer` (a dimension),
    * so the broadcast posture downstream is unchanged. */
  private val envCustomersCache = caches.newCache()
  private def envCustomers(spark: SparkSession, dir: String): DataFrame = {
    caches.evictOtherDirs(spark, dir)
    envCustomersCache.getOrElseUpdate((spark, dir), {
      StediOps.customerChain(syntheticEnvelopes(spark, dir,
          fanout = spark.sparkContext.defaultParallelism))
        .localCheckpoint()
    })
  }

  private def wmCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer").select(
      emailCol("c_custkey").as("email"),
      (lit(1950) + col("c_custkey") % 50).cast("string").as("birthYear"),
      expr("timestamp'2024-01-01 00:00:00' + (c_custkey % 720) * INTERVAL 1 HOUR")
        .as("custTs"))

  /** Left-outer variant twin — risk events with NO in-window customer
    * match still emit with null email/birthYear (the unmatched-events
    * audit stream). Same operator, batch inputs; the outer emission rule
    * the stream defers to watermark passage is, over a bounded frame,
    * just the left join's null padding. */
  def joinWatermarkedOuter(spark: SparkSession, dir: String): DataFrame =
    StediOps.joinRiskWithCustomerLeftOuter(
      wmRisk(spark, dir), broadcast(wmCustomers(spark, dir)), "36 HOURS")
      .orderBy("customer", "score", "email", "birthYear")

  /** Left-semi variant twin — risk events that HAVE an in-window match,
    * emitted once each with risk-side columns only (never multiplied by
    * match count). */
  def joinWatermarkedSemi(spark: SparkSession, dir: String): DataFrame =
    StediOps.joinRiskWithCustomerSemi(
      wmRisk(spark, dir), broadcast(wmCustomers(spark, dir)), "36 HOURS")
      .orderBy("customer", "score")

  /** F4 — to_json(struct(...)) serialization (Kafka sink value leg). */
  def toJsonStruct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_id"),
        to_json(struct(col("event_id"), col("event_type"))).as("json_value"))
      .orderBy("event_id")

  /** Q1 — createOrReplaceTempView + spark.sql entry point. */
  def sqlOverView(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stedi_pipeline" -> ((s, d) => stediPipeline(s, d)),
    "r_cast_binary_string" -> ((s, d) => castBinaryString(s, d)),
    "r_json_parse" -> ((s, d) => jsonParse(s, d)),
    "r_array_access" -> ((s, d) => arrayAccess(s, d)),
    "r_base64_roundtrip" -> ((s, d) => base64Roundtrip(s, d)),
    "r_null_filter" -> ((s, d) => nullFilter(s, d)),
    "r_split_year" -> ((s, d) => splitYear(s, d)),
    "r_join_events_customer" -> ((s, d) => joinEventsCustomer(s, d)),
    "r_join_watermarked" -> ((s, d) => joinWatermarked(s, d)),
    "r_join_watermarked_outer" -> ((s, d) => joinWatermarkedOuter(s, d)),
    "r_join_watermarked_semi" -> ((s, d) => joinWatermarkedSemi(s, d)),
    "r_to_json_struct" -> ((s, d) => toJsonStruct(s, d)),
    "r_sql_over_view" -> ((s, d) => sqlOverView(s, d))
  )

  /** DuckDB oracles state the *semantics* of each query (the encode→decode
    * legs are identities, so the oracle derives the same final relation
    * directly); a mismatch anywhere in the Spark chain breaks hash equality.
    */
  // lazy: oracle SQL bodies cross-reference sibling modules (t27→Dedup,
  // s24→Text…); eager Maps would make object-init order a correctness
  // hazard (NPE on whichever module clinit runs first).
  lazy val oracles: Map[String, String] = Map(
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
        |ORDER BY customer, score, kafka_value""".stripMargin,

    "r_cast_binary_string" ->
      "SELECT doc_id, decode(encode(text)) AS value FROM documents ORDER BY doc_id",

    "r_json_parse" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "r_array_access" ->
      """SELECT doc_id, string_split(text, ' ')[1] AS first_token,
        |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "r_base64_roundtrip" ->
      """SELECT doc_id, to_base64(encode(text)) AS encoded,
        |       decode(from_base64(to_base64(encode(text)))) AS decoded
        |FROM documents ORDER BY doc_id""".stripMargin,

    "r_null_filter" ->
      """SELECT event_id, event_type,
        |       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        |FROM events
        |WHERE json_extract_string(props, '$.k') IS NOT NULL
        |  AND event_type <> 'error'
        |ORDER BY event_id""".stripMargin,

    "r_split_year" ->
      """SELECT o_orderkey,
        |       split_part(strftime(o_orderdate, '%Y-%m-%d'), '-', 1) AS order_year
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "r_join_events_customer" ->
      """SELECT event_id, c_name, event_type, value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY event_id""".stripMargin,

    "r_join_watermarked" ->
      """WITH risk AS (
        |  SELECT 'user' || user_id || '@test.com' AS customer, value AS score,
        |         date_trunc('milliseconds', ts) AS riskTs
        |  FROM events
        |), cust AS (
        |  SELECT 'user' || c_custkey || '@test.com' AS email,
        |         CAST(1950 + c_custkey % 50 AS VARCHAR) AS birthYear,
        |         TIMESTAMP '2024-01-01 00:00:00'
        |           + (c_custkey % 720) * INTERVAL 1 HOUR AS custTs
        |  FROM customer
        |)
        |SELECT r.customer, r.score, c.email, c.birthYear
        |FROM risk r JOIN cust c ON r.customer = c.email
        |  AND r.riskTs >= c.custTs - INTERVAL 36 HOUR
        |  AND r.riskTs <= c.custTs + INTERVAL 36 HOUR
        |ORDER BY customer, score, email, birthYear""".stripMargin,

    "r_join_watermarked_outer" ->
      """WITH risk AS (
        |  SELECT 'user' || user_id || '@test.com' AS customer, value AS score,
        |         date_trunc('milliseconds', ts) AS riskTs
        |  FROM events
        |), cust AS (
        |  SELECT 'user' || c_custkey || '@test.com' AS email,
        |         CAST(1950 + c_custkey % 50 AS VARCHAR) AS birthYear,
        |         TIMESTAMP '2024-01-01 00:00:00'
        |           + (c_custkey % 720) * INTERVAL 1 HOUR AS custTs
        |  FROM customer
        |)
        |SELECT r.customer, r.score, c.email, c.birthYear
        |FROM risk r LEFT JOIN cust c ON r.customer = c.email
        |  AND r.riskTs >= c.custTs - INTERVAL 36 HOUR
        |  AND r.riskTs <= c.custTs + INTERVAL 36 HOUR
        |ORDER BY customer, score,
        |         email NULLS FIRST, birthYear NULLS FIRST""".stripMargin,

    "r_join_watermarked_semi" ->
      """WITH cust AS (
        |  SELECT 'user' || c_custkey || '@test.com' AS email,
        |         TIMESTAMP '2024-01-01 00:00:00'
        |           + (c_custkey % 720) * INTERVAL 1 HOUR AS custTs
        |  FROM customer
        |)
        |SELECT 'user' || user_id || '@test.com' AS customer, value AS score
        |FROM events e
        |WHERE EXISTS (
        |  SELECT 1 FROM cust c
        |  WHERE c.email = 'user' || e.user_id || '@test.com'
        |    AND date_trunc('milliseconds', e.ts) >= c.custTs - INTERVAL 36 HOUR
        |    AND date_trunc('milliseconds', e.ts) <= c.custTs + INTERVAL 36 HOUR)
        |ORDER BY customer, score""".stripMargin,

    "r_to_json_struct" ->
      """SELECT event_id,
        |       CAST(to_json(struct_pack(event_id := event_id,
        |                                event_type := event_type)) AS VARCHAR) AS json_value
        |FROM events ORDER BY event_id""".stripMargin,

    "r_sql_over_view" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin
  )
}
