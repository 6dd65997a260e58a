package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch OLAP operator surface over the TPC-H-ish fixtures — the
  * aggregation/window/set-op/join breadth the reference itself lacks
  * (SURVEY.md §2.8) but a complete engine needs.
  *
  * Scale posture: group-bys aggregate partially map-side before the
  * shuffle; dimension joins (region/nation/customer) are broadcast; sums
  * over doubles are rounded at (or finer than) the precision of the exact
  * underlying decimal quantity so the DuckDB hash compare is stable.
  */
object OlapQueries {

  /** TPC-H Q1: sliced full-table aggregation with partial (map-side)
    * aggregation before a 2-key shuffle — the canonical scan-heavy query.
    *
    * The avg columns compute as INTEGER half-up means — per-row exact
    * cents/basis-points, long sum, `(2s·scale + n) div 2n`, back to
    * double by one exact /1e6 — because `round(avg(double), 6)` can land
    * on a TRUE decimal half where Spark's and DuckDB's rounding modes
    * disagree (observed on this fixture family once), and float merge
    * order makes the miss intermittent. The emitted values are identical
    * everywhere else. The sum columns stay double: their true values sit
    * on the cents grid, 0.005 from any round-boundary — 1e-10 float
    * drift cannot cross that. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        sum(expr("cast(round(l_quantity * 100.0D, 0) as bigint)")).as("__sq"),
        sum(expr("cast(round(l_extendedprice * 100.0D, 0) as bigint)")).as("__sp"),
        sum(expr("cast(round(l_discount * 10000.0D, 0) as bigint)")).as("__sd"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty",
        expr("cast((__sq * 20000L + count_order) div (2L * count_order) as double) / 1000000.0D"))
      .withColumn("avg_price",
        expr("cast((__sp * 20000L + count_order) div (2L * count_order) as double) / 1000000.0D"))
      .withColumn("avg_disc",
        expr("cast((__sd * 200L + count_order) div (2L * count_order) as double) / 1000000.0D"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("sum_base_price"), col("sum_disc_price"), col("sum_charge"),
        col("avg_qty"), col("avg_price"), col("avg_disc"), col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Top-k with deterministic tie-break — plans as TakeOrderedAndProject
    * (no global sort: each partition keeps its local top 20, the driver
    * merges — the only scale-safe top-k shape). */
  def q2Topk(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(20)

  /** Ranking window: top 3 customers by balance per nation. */
  def q3WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.load(spark, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_nationkey"), col("rn").cast("long").as("rn"),
        col("c_custkey"), col("c_acctbal"))
      .orderBy("c_nationkey", "rn")
  }

  /** Analytic window frame: running total + lag per customer over time. */
  def q3bWindowFrame(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)), 2)
          .as("running_total"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Distinct (hash aggregate without measures). */
  def q4Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_type")).distinct().orderBy("event_type")

  /** Set operations: INTERSECT + EXCEPT, tagged and unioned. */
  def q5Setops(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events").select(col("user_id").as("id"))
    val c = Tables.load(spark, dir, "customer").select(col("c_custkey").as("id"))
    e.intersect(c).select(lit("both").as("tag"), col("id"))
      .unionAll(c.except(e).select(lit("cust_only").as("tag"), col("id")))
      .orderBy("tag", "id")
  }

  /** 3-way star join with broadcast dimensions (region, nation ship once
    * per executor; the customer scan never shuffles). */
  def q6StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.load(spark, dir, "region")
    val n = Tables.load(spark, dir, "nation")
    val c = Tables.load(spark, dir, "customer")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_bal"),
        sum(expr("cast(round(c_acctbal * 100.0D, 0) as bigint)")).as("__sb"))
      // Integer half-up mean (see q1Agg); balances can be NEGATIVE, so
      // compute on |s| and re-apply the sign — keeps the floor/trunc
      // division distinction between engines out of play.
      .withColumn("avg_bal", expr(
        "cast((case when __sb < 0 then -1L else 1L end) * " +
          "((abs(__sb) * 20000L + n_customers) div (2L * n_customers)) as double) " +
          "/ 1000000.0D"))
      .select(col("r_name"), col("n_name"), col("n_customers"),
        col("total_bal"), col("avg_bal"))
      .orderBy("r_name", "n_name")
  }

  /** Left-semi join (EXISTS): customers holding at least one big order. */
  def q7Semi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders").filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no urgent orders. (The
    * fixture generator gives every customer at least one order, so the
    * unfiltered variant returned 0 rows — a vacuous oracle check; the
    * priority filter keeps the result non-empty at every SF.) */
  def q8Anti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  /** ROLLUP grouping sets with grouping_id; NULLS FIRST ordering pinned on
    * both sides (Spark defaults nulls-first, DuckDB nulls-last). */
  def q9Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))
      .orderBy(col("gid").asc, col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** Scalar subquery: orders above the global average price. */
  def q10Subquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Date/time bucketing: per-month order stats. */
  def q11Date(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(
        year(col("o_orderdate")).cast("long").as("y"),
        month(col("o_orderdate")).cast("long").as("m"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("monthly_total"))
      .orderBy("y", "m")

  /** CASE WHEN buckets + exact math functions (abs/ceil/floor/sqrt). */
  def q12CaseMath(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 30, "mid")
          .otherwise("high").as("qty_bucket"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        floor(col("l_extendedprice")).as("price_floor"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"))
      .orderBy("l_orderkey", "l_linenumber")

  /** String function battery over part names. */
  def q13String(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_name"), 1, 5).as("name_pre"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** Array/higher-order function battery over tokenized documents. */
  def q14Array(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(lower(col("text")), " ")
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        concat_ws(",", slice(toks, 1, 3)).as("first3"),
        array_contains(toks, "the").as("has_the"),
        element_at(array_sort(toks), 1).as("min_token"))
      .orderBy("doc_id")
  }

  /** Per-user event aggregation incl. exact distinct + timestamp min/max. */
  def q15EventsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .orderBy("user_id")

  /** Grouped top-k via the custom bounded-heap TypedImperativeAggregate
    * ([[graft.functions.TopKPairs]]): top 3 orders per customer without a
    * window sort — map-side combine keeps at most k rows per group per
    * partition, so the shuffle carries a sketch, not the table. */
  def q16TopkGroup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(expr("topk_pairs(o_totalprice, o_orderkey, 3)").as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(
        col("o_custkey"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("o_orderkey"),
        col("col.score").as("o_totalprice"))
      .orderBy("o_custkey", "rank")
  }

  /** Pivot: order counts + rounded totals per status, one column per
    * priority bucket (conditional aggregation under the hood). */
  def q17Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .agg(round(sum(col("o_totalprice")), 2))
      .orderBy("o_orderstatus")

  /** CUBE grouping sets over two dimensions (all 4 grouping combinations). */
  def q18Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("gid").asc, col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** q67 — deterministic MODE: each user's most frequent event type,
    * ties to the lexicographically smallest type (SQL's `mode()` leaves
    * tie order engine-defined, so a portable pipeline needs the explicit
    * formulation). Two hash aggregates + one per-user argmax window over
    * the tiny (user, type) count frame — the corpus-sized shuffle is the
    * first count, whose map-side partials collapse it to
    * |users|·|types| rows. */
  def q67Mode(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("cnt").desc, col("event_type").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .withColumn("n_events", sum(col("cnt")).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"),
        col("cnt").as("n_mode"), col("n_events"))
      .orderBy("user_id")
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q67_mode" -> ((s, d) => q67Mode(s, d)),
    "q1_agg" -> ((s, d) => q1Agg(s, d)),
    "q16_topk_group" -> ((s, d) => q16TopkGroup(s, d)),
    "q17_pivot" -> ((s, d) => q17Pivot(s, d)),
    "q18_cube" -> ((s, d) => q18Cube(s, d)),
    "q2_topk" -> ((s, d) => q2Topk(s, d)),
    "q3_window_rank" -> ((s, d) => q3WindowRank(s, d)),
    "q3b_window_frame" -> ((s, d) => q3bWindowFrame(s, d)),
    "q4_distinct" -> ((s, d) => q4Distinct(s, d)),
    "q5_setops" -> ((s, d) => q5Setops(s, d)),
    "q6_star_join" -> ((s, d) => q6StarJoin(s, d)),
    "q7_semi_join" -> ((s, d) => q7Semi(s, d)),
    "q8_anti_join" -> ((s, d) => q8Anti(s, d)),
    "q9_rollup" -> ((s, d) => q9Rollup(s, d)),
    "q10_subquery" -> ((s, d) => q10Subquery(s, d)),
    "q11_date" -> ((s, d) => q11Date(s, d)),
    "q12_case_math" -> ((s, d) => q12CaseMath(s, d)),
    "q13_string" -> ((s, d) => q13String(s, d)),
    "q14_array" -> ((s, d) => q14Array(s, d)),
    "q15_events_agg" -> ((s, d) => q15EventsAgg(s, d))
  )

  // lazy: oracle SQL bodies cross-reference sibling modules (t27→Dedup,
  // s24→Text…); eager Maps would make object-init order a correctness
  // hazard (NPE on whichever module clinit runs first).
  lazy val oracles: Map[String, String] = Map(
    "q67_mode" ->
      """WITH c AS (
        |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, event_type, cnt,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY cnt DESC, event_type ASC) rn,
        |         CAST(sum(cnt) OVER (PARTITION BY user_id) AS BIGINT) n_events
        |  FROM c)
        |SELECT user_id, event_type AS mode_type, cnt AS n_mode, n_events
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity),2) AS sum_qty,
        |  round(sum(l_extendedprice),2) AS sum_base_price,
        |  round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        |  round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
        |  (SUM(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) * 20000 + count(*))
        |    // (2 * count(*)) / 1000000.0 AS avg_qty,
        |  (SUM(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) * 20000 + count(*))
        |    // (2 * count(*)) / 1000000.0 AS avg_price,
        |  (SUM(CAST(round(l_discount * 10000.0, 0) AS BIGINT)) * 200 + count(*))
        |    // (2 * count(*)) / 1000000.0 AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q16_topk_group" ->
      """SELECT o_custkey, rank, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders)
        |WHERE rank <= 3 ORDER BY o_custkey, rank""".stripMargin,

    "q18_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |       count(*) AS n, round(sum(o_totalprice),2) AS total
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q17_pivot" ->
      """SELECT o_orderstatus,
        |       round(sum(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 2) AS "1-URGENT",
        |       round(sum(o_totalprice) FILTER (o_orderpriority = '2-HIGH'), 2) AS "2-HIGH",
        |       round(sum(o_totalprice) FILTER (o_orderpriority = '3-MEDIUM'), 2) AS "3-MEDIUM"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q3_window_rank" ->
      """SELECT c_nationkey, rn, c_custkey, c_acctbal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |         row_number() OVER (PARTITION BY c_nationkey
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY c_nationkey, rn""".stripMargin,

    "q3b_window_frame" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        |       lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q4_distinct" ->
      "SELECT DISTINCT event_type FROM events ORDER BY event_type",

    "q5_setops" ->
      """SELECT 'both' AS tag, id FROM
        |  (SELECT user_id AS id FROM events INTERSECT SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'cust_only' AS tag, id FROM
        |  (SELECT c_custkey AS id FROM customer EXCEPT SELECT user_id FROM events)
        |ORDER BY tag, id""".stripMargin,

    "q6_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_customers,
        |       round(sum(c_acctbal),2) AS total_bal,
        |       (CASE WHEN SUM(CAST(round(c_acctbal * 100.0, 0) AS BIGINT)) < 0
        |             THEN -1 ELSE 1 END) *
        |       ((abs(SUM(CAST(round(c_acctbal * 100.0, 0) AS BIGINT))) * 20000
        |         + count(*)) // (2 * count(*))) / 1000000.0 AS avg_bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q7_semi_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin,

    "q8_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q9_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q10_subquery" ->
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q11_date" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
        |       count(*) AS n, round(sum(o_totalprice),2) AS monthly_total
        |FROM orders GROUP BY y, m ORDER BY y, m""".stripMargin,

    "q12_case_math" ->
      """SELECT l_orderkey, l_linenumber,
        |       CASE WHEN l_quantity < 10 THEN 'low'
        |            WHEN l_quantity < 30 THEN 'mid'
        |            ELSE 'high' END AS qty_bucket,
        |       abs(l_discount - 0.05) AS disc_dev,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       round(sqrt(l_quantity), 6) AS qty_sqrt
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q13_string" ->
      """SELECT p_partkey, upper(p_name) AS name_upper,
        |       substring(p_name, 1, 5) AS name_pre,
        |       length(p_name) AS name_len,
        |       regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
        |       lpad(p_brand, 12, '*') AS brand_pad,
        |       concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q14_array" ->
      """SELECT doc_id,
        |       len(string_split(lower(text),' ')) AS n_tokens,
        |       len(list_distinct(string_split(lower(text),' '))) AS n_distinct,
        |       array_to_string(string_split(lower(text),' ')[1:3], ',') AS first3,
        |       list_contains(string_split(lower(text),' '), 'the') AS has_the,
        |       list_sort(string_split(lower(text),' '))[1] AS min_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q15_events_agg" ->
      """SELECT user_id, count(*) AS n_events,
        |       round(sum(value),2) AS total_value,
        |       count(DISTINCT event_type) AS n_types,
        |       min(ts) AS first_ts, max(ts) AS last_ts
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
