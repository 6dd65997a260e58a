package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second breadth tier: join types, window frames, statistical aggregates
  * and map functions the first OLAP tier didn't cover. Each entry is the
  * canonical Spark formulation of an operator class (SURVEY.md §2.8 names
  * these as reference gaps a complete engine must fill).
  */
object AdvancedQueries {

  /** q24 — full outer join with both null sides populated: per-user event
    * counts against the even-keyed half of `customer` (odd users match
    * nothing on the right; most even customers match nothing on the left —
    * all three row classes exist at every SF). */
  def q24FullOuter(spark: SparkSession, dir: String): DataFrame = {
    val ue = Tables.load(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"))
    ue.join(c, ue("user_id") === c("c_custkey"), "full_outer")
      .select(col("user_id"), col("n_events"), col("c_custkey"), col("c_name"))
      // coalesce(user_id, c_custkey) is unique across all three row
      // classes, giving the total order the hash compare needs.
      .orderBy(coalesce(col("user_id"), col("c_custkey")))
  }

  /** q25 — statistical aggregate battery: sample stddev/variance,
    * Pearson correlation, sample covariance (identical definitions in
    * DuckDB). */
  def q25Stats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(var_samp(col("l_quantity")), 6).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 6).as("cov_qp"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** q26 — RANGE window frame (value-based, not row-based): rolling 30-day
    * order total per customer, ordered by integral epoch day so both
    * engines bound the frame identically. */
  def q26RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    // o_orderdate is TIMESTAMP_NTZ (unix_micros rejects it); all fixture
    // dates are midnight, so the date-diff day number is exact.
    val days = expr("datediff(cast(o_orderdate as date), date'1970-01-01')").cast("long")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-30, 0)
    Tables.load(spark, dir, "orders")
      .withColumn("d", days)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("rolling_30d"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q27 — first_value / last_value / nth_value with explicit frames
    * (running first vs whole-partition last and 2nd). */
  def q27FirstLast(spark: SparkSession, dir: String): DataFrame = {
    val sort = Seq(col("o_orderdate").asc, col("o_orderkey").asc)
    val wRun = Window.partitionBy(col("o_custkey")).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("o_custkey")).orderBy(sort: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(wRun).as("first_price"),
        last(col("o_totalprice")).over(wAll).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(wAll).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q28 — map construction and access battery: literal map, lookup,
    * missing-key null, map_concat, size. The oracle states the expected
    * semantics directly (lookups resolve to the source columns). */
  def q28Map(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .withColumn("m", map(
        lit("status"), col("o_orderstatus"),
        lit("prio"), col("o_orderpriority")))
      .select(col("o_orderkey"),
        element_at(col("m"), "status").as("status_v"),
        element_at(col("m"), "prio").as("prio_v"),
        element_at(col("m"), "nope").as("missing_v"),
        size(map_concat(col("m"), map(lit("extra"), lit("x")))).cast("long").as("n_keys"))
      .orderBy("o_orderkey")

  /** q29 — IN-subquery through the SQL parser (plans as a left-semi
    * join — never a per-row lookup). */
  def q29InSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_full_outer" -> ((s, d) => q24FullOuter(s, d)),
    "q25_stats" -> ((s, d) => q25Stats(s, d)),
    "q26_range_frame" -> ((s, d) => q26RangeFrame(s, d)),
    "q27_first_last" -> ((s, d) => q27FirstLast(s, d)),
    "q28_map" -> ((s, d) => q28Map(s, d)),
    "q29_in_subquery" -> ((s, d) => q29InSubquery(s, d))
  )

  val oracles: Map[String, String] = Map(
    "q24_full_outer" ->
      """WITH ue AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
        |c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0)
        |SELECT ue.user_id, ue.n_events, c.c_custkey, c.c_name
        |FROM ue FULL OUTER JOIN c ON ue.user_id = c.c_custkey
        |ORDER BY coalesce(ue.user_id, c.c_custkey)""".stripMargin,

    "q25_stats" ->
      """SELECT l_returnflag,
        |       round(stddev_samp(l_quantity), 6) AS sd_qty,
        |       round(var_samp(l_quantity), 6) AS var_qty,
        |       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |       round(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qp,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q26_range_frame" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY d
        |         RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rolling_30d
        |FROM (SELECT *, epoch(o_orderdate)::BIGINT // 86400 AS d FROM orders)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q27_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |       first_value(o_totalprice) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
        |       last_value(o_totalprice) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        |       nth_value(o_totalprice, 2) OVER (PARTITION BY o_custkey
        |         ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q28_map" ->
      """SELECT o_orderkey, o_orderstatus AS status_v, o_orderpriority AS prio_v,
        |       CAST(NULL AS VARCHAR) AS missing_v, CAST(3 AS BIGINT) AS n_keys
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q29_in_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |ORDER BY o_orderkey""".stripMargin
  )
}
