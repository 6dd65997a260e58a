package graft.queries

import graft.Tables
import graft.ops.PlanHints.broadcastIfSmall
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-shaped multi-way join plans over the fixture star schema — the
  * deepest join trees in the suite (4-6 relations), exercising the
  * broadcast-vs-shuffle planning mix a warehouse engine lives on:
  * selective dimensions broadcast, the orders⋈lineitem spine shuffles on
  * the order key, semi-joins stay semi (never materialize the probe), and
  * top-k over an aggregate plans as TakeOrderedAndProject.
  *
  * Revenue is quantized PER ROW to 1e-4 dollars
  * (`round(extprice·(1−disc)·10000)` — one fixed expression tree, so both
  * engines compute the identical IEEE double before the exact integer
  * round) and summed as BIGINT: merge-order-independent, hash-stable.
  * The queries adapt TPC-H Q3/Q5/Q10/Q4 to the fixture columns (no
  * commitdate/receiptdate exists, so Q4's lateness predicate becomes
  * "shipped more than 60 days after ordering").
  */
object TpchQueries {

  private def revE4 = expr(
    "cast(round(l_extendedprice * (1.0D - l_discount) * 10000.0D, 0) as bigint)")

  /** q81 / TPC-H Q3 — shipping priority: top 10 unshipped-revenue orders
    * for one market segment at a cutoff date. customer (filtered to one
    * segment) broadcasts into orders; the orders⋈lineitem spine is the
    * only big shuffle; the LIMIT 10 rides a bounded heap. */
  def q81Tpch3(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = "1998-07-01"
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
      .select(col("l_orderkey"), revE4.as("rev"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(col("rev")).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("l_orderkey"))
      .limit(10)
  }

  /** q82 / TPC-H Q5 — local supplier volume: revenue per nation for one
    * region and one year, counted only where customer and supplier sit in
    * the same nation. nation/region are schema-bounded (25/5 rows) and
    * broadcast unconditionally; customer and supplier SCALE WITH THE FACT
    * DATA, so their hints are size-gated — at bench scale the gate attaches
    * the hint (same plan as before), at 100 TB the gate withholds it and
    * the spine falls back to a shuffle join (AQE may still promote). The
    * only wide exchanges are orders⋈lineitem and the final 5-row rollup. */
  def q82Tpch5(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), revE4.as("rev"))
    val c = Tables.load(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.load(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcastIfSmall(c), col("o_custkey") === col("c_custkey"))
      .join(broadcastIfSmall(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("n_name"))
  }

  /** q83 / TPC-H Q10 — returned-item reporting: the 20 customers who
    * returned the most revenue in a quarter. customer is projected to the
    * four output columns BEFORE any join (the scan prunes to them) and its
    * broadcast is size-gated — customer scales with the fact data, so at
    * 100 TB the gate withholds the hint and the post-aggregate (custkey)
    * frame shuffle-joins instead; nation (25 rows) broadcasts
    * unconditionally. The wide work stays on (custkey) only. */
  def q83Tpch10(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), revE4.as("rev"))
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
    val n = Tables.load(spark, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("rev")).as("revenue_e4"))
      .join(broadcastIfSmall(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        expr("cast(round(c_acctbal * 100.0D, 0) as bigint)").as("acctbal_cents"),
        col("n_name"), col("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("c_custkey"))
      .limit(20)
  }

  /** q84 / TPC-H Q4 shape — order-priority checking: orders in a half-year
    * with at least one LATE line (shipped > 60 days after ordering),
    * counted per priority. The lateness predicate correlates both sides,
    * so the plan must keep the lineitem probe as a LEFT SEMI join (exists
    * short-circuit, no fact-side duplication, no distinct repair). */
  def q84Tpch4(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val l = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("interval 60 days"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** q85 / TPC-H Q18 — large-volume orders: the 100 biggest orders by
    * total quantity above a HAVING threshold. The aggregate-then-back-join
    * shape: lineitem reduces to (orderkey, qty) WITH map-side partials,
    * the HAVING filter shrinks that to a few hundred keys, and only then
    * do orders/customer attach — the surviving-key frame is small enough
    * to broadcast onto the dimension joins, so nothing wide happens after
    * the first aggregation. Quantity quantizes to centi-units per row. */
  def q85Tpch18(spark: SparkSession, dir: String): DataFrame = {
    val ThresholdCenti = 22000L
    val big = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("cast(round(l_quantity * 100.0D, 0) as bigint)").as("qc"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("qc")).as("qty_centi"))
      .filter(col("qty_centi") > ThresholdCenti)
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
    val c = Tables.load(spark, dir, "customer").select(col("c_custkey"), col("c_name"))
    o.join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .join(broadcastIfSmall(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        expr("cast(round(o_totalprice * 100.0D, 0) as bigint)").as("totalprice_cents"),
        col("qty_centi"))
      .orderBy(col("totalprice_cents").desc, col("o_orderkey"))
      .limit(100)
  }

  /** q86 / TPC-H Q22 shape — inactive high-balance customers per nation:
    * balance above the positive-balance integer mean AND no order since a
    * cutoff. Two classic sub-plan shapes: a scalar subquery threshold
    * (computed as an exact integer `sum div n` so the comparison can't
    * flip on float merge order, then broadcast into the filter) and a
    * LEFT ANTI join whose probe side (recent orders) is the LARGE side —
    * the anti join reduces it to its key column before the shuffle. */
  def q86Tpch22(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        expr("cast(round(c_acctbal * 100.0D, 0) as bigint)").as("bal_cents"))
    val meanPos = c.filter(col("bal_cents") > 0)
      .agg(expr("sum(bal_cents) div count(1)").as("mean_cents"))
    val recent = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(meanPos))
      .filter(col("bal_cents") > col("mean_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_custs"), sum(col("bal_cents")).as("total_cents"))
      .orderBy("c_nationkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_tpch18" -> ((s, d) => q85Tpch18(s, d)),
    "q86_tpch22" -> ((s, d) => q86Tpch22(s, d)),
    "q81_tpch3" -> ((s, d) => q81Tpch3(s, d)),
    "q82_tpch5" -> ((s, d) => q82Tpch5(s, d)),
    "q83_tpch10" -> ((s, d) => q83Tpch10(s, d)),
    "q84_tpch4" -> ((s, d) => q84Tpch4(s, d))
  )

  private val revSql =
    "CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0, 0) AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "q85_tpch18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) AS BIGINT)
        |           AS qty_centi
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(round(l_quantity * 100.0, 0) AS BIGINT)) > 22000)
        |SELECT c_name, c_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |       CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS totalprice_cents,
        |       qty_centi
        |FROM big
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice_cents DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q86_tpch22" ->
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey,
        |         CAST(round(c_acctbal * 100.0, 0) AS BIGINT) bal_cents
        |  FROM customer),
        |m AS (SELECT CAST(SUM(bal_cents) // COUNT(*) AS BIGINT) mean_cents
        |      FROM c WHERE bal_cents > 0)
        |SELECT c_nationkey, COUNT(*) AS n_custs,
        |       CAST(SUM(bal_cents) AS BIGINT) AS total_cents
        |FROM c, m
        |WHERE bal_cents > mean_cents
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

    "q81_tpch3" ->
      s"""SELECT l_orderkey,
         |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
         |       o_orderpriority,
         |       CAST(SUM($revSql) AS BIGINT) AS revenue_e4
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-07-01'
         |  AND l_shipdate > TIMESTAMP '1998-07-01'
         |GROUP BY 1, 2, 3
         |ORDER BY revenue_e4 DESC, l_orderkey
         |LIMIT 10""".stripMargin,

    "q82_tpch5" ->
      s"""SELECT n_name,
         |       CAST(SUM($revSql) AS BIGINT) AS revenue_e4
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue_e4 DESC, n_name""".stripMargin,

    "q83_tpch10" ->
      s"""SELECT c_custkey, c_name,
         |       CAST(round(c_acctbal * 100.0, 0) AS BIGINT) AS acctbal_cents,
         |       n_name,
         |       CAST(SUM($revSql) AS BIGINT) AS revenue_e4
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-04-01'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue_e4 DESC, c_custkey
         |LIMIT 20""".stripMargin,

    "q84_tpch4" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-07-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
