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

  /** q88 / TPC-H Q21 shape — suppliers who kept orders waiting: late lines
    * (shipped > 60 days after ordering, finalized orders) where SOME other
    * supplier shares the order (EXISTS) but NO other supplier was late in
    * it (NOT EXISTS) — the hardest plan in the TPC-H suite.
    *
    * r16 rewrite (guide §1.2 — remove passes): the EXISTS/NOT-EXISTS
    * self-joins scanned lineitem THREE times (`late` twice + `allLines`)
    * and shuffled the fact three times. Both conditions are per-ORDER
    * facts, so one grouped pass computes them: per (orderkey, suppkey)
    * count the late lines, then over each order count its suppliers and
    * its late suppliers. A late line survives iff its order has ≥ 2
    * distinct suppliers (the EXISTS — some other supplier shares the
    * order) and exactly 1 late supplier (the NOT EXISTS — a late l1 is
    * itself late, so "no OTHER late supplier" ⟺ the order's late-supplier
    * count is 1); it contributes its group's late-line count to numwait.
    * Both the (orderkey, suppkey) aggregate and the per-order window ride
    * the orderkey partitioning the lineitem⋈orders join already
    * established — ONE lineitem scan, ONE fact exchange, no self-joins
    * (plan: 3 lineitem scans → 1, SortMergeJoin semi+anti gone). The
    * orders join stays the SMJ tier adjudicated in r11/r14 — both sides
    * scale with the fact data, so neither broadcasts. The region-filtered
    * supplier dimension attaches last, size-gated, unchanged. */
  def q88Tpch21(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val nat = Tables.load(spark, dir, "nation")
      .filter(col("n_regionkey") === 2).select(col("n_nationkey"))
    val sup = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    val perSupp = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(count(when(
        col("l_shipdate") > col("o_orderdate") + expr("interval 60 days"),
        1)).as("late_cnt"))
    val w = Window.partitionBy(col("l_orderkey"))
    perSupp
      .withColumn("n_supps", count(lit(1)).over(w))
      .withColumn("n_late_supps",
        sum(when(col("late_cnt") > 0, 1L).otherwise(0L)).over(w))
      .filter(col("late_cnt") > 0 && col("n_supps") >= 2 &&
        col("n_late_supps") === 1)
      .join(broadcastIfSmall(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_cnt")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** q89 / TPC-H Q20 shape — excess-stock suppliers: suppliers (in one
    * region) who shipped MORE of some matching part in 1997 than half
    * their all-time volume of it. Q20's nested IN with a correlated
    * scalar aggregate decorrelates into a SINGLE grouped pass: one
    * shuffle on (suppkey, partkey) computing both the all-time sum and
    * the 1997 conditional sum side by side, then the HAVING comparison
    * as an integer filter (2·qc97 > total — exact centi-unit arithmetic,
    * no float halves). The part-name IN-list prunes lineitem through a
    * size-gated semi join BEFORE the shuffle, and the surviving supplier
    * key set semi-joins the dimension last. Catalyst produces this same
    * decorrelation for the SQL form; writing it directly keeps the plan
    * explicit and the pass count at one. */
  def q89Tpch20(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.load(spark, dir, "part")
      .filter(col("p_name").like("red%")).select(col("p_partkey"))
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"), col("l_shipdate"),
        expr("cast(round(l_quantity * 100.0D, 0) as bigint)").as("qc"))
      .join(broadcastIfSmall(redParts),
        col("l_partkey") === col("p_partkey"), "left_semi")
    val in97 = col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
      col("l_shipdate") < lit("1998-01-01").cast("timestamp")
    val excess = li
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("qc")).as("total_qc"),
        sum(when(in97, col("qc")).otherwise(0L)).as("qc97"))
      .filter(col("qc97") * 2 > col("total_qc"))
      .select(col("l_suppkey")).distinct()
    val nat = Tables.load(spark, dir, "nation")
      .filter(col("n_regionkey") === 1).select(col("n_nationkey"))
    Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcastIfSmall(excess),
        col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_suppkey"))
      .orderBy("s_name")
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_tpch18" -> ((s, d) => q85Tpch18(s, d)),
    "q86_tpch22" -> ((s, d) => q86Tpch22(s, d)),
    "q81_tpch3" -> ((s, d) => q81Tpch3(s, d)),
    "q82_tpch5" -> ((s, d) => q82Tpch5(s, d)),
    "q83_tpch10" -> ((s, d) => q83Tpch10(s, d)),
    "q84_tpch4" -> ((s, d) => q84Tpch4(s, d)),
    "q88_tpch21" -> ((s, d) => q88Tpch21(s, d)),
    "q89_tpch20" -> ((s, d) => q89Tpch20(s, d))
  )

  private val revSql =
    "CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0, 0) AS BIGINT)"

  // lazy: oracle SQL bodies cross-reference sibling modules (t27→Dedup,
  // s24→Text…); eager Maps would make object-init order a correctness
  // hazard (NPE on whichever module clinit runs first).
  lazy val oracles: Map[String, String] = Map(
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

    "q88_tpch21" ->
      """WITH late AS (
        |  SELECT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  WHERE o.o_orderstatus = 'F'
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1
        |JOIN supplier ON s_suppkey = l1.l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_regionkey = 2
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q89_tpch20" ->
      """SELECT s_name, s_suppkey
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_regionkey = 1 AND s_suppkey IN (
        |  SELECT l1.l_suppkey FROM lineitem l1
        |  WHERE l1.l_partkey IN (SELECT p_partkey FROM part
        |                         WHERE p_name LIKE 'red%')
        |    AND l1.l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l1.l_shipdate < TIMESTAMP '1998-01-01'
        |  GROUP BY l1.l_suppkey, l1.l_partkey
        |  HAVING 2*SUM(CAST(round(l1.l_quantity*100.0,0) AS BIGINT)) >
        |    (SELECT SUM(CAST(round(l2.l_quantity*100.0,0) AS BIGINT))
        |     FROM lineitem l2
        |     WHERE l2.l_partkey = l1.l_partkey
        |       AND l2.l_suppkey = l1.l_suppkey))
        |ORDER BY s_name""".stripMargin,

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
