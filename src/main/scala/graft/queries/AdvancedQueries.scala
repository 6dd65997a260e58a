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

  private val caches = new graft.ext.DirCaches

  /** Bench/Verify teardown hook (see [[graft.ext.DedupQueries.clearCaches]]). */
  def clearCaches(): Unit = caches.clear()

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

  /** q30 — higher-order array function battery: filter, aggregate (fold),
    * exists, forall over tokenized documents. These run inside whole-stage
    * codegen as lambda expressions — no UDF boundary. */
  def q30Hof(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", split(lower(col("text")), " "))
      .select(col("doc_id"),
        expr("size(filter(toks, w -> length(w) > 5))").cast("long").as("n_long"),
        expr("aggregate(toks, 0, (acc, w) -> acc + length(w))").cast("long").as("tot_len"),
        expr("exists(toks, w -> w = 'the')").as("has_the"),
        expr("forall(toks, w -> length(w) < 20)").as("all_short"))
      .orderBy("doc_id")

  /** q31 — string battery 2: translate, reverse, repeat, trims, left/right,
    * substring search. */
  def q31String2(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(col("p_partkey"),
        translate(col("p_name"), "aeiou", "AEIOU").as("name_tr"),
        reverse(col("p_brand")).as("brand_rev"),
        expr("repeat(p_brand, 2)").as("brand_2x"),
        ltrim(rtrim(col("p_type"))).as("type_trim"),
        expr("left(p_name, 4)").as("name_l4"),
        expr("right(p_name, 4)").as("name_r4"),
        instr(col("p_name"), "a").cast("long").as("first_a"))
      .orderBy("p_partkey")

  /** q32 — correlated scalar-aggregate subquery: orders priced far above
    * their own customer's average. Catalyst decorrelates this into an
    * aggregate + join — never a per-row re-scan. */
  def q32CorrSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.8D * (SELECT avg(i.o_totalprice)
        |                             FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** q33 — multiset set operations (EXCEPT ALL / INTERSECT ALL), tagged and
    * unioned; duplicates survive, so the result is a multiset listing. */
  def q33SetopsAll(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders").select(col("o_custkey").as("id"))
    val c = Tables.load(spark, dir, "customer").select(col("c_custkey").as("id"))
    o.exceptAll(c).select(lit("order_extra").as("tag"), col("id"))
      .unionAll(o.intersectAll(c).select(lit("in_both").as("tag"), col("id")))
      .orderBy("tag", "id")
  }

  /** q34 — date/time battery 2: month truncation, last day of month,
    * day-of-week (Spark is 1=Sunday, DuckDB 0=Sunday — oracle shifts),
    * day arithmetic and day differences. */
  def q34Date2(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .withColumn("od", col("o_orderdate").cast("date"))
      .select(col("o_orderkey"),
        trunc(col("od"), "month").as("month_start"),
        last_day(col("od")).as("month_end"),
        dayofweek(col("od")).cast("long").as("dow"),
        date_add(col("od"), 30).as("plus30"),
        datediff(col("od"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))
      .orderBy("o_orderkey")

  /** q35 — UNPIVOT (pivot's inverse): widen-to-long over two measure
    * columns; the oracle states the equivalent stacked UNION ALL. */
  def q35Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "part")
      .select(col("p_partkey"),
        col("p_size").cast("double").as("p_size"), col("p_retailprice"))
      .unpivot(Array(col("p_partkey")),
        Array(col("p_size"), col("p_retailprice")), "attr", "val")
      .orderBy("p_partkey", "attr")

  /** q36 — null-preserving explode: docs with no match still emit one
    * (doc_id, NULL) row — the LEFT JOIN LATERAL shape (106 of 500 fixture
    * docs have no 8+-letter word, so both row classes exist). */
  def q36ExplodeOuter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("ws", expr("regexp_extract_all(lower(text), '[a-z]{8,}', 0)"))
      .select(col("doc_id"), explode_outer(col("ws")).as("w"))
      .orderBy(col("doc_id").asc, col("w").asc_nulls_first)

  /** q37 — recursive CTE (Spark 4's WITH RECURSIVE): ancestor walk up the
    * synthetic key-halving hierarchy (parent(c) = c div 2), per-key chain
    * length and depth. The iterative fixpoint runs driver-coordinated
    * rounds of the same distributed plan. */
  def q37Recursive(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(
      """WITH RECURSIVE anc(custkey, anc_key, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 64
        |  UNION ALL
        |  SELECT custkey, anc_key DIV 2, depth + 1 FROM anc WHERE anc_key > 0
        |)
        |SELECT custkey, count(*) AS chain_len, CAST(max(depth) AS BIGINT) AS max_depth
        |FROM anc GROUP BY custkey ORDER BY custkey""".stripMargin)
  }

  /** q38 — explicit GROUPING SETS (beyond rollup/cube): two 1-D marginals
    * plus the grand total in one pass. */
  def q38GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** q39 — null-handling battery: nullif, coalesce, ifnull, and null-safe
    * equality (<=> / IS NOT DISTINCT FROM). */
  def q39NullSafe(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(
      """SELECT o_orderkey,
        |       nullif(o_orderstatus, 'O') AS ns,
        |       coalesce(nullif(o_orderstatus, 'O'), 'open') AS st_or_open,
        |       ifnull(nullif(o_orderstatus, 'O'), 'X') AS ifn,
        |       (nullif(o_orderstatus, 'O') <=> nullif(o_orderpriority, '1-URGENT'))
        |         AS both_null_eq
        |FROM orders ORDER BY o_orderkey""".stripMargin)
  }

  /** q40 — LATERAL VIEW explode through the SQL parser (the HiveQL-shaped
    * generator syntax; the fluent-API twin is q36). */
  def q40Lateral(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "documents").createOrReplaceTempView("documents")
    spark.sql(
      """SELECT doc_id, w
        |FROM documents
        |LATERAL VIEW explode(split(lower(text), ' ')) t AS w
        |WHERE w LIKE 'qu%'
        |ORDER BY doc_id, w""".stripMargin)
  }

  /** q41 — IGNORE NULLS navigation + cume_dist: last non-open status seen
    * in each customer's history, and the cumulative distribution of price
    * within status. */
  def q41IgnoreNulls(spark: SparkSession, dir: String): DataFrame = {
    val wHist = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wDist = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        lag(expr("nullif(o_orderstatus, 'O')"), 1, null, ignoreNulls = true)
          .over(wHist).as("prev_closed"),
        round(cume_dist().over(wDist), 6).as("cd"))
      .orderBy("o_orderkey")
  }

  /** q42 — array set operations (union/intersect/except/flatten) over two
    * overlapping token slices, sort-canonicalized since the engines order
    * set results differently. */
  def q42ArraySetops(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("a", expr("slice(toks, 1, 5)"))
      .withColumn("b", expr("slice(toks, 4, 5)"))
      .select(col("doc_id"),
        concat_ws(",", array_sort(array_union(col("a"), col("b")))).as("u"),
        concat_ws(",", array_sort(array_intersect(col("a"), col("b")))).as("i"),
        concat_ws(",", array_sort(array_except(col("a"), col("b")))).as("e"),
        concat_ws(",", flatten(array(col("a"), col("b")))).as("f"))
      .orderBy("doc_id")

  /** q43 — running distinct count over a window, an operator Spark has no
    * native form for (no DISTINCT inside window aggregates): decomposed as
    * first-occurrence flag (row_number over (key, value) = 1) + prefix sum
    * over the key. Two window passes over the same (key, time) sort order
    * — Catalyst reuses the one sort — instead of a per-row distinct set,
    * which is the form that survives scale (state per row is O(1), not
    * O(cardinality)). */
  def q43RunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "events")
      .withColumn("fs", when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .select(col("event_id"), col("user_id"), col("event_type"),
        sum(col("fs")).over(wRun).as("distinct_types_so_far"))
      .orderBy("event_id")
  }

  /** q44 — FILTER-clause conditional aggregation (SQL:2003 surface, one
    * scan instead of N filtered scans or sum(CASE) rewrites), through the
    * SQL entry point. */
  def q44FilterAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT l_returnflag,
        |       count(*) AS n_all,
        |       count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |       round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05D), 2) AS rev_disc,
        |       (sum(cast(round(l_quantity * 100.0D, 0) as bigint))
        |          FILTER (WHERE l_linenumber = 1) * 20000L
        |        + count(*) FILTER (WHERE l_linenumber = 1))
        |       div (2L * nullif(count(*) FILTER (WHERE l_linenumber = 1), 0L))
        |       / 1000000.0D AS avg_qty_l1
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  /** q47 — equi-width histogram over a continuous measure: bin edges from
    * the global (min, max) — gathered as one broadcast scalar row, never a
    * driver round-trip — and a closed-form bin index per row; the final
    * top value clamps into the last bin. The two scans this costs (stats +
    * binning) are what any single-pass-unfriendly histogram pays; both are
    * full-parallel, and the aggregate is [[HistBins]] groups. Identical
    * left-to-right IEEE double arithmetic on both engines, so bin edges
    * and assignments agree bit-for-bit. */
  val HistBins = 20
  def q47Histogram(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val stats = e.agg(min(col("value")).as("vmin"), max(col("value")).as("vmax"))
    e.crossJoin(broadcast(stats))
      .withColumn("bin", least(
        floor((col("value") - col("vmin")) * HistBins / (col("vmax") - col("vmin"))),
        lit(HistBins - 1L)).cast("long"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("value")), 6).as("lo"),
        round(max(col("value")), 6).as("hi"))
      .orderBy("bin")
  }

  /** q53 — top-k with remainder rollup (the reporting classic: "top 2
    * customers per nation, everyone else as OTHER"): rank within group,
    * relabel ranks ≤ k, and aggregate — the long tail collapses into one
    * row per group instead of being dropped, so totals still reconcile.
    * Balance totals sum as exact cents (BIGINT) before the final
    * divide — no float accumulation order in the oracle hash. The rank
    * window is per-nation (balanced groups); at corpus scale a skewed
    * group key would route through RankOps.withGroupRank instead. */
  def q53TopkOther(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    Tables.load(spark, dir, "customer")
      .withColumn("rk", row_number().over(w))
      .withColumn("grp",
        when(col("rk") <= 2, concat(lit("top"), col("rk"))).otherwise(lit("other")))
      .withColumn("cents", expr("cast(round(c_acctbal * 100.0D, 0) as bigint)"))
      .groupBy(col("c_nationkey"), col("grp"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("cents")).cast("double") / lit(100.0), 2).as("total_bal"))
      .orderBy("c_nationkey", "grp")
  }

  /** q54 — winsorized robust statistics: clamp each nation's balances to
    * its own [p05, p95] band before averaging — the outlier-taming step a
    * feature pipeline applies before normalization (and the difference
    * raw_mean − wins_mean IS the outlier-influence diagnostic). The
    * percentile frame is one row per nation → broadcast back onto the
    * fact scan; exact interpolated percentiles share q23's cross-engine
    * definition.
    *
    * Means accumulate AND divide as micro-unit BIGINTs: the clamped
    * per-row value is an identical double on both engines (same
    * percentile, same least/greatest), so `round(v·1e6)` is an identical
    * integer, the integer sum is order-free, and the mean is the exact
    * floor division `sum div n` — no floating round at all. Two real
    * failures forced this: a double `avg` differed by summation order,
    * and after fixing that, nation 17's mean landed EXACTLY on a …1875
    * true half, where Spark's decimal-string `round` and DuckDB's
    * numeric `round` disagree by one ulp of intent. Integer emission has
    * no such edge. */
  /** q63 — robust outlier detection per segment via median absolute
    * deviation: the data-cleaning gate that survives the outliers it
    * hunts (mean/stddev z-scores get dragged by the very tail they
    * should flag). `x` is an outlier iff `|x - median| > 3·MAD`.
    *
    * Two grouped exact medians → two aggregations of the fact table on
    * the (low-cardinality) segment key, with the tiny per-segment
    * median/MAD frames broadcast back onto the scan. Exact percentile
    * keeps the DuckDB oracle bit-true (quantile_cont semantics, q23
    * precedent); at 100 TB the same shape runs on approx_percentile or
    * q55's sketch-bracketed exact selection when the per-group value
    * multiset no longer fits an aggregation buffer. */
  private val madJoinCache = caches.newCache()

  def q63MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    // The three aggregation passes (median, MAD, final gate) all consume
    // the same orders-customer join; without a checkpoint each pass would
    // re-execute the corpus-sized join from scratch. Cached per
    // (session, dir) under the shared DirCaches discipline.
    caches.evictOtherDirs(spark, dir)
    val j = madJoinCache.getOrElseUpdate((spark, dir),
      Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("o_totalprice").as("x"))
        .localCheckpoint())
    val med = j.groupBy(col("segment")).agg(expr("percentile(x, 0.5D)").as("med"))
    val dev = j.join(broadcast(med), "segment")
      .withColumn("adev", abs(col("x") - col("med")))
    val mad = dev.groupBy(col("segment")).agg(expr("percentile(adev, 0.5D)").as("mad"))
    dev.join(broadcast(mad), "segment")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 6).as("med"),
        round(max(col("mad")), 6).as("mad"),
        sum(when(col("adev") > col("mad") * lit(3.0), 1L).otherwise(0L)).as("n_outliers"),
        round(max(col("adev")), 6).as("max_adev"))
      .orderBy("segment")
  }

  def q54Winsorize(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
    val pct = c.groupBy(col("c_nationkey")).agg(
      expr("percentile(c_acctbal, 0.05D)").as("p05"),
      expr("percentile(c_acctbal, 0.95D)").as("p95"))
    c.join(broadcast(pct), Seq("c_nationkey"))
      .withColumn("rawm", expr("cast(round(c_acctbal * 1000000.0D, 0) as bigint)"))
      .withColumn("wm", expr(
        "cast(round(least(greatest(c_acctbal, p05), p95) * 1000000.0D, 0) as bigint)"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("rawm")).as("sraw"), sum(col("wm")).as("sw"))
      .select(col("c_nationkey"), col("n"),
        expr("sraw div n").as("raw_mean_micro"),
        expr("sw div n").as("wins_mean_micro"))
      .orderBy("c_nationkey")
  }

  /** q55 — exact global median by sketch-bracketed distributed selection
    * ([[graft.ops.MedianOps.exactMedian]] — the three-pass bracket/count/
    * band-select engine, property-tested against a sequential median in
    * PropertySpec). Interpolation at 0.5 is the mean of the two middle
    * elements, matching `quantile_cont`; (orderkey, linenumber)
    * tiebreaks give the rank a total order — equal-valued ranks differ
    * but their VALUES agree, so the median is exact regardless. */
  def q55ExactMedian(spark: SparkSession, dir: String): DataFrame =
    graft.ops.MedianOps.exactMedian(
      Tables.load(spark, dir, "lineitem"),
      col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))

  /** q56 — salted fact-dim join ([[graft.ops.SkewOps.saltedJoin]]):
    * events×customer with the fact side salted `Salts` ways and the dim
    * replicated per salt, so a hot user never lands on one reducer. The
    * result multiset is identical to the plain join — the oracle states
    * the UNSALTED join, so correctness of the rewrite is what's checked.
    * Sums are micro-unit BIGINTs (exact on any partitioning). */
  val Salts = 4
  def q56SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        expr("cast(round(value * 1000000.0D, 0) as bigint)").as("vm"))
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    graft.ops.SkewOps.saltedJoin(ev, cust, "user_id", "c_custkey", "event_id", Salts)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("value_micro"))
      .orderBy("c_mktsegment")
  }

  /** q57 — bloom-pruned join ([[graft.ops.SkewOps.bloomSemiJoin]]): a
    * selective dimension (one market segment) builds a bloom filter that
    * drops non-matching fact rows BEFORE the join's shuffle; false
    * positives are removed by the join itself, so the result is exactly
    * the plain inner join the oracle states. The manual form of AQE's
    * runtime bloom filter — at 100 TB the ~MB-scale broadcast bloom can
    * cut a selective join's shuffle by 10×. */
  def q57BloomJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("cast(round(value * 1000000.0D, 0) as bigint)").as("vm"))
    val dim = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    graft.ops.SkewOps.bloomSemiJoin(ev, dim, "user_id", "c_custkey",
        expectedKeys = 100000L, fpp = 0.01)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("vm")).as("value_micro"))
      .orderBy("event_type")
  }

  /** q58 — sharded exact distinct ([[graft.ops.SkewOps.
    * shardedCountDistinct]]): distinct users per event type with the
    * value space hash-sharded 8 ways so no reducer ever holds a hot
    * key's whole distinct set; shard counts sum to the exact distinct
    * count the oracle states. */
  def q58ShardedDistinct(spark: SparkSession, dir: String): DataFrame =
    graft.ops.SkewOps.shardedCountDistinct(
        Tables.load(spark, dir, "events").select(col("event_type"), col("user_id")),
        "event_type", "user_id", 8)
      .orderBy("event_type")

  /** q59 — rollup maintenance by re-aggregation: monthly stats computed
    * FROM the daily partial aggregates, not from raw events — the
    * materialized-view refresh pattern (a day's partition lands, its
    * partial updates, months re-aggregate from ~30 partial rows each;
    * raw is never rescanned). Valid because count/sum/min/max are
    * algebraic — the oracle aggregates raw directly, so the compare
    * proves the two-level composition identity. The daily level keeps
    * map-side partials; the monthly level aggregates a frame whose size
    * is days×types, independent of event volume. */
  def q59RollupMaintenance(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.load(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        expr("cast(round(value * 1000000.0D, 0) as bigint)").as("vm"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("pn"), sum(col("vm")).as("psum"),
        min(col("vm")).as("pmin"), max(col("vm")).as("pmax"))
    daily
      .groupBy(col("event_type"), date_format(col("day"), "yyyy-MM").as("month"))
      .agg(sum(col("pn")).as("n"), sum(col("psum")).as("value_micro"),
        min(col("pmin")).as("min_micro"), max(col("pmax")).as("max_micro"))
      .orderBy("event_type", "month")
  }

  /** q65 — mergeable-sketch set algebra: KMV (bottom-k) audience sketches
    * per event type, combined pairwise to estimate audience union size,
    * Jaccard and intersection WITHOUT re-touching the raw log — t6's
    * point-estimate sketch upgraded to an algebra (union sketch = k
    * smallest of the merged hash sets; J ≈ share of the union's bottom-k
    * lying in both input sketches; |A∩B| ≈ J·|A∪B|). The exact
    * counterparts ride along as the audit.
    *
    * Scale shape: the sketch build is the bounded-heap
    * [[graft.functions.TopKPairs]] aggregate over distinct (type, hash)
    * — map-side partial heaps, k longs per type cross the shuffle — and
    * the pairwise algebra runs on a |types|²-row frame of k-length
    * arrays. Hashes are 48-bit so the heap's double score is exact.
    * Deterministic md5 hashing: the oracle rebuilds the identical
    * sketches. */
  val KmvOverlapK = 32
  private val HashSpace48 = 281474976710656.0 // 2^48 = 16^12
  def q65SketchOverlap(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val du = Tables.load(spark, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
    val dh = du.select(col("event_type"), expr(
      "cast(conv(substr(md5(cast(user_id as string)), 1, 12), 16, 10) as bigint)").as("h"))
      .distinct() // KMV sketches the distinct HASH set (collisions collapse)
    val sk = dh.groupBy(col("event_type"))
      .agg(expr(s"transform(topk_pairs(cast(-h as double), h, $KmvOverlapK), x -> x.id)")
        .as("hs")) // score -h => ascending hash order
    val ex = du.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val side = sk.join(ex, "event_type")
    val a = side.select(col("event_type").as("type_a"), col("hs").as("ha"), col("n").as("n_a"))
    val b = side.select(col("event_type").as("type_b"), col("hs").as("hb"), col("n").as("n_b"))
    val est = a.join(b, col("type_a") < col("type_b"))
      .withColumn("u", expr("array_sort(array_distinct(concat(ha, hb)))"))
      // If the union sketch holds < k hashes, BOTH inputs were complete
      // sets and the "estimates" are exact by construction.
      .withColumn("denom", least(lit(KmvOverlapK), size(col("u"))))
      .withColumn("kth", expr("element_at(u, denom)"))
      .withColumn("est_union",
        when(size(col("u")) >= KmvOverlapK,
          lit(KmvOverlapK - 1) * lit(HashSpace48) / col("kth"))
          .otherwise(size(col("u")).cast("double")))
      .withColumn("common_bottom", expr(
        "size(array_intersect(slice(u, 1, denom), array_intersect(ha, hb)))"))
      .withColumn("jac_est", col("common_bottom").cast("double") / col("denom"))
    val common = du.select(col("event_type").as("type_a"), col("user_id"))
      .join(du.select(col("event_type").as("type_b"), col("user_id")), Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b")).agg(count(lit(1)).as("nc"))
    est.join(broadcast(common), Seq("type_a", "type_b"), "left")
      .withColumn("n_common", coalesce(col("nc"), lit(0L)))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 6).as("jac_exact"),
        round(col("jac_est"), 6).as("jac_est"),
        round(col("jac_est") * col("est_union"), 4).as("est_common"))
      .orderBy("type_a", "type_b")
  }

  /** q72 — 2-D Pareto skyline of orders (maximize price AND recency): an
    * order is on the frontier iff no other order is at least as good on
    * both axes and strictly better on one. The naive formulation is an
    * O(n²) dominance anti-join; sorting one axis reduces it to window
    * algebra: with rows ordered by price DESC, `m_gt` = max recency among
    * strictly-pricier rows and `m_ge` = max recency from the current
    * price up — a row survives iff `m_gt < odd` (nothing pricier is as
    * recent) and `m_ge == odd` (nothing equally-priced is more recent).
    * The DESC order matters physically: it puts both frames at
    * `unboundedPreceding → {-1, currentRow}`, which Spark executes as an
    * incremental running aggregate (one pass per partition); the
    * ASC-order formulation needs `→ unboundedFollowing` frames, which
    * recompute the aggregate from scratch per row — O(n²) and measured
    * at 39 s on 150 k rows.
    *
    * Scale shape is the standard two-phase skyline: phase 1 computes the
    * frontier per hash bucket (a partitioned window — the corpus sorts
    * only within buckets, never globally), phase 2 re-runs the same
    * algebra on the surviving ~bucket_count·|frontier| rows (random 2-D
    * data has an O(log n) frontier, so phase 2 is a few rows on one
    * partition). Both axes are exact integers (price cents, epoch days),
    * so window results are engine-identical; the oracle runs the
    * single-pass global form, proving the two-phase split result-equal. */
  def q72Skyline(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders").select(col("o_orderkey"),
      expr("cast(round(o_totalprice * 100.0D, 0) as bigint)").as("tpc"),
      expr("cast(datediff(cast(o_orderdate as date), date'1970-01-01') as bigint)")
        .as("odd"))
    def frontier(df: DataFrame, part: Seq[String]): DataFrame = {
      val base =
        if (part.isEmpty) Window.orderBy(col("tpc").desc)
        else Window.partitionBy(part.map(col): _*).orderBy(col("tpc").desc)
      // On the DESC key, "1 preceding" in range terms is tpc >= current+1,
      // i.e. the strictly-pricier set; both frames grow monotonically from
      // the partition start, so Spark's running-aggregate frame applies.
      val mGt = max(col("odd"))
        .over(base.rangeBetween(Window.unboundedPreceding, -1L))
      val mGe = max(col("odd"))
        .over(base.rangeBetween(Window.unboundedPreceding, Window.currentRow))
      df.withColumn("m_gt", mGt).withColumn("m_ge", mGe)
        .filter((col("m_gt").isNull || col("m_gt") < col("odd")) &&
          col("m_ge") <= col("odd"))
        .drop("m_gt", "m_ge")
    }
    val local = frontier(
      o.withColumn("bucket", pmod(col("o_orderkey"), lit(32))), Seq("bucket"))
      .drop("bucket")
    frontier(local, Nil)
      .select(col("o_orderkey"), col("tpc").as("price_cents"),
        col("odd").as("epoch_day"))
      .orderBy("o_orderkey")
  }

  /** q73 — A/B lift per market segment: users split into arms by id
    * parity, "conversion" = any purchase event; per segment the arm
    * sizes, conversion counts, exact micro-unit conversion rates
    * (`sum·1e6 div n` — integer, engine-identical), the rate lift, and
    * the two-proportion z-score. One user-level reduction of events
    * (max-flag aggregate), one join to the customer dim for the segment,
    * one tiny (segment × arm) rollup pivoted by conditional aggregation
    * — the experiment-readout query an analytics engine serves
    * continuously. The z double derives from exact integer counts
    * through one fixed expression tree, so both engines compute the
    * identical IEEE value. */
  def q73AbLift(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("conv"))
      .withColumn("treat", pmod(col("user_id"), lit(2)))
    val seg = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    u.join(seg, col("user_id") === col("c_custkey"))
      .groupBy(col("segment"))
      .agg(
        sum(when(col("treat") === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when(col("treat") === 1, col("conv")).otherwise(0L)).as("c_t"),
        sum(when(col("treat") === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when(col("treat") === 0, col("conv")).otherwise(0L)).as("c_c"))
      // A segment with an empty arm has no defined lift (and would divide
      // by zero under ANSI): the readout covers two-arm segments only.
      .filter(col("n_t") > 0 && col("n_c") > 0)
      .withColumn("rate_t_micro", expr("c_t * 1000000L div n_t"))
      .withColumn("rate_c_micro", expr("c_c * 1000000L div n_c"))
      .withColumn("lift_micro", col("rate_t_micro") - col("rate_c_micro"))
      // Degenerate pooled rate (0 or 1) zeroes the variance — z is
      // undefined (0/0), reported as NULL rather than NaN/Inf.
      .withColumn("z", round(expr(
        "CASE WHEN c_t + c_c > 0 AND c_t + c_c < n_t + n_c THEN " +
          "(c_t * 1.0D / n_t - c_c * 1.0D / n_c) / " +
          "sqrt(((c_t + c_c) * 1.0D / (n_t + n_c)) * " +
          "(1.0D - (c_t + c_c) * 1.0D / (n_t + n_c)) * " +
          "(1.0D / n_t + 1.0D / n_c)) END"), 6))
      .select(col("segment"), col("n_t"), col("c_t"), col("n_c"), col("c_c"),
        col("rate_t_micro"), col("rate_c_micro"), col("lift_micro"), col("z"))
      .orderBy("segment")
  }

  /** q74 — rank-distribution battery: the full ranking-function family
    * (row_number / rank / dense_rank / ntile / percent_rank / cume_dist)
    * over orders partitioned by priority, with the two fractional
    * readouts recast as exact integer micro-units
    * (`(rank−1)·1e6 div (n−1)`, `cnt_le·1e6 div n`) so both engines
    * compute identical values — no IEEE division in the compare surface.
    *
    * Two deliberately different window orders: rank / dense_rank / the
    * distribution stats order by price alone (ties share a rank), while
    * row_number and ntile — whose outputs are undefined under ties —
    * order by (price, orderkey), a total order. Scale shape: one
    * shuffle by priority, sorts confined to partitions, nothing global;
    * all six functions ride the same sorted run per window order. */
  def q74RankDistribution(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders").select(
      col("o_orderkey"), col("o_orderpriority").as("priority"),
      expr("cast(round(o_totalprice * 100.0D, 0) as bigint)").as("tpc"))
    val wTies = Window.partitionBy(col("priority")).orderBy(col("tpc"))
    val wTotal = Window.partitionBy(col("priority"))
      .orderBy(col("tpc"), col("o_orderkey"))
    o.withColumn("n", count(lit(1)).over(Window.partitionBy(col("priority"))))
      .withColumn("rnk", rank().over(wTies).cast("long"))
      .withColumn("drnk", dense_rank().over(wTies).cast("long"))
      .withColumn("rn", row_number().over(wTotal).cast("long"))
      .withColumn("nt", ntile(4).over(wTotal).cast("long"))
      .withColumn("cnt_le", count(lit(1)).over(
        wTies.rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pr_micro", expr(
        "CASE WHEN n > 1 THEN (rnk - 1) * 1000000L div (n - 1) ELSE 0L END"))
      .withColumn("cd_micro", expr("cnt_le * 1000000L div n"))
      .select(col("o_orderkey"), col("priority"), col("tpc"), col("rnk"),
        col("drnk"), col("rn"), col("nt"), col("pr_micro"), col("cd_micro"))
      .orderBy("priority", "rn")
  }

  /** q75 — Mann-Whitney AUC per market segment: how well account balance
    * rank-orders customers into converters (≥1 purchase event) vs
    * non-converters — the model-free ranking-quality readout behind every
    * score-evaluation dashboard. AUC = U/(n_pos·n_neg) with the standard
    * average-rank tie correction, computed entirely in integers: per row
    * `2·r_avg = 2·rank + ties − 1`, so `2U = Σ_pos 2·r_avg − n_pos·(n_pos+1)` and
    * `auc_micro = 2U·1e6 div (2·n_pos·n_neg)` — no doubles anywhere.
    * (Long headroom: 2U·1e6 ≤ n²·1e6, safe below ~3M rows per segment;
    * beyond that, lift the algebra to decimal(38,0).)
    *
    * Scale shape: one user-level reduction of events to a conversion
    * flag, a dim-sized left join, one window partitioned by segment
    * (sort within segment only), one five-row rollup. */
  def q75Auc(spark: SparkSession, dir: String): DataFrame = {
    val conv = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
    val c = Tables.load(spark, dir, "customer").select(
      col("c_custkey"), col("c_mktsegment").as("segment"),
      expr("cast(round(c_acctbal * 100.0D, 0) as bigint)").as("score"))
    c.join(conv, col("c_custkey") === col("user_id"), "left")
      .withColumn("pos", when(col("user_id").isNotNull, 1L).otherwise(0L))
      .withColumn("r2",
        lit(2L) * rank().over(
          Window.partitionBy(col("segment")).orderBy(col("score"))) +
          count(lit(1)).over(
            Window.partitionBy(col("segment"), col("score"))) - lit(1L))
      .groupBy(col("segment"))
      .agg(sum(col("pos")).as("n_pos"),
        sum(lit(1L) - col("pos")).as("n_neg"),
        sum(col("r2") * col("pos")).as("s2r"))
      .filter(col("n_pos") > 0 && col("n_neg") > 0)
      .withColumn("auc_micro", expr(
        "(s2r - n_pos * (n_pos + 1)) * 1000000L div (2 * n_pos * n_neg)"))
      .select(col("segment"), col("n_pos"), col("n_neg"), col("auc_micro"))
      .orderBy("segment")
  }

  /** q78 — half-life time-decay scoring: each event's micro-unit value is
    * halved for every whole week between it and the newest event in the
    * log, then rolled up per type — the freshness-weighted engagement
    * rollup every feed/ranking pipeline maintains. The decay is an
    * integer SHIFT (`vm >> weeks`, capped at 62) — floor-exact in any
    * engine, no floating-point decay factor to drift between engines or
    * partitionings. The anchor (global max ts) is a 1-row aggregate
    * broadcast into the projection, so the whole query is one scan + one
    * small rollup; at 100 TB the anchor comes from the table's watermark
    * and the scan shape is unchanged. */
  def q78DecayScore(spark: SparkSession, dir: String): DataFrame = {
    val WeekUs = 7L * 86400 * 1000000
    val e = Tables.load(spark, dir, "events").select(
      col("event_type"), unix_micros(col("ts")).as("us"),
      expr("cast(round(value * 1000000.0D, 0) as bigint)").as("vm"))
    val anchor = e.agg(max(col("us")).as("anchor_us"))
    e.crossJoin(broadcast(anchor))
      .withColumn("wk", expr(s"cast(least((anchor_us - us) div ${WeekUs}L, 62L) as int)"))
      .withColumn("decayed", expr("shiftright(vm, wk)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("vm")).as("raw_micro"),
        sum(col("decayed")).as("decayed_micro"))
      .orderBy("event_type")
  }

  /** q79 — GDPR-style erasure cascade: a tombstone set (customers in one
    * segment with negative balance) propagates down the FK chain
    * (customer → orders → lineitem), reporting per table how many rows
    * the erasure deletes vs retains and the retained value. The scale
    * shape is the deletion-propagation pattern: the tombstone key set is
    * tiny, so each fact table takes ONE broadcast hash join (flag, then
    * aggregate) and never shuffles; the derived order-key tombstones stay
    * a broadcast too. At 100 TB with a large tombstone set, swap the
    * broadcasts for the q57 bloom-pruned join — the cascade shape is
    * unchanged. */
  def q79ErasureCascade(spark: SparkSession, dir: String): DataFrame = {
    def cents(cn: String) = expr(s"cast(round($cn * 100.0D, 0) as bigint)")
    val c = Tables.load(spark, dir, "customer")
    val victimCond = col("c_mktsegment") === "AUTOMOBILE" && col("c_acctbal") < 0
    val victims = c.filter(victimCond).select(col("c_custkey").as("v_key"))

    val custRow = c
      .withColumn("del", victimCond.cast("long"))
      .agg(lit("customer").as("table_name"),
        sum(col("del")).as("n_deleted"),
        sum(lit(1L) - col("del")).as("n_retained"),
        sum(when(col("del") === 0L, cents("c_acctbal")).otherwise(0L))
          .as("retained_cents"))

    val o = Tables.load(spark, dir, "orders")
      .join(broadcast(victims), col("o_custkey") === col("v_key"), "left")
      .withColumn("del", col("v_key").isNotNull.cast("long"))
    val orderRow = o
      .agg(lit("orders").as("table_name"),
        sum(col("del")).as("n_deleted"),
        sum(lit(1L) - col("del")).as("n_retained"),
        sum(when(col("del") === 0L, cents("o_totalprice")).otherwise(0L))
          .as("retained_cents"))

    val delOrders = o.filter(col("del") === 1L).select(col("o_orderkey").as("d_okey"))
    val lineRow = Tables.load(spark, dir, "lineitem")
      .join(broadcast(delOrders), col("l_orderkey") === col("d_okey"), "left")
      .withColumn("del", col("d_okey").isNotNull.cast("long"))
      .agg(lit("lineitem").as("table_name"),
        sum(col("del")).as("n_deleted"),
        sum(lit(1L) - col("del")).as("n_retained"),
        sum(when(col("del") === 0L, cents("l_extendedprice")).otherwise(0L))
          .as("retained_cents"))

    custRow.unionAll(orderRow).unionAll(lineRow).orderBy("table_name")
  }

  /** q114 — referential-integrity audit across the star schema: for each
    * foreign-key relationship, the child row count, the count of
    * orphaned children (FK value absent from the parent key set) and
    * distinct orphaned key values — the data-quality contract check a
    * warehouse runs after every load, published as a per-relationship
    * ledger (all-zeros on a consistent load; any orphan is a pipeline
    * incident). Each relationship is one LEFT ANTI join on the key —
    * the parent key sets here are dimension-sized (broadcastable); a
    * fact-fact edge (lineitem→orders) rides the key shuffle. */
  def q114FkAudit(spark: SparkSession, dir: String): DataFrame = {
    def rel(name: String, child: DataFrame, fk: String,
        parent: DataFrame, pk: String): DataFrame = {
      val orphans = child.select(col(fk))
        .join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")
      val totals = child.agg(count(lit(1)).as("n_child"))
      val o = orphans.agg(count(lit(1)).as("n_orphans"),
        countDistinct(col(fk)).as("n_orphan_keys"))
      totals.crossJoin(o)
        .select(lit(name).as("relationship"), col("n_child"),
          col("n_orphans"), col("n_orphan_keys"))
    }
    def t(n: String) = graft.Tables.load(spark, dir, n)
    rel("1_lineitem_orders", t("lineitem"), "l_orderkey", t("orders"), "o_orderkey")
      .unionAll(rel("2_orders_customer", t("orders"), "o_custkey",
        t("customer"), "c_custkey"))
      .unionAll(rel("3_customer_nation", t("customer"), "c_nationkey",
        t("nation"), "n_nationkey"))
      .unionAll(rel("4_supplier_nation", t("supplier"), "s_nationkey",
        t("nation"), "n_nationkey"))
      .unionAll(rel("5_nation_region", t("nation"), "n_regionkey",
        t("region"), "r_regionkey"))
      .orderBy("relationship")
  }

  /** The (table → key expression) list behind q116: composite keys
    * concat with '#', every key cast to string. */
  private val manifestKeys: Seq[(String, String)] = Seq(
    "region" -> "cast(r_regionkey as string)",
    "nation" -> "cast(n_nationkey as string)",
    "customer" -> "cast(c_custkey as string)",
    "supplier" -> "cast(s_suppkey as string)",
    "part" -> "cast(p_partkey as string)",
    "orders" -> "cast(o_orderkey as string)",
    "lineitem" -> "concat(cast(l_orderkey as string), '#', cast(l_linenumber as string))",
    "events" -> "cast(event_id as string)",
    "documents" -> "cast(doc_id as string)",
    "embeddings" -> "cast(vec_id as string)")

  /** q116 — snapshot manifest: per table, the row count and an
    * order-insensitive key checksum (sum of each key's leading-32-bit
    * md5 value) — the data-contract artifact a platform publishes per
    * snapshot so two sides of a replication / migration can prove
    * table-level equality without comparing rows. Sum-of-hashes is the
    * standard mergeable table checksum: partition-order independent,
    * map-side combinable, and any single-row difference moves it.
    *
    * One combinable aggregate per table; no joins, no windows. */
  def q116TableManifest(spark: SparkSession, dir: String): DataFrame =
    manifestKeys.map { case (t, keyExpr) =>
      graft.Tables.load(spark, dir, t)
        .select(expr(keyExpr).as("k"))
        .agg(count(lit(1)).as("n_rows"),
          sum(expr("cast(conv(substr(md5(k), 1, 8), 16, 10) as bigint)"))
            .as("key_checksum"))
        .select(lit(t).as("table_name"), col("n_rows"), col("key_checksum"))
    }.reduce(_ unionAll _).orderBy("table_name")

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q116_table_manifest" -> ((s, d) => q116TableManifest(s, d)),
    "q114_fk_audit" -> ((s, d) => q114FkAudit(s, d)),
    "q78_decay_score" -> ((s, d) => q78DecayScore(s, d)),
    "q79_erasure_cascade" -> ((s, d) => q79ErasureCascade(s, d)),
    "q74_rank_distribution" -> ((s, d) => q74RankDistribution(s, d)),
    "q75_auc" -> ((s, d) => q75Auc(s, d)),
    "q72_skyline" -> ((s, d) => q72Skyline(s, d)),
    "q73_ab_lift" -> ((s, d) => q73AbLift(s, d)),
    "q65_sketch_overlap" -> ((s, d) => q65SketchOverlap(s, d)),
    "q59_rollup_maintenance" -> ((s, d) => q59RollupMaintenance(s, d)),
    "q56_salted_join" -> ((s, d) => q56SaltedJoin(s, d)),
    "q57_bloom_join" -> ((s, d) => q57BloomJoin(s, d)),
    "q58_sharded_distinct" -> ((s, d) => q58ShardedDistinct(s, d)),
    "q55_exact_median" -> ((s, d) => q55ExactMedian(s, d)),
    "q54_winsorize" -> ((s, d) => q54Winsorize(s, d)),
    "q63_mad_outliers" -> ((s, d) => q63MadOutliers(s, d)),
    "q53_topk_other" -> ((s, d) => q53TopkOther(s, d)),
    "q47_histogram" -> ((s, d) => q47Histogram(s, d)),
    "q43_running_distinct" -> ((s, d) => q43RunningDistinct(s, d)),
    "q44_filter_agg" -> ((s, d) => q44FilterAgg(s, d)),
    "q42_array_setops" -> ((s, d) => q42ArraySetops(s, d)),
    "q40_lateral" -> ((s, d) => q40Lateral(s, d)),
    "q41_ignore_nulls" -> ((s, d) => q41IgnoreNulls(s, d)),
    "q37_recursive" -> ((s, d) => q37Recursive(s, d)),
    "q38_grouping_sets" -> ((s, d) => q38GroupingSets(s, d)),
    "q39_nullsafe" -> ((s, d) => q39NullSafe(s, d)),
    "q35_unpivot" -> ((s, d) => q35Unpivot(s, d)),
    "q36_explode_outer" -> ((s, d) => q36ExplodeOuter(s, d)),
    "q30_hof" -> ((s, d) => q30Hof(s, d)),
    "q31_string2" -> ((s, d) => q31String2(s, d)),
    "q32_corr_subquery" -> ((s, d) => q32CorrSubquery(s, d)),
    "q33_setops_all" -> ((s, d) => q33SetopsAll(s, d)),
    "q34_date2" -> ((s, d) => q34Date2(s, d)),
    "q24_full_outer" -> ((s, d) => q24FullOuter(s, d)),
    "q25_stats" -> ((s, d) => q25Stats(s, d)),
    "q26_range_frame" -> ((s, d) => q26RangeFrame(s, d)),
    "q27_first_last" -> ((s, d) => q27FirstLast(s, d)),
    "q28_map" -> ((s, d) => q28Map(s, d)),
    "q29_in_subquery" -> ((s, d) => q29InSubquery(s, d))
  )

  // lazy: oracle SQL bodies cross-reference sibling modules (t27→Dedup,
  // s24→Text…); eager Maps would make object-init order a correctness
  // hazard (NPE on whichever module clinit runs first).
  lazy val oracles: Map[String, String] = Map(
    "q116_table_manifest" -> {
      val duckKeys = Map(
        "lineitem" -> "l_orderkey::VARCHAR || '#' || l_linenumber::VARCHAR",
        "region" -> "r_regionkey::VARCHAR", "nation" -> "n_nationkey::VARCHAR",
        "customer" -> "c_custkey::VARCHAR", "supplier" -> "s_suppkey::VARCHAR",
        "part" -> "p_partkey::VARCHAR", "orders" -> "o_orderkey::VARCHAR",
        "events" -> "event_id::VARCHAR", "documents" -> "doc_id::VARCHAR",
        "embeddings" -> "vec_id::VARCHAR")
      manifestKeys.map { case (t, _) =>
        s"""SELECT '$t' AS table_name, count(*) AS n_rows,
           |  CAST(sum(('0x' || substr(md5(${duckKeys(t)}), 1, 8))::BIGINT)
           |       AS BIGINT) AS key_checksum
           |FROM $t""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY table_name")
    },

    "q114_fk_audit" -> {
      def rel(name: String, child: String, fk: String,
          parent: String, pk: String): String =
        s"""SELECT '$name' AS relationship,
           |  (SELECT count(*) FROM $child) AS n_child,
           |  (SELECT count(*) FROM $child c
           |    WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk))
           |    AS n_orphans,
           |  (SELECT count(DISTINCT c.$fk) FROM $child c
           |    WHERE NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pk = c.$fk))
           |    AS n_orphan_keys""".stripMargin
      Seq(
        rel("1_lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        rel("2_orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        rel("3_customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        rel("4_supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        rel("5_nation_region", "nation", "n_regionkey", "region", "r_regionkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
    },
    "q78_decay_score" ->
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) us,
        |         CAST(round(value * 1000000.0, 0) AS BIGINT) vm
        |  FROM events),
        |a AS (SELECT max(us) anchor_us FROM e)
        |SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(vm) AS BIGINT) AS raw_micro,
        |       CAST(SUM(vm >> CAST(least((anchor_us - us) // 604800000000, 62)
        |                           AS INTEGER)) AS BIGINT) AS decayed_micro
        |FROM e, a
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q79_erasure_cascade" ->
      """WITH victims AS (
        |  SELECT c_custkey FROM customer
        |  WHERE c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0),
        |del_orders AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM victims))
        |SELECT * FROM (
        |  SELECT 'customer' AS table_name,
        |    CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
        |    CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0
        |                  THEN 0 ELSE 1 END) AS BIGINT) AS n_retained,
        |    CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' AND c_acctbal < 0
        |                  THEN 0
        |                  ELSE CAST(round(c_acctbal * 100.0, 0) AS BIGINT)
        |             END) AS BIGINT) AS retained_cents
        |  FROM customer
        |  UNION ALL
        |  SELECT 'orders',
        |    CAST(SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM victims)
        |                  THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM victims)
        |                  THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN o_custkey IN (SELECT c_custkey FROM victims)
        |                  THEN 0
        |                  ELSE CAST(round(o_totalprice * 100.0, 0) AS BIGINT)
        |             END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem',
        |    CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM del_orders)
        |                  THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM del_orders)
        |                  THEN 0 ELSE 1 END) AS BIGINT),
        |    CAST(SUM(CASE WHEN l_orderkey IN (SELECT o_orderkey FROM del_orders)
        |                  THEN 0
        |                  ELSE CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)
        |             END) AS BIGINT)
        |  FROM lineitem)
        |ORDER BY table_name""".stripMargin,

    "q74_rank_distribution" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_orderpriority priority,
        |         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) tpc
        |  FROM orders),
        |w AS (
        |  SELECT o_orderkey, priority, tpc,
        |    CAST(count(*) OVER (PARTITION BY priority) AS BIGINT) n,
        |    CAST(rank() OVER (PARTITION BY priority ORDER BY tpc)
        |         AS BIGINT) rnk,
        |    CAST(dense_rank() OVER (PARTITION BY priority ORDER BY tpc)
        |         AS BIGINT) drnk,
        |    CAST(row_number() OVER (PARTITION BY priority
        |         ORDER BY tpc, o_orderkey) AS BIGINT) rn,
        |    CAST(ntile(4) OVER (PARTITION BY priority
        |         ORDER BY tpc, o_orderkey) AS BIGINT) nt,
        |    CAST(count(*) OVER (PARTITION BY priority ORDER BY tpc
        |         RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |         AS BIGINT) cnt_le
        |  FROM o)
        |SELECT o_orderkey, priority, tpc, rnk, drnk, rn, nt,
        |       CAST(CASE WHEN n > 1 THEN (rnk - 1) * 1000000 // (n - 1)
        |                 ELSE 0 END AS BIGINT) pr_micro,
        |       CAST(cnt_le * 1000000 // n AS BIGINT) cd_micro
        |FROM w ORDER BY priority, rn""".stripMargin,

    "q75_auc" ->
      """WITH conv AS (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT c_mktsegment segment,
        |         CAST(round(c_acctbal * 100.0, 0) AS BIGINT) score,
        |         CASE WHEN user_id IS NOT NULL THEN 1 ELSE 0 END pos
        |  FROM customer LEFT JOIN conv ON c_custkey = user_id),
        |r AS (
        |  SELECT segment, pos,
        |         2 * rank() OVER (PARTITION BY segment ORDER BY score)
        |           + count(*) OVER (PARTITION BY segment, score) - 1 AS r2
        |  FROM c),
        |g AS (
        |  SELECT segment, CAST(sum(pos) AS BIGINT) n_pos,
        |         CAST(sum(1 - pos) AS BIGINT) n_neg,
        |         CAST(sum(r2 * pos) AS BIGINT) s2r
        |  FROM r GROUP BY segment)
        |SELECT segment, n_pos, n_neg,
        |       CAST((s2r - n_pos * (n_pos + 1)) * 1000000
        |            // (2 * n_pos * n_neg) AS BIGINT) auc_micro
        |FROM g WHERE n_pos > 0 AND n_neg > 0
        |ORDER BY segment""".stripMargin,

    // Single-pass global form of the same window algebra — proves the
    // two-phase (per-bucket then global) split is result-identical.
    "q72_skyline" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |         CAST(round(o_totalprice * 100.0, 0) AS BIGINT) tpc,
        |         CAST(date_diff('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) odd
        |  FROM orders),
        |w AS (
        |  SELECT *,
        |    max(odd) OVER (ORDER BY tpc
        |      RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) m_gt,
        |    max(odd) OVER (ORDER BY tpc
        |      RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) m_ge
        |  FROM o)
        |SELECT o_orderkey, tpc AS price_cents, odd AS epoch_day
        |FROM w
        |WHERE (m_gt IS NULL OR m_gt < odd) AND m_ge <= odd
        |ORDER BY o_orderkey""".stripMargin,

    "q73_ab_lift" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(max(CASE WHEN event_type = 'purchase' THEN 1
        |                       ELSE 0 END) AS BIGINT) conv,
        |         user_id % 2 AS treat
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT c_mktsegment segment,
        |         CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END) AS BIGINT) n_t,
        |         CAST(sum(CASE WHEN treat = 1 THEN conv ELSE 0 END) AS BIGINT) c_t,
        |         CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END) AS BIGINT) n_c,
        |         CAST(sum(CASE WHEN treat = 0 THEN conv ELSE 0 END) AS BIGINT) c_c
        |  FROM u JOIN customer ON user_id = c_custkey
        |  GROUP BY 1
        |  HAVING n_t > 0 AND n_c > 0)
        |SELECT segment, n_t, c_t, n_c, c_c,
        |       c_t * 1000000 // n_t AS rate_t_micro,
        |       c_c * 1000000 // n_c AS rate_c_micro,
        |       c_t * 1000000 // n_t - c_c * 1000000 // n_c AS lift_micro,
        |       round(CASE WHEN c_t + c_c > 0 AND c_t + c_c < n_t + n_c THEN
        |             (CAST(c_t AS DOUBLE) / n_t - CAST(c_c AS DOUBLE) / n_c) /
        |             sqrt((CAST(c_t + c_c AS DOUBLE) / (n_t + n_c)) *
        |                  (1 - CAST(c_t + c_c AS DOUBLE) / (n_t + n_c)) *
        |                  (CAST(1 AS DOUBLE) / n_t + CAST(1 AS DOUBLE) / n_c))
        |             END, 6) AS z
        |FROM g ORDER BY segment""".stripMargin,

    "q65_sketch_overlap" ->
      s"""WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
         |dh AS (SELECT DISTINCT event_type,
         |         ('0x' || substr(md5(user_id::VARCHAR), 1, 12))::BIGINT h FROM du),
         |r AS (SELECT event_type, h,
         |        row_number() OVER (PARTITION BY event_type ORDER BY h) rk FROM dh),
         |sk AS (SELECT event_type, list(h ORDER BY h) hs
         |       FROM r WHERE rk <= $KmvOverlapK GROUP BY event_type),
         |n AS (SELECT event_type, CAST(count(*) AS BIGINT) n FROM du GROUP BY 1),
         |side AS (SELECT sk.event_type, hs, n FROM sk JOIN n USING (event_type)),
         |p AS (SELECT a.event_type type_a, b.event_type type_b,
         |             a.hs ha, b.hs hb, a.n n_a, b.n n_b
         |      FROM side a JOIN side b ON a.event_type < b.event_type),
         |c AS (SELECT *, list_sort(list_distinct(list_concat(ha, hb))) u FROM p),
         |d AS (SELECT *, least($KmvOverlapK, len(u)) denom,
         |             u[least($KmvOverlapK, len(u))] kth FROM c),
         |e AS (SELECT *,
         |        CASE WHEN len(u) >= $KmvOverlapK
         |             THEN ${KmvOverlapK - 1} * 281474976710656.0::DOUBLE / kth
         |             ELSE len(u)::DOUBLE END est_union,
         |        len(list_intersect(array_slice(u, 1, denom),
         |            list_intersect(ha, hb))) common_bottom
         |      FROM d),
         |x AS (SELECT a.event_type type_a, b.event_type type_b,
         |             CAST(count(*) AS BIGINT) nc
         |      FROM du a JOIN du b
         |        ON a.user_id = b.user_id AND a.event_type < b.event_type
         |      GROUP BY 1, 2)
         |SELECT e.type_a, e.type_b, n_a, n_b,
         |       coalesce(nc, 0) AS n_common,
         |       round(coalesce(nc, 0)::DOUBLE / (n_a + n_b - coalesce(nc, 0)), 6)
         |         AS jac_exact,
         |       round(common_bottom::DOUBLE / denom, 6) AS jac_est,
         |       round(common_bottom::DOUBLE / denom * est_union, 4) AS est_common
         |FROM e LEFT JOIN x ON e.type_a = x.type_a AND e.type_b = x.type_b
         |ORDER BY e.type_a, e.type_b""".stripMargin,

    // Oracles state the PLAIN join/distinct semantics; the Spark side
    // runs the salted / bloom-pruned / sharded rewrites, so the compare
    // proves each rewrite is result-identical to the naive form.
    // Oracle aggregates RAW events straight to months — the Spark side
    // composes monthly from daily partials, so the compare proves the
    // algebraic re-aggregation identity.
    "q59_rollup_maintenance" ->
      """SELECT event_type, strftime(ts, '%Y-%m') AS month,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS value_micro,
        |       CAST(min(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS min_micro,
        |       CAST(max(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS max_micro
        |FROM events
        |GROUP BY event_type, month
        |ORDER BY event_type, month""".stripMargin,

    "q56_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |       CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS value_micro
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q57_bloom_join" ->
      """SELECT event_type, count(*) AS n,
        |       CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT) AS value_micro
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q58_sharded_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Independent formulation: interpolated quantile_cont vs the
    // selection-based two-order-statistics construction.
    "q55_exact_median" ->
      """SELECT count(l_extendedprice) AS n,
        |       round(quantile_cont(l_extendedprice, 0.5), 6) AS median
        |FROM lineitem""".stripMargin,

    "q54_winsorize" ->
      """WITH p AS (
        |  SELECT c_nationkey,
        |         quantile_cont(c_acctbal, 0.05) p05,
        |         quantile_cont(c_acctbal, 0.95) p95
        |  FROM customer GROUP BY 1),
        |m AS (
        |  SELECT c.c_nationkey,
        |         CAST(round(c_acctbal * 1000000.0, 0) AS BIGINT) rawm,
        |         CAST(round(least(greatest(c_acctbal, p05), p95) * 1000000.0, 0)
        |              AS BIGINT) wm
        |  FROM customer c JOIN p USING (c_nationkey))
        |SELECT c_nationkey, count(*) AS n,
        |       CAST(sum(rawm) // count(*) AS BIGINT) AS raw_mean_micro,
        |       CAST(sum(wm) // count(*) AS BIGINT) AS wins_mean_micro
        |FROM m GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q63_mad_outliers" ->
      """WITH j AS (SELECT c_mktsegment segment, o_totalprice x
        |           FROM orders JOIN customer ON o_custkey = c_custkey),
        |med AS (SELECT segment, quantile_cont(x, 0.5) med FROM j GROUP BY 1),
        |dev AS (SELECT j.segment, x, med.med, abs(x - med.med) adev
        |        FROM j JOIN med USING (segment)),
        |mad AS (SELECT segment, quantile_cont(adev, 0.5) mad FROM dev GROUP BY 1)
        |SELECT d.segment, CAST(count(*) AS BIGINT) AS n,
        |       round(max(d.med), 6) AS med,
        |       round(max(m.mad), 6) AS mad,
        |       CAST(sum(CASE WHEN adev > m.mad * 3.0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_outliers,
        |       round(max(adev), 6) AS max_adev
        |FROM dev d JOIN mad m USING (segment)
        |GROUP BY d.segment ORDER BY d.segment""".stripMargin,

    "q53_topk_other" ->
      """WITH r AS (
        |  SELECT c_nationkey, c_acctbal,
        |         CAST(round(c_acctbal * 100.0, 0) AS BIGINT) cents,
        |         row_number() OVER (PARTITION BY c_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey ASC) rk
        |  FROM customer),
        |g AS (SELECT c_nationkey,
        |        CASE WHEN rk <= 2 THEN 'top' || rk ELSE 'other' END grp,
        |        cents
        |      FROM r)
        |SELECT c_nationkey, grp, count(*) AS n_customers,
        |       round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS total_bal
        |FROM g GROUP BY 1, 2 ORDER BY c_nationkey, grp""".stripMargin,

    "q47_histogram" ->
      s"""WITH s AS (SELECT min(value) vmin, max(value) vmax FROM events),
         |b AS (SELECT least(floor((value - vmin) * $HistBins / (vmax - vmin)),
         |               $HistBins - 1)::BIGINT bin, value
         |      FROM events, s)
         |SELECT bin, count(*) AS n,
         |       round(min(value), 6) AS lo, round(max(value), 6) AS hi
         |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q43_running_distinct" ->
      """WITH f AS (
        |  SELECT event_id, user_id, event_type, ts,
        |         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |                ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END fs
        |  FROM events)
        |SELECT event_id, user_id, event_type,
        |       CAST(sum(fs) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS distinct_types_so_far
        |FROM f ORDER BY event_id""".stripMargin,

    "q44_filter_agg" ->
      """SELECT l_returnflag,
        |       count(*) AS n_all,
        |       count(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |       round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 2) AS rev_disc,
        |       (SUM(CAST(round(l_quantity * 100.0, 0) AS BIGINT))
        |          FILTER (WHERE l_linenumber = 1) * 20000
        |        + count(*) FILTER (WHERE l_linenumber = 1))
        |       // (2 * NULLIF(count(*) FILTER (WHERE l_linenumber = 1), 0))
        |       / 1000000.0 AS avg_qty_l1
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

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
        |ORDER BY o_orderkey""".stripMargin,

    "q30_hof" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks FROM documents)
        |SELECT doc_id,
        |       len(list_filter(toks, w -> len(w) > 5)) AS n_long,
        |       CAST(coalesce(list_aggregate(list_transform(toks, w -> len(w)), 'sum'), 0) AS BIGINT) AS tot_len,
        |       len(list_filter(toks, w -> w = 'the')) > 0 AS has_the,
        |       len(list_filter(toks, w -> len(w) >= 20)) = 0 AS all_short
        |FROM t ORDER BY doc_id""".stripMargin,

    "q31_string2" ->
      """SELECT p_partkey,
        |       translate(p_name, 'aeiou', 'AEIOU') AS name_tr,
        |       reverse(p_brand) AS brand_rev,
        |       repeat(p_brand, 2) AS brand_2x,
        |       ltrim(rtrim(p_type)) AS type_trim,
        |       left(p_name, 4) AS name_l4,
        |       right(p_name, 4) AS name_r4,
        |       CAST(strpos(p_name, 'a') AS BIGINT) AS first_a
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q32_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.8 * (SELECT avg(i.o_totalprice)
        |                            FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q33_setops_all" ->
      """SELECT 'order_extra' AS tag, id FROM
        |  (SELECT o_custkey AS id FROM orders EXCEPT ALL SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'in_both' AS tag, id FROM
        |  (SELECT o_custkey AS id FROM orders INTERSECT ALL SELECT c_custkey FROM customer)
        |ORDER BY tag, id""".stripMargin,

    "q42_array_setops" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks FROM documents),
        |ab AS (SELECT doc_id, toks[1:5] a, toks[4:8] b FROM t)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_sort(list_distinct(a || b)), ','), '') AS u,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
        |    x -> list_contains(b, x))), ','), '') AS i,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
        |    x -> NOT list_contains(b, x))), ','), '') AS e,
        |  coalesce(array_to_string(a || b, ','), '') AS f
        |FROM ab ORDER BY doc_id""".stripMargin,

    "q40_lateral" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |           FROM documents)
        |SELECT doc_id, w FROM t WHERE w LIKE 'qu%' ORDER BY doc_id, w""".stripMargin,

    "q41_ignore_nulls" ->
      """SELECT o_orderkey, o_custkey,
        |       lag(nullif(o_orderstatus, 'O'), 1 IGNORE NULLS)
        |         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |         AS prev_closed,
        |       round(cume_dist() OVER (PARTITION BY o_orderstatus
        |         ORDER BY o_totalprice, o_orderkey), 6) AS cd
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q37_recursive" ->
      """WITH RECURSIVE anc(custkey, anc_key, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 64
        |  UNION ALL
        |  SELECT custkey, anc_key // 2, depth + 1 FROM anc WHERE anc_key > 0
        |)
        |SELECT custkey, count(*) AS chain_len, CAST(max(depth) AS BIGINT) AS max_depth
        |FROM anc GROUP BY custkey ORDER BY custkey""".stripMargin,

    "q38_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |       count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q39_nullsafe" ->
      """SELECT o_orderkey,
        |       nullif(o_orderstatus, 'O') AS ns,
        |       coalesce(nullif(o_orderstatus, 'O'), 'open') AS st_or_open,
        |       ifnull(nullif(o_orderstatus, 'O'), 'X') AS ifn,
        |       (nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM
        |          nullif(o_orderpriority, '1-URGENT')) AS both_null_eq
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q35_unpivot" ->
      """SELECT p_partkey, 'p_size' AS attr, CAST(p_size AS DOUBLE) AS val FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS attr, p_retailprice AS val FROM part
        |ORDER BY p_partkey, attr""".stripMargin,

    "q36_explode_outer" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]{8,}') ws
        |           FROM documents)
        |SELECT doc_id, unnest(ws) AS w FROM t WHERE len(ws) > 0
        |UNION ALL
        |SELECT doc_id, NULL AS w FROM t WHERE len(ws) = 0
        |ORDER BY doc_id ASC, w ASC NULLS FIRST""".stripMargin,

    "q34_date2" ->
      """SELECT o_orderkey,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |       CAST(o_orderdate AS DATE) + 30 AS plus30,
        |       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin
  )
}
