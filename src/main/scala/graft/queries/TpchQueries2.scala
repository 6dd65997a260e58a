package graft.queries

import graft.Tables
import graft.ops.PlanHints.broadcastIfSmall
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remainder of the TPC-H plan-shape battery (Q1, Q2, Q6, Q7, Q8, Q9,
  * Q11, Q12, Q13, Q14, Q15, Q16, Q17, Q19), adapted to the fixture star
  * schema the same way `TpchQueries` adapts Q3-Q5/Q10/Q18/Q20-Q22:
  *
  *  - no `partsupp` table exists, so part-supplier relations (Q2's supply
  *    cost, Q11's stock value, Q16's supplier-per-part counts) derive from
  *    `lineitem` — the observed (l_partkey, l_suppkey) pairs ARE the supply
  *    relation, with unit price / extended price standing in for
  *    ps_supplycost / ps_availqty·cost;
  *  - no commitdate/receiptdate exists, so every lateness predicate is
  *    "shipped more than 60 days after ordering" (same adaptation as Q4/Q21);
  *  - no p_container/p_mfgr exists, so Q17/Q19's container predicates and
  *    Q9's mfgr rollup use p_brand / p_type / p_size, and Q9's supplycost
  *    uses a 10 %-of-retail proxy.
  *
  * Everything hashes exactly: money quantizes PER ROW to integer cents /
  * 1e-4 dollars before any aggregation (one fixed double expression tree,
  * identical in both engines, then an exact integer sum), means are integer
  * `div`, and ratios are parts-per-million computed as
  * `(decimal(38,0) numerator × 1e6) div denominator` — decimal because a
  * bigint numerator times 1e6 would overflow int64 once fact sums pass
  * ~9.2e12, which a 100 TB corpus does easily. Ordering keys always extend
  * to a total order so LIMIT is deterministic across engines.
  */
object TpchQueries2 {

  private def revE4 = expr(
    "cast(round(l_extendedprice * (1.0D - l_discount) * 10000.0D, 0) as bigint)")
  private def qtyCenti = expr(
    "cast(round(l_quantity * 100.0D, 0) as bigint)")

  /** q90 / TPC-H Q1 — pricing summary report: the canonical scan-heavy
    * aggregate. One pass over lineitem, grouped on two low-cardinality
    * columns (6 groups), every aggregate map-side combinable — the shuffle
    * carries 6 rows per task no matter the scale factor. Averages are
    * exact integer `sum div count`, never a float mean. */
  def q90Tpch1(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        qtyCenti.as("qc"),
        expr("cast(round(l_extendedprice * 100.0D, 0) as bigint)").as("pc"),
        revE4.as("disc_e4"),
        expr("cast(round(l_extendedprice * (1.0D - l_discount) * (1.0D + l_tax) * 10000.0D, 0) as bigint)")
          .as("charge_e4"),
        expr("cast(round(l_discount * 10000.0D, 0) as bigint)").as("disc_bp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qc")).as("sum_qty_centi"),
        sum(col("pc")).as("sum_base_cents"),
        sum(col("disc_e4")).as("sum_disc_price_e4"),
        sum(col("charge_e4")).as("sum_charge_e4"),
        expr("sum(qc) div count(1)").as("avg_qty_centi"),
        expr("sum(pc) div count(1)").as("avg_price_cents"),
        expr("sum(disc_bp) div count(1)").as("avg_disc_bp"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q91 / TPC-H Q2 shape — minimum-cost supplier: for each qualifying
    * part, the region's suppliers achieving the per-part MINIMUM unit
    * price (supply cost proxy = min observed extendedprice/quantity per
    * (part, supplier)). The correlated scalar-min subquery decorrelates
    * into a min-over-part WINDOW on the aggregated supply frame — not a
    * groupBy + join-back, which would recompute the whole supply subtree
    * (column pruning gives the two consumers different partial aggregates,
    * so exchange reuse can't deduplicate them and lineitem scans twice).
    * The window shuffles only the already-aggregated (part, supplier)
    * frame, partition width bounded by suppliers-per-part. */
  def q91Tpch2(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .filter(col("p_type") === "LARGE" && col("p_size") <= 5)
      .select(col("p_partkey"))
    val nat = Tables.load(spark, dir, "nation")
      .filter(col("n_regionkey") === 1)
      .select(col("n_nationkey"), col("n_name"))
    val sup = Tables.load(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        expr("cast(round(s_acctbal * 100.0D, 0) as bigint)").as("acctbal_cents"))
    val supply = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr("cast(round(l_extendedprice / l_quantity * 10000.0D, 0) as bigint)").as("unit_e4"))
      .join(broadcastIfSmall(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcastIfSmall(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"), col("s_suppkey"))
      .agg(first(col("s_name")).as("s_name"), first(col("n_name")).as("n_name"),
        first(col("acctbal_cents")).as("acctbal_cents"),
        min(col("unit_e4")).as("cost_e4"))
    supply
      .withColumn("min_cost_e4",
        min(col("cost_e4")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("cost_e4") === col("min_cost_e4"))
      .select(col("acctbal_cents"), col("s_name"), col("n_name"),
        col("p_partkey"), col("cost_e4"))
      .orderBy(col("acctbal_cents").desc, col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** q103 / TPC-H Q6 — forecasting revenue change: the pure
    * filter-and-sum. All three predicates push to the parquet scan
    * (year range on shipdate, discount band, quantity cap); the "plan" is
    * a scan plus one partial/final agg of a single bigint — the shape
    * where a columnar reader's min/max row-group pruning does all the
    * work at 100 TB. */
  def q103Tpch6(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum(expr("cast(round(l_extendedprice * l_discount * 10000.0D, 0) as bigint)"))
        .as("revenue_e4"))
  }

  /** q92 / TPC-H Q7 — volume shipping: revenue flowing between two named
    * nations, in both directions, per ship year. The two nation lookups
    * attach through bounded broadcasts (25 rows each) onto the supplier
    * and customer keys; the only wide exchange is the lineitem⋈orders
    * spine. The direction pair filter is a residual OR over the two
    * broadcast-joined columns — nothing re-shuffles for it. */
  def q92Tpch7(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"), revE4.as("rev"))
    val o = Tables.load(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.load(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.load(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val n1 = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcastIfSmall(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcastIfSmall(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("rev")).as("revenue_e4"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q93 / TPC-H Q8 — national market share: of the revenue a region's
    * customers spent on one part type, the fraction supplied by one
    * nation, per order year. The share is parts-per-million computed as
    * `(decimal(38,0) nation_sum × 1e6) div total_sum` — both sums are
    * exact integer e-4 dollars, and the decimal widening means the ppm
    * stays exact at any scale factor (bigint × 1e6 would wrap at ~9.2e12
    * e-4 dollars ≈ $1 B, far below a 100 TB year's revenue). */
  def q93Tpch8(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    val region0Nations = Tables.load(spark, dir, "nation")
      .filter(col("n_regionkey") === 0).select(col("n_nationkey"))
    val c = Tables.load(spark, dir, "customer")
      .join(broadcast(region0Nations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
    val s = Tables.load(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), revE4.as("rev"))
      .join(broadcastIfSmall(parts), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcastIfSmall(c), col("o_custkey") === col("c_custkey"))
      .join(broadcastIfSmall(s), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        expr("cast((cast(sum(case when s_nationkey = 3 then rev else 0L end) as decimal(38,0)) * 1000000) div sum(rev) as bigint)")
          .as("share_ppm"),
        sum(col("rev")).as("total_e4"))
      .orderBy("o_year")
  }

  /** q94 / TPC-H Q9 shape — product-type profit: per supplier nation and
    * order year, revenue minus a supply-cost proxy (10 % of retail price
    * per unit — the fixture has no partsupp.ps_supplycost). The profit
    * amount quantizes per row BEFORE the sum: both engines evaluate the
    * identical two-term double expression, round each term to an exact
    * integer, and subtract — so the grouped sums are merge-order-free. */
  def q94Tpch9(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .filter(col("p_name").like("%gear%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val s = Tables.load(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.load(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
    Tables.load(spark, dir, "lineitem")
      .join(broadcastIfSmall(parts), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (revE4 - expr("cast(round(l_quantity * p_retailprice * 0.1D * 10000.0D, 0) as bigint)"))
          .as("amount_e4"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcastIfSmall(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(col("amount_e4")).as("profit_e4"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** q95 / TPC-H Q11 shape — important stock: parts whose observed trade
    * value (from one region's suppliers) exceeds TWICE the average part
    * value. Q11's literal `0.0001` fraction is calibrated to SF1 and
    * degenerates with scale (at 10× the parts it selects nothing), so the
    * adaptation makes the threshold scale-free: value > 2 · total/n_parts,
    * multiplied out to `value × n_parts > 2 × total` in decimal(38,0) so
    * the comparison is exact and cannot wrap at any scale factor. The
    * scalar (total, n_parts) is a 1-row broadcast cross join; one wide
    * shuffle on partkey, and the global total re-aggregates the same
    * grouped frame (AQE stage reuse dedupes the scan at runtime). */
  def q95Tpch11(spark: SparkSession, dir: String): DataFrame = {
    val region3Nations = Tables.load(spark, dir, "nation")
      .filter(col("n_regionkey") === 3).select(col("n_nationkey"))
    val sup = Tables.load(spark, dir, "supplier")
      .join(broadcast(region3Nations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val byPart = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr("cast(round(l_extendedprice * 100.0D, 0) as bigint)").as("pc"))
      .join(broadcastIfSmall(sup), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("pc")).as("value_cents"))
    val total = byPart.agg(sum(col("value_cents")).as("total_cents"),
      count(lit(1)).as("n_parts"))
    byPart.crossJoin(broadcast(total))
      .filter(expr("cast(value_cents as decimal(38,0)) * n_parts > cast(total_cents as decimal(38,0)) * 2"))
      .select(col("l_partkey"), col("value_cents"))
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  /** q96 / TPC-H Q12 shape — late-shipment priority mix: among lines
    * shipped in one year more than 60 days after ordering, count
    * critical-priority vs other orders per line status (the fixture has
    * no l_shipmode; l_linestatus is the grouping stand-in). One
    * orders⋈lineitem shuffle; the conditional counts are map-side
    * combinable sums of 0/1. */
  def q96Tpch12(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("interval 60 days"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** q97 / TPC-H Q13 — customer order-count distribution: LEFT OUTER
    * customer⟕orders so zero-order customers keep a 0 bucket, then a
    * second aggregation over the counts. The first groupBy shuffles on
    * custkey (same key the outer join just used — Catalyst reuses the
    * partitioning, no second exchange of the fact side); the histogram
    * aggregation moves one row per distinct count. */
  def q97Tpch13(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") =!= "P")
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.load(spark, dir, "customer").select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** q98 / TPC-H Q14 — promotion effect: the share of one ship month's
    * revenue coming from PROMO-type parts, as exact ppm (decimal-widened
    * integral division, same scheme as q93). The month filter prunes
    * lineitem at the scan; part attaches via a size-gated hint. */
  def q98Tpch14(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_type"))
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select(col("l_partkey"), revE4.as("rev"))
      .join(broadcastIfSmall(parts), col("l_partkey") === col("p_partkey"))
      .agg(
        expr("cast((cast(sum(case when p_type = 'PROMO' then rev else 0L end) as decimal(38,0)) * 1000000) div sum(rev) as bigint)")
          .as("promo_ppm"),
        sum(col("rev")).as("total_e4"))
  }

  /** q99 / TPC-H Q15 — top supplier: the quarter's revenue per supplier,
    * returning every supplier tied at the maximum. The max is a 1-row
    * broadcast joined back onto the SAME aggregated subtree (view reuse —
    * Q15's CREATE VIEW is exactly this shared-subplan shape); the
    * supplier dimension attaches after the equality filter has reduced
    * the frame to the winners. */
  def q99Tpch15(spark: SparkSession, dir: String): DataFrame = {
    // The explicit isnotnull matches the predicate the inner supplier
    // join infers on the winners branch — without it the max branch's
    // scan filter differs, the two Exchanges stop being canonically
    // equal, and exchange reuse (one lineitem scan, not two) is lost.
    val srev = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-10-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_suppkey").isNotNull)
      .select(col("l_suppkey"), revE4.as("rev"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("rev")).as("total_rev_e4"))
    val top = srev.agg(max(col("total_rev_e4")).as("max_rev_e4"))
    val s = Tables.load(spark, dir, "supplier").select(col("s_suppkey"), col("s_name"))
    srev.crossJoin(broadcast(top))
      .filter(col("total_rev_e4") === col("max_rev_e4"))
      .join(broadcastIfSmall(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_e4"))
      .orderBy("s_suppkey")
  }

  /** q100 / TPC-H Q16 shape — supplier diversity per part class: distinct
    * suppliers observed per (brand, type, size), excluding suppliers with
    * negative balances (the complaints-comment proxy) through a LEFT ANTI
    * join applied BEFORE the distinct aggregation. countDistinct plans as
    * the standard two-level expand — partial distinct on (group, suppkey),
    * then the count — never a per-group set collect. */
  def q100Tpch16(spark: SparkSession, dir: String): DataFrame = {
    val badSup = Tables.load(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val parts = Tables.load(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcastIfSmall(badSup), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcastIfSmall(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** q101 / TPC-H Q17 — small-quantity-order revenue: lines of one brand
    * whose quantity is under a fifth of that part's average quantity.
    * The correlated AVG decorrelates to per-part WINDOW sums over the
    * brand-pruned lines — one scan and one shuffle on partkey, where the
    * groupBy-and-join-back alternative scans lineitem twice (the raw-row
    * consumer and the aggregate consumer prune differently, defeating
    * exchange reuse). Partition width is lines-per-part, schema-bounded.
    * The comparison `5·qty·cnt < total_qty` is exact integer algebra
    * (multiplying out the average avoids both the float mean and a
    * division) — identical filter semantics in both engines by
    * construction. Output is the Q17 "avg yearly" figure: the revenue
    * sum div 7, exact. */
  def q101Tpch17(spark: SparkSession, dir: String): DataFrame = {
    val parts4 = Tables.load(spark, dir, "part")
      .filter(col("p_brand") === "Brand#4").select(col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), qtyCenti.as("qc"), revE4.as("rev"))
      .join(broadcastIfSmall(parts4), col("l_partkey") === col("p_partkey"), "left_semi")
      .withColumn("total_qc", sum(col("qc")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("qc") * 5 * col("cnt") < col("total_qc"))
      .agg(expr("sum(rev) div 7").as("avg_yearly_e4"))
  }

  /** q102 / TPC-H Q19 — disjunctive predicate revenue: three brand/size/
    * quantity conjunctions OR-ed together across the lineitem⋈part join.
    * The part-side disjunction (brand, size) prunes the dimension scan;
    * the quantity terms must stay residual on the join because each is
    * paired with a different brand — the classic Q19 test that a planner
    * keeps the equi-join key clean and the OR as a post-join filter
    * instead of exploding to a union of three joins. */
  def q102Tpch19(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .filter((col("p_brand") === "Brand#2" && col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#19" && col("p_size").between(1, 30)) ||
        (col("p_brand") === "Brand#4" && col("p_size").between(20, 50)))
      .select(col("p_partkey"), col("p_brand"))
    Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), revE4.as("rev"))
      .join(broadcastIfSmall(parts), col("l_partkey") === col("p_partkey"))
      .filter((col("p_brand") === "Brand#2" && col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#19" && col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#4" && col("l_quantity").between(20, 40)))
      .agg(sum(col("rev")).as("revenue_e4"))
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q90_tpch1" -> ((s, d) => q90Tpch1(s, d)),
    "q91_tpch2" -> ((s, d) => q91Tpch2(s, d)),
    "q92_tpch7" -> ((s, d) => q92Tpch7(s, d)),
    "q93_tpch8" -> ((s, d) => q93Tpch8(s, d)),
    "q94_tpch9" -> ((s, d) => q94Tpch9(s, d)),
    "q95_tpch11" -> ((s, d) => q95Tpch11(s, d)),
    "q96_tpch12" -> ((s, d) => q96Tpch12(s, d)),
    "q97_tpch13" -> ((s, d) => q97Tpch13(s, d)),
    "q98_tpch14" -> ((s, d) => q98Tpch14(s, d)),
    "q99_tpch15" -> ((s, d) => q99Tpch15(s, d)),
    "q100_tpch16" -> ((s, d) => q100Tpch16(s, d)),
    "q101_tpch17" -> ((s, d) => q101Tpch17(s, d)),
    "q102_tpch19" -> ((s, d) => q102Tpch19(s, d)),
    "q103_tpch6" -> ((s, d) => q103Tpch6(s, d))
  )

  private val revSql =
    "CAST(round(l_extendedprice * (1.0 - l_discount) * 10000.0, 0) AS BIGINT)"
  private val qcSql = "CAST(round(l_quantity * 100.0, 0) AS BIGINT)"

  // lazy: oracle SQL bodies cross-reference sibling modules (t27→Dedup,
  // s24→Text…); eager Maps would make object-init order a correctness
  // hazard (NPE on whichever module clinit runs first).
  lazy val oracles: Map[String, String] = Map(
    "q90_tpch1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM($qcSql) AS BIGINT) AS sum_qty_centi,
         |  CAST(SUM(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT)
         |    AS sum_base_cents,
         |  CAST(SUM($revSql) AS BIGINT) AS sum_disc_price_e4,
         |  CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000.0, 0) AS BIGINT)) AS BIGINT)
         |    AS sum_charge_e4,
         |  CAST(SUM($qcSql) // COUNT(*) AS BIGINT) AS avg_qty_centi,
         |  CAST(SUM(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) // COUNT(*) AS BIGINT)
         |    AS avg_price_cents,
         |  CAST(SUM(CAST(round(l_discount * 10000.0, 0) AS BIGINT)) // COUNT(*) AS BIGINT)
         |    AS avg_disc_bp,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q91_tpch2" ->
      """WITH supply AS (
        |  SELECT l_partkey AS p_partkey, l_suppkey,
        |         MIN(CAST(round(l_extendedprice / l_quantity * 10000.0, 0) AS BIGINT))
        |           AS cost_e4
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_type = 'LARGE' AND p_size <= 5)
        |    AND l_suppkey IN (SELECT s_suppkey FROM supplier
        |                      JOIN nation ON s_nationkey = n_nationkey
        |                      WHERE n_regionkey = 1)
        |  GROUP BY 1, 2),
        |sp AS (
        |  SELECT CAST(round(s_acctbal * 100.0, 0) AS BIGINT) AS acctbal_cents,
        |         s_name, n_name, p_partkey, cost_e4
        |  FROM supply
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey)
        |SELECT acctbal_cents, s_name, n_name, p_partkey, cost_e4
        |FROM sp
        |WHERE cost_e4 = (SELECT MIN(cost_e4) FROM sp sp2
        |                 WHERE sp2.p_partkey = sp.p_partkey)
        |ORDER BY acctbal_cents DESC, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q92_tpch7" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |       CAST(year(l_shipdate) AS INT) AS l_year,
         |       CAST(SUM($revSql) AS BIGINT) AS revenue_e4
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |  AND l_shipdate < TIMESTAMP '1999-01-01'
         |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         |GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin,

    "q93_tpch8" ->
      s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         |       CAST(SUM(CASE WHEN s_nationkey = 3 THEN $revSql ELSE 0 END)
         |            * 1000000 // SUM($revSql) AS BIGINT) AS share_ppm,
         |       CAST(SUM($revSql) AS BIGINT) AS total_e4
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey AND cn.n_regionkey = 0
         |JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY 1
         |ORDER BY 1""".stripMargin,

    "q94_tpch9" ->
      s"""SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
         |       CAST(SUM($revSql
         |         - CAST(round(l_quantity * p_retailprice * 0.1 * 10000.0, 0) AS BIGINT))
         |         AS BIGINT) AS profit_e4
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%gear%'
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1, 2
         |ORDER BY n_name, o_year DESC""".stripMargin,

    "q95_tpch11" ->
      """WITH byPart AS (
        |  SELECT l_partkey,
        |         CAST(SUM(CAST(round(l_extendedprice * 100.0, 0) AS BIGINT)) AS BIGINT)
        |           AS value_cents
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |                      JOIN nation ON s_nationkey = n_nationkey
        |                      WHERE n_regionkey = 3)
        |  GROUP BY 1)
        |SELECT l_partkey, value_cents
        |FROM byPart
        |WHERE value_cents * (SELECT COUNT(*) FROM byPart)
        |      > 2 * (SELECT SUM(value_cents) FROM byPart)
        |ORDER BY value_cents DESC, l_partkey""".stripMargin,

    "q96_tpch12" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin,

    "q97_tpch13" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |    AND o_orderstatus <> 'P'
        |  GROUP BY c_custkey) cc
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q98_tpch14" ->
      s"""SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql ELSE 0 END)
         |            * 1000000 // SUM($revSql) AS BIGINT) AS promo_ppm,
         |       CAST(SUM($revSql) AS BIGINT) AS total_e4
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
         |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin,

    "q99_tpch15" ->
      s"""WITH srev AS (
         |  SELECT l_suppkey, CAST(SUM($revSql) AS BIGINT) AS total_rev_e4
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-10-01'
         |    AND l_shipdate < TIMESTAMP '1998-01-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_rev_e4
         |FROM srev JOIN supplier ON s_suppkey = l_suppkey
         |WHERE total_rev_e4 = (SELECT MAX(total_rev_e4) FROM srev)
         |ORDER BY s_suppkey""".stripMargin,

    "q100_tpch16" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q101_tpch17" ->
      s"""WITH li AS (
         |  SELECT l_partkey, $qcSql AS qc, $revSql AS rev
         |  FROM lineitem
         |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4')),
         |stats AS (
         |  SELECT l_partkey AS sp_key, CAST(SUM(qc) AS BIGINT) AS total_qc,
         |         COUNT(*) AS cnt
         |  FROM li GROUP BY 1)
         |SELECT CAST(SUM(rev) // 7 AS BIGINT) AS avg_yearly_e4
         |FROM li JOIN stats ON l_partkey = sp_key
         |WHERE qc * 5 * cnt < total_qc""".stripMargin,

    "q102_tpch19" ->
      s"""SELECT CAST(SUM($revSql) AS BIGINT) AS revenue_e4
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 1 AND 20)
         |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 30
         |        AND l_quantity BETWEEN 10 AND 30)
         |   OR (p_brand = 'Brand#4' AND p_size BETWEEN 20 AND 50
         |        AND l_quantity BETWEEN 20 AND 40)""".stripMargin,

    "q103_tpch6" ->
      """SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 10000.0, 0) AS BIGINT)) AS BIGINT)
        |  AS revenue_e4
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin
  )
}
