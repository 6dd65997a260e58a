package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global median by sketch-bracketed distributed selection — the
  * q55 engine, factored over any frame. Never sorts or range-shuffles the
  * input and never aggregates every value into one percentile buffer:
  *
  *  - pass 1 (narrow scan): count + an `approx_percentile` bracket
  *    `[lo, hi]` whose GK rank guarantee (error ≤ n/accuracy) provably
  *    contains both middle order statistics;
  *  - pass 2 (scan): `count(v < lo)` / `count(v <= hi)` — the band's
  *    global rank offset and the safety check;
  *  - pass 3: exact [[RankOps]] selection over ONLY the ~6n/accuracy-row
  *    band, partitioned by its known size.
  *
  * If the sketch invariant is ever violated the selection falls back to a
  * full-input [[RankOps]] rank — exactness never rests on the sketch.
  */
object MedianOps {

  /** One row `(n BIGINT, median DOUBLE)`: `n` = count of NON-NULL
    * values, `median` = `quantile_cont(value, 0.5)` over them (mean of
    * the two middle order statistics, rounded to 6 dp; NULL when no
    * values exist). NULLs are excluded from both `n` and the median —
    * SQL aggregate semantics; NaN values are unsupported (they have no
    * consistent quantile position). `tiebreaks` must make
    * (value, tiebreaks) a total order; they may be arbitrary expressions
    * (each is aliased internally, so computed tiebreaks resolve fine). */
  def exactMedian(df: DataFrame, value: Column, tiebreaks: Column*): DataFrame = {
    val spark = df.sparkSession
    // Alias every tiebreak: the same Column objects are used again as
    // sort keys against the PROJECTED frame, where an unaliased computed
    // expression (or its inputs) no longer resolves.
    val tbNames = tiebreaks.indices.map(i => s"__tb$i")
    val base = df
      .select((value.cast("double").as("__mv") +:
        tiebreaks.zip(tbNames).map { case (c, n) => c.as(n) }): _*)
      .filter(col("__mv").isNotNull)
    val acc = 1000 // GK rank error ≤ n/acc; band ≈ 6n/acc rows
    val head = base.agg(
      count(lit(1)).as("n"),
      expr(s"approx_percentile(__mv, array(greatest(0.5d - 3.0d/$acc, 0.0d)," +
        s" least(0.5d + 3.0d/$acc, 1.0d)), $acc)").as("br")).first()
    val n = head.getLong(0)
    if (n == 0)
      spark.range(1).select(lit(0L).as("n"), lit(null).cast("double").as("median"))
    else {
      val br = head.getSeq[Double](1)
      val (lo, hi) = (br(0), br(1))
      val k1 = (n - 1) / 2
      val k2 = n / 2
      val counts = base.agg(
        sum(when(col("__mv") < lo, 1L).otherwise(0L)).as("c_lo"),
        sum(when(col("__mv") <= hi, 1L).otherwise(0L)).as("c_hi")).first()
      val (cLo, cHi) = (counts.getLong(0), counts.getLong(1))
      val sortCols = col("__mv").asc +: tbNames.map(col(_).asc)
      val sel =
        if (cLo <= k1 && k2 < cHi) {
          // Partition the band rank by its KNOWN size (c_hi − c_lo):
          // hundreds of rows get one task, 10⁸ rows get the full width.
          val bandParts = math.min(spark.sparkContext.defaultParallelism.toLong,
            (cHi - cLo) / 100000 + 1).toInt
          RankOps.withGlobalRank(
              base.filter(col("__mv") >= lo && col("__mv") <= hi),
              bandParts, "rk", sortCols: _*)
            .filter((col("rk") + cLo).isin(k1, k2))
        } else // sketch bound violated (can't happen); exact full-rank path
          RankOps.withGlobalRank(
              base, spark.sparkContext.defaultParallelism, "rk", sortCols: _*)
            .filter(col("rk").isin(k1, k2))
      sel.agg(round(avg(col("__mv")), 6).as("median"))
        .select(lit(n).as("n"), col("median"))
    }
  }
}
