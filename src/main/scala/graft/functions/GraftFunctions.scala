package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registration of graft's native expressions into a session's function
  * registry, callable from SQL / `expr(...)` as ordinary functions.
  *
  * Idempotent — query builders call this unconditionally.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", exprs => SortedIntersectCount(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_pairs", exprs => TopKPairs(exprs(0), exprs(1), literalK(exprs(2))),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_explode", exprs => ShingleExplode(exprs(0), exprs(1)), "built-in")
  }

  /** `k` must fold to an integral constant (INT or BIGINT both accepted —
    * SQL integer literals can parse as either, and `cast(1 as bigint)` is
    * foldable without being a Literal); anything else gets a clear
    * plan-time error instead of a ClassCastException/NPE. */
  private def literalK(e: Expression): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"topk_pairs: k must be a constant integer, got non-foldable ${e.sql}")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case other => throw new IllegalArgumentException(
        s"topk_pairs: k must be an integral constant, got $other")
    }
  }
}
