package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registration of graft's native expressions into a session's function
  * registry, callable from SQL / `expr(...)` as ordinary functions.
  *
  * Idempotent — query builders call this unconditionally.
  */
object GraftFunctions {

  /** Single source of truth for the native function surface: the
    * per-session path ([[register]]) and the cluster-wide extension path
    * ([[GraftExtensions]]) both iterate this list, so a function added
    * here is available on both — they cannot drift apart. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "dot_product" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "sorted_intersect_count" -> (exprs => SortedIntersectCount(exprs(0), exprs(1))),
    "topk_pairs" -> (exprs => TopKPairs(exprs(0), exprs(1), literalK(exprs(2)))),
    "shingle_explode" -> (exprs => ShingleExplode(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }

  // ---- typed Column API --------------------------------------------------
  // DataFrame users shouldn't have to round-trip through SQL strings
  // (`expr("cosine_sim(a, b)")`) to reach the native expressions; these
  // wrappers build the Catalyst node directly, so they compose with any
  // Column and stay inside whole-stage codegen. Spark 4 wraps classic
  // expressions via ExpressionUtils (Column's expression constructor moved
  // behind the Connect column-node abstraction).

  import org.apache.spark.sql.Column
  private def wrap(e: Expression): Column =
    org.apache.spark.sql.GraftColumnShim.column(e)
  private def unwrap(c: Column): Expression =
    org.apache.spark.sql.GraftColumnShim.expression(c)

  /** Cosine similarity of two float/double array columns. */
  def cosineSim(a: Column, b: Column): Column =
    wrap(CosineSimilarity(unwrap(a), unwrap(b)))

  /** Dot product of two numeric array columns. */
  def dotProduct(a: Column, b: Column): Column =
    wrap(DotProduct(unwrap(a), unwrap(b)))

  /** Intersection size of two SORTED bigint array columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    wrap(SortedIntersectCount(unwrap(a), unwrap(b)))

  /** Bounded-heap top-k (score, id) aggregate; `k` is a compile-time
    * constant. */
  def topkPairs(score: Column, id: Column, k: Int): Column =
    wrap(TopKPairs(unwrap(score), unwrap(id), k)
      .toAggregateExpression())

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
