package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` hook for cluster deployments:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes
  * `cosine_sim` available in every session without per-session
  * registration (the harness path uses [[GraftFunctions.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      exprs => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      exprs => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      exprs => SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("shingle_explode"),
      new ExpressionInfo(classOf[ShingleExplode].getName, "shingle_explode"),
      exprs => ShingleExplode(exprs(0), exprs(1))))
  }
}
