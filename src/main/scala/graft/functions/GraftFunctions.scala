package graft.functions

import org.apache.spark.sql.SparkSession

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
      "topk_pairs", exprs => TopKPairs(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int]), "built-in")
  }
}
