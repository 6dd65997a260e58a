package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` hook for cluster deployments:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes
  * every graft native function available in every session without
  * per-session registration (the harness path uses
  * [[GraftFunctions.register]]). The function list is
  * [[GraftFunctions.builders]] — one surface, two injection paths.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(GraftFunctions.getClass.getName, name),
        builder))
    }
}
