package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: |A ∩ B| for two SORTED `array<bigint>`
  * inputs via a linear merge — the set-similarity verification primitive.
  *
  * `array_intersect` builds a hash set per evaluation and materializes the
  * intersection array just to take its size; on a candidate-pair stream
  * (millions of pairs at corpus scale, each paying one verification) the
  * merge-count does the same work with two pointers, zero allocation, and
  * whole-stage codegen. Duplicate-free sorted inputs are the caller's
  * contract (the dedup cache sorts each fingerprint array once at build
  * time — per document, not per pair).
  *
  * Counts matching positions the way a set intersection does: after a
  * match both cursors advance, so duplicate-free inputs yield exact set
  * intersection size.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects array<bigint>, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NOT fixed identifiers: two instances of this expression
      // in one projection can compile into ONE generated function (when the
      // children are non-nullable, nullSafeCodeGen emits the bodies
      // unbraced), and fixed locals then collide — janino rejects the
      // function and the whole stage silently falls back to interpreted
      // eval, the exact path this expression exists to avoid.
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements(), $nb = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i), $y = $b.getLong($j);
         |  if ($x < $y) $i++;
         |  else if ($x > $y) $j++;
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
