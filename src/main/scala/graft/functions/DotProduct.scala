package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: dot product of two vectors (`array<float>`
  * or `array<double>`, mixed allowed), accumulated in double precision.
  *
  * The primitive under LSH bucketing (hyperplane sign bits are
  * `dot(v, plane) > 0`) and IVF scoring; splitting it out of
  * [[CosineSimilarity]] lets plans that already know the norms — or that
  * only need the sign — skip the norm arithmetic. Same design rationale:
  * `zip_with`+`aggregate` higher-order lambdas are CodegenFallback and pay
  * per-row interpretation plus an intermediate array; this expression emits
  * a tight fused loop inside whole-stage codegen.
  *
  * Element-wise float→double widening with sequential left-to-right
  * accumulation — identical arithmetic to DuckDB's
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])`, so results hash-match.
  * Length-mismatched inputs return null (malformed embedding, not a value).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVector(left.dataType) && isVector(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float>/array<double>, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var dot = 0.0; var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName, NOT fixed identifiers: two instances of this expression
      // in one projection can compile into ONE generated function (when the
      // children are non-nullable, nullSafeCodeGen emits the bodies
      // unbraced), and fixed locals then collide — janino rejects the
      // function and the whole stage silently falls back to interpreted
      // eval, the exact path this expression exists to avoid.
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val xGet = if (isFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val yGet = if (isFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ($xGet) * ($yGet);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
