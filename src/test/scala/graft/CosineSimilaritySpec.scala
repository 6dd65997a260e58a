package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def cosOf(df: org.apache.spark.sql.DataFrame): Double = {
    GraftFunctions.register(spark)
    df.select(expr("cosine_sim(a, b)")).collect()(0).getDouble(0)
  }

  test("known double vectors") {
    val got = cosOf(Seq((Array(1.0, 2.0), Array(2.0, 1.0))).toDF("a", "b"))
    assert(math.abs(got - 0.8) < 1e-12)
  }

  test("identical vectors give 1.0, orthogonal give 0.0") {
    assert(math.abs(cosOf(Seq((Array(3.0, 4.0), Array(3.0, 4.0))).toDF("a", "b")) - 1.0) < 1e-12)
    assert(math.abs(cosOf(Seq((Array(1.0, 0.0), Array(0.0, 1.0))).toDF("a", "b"))) < 1e-12)
  }

  test("float arrays widen to double (parquet embedding column path)") {
    val got = cosOf(Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b"))
    assert(math.abs(got - 0.8) < 1e-7)
  }

  test("interpreted eval matches codegen") {
    GraftFunctions.register(spark)
    val df = Seq((Array(0.3, -1.7, 2.2), Array(1.1, 0.4, -0.9))).toDF("a", "b")
    val codegen = df.select(expr("cosine_sim(a, b)")).collect()(0).getDouble(0)
    val e = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(0.3, -1.7, 2.2)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.1, 0.4, -0.9)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    assert(codegen == interpreted)
  }

  test("null input yields null") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).collect()(0).isNullAt(0))
  }

  test("length-mismatched vectors yield null, not a truncated similarity") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).collect()(0).isNullAt(0))
    val e = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0, 3.0)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0)))
    assert(e.eval(null) == null)
  }

  test("zero-norm vector yields null, not NaN") {
    GraftFunctions.register(spark)
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(expr("cosine_sim(a, b)")).collect()(0).isNullAt(0))
    val e = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(0.0, 0.0)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0)))
    assert(e.eval(null) == null)
  }

  test("topk_pairs rejects non-literal and non-integral k with a clear error") {
    GraftFunctions.register(spark)
    val df = Seq((1, 2)).toDF("x", "y")
    val err = intercept[Exception] {
      df.selectExpr("topk_pairs(x, y, x)").collect()
    }
    assert(err.getMessage.contains("topk_pairs"))
    // BIGINT literal k must be accepted (SQL integer literals can parse long)
    val dfe = Seq((1.0, 1L), (0.5, 2L)).toDF("s", "id")
    val top = dfe.selectExpr("topk_pairs(s, id, cast(1 as bigint)) as t")
      .selectExpr("t[0].id").collect()(0).getLong(0)
    assert(top == 1L)
  }
}
