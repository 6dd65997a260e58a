package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions.expr
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

class SortedIntersectCountSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def countOf(a: Seq[Long], b: Seq[Long]): Int = {
    GraftFunctions.register(spark)
    Seq((a.toArray, b.toArray)).toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)")).collect()(0).getInt(0)
  }

  test("known sorted arrays") {
    assert(countOf(Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)) == 2)
    assert(countOf(Seq(1L, 2L), Seq(3L, 4L)) == 0)
    assert(countOf(Seq.empty, Seq(1L)) == 0)
    assert(countOf(Seq(-5L, 0L, 7L), Seq(-5L, 0L, 7L)) == 3)
  }

  test("interpreted eval matches codegen") {
    GraftFunctions.register(spark)
    val e = graft.functions.SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1L, 4L, 6L)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(2L, 4L, 6L, 8L)))
    assert(e.eval(null) == countOf(Seq(1L, 4L, 6L), Seq(2L, 4L, 6L, 8L)))
  }

  test("null input yields null") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
    assert(df.select(expr("sorted_intersect_count(a, b)")).collect()(0).isNullAt(0))
  }

  test("agrees with set intersection on random sorted duplicate-free inputs") {
    GraftFunctions.register(spark)
    val gen = Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted)
    val cases = (1 to 60).flatMap { _ =>
      for (a <- gen.sample; b <- gen.sample) yield (a.toArray, b.toArray)
    }
    val got = cases.toDF("a", "b")
      .select(expr("sorted_intersect_count(a, b)")).collect().map(_.getInt(0))
    val want = cases.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got.toSeq == want.toSeq)
  }
}
