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

  test("two instances per projection survive codegen (freshName regression)") {
    // Non-nullable literal-array children make nullSafeCodeGen emit the
    // bodies unbraced into one generated function; fixed local names would
    // collide, janino would reject, and Spark would silently fall back to
    // interpreted eval. fallback=false turns that silence into a failure.
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      // id-dependent arrays: literal arrays would constant-fold the whole
      // expression away and never exercise codegen at all.
      val vecs = spark.range(1).selectExpr(
        "array(cast(id as double) + 1.0d, 2.0d) as a", "array(2.0d, 1.0d) as b",
        "array(cast(id as double), 1.0d) as c", "array(1.0d, 0.0d) as d")
      val r = vecs.selectExpr(
        "cosine_sim(a, b) as s1", "cosine_sim(c, d) as s2",
        "dot_product(a, b) as p1", "dot_product(c, d) as p2").collect()(0)
      assert(math.abs(r.getDouble(0) - 0.8) < 1e-12)
      assert(math.abs(r.getDouble(1)) < 1e-12)
      assert(r.getDouble(2) == 4.0)
      assert(r.getDouble(3) == 0.0)
      val sets = spark.range(1).selectExpr(
        "array(id + 1L, 3L, 5L) as u", "array(1L, 2L, 5L) as v",
        "array(id + 2L, 4L) as w", "array(4L, 6L) as z")
      val c = sets.selectExpr(
        "sorted_intersect_count(u, v) as c1",
        "sorted_intersect_count(w, z) as c2").collect()(0)
      assert(c.getInt(0) == 2 && c.getInt(1) == 1)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("typed Column API builds the same plans as the SQL registration path") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions.col
    val df = spark.range(3).selectExpr(
      "array(cast(id as double) + 1.0D, 2.0D, 0.5D) as a",
      "array(2.0D, cast(id as double) + 1.0D, 1.0D) as b",
      "array(id + 1L, 3L, 7L) as u", "array(1L, 3L, 7L) as v")
    // scalar wrappers: identical values to the SQL route, same rows
    val viaSql = df.selectExpr("cosine_sim(a, b) c", "dot_product(a, b) d",
      "sorted_intersect_count(u, v) i").collect()
    val viaCol = df.select(
      GraftFunctions.cosineSim(col("a"), col("b")).as("c"),
      GraftFunctions.dotProduct(col("a"), col("b")).as("d"),
      GraftFunctions.sortedIntersectCount(col("u"), col("v")).as("i")).collect()
    viaSql.zip(viaCol).foreach { case (s, c) =>
      assert(s.getDouble(0) == c.getDouble(0))
      assert(s.getDouble(1) == c.getDouble(1))
      assert(s.getInt(2) == c.getInt(2))
    }
    // the aggregate wrapper: a typed bounded-heap top-k
    import spark.implicits._
    val top = Seq((1.0, 1L), (3.0, 2L), (2.0, 3L)).toDF("s", "id")
      .select(GraftFunctions.topkPairs(col("s"), col("id"), 2).as("t"))
      .selectExpr("transform(t, x -> x.id) ids").collect()(0)
      .getSeq[Long](0)
    assert(top == Seq(2L, 3L))
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
