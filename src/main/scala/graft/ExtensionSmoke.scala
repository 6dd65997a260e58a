package graft

import org.apache.spark.sql.SparkSession

/** Proves the cluster deployment path end-to-end in a real session:
  * `spark.sql.extensions=graft.functions.GraftExtensions` (applied at
  * session build — only a fresh JVM exercises it, which is why this is a
  * main and not a ScalaTest sharing the suite session) must make every
  * native function resolvable from SQL with NO per-session
  * `GraftFunctions.register` call. Exits nonzero on failure. */
object ExtensionSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val r = spark.sql(
        """SELECT
          |  cosine_sim(array(cast(id as double) + 1.0D, 2.0D), array(2.0D, 1.0D)) c,
          |  dot_product(array(cast(id as double) + 1.0D, 2.0D), array(2.0D, 1.0D)) d,
          |  sorted_intersect_count(array(id + 1L, 3L), array(1L, 3L)) i
          |FROM range(1)
          |""".stripMargin).collect()(0)
      assert(math.abs(r.getDouble(0) - 0.8) < 1e-12, s"cosine_sim: ${r.getDouble(0)}")
      assert(r.getDouble(1) == 4.0, s"dot_product: ${r.getDouble(1)}")
      assert(r.getInt(2) == 2, s"sorted_intersect_count: ${r.getInt(2)}")
      // topk_pairs is an aggregate — its own statement
      val t = spark.sql(
        "SELECT topk_pairs(cast(id as double), id, 1) t FROM range(5)")
        .selectExpr("t[0].id").collect()(0).getLong(0)
      assert(t == 4L, s"topk_pairs: $t")
      val sh = spark.sql(
        "SELECT shingle_explode('a b c d', 3) AS (pos, shingle) FROM (SELECT 1)")
        .collect()
      assert(sh.length == 2 && sh(0).getString(1) == "a b c", sh.mkString(";"))
      println("[extension-smoke] OK: all native functions resolve via spark.sql.extensions")
    } finally spark.stop()
  }
}
