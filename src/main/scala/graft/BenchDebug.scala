package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for hot queries (not part of the driver contract). */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[dbg] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs = Tables.load(spark, dir, "documents")
      .withColumn("toks", split(lower(col("text")), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", expr(
        "array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))
      .select(col("doc_id"), col("sh"))

    time("shingled")(docs.count())
    val cached = docs.cache()
    time("shingled cached")(cached.count())
    val ex = cached.select(col("doc_id"), explode(col("sh")).as("g"))
    time("explode")(ex.count())
    val freq = ex.groupBy(col("g")).agg(count(lit(1)).as("f"))
    time("freq")(freq.count())
    val fg = ex.join(broadcast(freq), "g")
      .groupBy(col("doc_id")).agg(collect_list(struct(col("f"), col("g"))).as("fg"))
    time("fg collect_list")(fg.count())
    val prefixed = fg.select(col("doc_id"), expr(
      "transform(slice(array_sort(fg), 1, size(fg) - cast(ceil(0.5D * size(fg)) as int) + 1), x -> x.g)")
      .as("pref"))
    val exP = prefixed.select(col("doc_id"), explode(col("pref")).as("g"))
    time("prefix postings")(exP.count())
    val cand = exP.as("a")
      .join(exP.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(cand.count())
    val verified = cand
      .join(cached.as("x"), col("doc_a") === col("x.doc_id"))
      .join(cached.as("y"), col("doc_b") === col("y.doc_id"))
      .withColumn("i", size(array_intersect(col("x.sh"), col("y.sh"))).cast("double"))
      .withColumn("jac", col("i") / (size(col("x.sh")) + size(col("y.sh")) - col("i")))
      .filter(round(col("jac"), 6) >= 0.5)
    time("verified")(verified.count())
    time("full d4 (uncached)")(graft.ext.DedupQueries.ngramJaccardPairs(spark, dir).count())
    spark.stop()
  }
}
