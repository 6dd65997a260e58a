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
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[dbg] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val Q = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else {
      time("d3 cold (builds cache)")(Q("d3_lsh_pairs")(spark, dir).count())
      Seq("d2_minhash_signature", "d3_lsh_pairs", "d4_ngram_jaccard",
        "d8_dedup_clusters", "d7_simhash_pairs", "t5_tfidf", "stedi_pipeline")
    }
    for (name <- names; pass <- 1 to 2)
      time(s"$name $pass")(Q(name)(spark, dir).count())
    spark.stop()
  }
}
