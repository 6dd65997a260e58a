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

    // Steady-state vs cold d4/d3: first runs pay shingle(+minhash) cache
    // materialization, repeats show intrinsic query cost.
    time("d4 cold (builds cache)")(graft.ext.DedupQueries.ngramJaccardPairs(spark, dir).count())
    time("d4 warm")(graft.ext.DedupQueries.ngramJaccardPairs(spark, dir).count())
    time("d4 warm 2")(graft.ext.DedupQueries.ngramJaccardPairs(spark, dir).count())
    time("d3 cold (builds minhash)")(graft.ext.DedupQueries.lshPairs(spark, dir).count())
    time("d3 warm")(graft.ext.DedupQueries.lshPairs(spark, dir).count())
    time("d7 simhash pairs")(graft.ext.DedupQueries.simhashPairs(spark, dir).count())
    time("d7 simhash pairs 2")(graft.ext.DedupQueries.simhashPairs(spark, dir).count())
    time("d5 simhash")(graft.ext.DedupQueries.simhash(spark, dir).count())
    time("d6 levenshtein")(graft.ext.DedupQueries.levenshteinPairs(spark, dir).count())
    time("stedi")(graft.queries.ReferenceQueries.stediPipeline(spark, dir).count())
    time("stedi 2")(graft.queries.ReferenceQueries.stediPipeline(spark, dir).count())
    spark.stop()
  }
}
