package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler harness (not part of the driver contract): run one
  * registered query in a loop so an external sampler (jstack) can catch
  * the hot frames. Deleted/ignored by the bench and oracle. */
object ProfLoop {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("AQE", "true"))
      .config("spark.local.dir", sys.env.getOrElse("LOCALDIR", "/tmp"))
      // compiled-class cache sized to the suite (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("q113_equidepth_stats")
    val n = if (args.length > 1) args(1).toInt else 30
    val planOnly = sys.env.get("PLAN_ONLY").contains("true")
    val fn: (SparkSession, String) => org.apache.spark.sql.DataFrame =
      if (name == "SYNTH")
        (s, _) => s.range(1000000).groupBy(org.apache.spark.sql.functions.expr("id % 10"))
          .count()
      else SparkEntry.queries(name)
    fn(spark, dir).count() // warm
    println(s"[prof] warmed, looping $name x$n planOnly=$planOnly")
    val t0 = System.nanoTime()
    if (planOnly)
      (1 to n).foreach(_ => fn(spark, dir).queryExecution.executedPlan)
    else
      (1 to n).foreach(_ => fn(spark, dir).count())
    println(f"[prof] done: ${(System.nanoTime() - t0) / 1e9 / n}%.3f s/iter")
    spark.stop()
  }
}
