package graft

import org.apache.spark.sql.SparkSession

/** DISK-BOUNDED blow-up-scale form of the p27 survivor funnel (not part
  * of the driver contract, like [[ScaleBlowup]]): the composed
  * [[graft.pipelines.TrainingDataPipeline.gateFlags]] plan runs every
  * gate's index build inside ONE action chain, so their shuffle files
  * and checkpoint blocks coexist on local disk — at 300× (1.5M docs)
  * the sum filled this box's ~76 GB and the near-dup sort spill died
  * with SPILL_OUT_OF_MEMORY (r12 BASELINE note). This main runs the
  * SAME gate frames (shared code — [[graft.pipelines
  * .TrainingDataPipeline.gateFrames]], so semantics cannot drift) as
  * SEPARATE STAGES: land each frame to parquet, clear the stage's
  * module index caches, nudge the ContextCleaner (shuffle files free on
  * driver GC), then assemble the landed flags and print the funnel.
  * Peak disk is bounded by the LARGEST single gate build instead of
  * their sum — the staging pattern a deployed pipeline runs anyway
  * (land intermediate artifacts, release compute), and exactly what a
  * 1000-executor cluster's per-node local disks amortize for free.
  *
  * Usage: runMain graft.FunnelStaged [scratchDir]
  * (env SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
  */
object FunnelStaged {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scratch = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("funnel_staged").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // compiled-class cache sized to the suite (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def releaseAll(): Unit = {
      graft.ext.DedupQueries.clearCaches()
      graft.ext.TextQueries.clearCaches()
      graft.ext.SimilarityQueries.clearCaches()
      graft.ext.PipelineQueries.clearCaches()
      graft.pipelines.TrainingDataPipeline.clearCaches()
      graft.ext.MultimodalQueries.clearCaches()
      graft.ops.RankOps.clearCaches()
      // shuffle files are freed by the ContextCleaner on driver GC of
      // the dependency graph; nudge it so the NEXT stage starts with
      // the disk this stage's build was using
      System.gc()
      Thread.sleep(2000)
    }

    val t0 = System.nanoTime()
    import graft.pipelines.TrainingDataPipeline
    val names = TrainingDataPipeline.gateFrames(spark, dir).map { case (name, mk) =>
      val s0 = System.nanoTime()
      mk().write.mode("overwrite").parquet(s"$scratch/$name")
      releaseAll()
      println(f"[funnel-staged] gate '$name' landed in " +
        f"${(System.nanoTime() - s0) / 1e9}%.1f s")
      name
    }
    val landed = names.map(n => n -> spark.read.parquet(s"$scratch/$n")).toMap
    val flags = TrainingDataPipeline.assembleFlags(spark, dir, landed)
    val rows = TrainingDataPipeline.funnelOf(flags).collect()
    println(f"[funnel-staged] TOTAL ${(System.nanoTime() - t0) / 1e9}%.1f s")
    rows.foreach(r => println(s"[funnel-staged] ${r.getString(0)} ${r.getLong(1)}"))
    spark.stop()
  }
}
