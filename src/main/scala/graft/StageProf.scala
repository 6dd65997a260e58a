package graft

import org.apache.spark.sql.SparkSession

/** Scratch per-stage profiler (not part of the driver contract): runs one
  * registered query twice and prints each stage of the warm pass with its
  * task count, wall, cumulative task time and CPU time — the attribution
  * BenchDebug's per-pass totals can't give (WHICH stage is serial). */
object StageProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", LocalDirs.default)
      // compiled-class cache sized to the suite (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var record = false
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (record) {
          val i = s.stageInfo
          val m = i.taskMetrics
          val wall = (for {a <- i.completionTime; b <- i.submissionTime}
            yield (a - b) / 1e3).getOrElse(-1.0)
          lines.add(f"[stage] id=${i.stageId}%-4d tasks=${i.numTasks}%-3d " +
            f"wall=$wall%6.2f cpu=${m.executorCpuTime / 1e9}%6.2f " +
            f"run=${m.executorRunTime / 1e3}%6.2f " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB " +
            i.rddInfos.sortBy(_.id).map(r => s"${r.id}:${r.name}")
              .mkString(" ").take(200))
        }
    })
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).count() // pass 1: cache build
      lines.clear(); record = true
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      record = false
      Thread.sleep(400)
      println(f"===== $name warm $wall%.2f s rows=$n =====")
      lines.forEach(println)
      val live = spark.sparkContext.getPersistentRDDs
      spark.sparkContext.getRDDStorageInfo.filter(_.isCached).foreach { i =>
        val site = live.get(i.id)
          .map(_.toDebugString.linesIterator.next().take(120)).getOrElse("?")
        println(f"[storage] id=${i.id}%-5d mem=${i.memSize / 1e6}%8.2fMB " +
          f"disk=${i.diskSize / 1e6}%8.2fMB parts=${i.numCachedPartitions}%-3d " +
          site)
      }
    }
    spark.stop()
  }
}
