package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage timing for hot queries (not part of the driver contract).
  * Each timed pass also prints the pass's job/stage/task counts and
  * shuffle/scan byte totals from a stage-completion listener — the
  * attribution anchor for regressions (is a query slow because of MORE
  * SHUFFLE, MORE SCAN, or MORE ROUNDS?). */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_SHUFFLE: shuffle-partition override for blow-up-scale
    // measurements. The cpus default is right at fixture scale, but a
    // run whose intermediate mass is quadratic in a cluster size (zipf
    // head × probe depth 2) needs per-task aggregate state cut down —
    // on a real cluster partition count scales with data, and AQE
    // coalesces the small ones back, so the override measures the plan
    // a deployment would actually run.
    val shuf = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.local.dir", LocalDirs.default)
      // compiled-class cache sized to the suite (see Bench.scala)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Accumulates per-pass execution shape; reset before each timed pass.
    object stats extends org.apache.spark.scheduler.SparkListener {
      var jobs, stages, tasks = 0L
      var shuffleWrite, shuffleRead, input, cpuNanos = 0L
      def reset(): Unit = { jobs = 0; stages = 0; tasks = 0
        shuffleWrite = 0; shuffleRead = 0; input = 0; cpuNanos = 0 }
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        val m = s.stageInfo.taskMetrics
        shuffleWrite += m.shuffleWriteMetrics.bytesWritten
        shuffleRead += m.shuffleReadMetrics.totalBytesRead
        input += m.inputMetrics.bytesRead
        cpuNanos += m.executorCpuTime
      }
    }
    spark.sparkContext.addSparkListener(stats)

    def time(name: String)(f: => Long): Unit = {
      stats.reset()
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      // Listener events drain asynchronously (the bus API is
      // private[spark]); a short settle keeps this debug readout honest.
      Thread.sleep(300)
      println(f"[dbg] $name%-28s $wall%8.2f s  rows=$n")
      println(f"[dbg]   jobs=${stats.jobs} stages=${stats.stages} " +
        f"tasks=${stats.tasks} scan=${stats.input / 1e6}%.1fMB " +
        f"shufW=${stats.shuffleWrite / 1e6}%.1fMB " +
        f"shufR=${stats.shuffleRead / 1e6}%.1fMB " +
        f"cpu=${stats.cpuNanos / 1e9}%.1fs")
    }

    // Non-registry diagnostic ops (no oracle BY DESIGN — the
    // convergence-dependent-rounds convention) are timeable here too;
    // their full row set is printed so the readout is the measurement.
    val extras: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      Map(
        "x_nn_descent_converged" -> ((s, d) =>
          graft.ext.SimilarityQueries.nnDescentConverged(s, d)),
        "x_descent_capped" -> ((s, d) =>
          graft.ext.SimilarityQueries.descentOverCappedBase(s, d)),
        "x_descent_capped_converged" -> ((s, d) =>
          graft.ext.SimilarityQueries.nnDescentConverged(s, d,
            baseCap = Some(graft.ext.SimilarityQueries.BucketCapSweep.head))),
        // per-label component census over d30/d31 on a LABELED fixture
        // (ClusteredFixture corpora) — the connectivity readout behind
        // the zipf operating rule: the d31 column must be 1 for every
        // label (probe shells restore what the cap breaks), the d30
        // column shows the shattering. Top-20 labels by size.
        "x_label_components" -> ((s, d) => {
          import org.apache.spark.sql.functions._
          val labels = s.read.parquet(s"$d/embeddings.parquet")
            .select(col("vec_id"), col("label"))
          def census(df: org.apache.spark.sql.DataFrame, name: String) =
            df.select(col("vec_id"), col("canon_id")).join(labels, "vec_id")
              .groupBy(col("label"))
              .agg(count(lit(1)).as("n_docs"),
                countDistinct(col("canon_id")).as(name))
          census(graft.ext.DedupQueries.annDedup(s, d), "d30_components")
            .join(census(graft.ext.DedupQueries.annDedupMultiprobe(s, d),
              "d31_components").drop("n_docs"), "label")
            .orderBy(desc("n_docs")).limit(20)
        }))
    val Q = SparkEntry.queries ++ extras.map { case (k, f) =>
      k -> ((s: SparkSession, d: String) => {
        // checkpoint before show: otherwise show + the harness's count
        // execute the full plan twice inside the timed closure and the
        // wall/CPU attribution double-counts the measured work
        val df = f(s, d).localCheckpoint()
        df.show(50, false)
        df
      })
    }
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
