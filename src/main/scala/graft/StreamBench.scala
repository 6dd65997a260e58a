package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc throughput readout for the streaming near-dup operator (not
  * part of the driver contract): pushes the documents fixture through
  * `StreamOps.streamingNearDupPairs` via MemoryStream in fixed-size
  * micro-batches and prints docs/sec plus the verified-pair count. The
  * interesting number is the STEADY-STATE batch rate — bucket state
  * grows with enrolled docs, so a flat per-batch wall across batches is
  * the bounded-state contract showing up as a measurement.
  *
  * Usage: runMain graft.StreamBench [batchSize]  (env SPARK_GRAFT_SF_DIR)
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batchSize = args.headOption.map(_.toInt).getOrElse(500)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = graft.streaming.StreamOps.streamingNearDupPairs(spark,
        input.toDF().toDF("doc_id", "text")).toDF()
      .writeStream.format("memory").queryName("nd_bench")
      .outputMode("update").start()
    try {
      val t0 = System.nanoTime()
      docs.grouped(batchSize).zipWithIndex.foreach { case (chunk, i) =>
        val b0 = System.nanoTime()
        input.addData(chunk)
        q.processAllAvailable()
        println(f"[stream] batch $i%2d: ${chunk.size} docs in " +
          f"${(System.nanoTime() - b0) / 1e9}%.2f s")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val pairs = spark.table("nd_bench")
        .dropDuplicates("doc_a", "doc_b").count()
      println(f"[stream] TOTAL ${docs.size} docs in $wall%.2f s = " +
        f"${docs.size / wall}%.0f docs/s, $pairs verified near-dup pairs")
    } finally q.stop()
    spark.stop()
  }
}
