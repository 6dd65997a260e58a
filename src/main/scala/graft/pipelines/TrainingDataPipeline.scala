package graft.pipelines

import graft.Tables
import graft.ext.{DedupQueries, PipelineQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline: the LLM-corpus flow composed from
  * the engine's own operators, raw documents in → packed, deduplicated,
  * language-partitioned chunk shards out.
  *
  * Stages (each one a plain DataFrame transformation — the whole pipeline
  * is ONE lazy plan per output, no driver-side data movement):
  *
  *  1. quality gate  — [[TextQueries.quality]] score >= threshold
  *  2. exact dedup   — keep the minimum doc_id per identical text
  *  3. near dedup    — keep only cluster roots from the LSH connected
  *                     components ([[DedupQueries.dedupClusters]])
  *  4. chunk         — fixed token windows with stride overlap
  *                     ([[PipelineQueries]] parameters)
  *  5. pack          — running-token-budget shard assignment
  *  6. land          — parquet partitioned by lang (partition-pruned
  *                     reads for per-language training mixes)
  *
  * Scale posture: stages 1-2 are narrow filters/aggregates; stage 3's
  * loop state is only edge-connected docs; stages 4-5 are one explode and
  * one window; the write is the only global ordering point. Survivor
  * counts per stage come back as ONE summary frame, not driver loops.
  */
object TrainingDataPipeline {

  val QualityThreshold = 0.1

  /** Survivor doc_ids after quality gate + exact dedup + near-dup root
    * filter, with lang carried for partitioning. */
  def survivors(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextQueries.quality(spark, dir)
      .filter(col("quality_score") >= QualityThreshold)
      .select(col("doc_id"))
    val exactKeep = DedupQueries.dedupExact(spark, dir)
      .select(col("keep_id").as("doc_id"))
    val roots = DedupQueries.dedupClusters(spark, dir)
      .filter(col("doc_id") === col("cluster_root"))
      .select(col("doc_id"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .join(quality, "doc_id")
      .join(exactKeep, "doc_id")
      .join(roots, "doc_id")
  }

  /** Packed chunk shards for the surviving documents. */
  def shards(spark: SparkSession, dir: String): DataFrame = {
    val keep = survivors(spark, dir)
    val chunks = PipelineQueries.chunk(spark, dir).join(keep, "doc_id")
    val packed = PipelineQueries.tokenPacking(spark, dir)
      .select(col("doc_id"), col("shard"))
    chunks.join(packed, "doc_id")
      .select(col("doc_id"), col("lang"), col("shard"),
        col("chunk_idx"), col("chunk_len"), col("chunk_text"))
  }

  /** Run the pipeline, land shards at `outDir` partitioned by lang, and
    * return the per-stage survivor summary. */
  def run(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    shards(spark, dir)
      .write.mode("overwrite").partitionBy("lang").parquet(outDir)
    val total = Tables.load(spark, dir, "documents").count()
    val kept = survivors(spark, dir).count()
    val landed = spark.read.parquet(outDir)
    import spark.implicits._
    Seq(("documents_in", total),
      ("documents_kept", kept),
      ("chunks_out", landed.count()),
      ("shards_out", landed.select(col("shard")).distinct().count()))
      .toDF("stage", "n")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft-training-shards")
    val spark = PipelineSession.build("graft-training-data")
    run(spark, dir, outDir).show(false)
    spark.stop()
  }
}
