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
  *  2. repetition    — [[TextQueries.repetition]] dup_ratio below
  *                     [[RepetitionMax]] (boilerplate-loop gate t2's
  *                     score is blind to)
  *  3. exact dedup   — keep the minimum doc_id per identical text
  *  4. near dedup    — keep only cluster roots from the LSH connected
  *                     components ([[DedupQueries.dedupClusters]])
  *  5. mixture       — per-source weighted keep
  *                     ([[PipelineQueries.mixtureKeepIds]])
  *  6. split         — deterministic train/val/test hash assignment
  *                     ([[PipelineQueries.trainValTestSplit]])
  *  7. decontaminate — drop TRAIN docs sharing trigrams with the test
  *                     split ([[PipelineQueries.decontaminate]]); val and
  *                     test rows pass through untouched
  *  8. PII scrub     — [[TextQueries.scrubbed]] BEFORE chunking (a chunk
  *                     boundary could split a match)
  *  9. chunk         — fixed token windows with stride overlap
  *                     ([[PipelineQueries]] parameters)
  * 10. pack          — running-token-budget shard assignment
  * 11. land          — parquet partitioned by (lang, split)
  *                     (partition-pruned reads for per-language training
  *                     mixes; eval splits never touch training scans)
  *
  * Scale posture: stages 1-2 and 4-6 are narrow filters/projections or
  * hash predicates; stage 3's loop state is only edge-connected docs;
  * stages 7-8 are one explode and one window; the write is the only
  * global ordering point. Survivor counts per stage come back as ONE
  * summary frame, not driver loops.
  */
object TrainingDataPipeline {

  val QualityThreshold = 0.1
  val RepetitionMax = 0.2

  /** Survivor doc_ids after quality + repetition gates, exact dedup,
    * near-dup root filter, mixture sampling and train-split
    * decontamination, with lang and split assignment carried for
    * partitioning. */
  def survivors(spark: SparkSession, dir: String): DataFrame = {
    val quality = TextQueries.quality(spark, dir)
      .filter(col("quality_score") >= QualityThreshold)
      .select(col("doc_id"))
    // gate on the OFFENDERS via anti-join: a doc too short to have
    // trigrams is absent from the repetition frame and must pass, not
    // be dropped by an inner join
    val highRep = TextQueries.repetition(spark, dir)
      .filter(col("dup_ratio") > RepetitionMax)
      .select(col("doc_id"))
    val exactKeep = DedupQueries.dedupExact(spark, dir)
      .select(col("keep_id").as("doc_id"))
    val roots = DedupQueries.dedupClusters(spark, dir)
      .filter(col("doc_id") === col("cluster_root"))
      .select(col("doc_id"))
    val mix = PipelineQueries.mixtureKeepIds(spark, dir)
    val splits = PipelineQueries.trainValTestSplit(spark, dir)
      .select(col("doc_id"), col("split"))
    // anti-join semantics via the audit frame: a train doc sharing any
    // test trigram is contaminated; val/test docs are never in the frame
    val contaminated = PipelineQueries.decontaminate(spark, dir)
      .filter(col("is_contaminated"))
      .select(col("doc_id"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .join(quality, "doc_id")
      .join(highRep, Seq("doc_id"), "left_anti")
      .join(exactKeep, "doc_id")
      .join(roots, "doc_id")
      .join(mix, "doc_id")
      .join(splits, "doc_id")
      .join(contaminated, Seq("doc_id"), "left_anti")
  }

  /** Packed chunk shards for the surviving documents: PII-scrubbed text,
    * chunked and packed. */
  def shards(spark: SparkSession, dir: String): DataFrame =
    shardsOf(spark, dir, survivors(spark, dir))

  private def shardsOf(spark: SparkSession, dir: String, keep: DataFrame): DataFrame = {
    val clean = TextQueries.scrubbed(
      Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")))
    val chunks = PipelineQueries.chunkOf(clean).join(keep, "doc_id")
    // pack the SURVIVORS, not the raw corpus: the shard budget must count
    // tokens that actually land — packing over all documents under-fills
    // every shard by whatever the gates dropped and leaves holes in the
    // shard numbering where an entire budget window was filtered out.
    val packed = PipelineQueries
      .tokenPackingOf(clean.join(keep.select(col("doc_id")), "doc_id"))
      .select(col("doc_id"), col("shard"))
    chunks.join(packed, "doc_id")
      .select(col("doc_id"), col("lang"), col("split"), col("shard"),
        col("chunk_idx"), col("chunk_len"), col("chunk_text"))
  }

  /** Run the pipeline, land shards at `outDir` partitioned by
    * (lang, split), and return the per-stage survivor summary. */
  def run(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    // one survivors computation for the write AND the summary counts —
    // the near-dup label-propagation loop inside it executes eagerly, so
    // a second call would re-run the whole BSP iteration for nothing.
    val kept = survivors(spark, dir).localCheckpoint()
    shardsOf(spark, dir, kept)
      .write.mode("overwrite").partitionBy("lang", "split").parquet(outDir)
    val total = Tables.load(spark, dir, "documents").count()
    val landed = spark.read.parquet(outDir)
    import spark.implicits._
    val splitCounts = kept.groupBy(col("split")).count()
      .collect().map(r => (s"docs_${r.getString(0)}", r.getLong(1)))
    // One scan of the landed output serves both chunk and shard counts
    // (count + count distinct in a single aggregate pass).
    val landedStats = landed
      .agg(count(lit(1)).as("chunks"), countDistinct(col("shard")).as("shards"))
      .first()
    val summary = (Seq(("documents_in", total),
      ("documents_kept", kept.count()),
      ("chunks_out", landedStats.getLong(0)),
      ("shards_out", landedStats.getLong(1)))
      ++ splitCounts)
      .toDF("stage", "n")
    graft.CheckpointUtil.release(kept)
    summary
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft-training-shards")
    val spark = PipelineSession.build("graft-training-data")
    run(spark, dir, outDir).show(false)
    spark.stop()
  }
}
