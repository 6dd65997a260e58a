package graft.pipelines

import graft.ext.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming flavor of [[TrainingDataPipeline]]'s front half: continuous
  * corpus ingestion with the same per-document gates, expressed as one
  * `DataFrame => DataFrame` over a streaming source.
  *
  *  1. PII scrub      — [[TextQueries.scrubbed]] (per-row projection)
  *  2. quality gate   — [[TextQueries.qualityOf]] score >= threshold
  *  3. exact dedup    — `dropDuplicatesWithinWatermark` on the text
  *                      fingerprint: at-least-once sources (Kafka replays,
  *                      crawler re-fetches) deliver the same document
  *                      repeatedly; state for a fingerprint is held only
  *                      until the watermark passes it, so dedup state is
  *                      BOUNDED — the streaming analog of d1, and the
  *                      reason this scales where a global distinct never
  *                      evicts.
  *
  * Near-dedup (LSH) and packing stay batch-side in this design: they need
  * corpus-global state (document frequencies, cluster roots), which a
  * continuous query cannot bound. The landed micro-batches feed the batch
  * [[TrainingDataPipeline]] as its raw input — the standard two-tier
  * (streaming ingest + batch consolidation) corpus architecture.
  */
object StreamingCorpusPipeline {

  val QualityThreshold = TrainingDataPipeline.QualityThreshold

  /** `docs` must carry (doc_id, text, ts); emits scrubbed, gated,
    * fingerprint-deduplicated documents in append mode. */
  def ingest(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    TextQueries.qualityOf(
      TextQueries.scrubbed(docs)
        .withColumn("toks", split(lower(col("text")), " ")))
      .filter(col("quality_score") >= QualityThreshold)
      .withColumn("fp", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("ts"), col("text"),
        col("quality_score"), col("fp"))
}
