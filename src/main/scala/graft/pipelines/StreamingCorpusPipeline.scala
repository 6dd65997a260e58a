package graft.pipelines

import graft.ext.TextQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming flavor of [[TrainingDataPipeline]]'s front half: continuous
  * corpus ingestion with the same per-document gates IN THE SAME ORDER
  * as the batch pipeline — gate and fingerprint on the RAW text, scrub
  * last — so the two tiers admit the same corpus for the same input
  * (gating on scrubbed text would score `<EMAIL>` tokens instead of the
  * original ones and flip borderline documents between tiers).
  *
  *  1. quality gate   — [[TextQueries.qualityOf]] on raw text,
  *                      score >= threshold (batch stage 1)
  *  2. exact dedup    — `dropDuplicatesWithinWatermark` on the RAW text
  *                      fingerprint (the batch d1 key): at-least-once
  *                      sources (Kafka replays, crawler re-fetches)
  *                      deliver the same document repeatedly; state for
  *                      a fingerprint is held only until the watermark
  *                      passes it, so dedup state is BOUNDED — the
  *                      streaming analog of d1, and the reason this
  *                      scales where a global distinct never evicts.
  *  3. PII scrub      — [[TextQueries.scrubbed]] (per-row projection,
  *                      batch stage 8) before landing.
  *
  * Packing and cluster consolidation stay batch-side in this design: they
  * need corpus-global state (document frequencies, cluster roots), which a
  * continuous query cannot bound. Near-dedup DOES have a bounded streaming
  * form — [[graft.streaming.StreamOps.streamingNearDupPairs]] keys LSH
  * bucket state and verifies arrivals against capped/TTL-able residents
  * (stream = batch-d3 equality proven by `StreamBatchEqualitySpec`) — and
  * composes after stage 2 when in-flight near-dup flagging is wanted. The
  * landed micro-batches feed the batch [[TrainingDataPipeline]] as its raw
  * input — the standard two-tier (streaming ingest + batch consolidation)
  * corpus architecture.
  */
object StreamingCorpusPipeline {

  val QualityThreshold = TrainingDataPipeline.QualityThreshold

  /** `docs` must carry (doc_id, text, ts); emits gated,
    * fingerprint-deduplicated, scrubbed documents in append mode. */
  def ingest(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    TextQueries.scrubbed(
      TextQueries.qualityOf(
        docs.withColumn("toks", split(lower(col("text")), " ")))
        .filter(col("quality_score") >= QualityThreshold)
        .withColumn("fp", md5(col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark("fp"))
      .select(col("doc_id"), col("ts"), col("text"),
        col("quality_score"), col("fp"))
}
