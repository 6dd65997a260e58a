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
  *  4. near dedup    — BOTH near-dup signals, each keeping only its
  *                     cluster roots: the shingle-LSH connected
  *                     components ([[DedupQueries.dedupClusters]]) AND
  *                     the multi-probe ANN embedding components
  *                     ([[DedupQueries.annDedupMultiprobe]], d31 — the
  *                     admission-default probe dial; d26's ARI readout
  *                     shows the two signals prune DIFFERENT pairs, so
  *                     both run; a doc with no embedding row passes the
  *                     embedding gate vacuously)
  *  5. mixture       — per-source weighted keep
  *                     ([[PipelineQueries.mixtureKeepIds]])
  *  6. split         — deterministic train/val/test hash assignment
  *                     ([[PipelineQueries.trainValTestSplit]])
  *  7. decontaminate — drop TRAIN docs sharing trigrams with the test
  *                     split ([[PipelineQueries.decontaminate]]); val and
  *                     test rows pass through untouched
  *  8. cut apply     — remove the non-kept copies of every duplicated
  *                     span per the PROVENANCE-preferred cut plan
  *                     ([[DedupQueries.provenanceCut]], d33) through the
  *                     d29 membership kernel
  *                     ([[DedupQueries.cutAppliedOf]]) — document-grain
  *                     dedup (stages 3-4) drops whole near-copies;
  *                     this drops the COPIED SPANS inside otherwise
  *                     distinct survivors (Lee et al. ExactSubstr),
  *                     BEFORE the PII scrub so the scrubbed text is
  *                     final
  *  9. PII scrub     — [[TextQueries.scrubbed]] BEFORE chunking (a chunk
  *                     boundary could split a match)
  * 10. chunk         — fixed token windows with stride overlap
  *                     ([[PipelineQueries]] parameters)
  * 11. pack          — TOKENIZER-budget shard assignment
  *                     ([[PipelineQueries.bpePackingOf]], p26): the
  *                     shard budget counts the trained tokenizer's
  *                     subword units over the cut+scrubbed text that
  *                     actually lands — whitespace packing under/over
  *                     fills every sequence by the per-doc expansion
  *                     factor t32 measures
  * 12. land          — parquet partitioned by (lang, split)
  *                     (partition-pruned reads for per-language training
  *                     mixes; eval splits never touch training scans)
  *
  * Scale posture: stages 1-2 and 5-7 are narrow filters/projections or
  * hash predicates; stage 4's loop state is only edge-connected docs
  * (both BSP component loops ship (lo, hi) rows); stage 8 rides the
  * span-grain checkpointed cut-range index (never a corpus re-scan);
  * stages 9-10 are one regex projection and one explode; stage 11 is
  * the RankOps distributed prefix sum; the write is the only global
  * ordering point. Survivor counts per stage come back as ONE summary
  * frame, not driver loops — registered as the p27 funnel oracle entry.
  */
object TrainingDataPipeline {

  val QualityThreshold = 0.1
  val RepetitionMax = 0.2

  /** `SPARK_GRAFT_TEXT_CAP=1`: route the `f_lsh` gate through the
    * CAPPED text chain ([[DedupQueries.cappedTextDedup]], d35) instead
    * of d8's uncapped components — the scale dial for corpora whose
    * duplicate-cluster sizes blow up the uncapped Σ n_k² band
    * self-join (the zipf text corpora: uncapped OOMs the default heap
    * at 100k docs and implies ~5.5e9 verifications at 500k; capped
    * runs 22 s / 42 s at hard-bounded n·B·cap mass). Default OFF:
    * d8's exact semantics stay the faithful default. Like the
    * probe-depth dial, the p27/p28/p29 funnel ORACLES track this env
    * (PipelineQueries swaps the f_lsh CTE chain), so the full registry
    * verifies green at either setting; a deployment reads d36's
    * agreement row first (zipf-100k: 99.77% same-root, +1.2%
    * clusters — splits only, never merges). */
  private[graft] val TextCapGate: Boolean =
    sys.env.get("SPARK_GRAFT_TEXT_CAP").exists(v => v == "1" || v == "true")

  /** Per-document gate flags for every doc-grain stage, ONE row per
    * document — the shared frame under [[survivors]] (conjunction
    * filter) and [[survivorFunnel]] (cumulative conditional counts),
    * so the two can never disagree on a gate's semantics.
    *
    * Flag conventions: a doc absent from the repetition frame (< 3
    * tokens — no trigrams) PASSES `f_rep`; a doc with no embedding row
    * PASSES `f_ann` (no embedding evidence to dedup on); `f_clean` is
    * false only for TRAIN docs flagged contaminated (val/test rows are
    * never in the decontamination frame). */
  /** The gate frames, NAMED and in build-cost order — factored out so
    * [[gateFlags]] (one composed plan) and [[graft.FunnelStaged]] (land
    * each frame to parquet, release the stage's index caches, then
    * assemble — the disk-bounded blow-up-scale form) share the exact
    * flag semantics and can never drift. */
  private[graft] def gateFrames(spark: SparkSession, dir: String)
      : Seq[(String, () => DataFrame)] = Seq(
    "lsh" -> (() => (if (TextCapGate)
        DedupQueries.cappedTextDedup(spark, dir)
          .filter(col("is_kept")).select(col("doc_id"))
      else DedupQueries.dedupClusters(spark, dir)
        .filter(col("doc_id") === col("cluster_root"))
        .select(col("doc_id")))
      .select(col("doc_id"), lit(true).as("fl"))),
    "ann" -> (() => DedupQueries.annDedupMultiprobe(spark, dir)
      .select(col("vec_id").as("doc_id"), col("is_kept").as("fa"))),
    "q" -> (() => TextQueries.quality(spark, dir)
      .select(col("doc_id"),
        (col("quality_score") >= QualityThreshold).as("fq"))),
    "rep" -> (() => TextQueries.repetition(spark, dir)
      .select(col("doc_id"), (col("dup_ratio") <= RepetitionMax).as("fr"))),
    "exact" -> (() => DedupQueries.dedupExact(spark, dir)
      .select(col("keep_id").as("doc_id"), lit(true).as("fe"))),
    "mix" -> (() => PipelineQueries.mixtureKeepIds(spark, dir)
      .select(col("doc_id"), lit(true).as("fm"))),
    "splits" -> (() => PipelineQueries.trainValTestSplit(spark, dir)
      .select(col("doc_id"), col("split"))),
    "contam" -> (() => PipelineQueries.decontaminate(spark, dir)
      .filter(col("is_contaminated"))
      .select(col("doc_id"), lit(true).as("fc"))))

  /** Join the named gate frames into the one-row-per-document flag
    * frame (the coalesce defaults encode the absent-row conventions in
    * the Scaladoc above). */
  private[graft] def assembleFlags(spark: SparkSession, dir: String,
      fr: Map[String, DataFrame]): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .join(fr("q"), Seq("doc_id"), "left")
      .join(fr("rep"), Seq("doc_id"), "left")
      .join(fr("exact"), Seq("doc_id"), "left")
      .join(fr("lsh"), Seq("doc_id"), "left")
      .join(fr("ann"), Seq("doc_id"), "left")
      .join(fr("mix"), Seq("doc_id"), "left")
      .join(fr("splits"), Seq("doc_id"), "left")
      .join(fr("contam"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("split"),
        coalesce(col("fq"), lit(false)).as("f_quality"),
        coalesce(col("fr"), lit(true)).as("f_rep"),
        coalesce(col("fe"), lit(false)).as("f_exact"),
        coalesce(col("fl"), lit(false)).as("f_lsh"),
        coalesce(col("fa"), lit(true)).as("f_ann"),
        coalesce(col("fm"), lit(false)).as("f_mix"),
        (!coalesce(col("fc"), lit(false))).as("f_clean"))

  // Module caches (r15 optimization): the flag frame and the cut+scrubbed
  // survivor text are deterministic per (session, dir) and read by several
  // registered queries (p27/p28 aggregate the flags; p29's manifest plan
  // read the flags subtree — an 8-way gate join — TWICE through its two
  // survivor joins, and the cut+scrub text twice through chunking and
  // packing). Checkpointing them once per (session, dir) follows the
  // shared DirCaches discipline of every ext module.
  private val caches = new graft.ext.DirCaches

  /** Bench/Verify teardown hook (see [[graft.ext.DedupQueries.clearCaches]]). */
  def clearCaches(): Unit = caches.clear()

  private val flagsCache = caches.newCache()
  private val cleanSurvivorsCache = caches.newCache()

  private[graft] def gateFlags(spark: SparkSession, dir: String): DataFrame = {
    caches.evictOtherDirs(spark, dir)
    flagsCache.getOrElseUpdate((spark, dir),
      assembleFlags(spark, dir,
        gateFrames(spark, dir).map { case (n, th) => n -> th() }.toMap)
        .localCheckpoint())
  }

  /** Survivor doc_ids after every doc-grain gate, with lang and split
    * carried for partitioning. */
  def survivors(spark: SparkSession, dir: String): DataFrame =
    gateFlags(spark, dir)
      .filter(col("f_quality") && col("f_rep") && col("f_exact") &&
        col("f_lsh") && col("f_ann") && col("f_mix") && col("f_clean"))
      .select(col("doc_id"), col("lang"), col("split"))

  /** p27 — the per-stage survivor funnel over the composed chain:
    * cumulative survivor count after each doc-grain gate, in stage
    * order, from ONE pass over [[gateFlags]] (eight conditional sums in
    * a single aggregate — never eight jobs). The oracle recomputes every
    * gate independently in DuckDB (quality/repetition formulas, exact
    * min-per-text, the full minhash-LSH component chain, the multi-probe
    * ANN component chain, mixture/split hashes, the decontamination
    * probe) and must land on identical counts — the whole pipeline's
    * doc-grain semantics pinned by one hash compare. */
  def survivorFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(gateFlags(spark, dir))

  /** The one-aggregate funnel readout over any flag frame — shared by
    * [[survivorFunnel]] and [[graft.FunnelStaged]]'s landed-flags run. */
  private[graft] def funnelOf(f: DataFrame): DataFrame = {
    def cum(flags: Seq[String]): org.apache.spark.sql.Column =
      sum(when(flags.map(col).reduce(_ && _), 1L).otherwise(0L))
    val agg = f.agg(
      count(lit(1)).as("n0"),
      cum(Seq("f_quality")).as("n1"),
      cum(Seq("f_quality", "f_rep")).as("n2"),
      cum(Seq("f_quality", "f_rep", "f_exact")).as("n3"),
      cum(Seq("f_quality", "f_rep", "f_exact", "f_lsh")).as("n4"),
      cum(Seq("f_quality", "f_rep", "f_exact", "f_lsh", "f_ann")).as("n5"),
      cum(Seq("f_quality", "f_rep", "f_exact", "f_lsh", "f_ann", "f_mix"))
        .as("n6"),
      cum(Seq("f_quality", "f_rep", "f_exact", "f_lsh", "f_ann", "f_mix",
        "f_clean")).as("n7"))
    agg.selectExpr(
      """stack(8,
        |  's0_documents_in', n0,
        |  's1_quality', n1,
        |  's2_repetition', n2,
        |  's3_exact_dedup', n3,
        |  's4_lsh_roots', n4,
        |  's5_ann_mp_roots', n5,
        |  's6_mixture', n6,
        |  's7_decontaminated', n7) AS (stage, n)""".stripMargin)
      .orderBy("stage")
  }

  /** p28 — the funnel in TOKEN MASS: the same cumulative gates weighted
    * by each document's whitespace-token count — the units a training
    * budget is written in. Doc and token funnels diverge exactly where
    * a gate correlates with length (the quality gate's length term
    * drops short docs, so the token funnel falls SLOWER through s1;
    * near-dup clusters skew long on boilerplate-heavy corpora, so it
    * falls FASTER through s4/s5) — the divergence is the readout. Same
    * one-aggregate-pass shape as [[survivorFunnel]]; subword pricing of
    * the final surviving text stays t32's job (the expansion factor is
    * corpus-wide, not per-gate). */
  def tokenFunnel(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("nt"))
    val f = gateFlags(spark, dir).join(toks, "doc_id")
    def cum(flags: Seq[String]): org.apache.spark.sql.Column =
      sum(when(flags.map(col).reduce(_ && _), col("nt")).otherwise(0L))
    val agg = f.agg(
      sum(col("nt")).as("n0"),
      cum(Seq("f_quality")).as("n1"),
      cum(Seq("f_quality", "f_rep")).as("n2"),
      cum(Seq("f_quality", "f_rep", "f_exact")).as("n3"),
      cum(Seq("f_quality", "f_rep", "f_exact", "f_lsh")).as("n4"),
      cum(Seq("f_quality", "f_rep", "f_exact", "f_lsh", "f_ann")).as("n5"),
      cum(Seq("f_quality", "f_rep", "f_exact", "f_lsh", "f_ann", "f_mix"))
        .as("n6"),
      cum(Seq("f_quality", "f_rep", "f_exact", "f_lsh", "f_ann", "f_mix",
        "f_clean")).as("n7"))
    agg.selectExpr(
      """stack(8,
        |  's0_documents_in', n0,
        |  's1_quality', n1,
        |  's2_repetition', n2,
        |  's3_exact_dedup', n3,
        |  's4_lsh_roots', n4,
        |  's5_ann_mp_roots', n5,
        |  's6_mixture', n6,
        |  's7_decontaminated', n7) AS (stage, n_tokens)""".stripMargin)
      .orderBy("stage")
  }

  /** Packed chunk shards for the surviving documents: span-cut
    * (provenance-preferred), PII-scrubbed text, chunked and packed by
    * the trained tokenizer's budget. */
  def shards(spark: SparkSession, dir: String): DataFrame =
    shardsOf(spark, dir, survivors(spark, dir))

  /** Stages 8–9 (span cut + PII scrub) over the SURVIVORS' text only,
    * checkpointed once per (session, dir): chunking and packing both
    * read it, and inside p29's one lazy plan the regex scrub + span-cut
    * subtree would otherwise evaluate twice; restricting to survivors
    * BEFORE the cut also keeps the per-token membership kernel and the
    * regex pass off documents the gates dropped (identical output —
    * both kernels are per-document). */
  private def cleanSurvivors(spark: SparkSession, dir: String): DataFrame = {
    caches.evictOtherDirs(spark, dir)
    cleanSurvivorsCache.getOrElseUpdate((spark, dir), {
      val cutPlan = DedupQueries.provenanceCut(spark, dir)
        .select(col("doc_id"), col("cut_start"), col("cut_end"))
      val cut = DedupQueries.cutAppliedOf(
        Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
          .join(survivors(spark, dir).select(col("doc_id")), "doc_id"),
        cutPlan)
        .select(col("doc_id"), col("clean_text").as("text"))
      // DISK_ONLY, not the default MEMORY_AND_DISK: unlike every other
      // cache in this module (flags, counts, pair keys), this one is
      // doc-grain TEXT — the survivor corpus. A real pipeline lands this
      // artifact on disk; pinning it in block-manager memory would
      // compete with execution memory at exactly the corpus scales where
      // the cut+scrub is worth deduplicating (guide §5). Chunking and
      // packing each read it once sequentially, so the disk round-trip
      // replaces a full regex re-scrub, not a memory hit. Measured at
      // sf0.1: 0.16 MB serialized on disk (BASELINE.md r16 row).
      TextQueries.scrubbed(cut).localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    })
  }

  private def shardsOf(spark: SparkSession, dir: String, keep: DataFrame): DataFrame = {
    // stages 8-9 ride the survivor-text checkpoint (the raw text never
    // reaches the scrub; dropped docs never reach the cut)
    val clean = cleanSurvivors(spark, dir)
    val chunks = PipelineQueries.chunkOf(clean).join(keep, "doc_id")
    // pack the SURVIVORS' final text, not the raw corpus: the shard
    // budget must count tokenizer units that actually land — packing
    // over all documents under-fills every shard by whatever the gates
    // dropped, and packing pre-cut text charges shards for spans the
    // cut stage removed. `clean` is survivor-only by construction.
    val packed = PipelineQueries
      .bpePackingOf(spark, dir, clean)
      .select(col("doc_id"), col("shard"))
    chunks.join(packed, "doc_id")
      .select(col("doc_id"), col("lang"), col("split"), col("shard"),
        col("chunk_idx"), col("chunk_len"), col("chunk_text"))
  }

  /** p29 — the composed pipeline's SHARD MANIFEST: per (lang, split,
    * shard) doc/chunk/token counts of exactly what [[run]] lands — the
    * reproducibility artifact of the WHOLE chain, and the operator that
    * pins it end to end: its DuckDB oracle independently recomputes
    * every gate, the provenance-preferred cut plan AND its application,
    * the PII scrub, the chunker, the trained-BPE counts and the
    * survivor prefix packing in one statement, so a drift anywhere in
    * the 11-stage composition breaks one hash compare. One lazy plan —
    * the [[shards]] frame grouped once. */
  def composedManifest(spark: SparkSession, dir: String): DataFrame =
    shards(spark, dir)
      .groupBy(col("lang"), col("split"), col("shard"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("n_tokens"))
      .orderBy("lang", "split", "shard")

  /** Run the pipeline, land shards at `outDir` partitioned by
    * (lang, split), and return the per-stage survivor summary. */
  def run(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    // one survivors computation for the write AND the summary counts —
    // the near-dup label-propagation loops inside it execute eagerly, so
    // a second call would re-run both BSP iterations for nothing.
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
