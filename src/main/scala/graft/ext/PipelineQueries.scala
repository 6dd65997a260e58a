package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline mechanics over `documents`: deterministic
  * stratified sampling, token-budget sequence packing, and fixed-window
  * chunking with overlap — the plumbing between a raw corpus and a
  * training shard layout.
  *
  * All three are built on hash/window arithmetic only (no RNG state), so
  * runs are reproducible and the DuckDB oracle replicates them exactly —
  * the property a 100 TB pipeline needs anyway: re-running a failed
  * partition must re-draw the same sample and re-cut the same chunks.
  */
object PipelineQueries {

  /** p1 — deterministic 10% stratified sample per language: keep a doc iff
    * its md5-derived bucket is 0. Hash-mod sampling scales embarrassingly
    * (per-row predicate, no shuffle, no sampling state) and is stable
    * under retries/replication — unlike rand()-based sampling. */
  val SampleBuckets = 10
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("bucket", expr(
        "cast(conv(substr(md5(concat(lang, '|', cast(doc_id as string))), 1, 8), 16, 10) as bigint) " +
          s"% $SampleBuckets"))
      .filter(col("bucket") === 0)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")

  /** p2 — greedy sequential sequence packing: walk docs in id order and
    * cut a new shard every [[PackBudget]] tokens (shard of a doc = tokens
    * BEFORE it, integer-divided by the budget). The running sum is
    * [[graft.ops.RankOps.withGlobalPrefixSum]] — a distributed exclusive
    * prefix sum (range partition + per-partition window + broadcast
    * offsets), never a single-task global window. */
  val PackBudget = 2048

  /** The corpus packing frame `(doc_id, n_toks, tok_before)` — p2's shard
    * cuts and p12's boundary offsets both derive from this one RankOps
    * prefix sum, so it is built (range shuffle + two jobs) once per
    * (session, dir) and checkpointed, not once per query. */
  private val caches = new DirCaches
  private val packCache = caches.newCache()

  def clearCaches(): Unit = caches.clear()

  private def packedPrefix(spark: SparkSession, dir: String): DataFrame = {
    caches.evictOtherDirs(spark, dir)
    packCache.getOrElseUpdate((spark, dir), {
      val par = spark.sparkContext.defaultParallelism
      val t = Tables.load(spark, dir, "documents")
        .withColumn("n_toks", size(split(lower(col("text")), " ")).cast("long"))
      graft.ops.RankOps
        .withGlobalPrefixSum(t, par, "tok_before", col("n_toks"), col("doc_id"))
        .select(col("doc_id"), col("n_toks"), col("tok_before"))
        .localCheckpoint()
    })
  }

  def tokenPacking(spark: SparkSession, dir: String): DataFrame =
    packedPrefix(spark, dir)
      .select(col("doc_id"), col("n_toks"),
        expr(s"tok_before div $PackBudget").as("shard"))
      .orderBy("doc_id")

  /** Packing over an arbitrary (doc_id, text) frame (see [[chunkOf]]). */
  def tokenPackingOf(docs: DataFrame): DataFrame = {
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val t = docs.withColumn("n_toks", size(split(lower(col("text")), " ")).cast("long"))
    graft.ops.RankOps.withGlobalPrefixSum(t, par, "tok_before", col("n_toks"), col("doc_id"))
      .select(col("doc_id"), col("n_toks"),
        expr(s"tok_before div $PackBudget").as("shard"))
      .orderBy("doc_id")
  }

  /** p25 — balanced fixed-count shard assignment: the layout a
    * data-parallel trainer with a FIXED worker count actually needs.
    * p2 packs by a running token budget (shard count falls out of the
    * data); this balances token mass across exactly [[BalanceShards]]
    * shards: docs take their global rank under (n_toks DESC, doc_id)
    * and the rank maps serpentine (boustrophedon) onto shards — pass 0
    * deals shards 0..S-1, pass 1 deals S-1..0, so each down-up cycle
    * gives every shard one large-half and one small-half doc of the
    * cycle and the totals stay within one document of each other
    * (greedy-LPT quality without LPT's sequential heap). Deterministic:
    * no RNG, stable under retries, reproducible across re-runs.
    *
    * Scale shape: the rank is [[graft.ops.RankOps.withGlobalRank]]
    * (range partition + per-partition offsets — never a single-task
    * `row_number() OVER (ORDER BY ...)` window) and the serpentine map
    * is exact integer projection arithmetic. One extra pass would write
    * each shard partition-local; nothing here is corpus-global. */
  val BalanceShards = 16
  def shardBalance(spark: SparkSession, dir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val t = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(lower(col("text")), " ")).cast("long").as("n_toks"))
    graft.ops.RankOps
      .withGlobalRank(t, par, "g_rank", col("n_toks").desc, col("doc_id"))
      .withColumn("shard", expr(
        s"CAST(CASE WHEN (g_rank div $BalanceShards) % 2 = 0 " +
          s"THEN g_rank % $BalanceShards " +
          s"ELSE $BalanceShards - 1 - (g_rank % $BalanceShards) END AS BIGINT)"))
      .select(col("doc_id"), col("n_toks"), col("g_rank"), col("shard"))
      .orderBy("doc_id")
  }

  /** p26 — sequence packing by the TRAINED tokenizer's budget: p2 packs
    * by whitespace token counts, but a trainer's context window is
    * measured in SUBWORD tokens — packing by whitespace under-fills or
    * overflows each sequence by the per-document expansion factor
    * (exactly the discrepancy t32 reports as expansion_ppm). This is
    * p2's running-prefix packing with t32's trained-BPE counts as the
    * mass: same [[PackBudget]], same deterministic doc_id order, shard
    * = exclusive-prefix div budget.
    *
    * Scale shape: the BPE counts ride the cached trained segmentation
    * (training cost paid once in the t31/t32 cache, never here); the
    * prefix sum is [[graft.ops.RankOps.withGlobalPrefixSum]] — range
    * partition + per-partition offsets, never a single-task running
    * window. */
  def bpePacking(spark: SparkSession, dir: String): DataFrame =
    bpePackingOf(spark, dir,
      graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text")))
      .orderBy("doc_id")

  /** p26's tokenizer-budget packing over ANY (doc_id, text) frame — the
    * composed pipeline packs its cut+scrubbed SURVIVOR text through this
    * ([[graft.ext.TextQueries.bpeApplyOf]] counts + the RankOps prefix
    * sum), so shard fill is measured in the trained tokenizer's units on
    * the text that actually lands. */
  def bpePackingOf(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val counts = graft.ext.TextQueries.bpeApplyOf(spark, dir, docs)
      .select(col("doc_id"), col("n_bpe_tokens"))
    graft.ops.RankOps
      .withGlobalPrefixSum(counts, par, "tok_before",
        col("n_bpe_tokens"), col("doc_id"))
      .select(col("doc_id"), col("n_bpe_tokens"),
        expr(s"tok_before div $PackBudget").as("shard"))
  }

  /** p3 — fixed-window chunking with overlap (window [[ChunkSize]], stride
    * [[ChunkStride]]): explode each doc into token-window chunks, the unit
    * a context-bounded trainer or embedder actually consumes. Chunk count
    * is data-dependent, so the explode is the scalable form — no per-doc
    * loop, and Spark's `sequence` keeps it inside codegen. */
  val ChunkSize = 50
  val ChunkStride = 40
  def chunk(spark: SparkSession, dir: String): DataFrame =
    chunkOf(Tables.load(spark, dir, "documents"))

  /** Chunking over an arbitrary (doc_id, text) frame — the composed
    * pipeline feeds PII-scrubbed text through here. */
  def chunkOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", split(lower(col("text")), " "))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(expr(s"sequence(0, n - 1, $ChunkStride)")).as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start").cast("long").as("start"),
        least(lit(ChunkSize), col("n") - col("start")).cast("long").as("chunk_len"),
        expr(s"array_join(slice(toks, start + 1, least($ChunkSize, n - start)), ' ')")
          .as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")

  /** p4 — deterministic train/val/test split: md5-bucket each doc_id into
    * [[SplitBuckets]] buckets, 0-7 train / 8 val / 9 test. Hash assignment
    * is the split discipline that survives at 100 TB: a pure per-row
    * projection (no shuffle, no RNG state, no split manifest), stable
    * under retries, and any document ever added to the corpus lands in the
    * same split forever — the property that keeps eval sets uncontaminated
    * across pipeline re-runs. */
  val SplitBuckets = 10

  /** The p4 split-bucket hash as a reusable column (p8 probes it too). */
  private def splitBucketCol =
    expr(
      "cast(conv(substr(md5(concat('split|', cast(doc_id as string))), 1, 8), 16, 10) as bigint) " +
        s"% $SplitBuckets")

  def trainValTestSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("bucket", splitBucketCol)
      .withColumn("split", expr(
        s"CASE WHEN bucket < ${SplitBuckets - 2} THEN 'train' " +
          s"WHEN bucket = ${SplitBuckets - 2} THEN 'val' ELSE 'test' END"))
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy("doc_id")

  /** p5 — weighted mixture sampling: each source gets its own keep rate
    * (the "data mix" step that blends web/books/code at configured
    * proportions before training). Rates here derive deterministically
    * from the source id (200/400/600/800 per mille by suffix mod 4) —
    * standing in for the mixture config a real pipeline reads. The keep
    * decision is the same per-row hash predicate as p1 (no RNG state,
    * stable under retries); the output is the per-source audit a mixture
    * job reports: configured vs achieved rate. One narrow scan + one
    * 20-group aggregate — nothing about this shape changes at 100 TB. */
  val MixtureBuckets = 1000
  private def withMixtureCols(df: DataFrame): DataFrame =
    df
      .withColumn("rate_millis", expr(
        "(200 + (cast(substring(source, 4) as bigint) % 4) * 200)"))
      .withColumn("keep", expr(
        "cast(conv(substr(md5(concat('mix|', cast(doc_id as string))), 1, 8), 16, 10) as bigint) " +
          s"% $MixtureBuckets < rate_millis"))

  /** Per-doc keep set under the p5 mixture config (composed pipeline's
    * mixture stage). */
  def mixtureKeepIds(spark: SparkSession, dir: String): DataFrame =
    withMixtureCols(Tables.load(spark, dir, "documents"))
      .filter(col("keep")).select(col("doc_id"))

  def mixtureSample(spark: SparkSession, dir: String): DataFrame =
    withMixtureCols(Tables.load(spark, dir, "documents"))
      .groupBy(col("source"), col("rate_millis"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("achieved_rate",
        round(col("n_kept").cast("double") / col("n_total"), 6))
      .orderBy("source")

  /** p6 — Z-order layout clustering: interleave the bits of two query
    * dimensions (user, event day) into one space-filling-curve key, range
    * the rows into files along it, and report each file's min/max per
    * dimension — the write-side layout that makes parquet min/max
    * statistics prune on BOTH dimensions at read time (a single-dim sort
    * gives one tight dimension and leaves the other's span at the full
    * domain per file). The audit output IS the data-skipping contract:
    * narrow [u_min,u_max]×[d_min,d_max] boxes per file.
    *
    * Both dimensions are normalized to the same [[ZBits]]-bit range before
    * interleaving — with raw values the wider dimension's high bits
    * dominate the curve and the narrow dimension degenerates to full-span
    * files (observed: unnormalized day-of-month left every file covering
    * all 30 days).
    *
    * File assignment = exact NTILE over the global z order, computed
    * distributed: [[graft.ops.RankOps.withGlobalRank]] (range partition on
    * z + per-partition window + broadcast offsets) feeds
    * [[graft.ops.RankOps.ntileFromRank]]'s closed-form tile arithmetic
    * with a broadcast row count — bit-identical to SQL NTILE, no
    * single-task window at any scale. */
  val ZBits = 8
  val ZFiles = 16
  def zInterleaveExpr(xCol: String, yCol: String): String =
    (0 until ZBits).map { i =>
      s"(($xCol div ${1 << i}) % 2) * ${1L << (2 * i + 1)} + " +
        s"(($yCol div ${1 << i}) % 2) * ${1L << (2 * i)}"
    }.mkString(" + ")
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val base = Tables.load(spark, dir, "events")
      // Narrow BEFORE the range shuffle: the layout needs only the two
      // dimensions and the tiebreak id — the wide props payload must not
      // ride through the exchange. (A real writer would z-sort the full
      // rows, but then the payload is the deliverable; the audit isn't.)
      .select(col("event_id"), col("user_id"), col("ts"))
      .withColumn("ux", col("user_id") % 256)
      .withColumn("dy", (dayofmonth(col("ts")) - 1).cast("long"))
      // Scale day (0..30) onto the full 8-bit grid so both dims contribute
      // equally at every interleave level.
      .withColumn("dyn", expr("dy * 255 div 30"))
      .withColumn("z", expr(zInterleaveExpr("ux", "dyn")))
      .select(col("event_id"), col("ux"), col("dy"), col("z"))
    // Row count comes out of the rank's own totals job — no separate
    // full scan just to count(*).
    val (ranked, total) = graft.ops.RankOps
      .withGlobalRankAndTotal(base, par, "__rank0", col("z"), col("event_id"))
    ranked
      .withColumn("__total", lit(total))
      .withColumn("file", graft.ops.RankOps.ntileFromRank("__rank0", "__total", ZFiles))
      .groupBy(col("file"))
      .agg(
        count(lit(1)).as("n"),
        min(col("ux")).as("u_min"), max(col("ux")).as("u_max"),
        min(col("dy")).as("d_min"), max(col("dy")).as("d_max"))
      .orderBy("file")
  }

  /** p7 — shard manifest: the reproducibility artifact a corpus release
    * ships alongside its shards — per (split, shard): chunk count, token
    * count, and an order-insensitive content digest (md5 over the sorted
    * per-chunk md5s). Re-running the pipeline must reproduce this
    * manifest bit-for-bit, and a consumer can verify a delivered shard
    * against it without trusting the producer. One join of the chunk and
    * shard-assignment frames + one aggregate; the digest concat is per
    * shard (bounded), never corpus-global. */
  def shardManifest(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunk(spark, dir)
      .select(col("doc_id"), col("chunk_len"), md5(col("chunk_text")).as("cmd5"))
    val shards = tokenPacking(spark, dir).select(col("doc_id"), col("shard"))
    val splits = trainValTestSplit(spark, dir).select(col("doc_id"), col("split"))
    chunks.join(shards, "doc_id").join(splits, "doc_id")
      .groupBy(col("split"), col("shard"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("chunk_len")).as("n_tokens"),
        md5(concat_ws(",", array_sort(collect_list(col("cmd5"))))).as("content_md5"))
      .orderBy("split", "shard")
  }

  /** p8 — train/test decontamination audit: for every train-split document,
    * how many of its distinct [[ContamNgram]]-gram shingles also occur in
    * ANY test-split document. The eval-set hygiene check every training
    * corpus release runs (n-gram overlap decontamination a la GPT-3 §C /
    * PaLM): a train doc sharing n-grams with the eval set inflates eval
    * metrics, so it gets flagged (and in the composed pipeline, dropped).
    *
    * Scale shape: the test split is ~1/10th bucket of the corpus and its
    * DISTINCT shingle set is a dictionary, not a corpus — at 100 TB train
    * scale the test dictionary still fits an executor (or failing that, a
    * bloom filter of it does), so the probe is a broadcast hash join
    * against the exploded train side with a map-side per-doc count — the
    * train corpus is never shuffled on shingle. Shingles come from the
    * d2-d4 checkpointed index ([[DedupQueries.shingled]]): the probe runs
    * on the 64-bit fingerprints (equality-only use, collision P ≈ n²/2^65
    * — the d4 argument), and building the index is shared with every
    * other dedup operator.
    */
  val ContamNgram = 3
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = DedupQueries.shingled(spark, dir)
      .withColumn("bucket", splitBucketCol)
    val testSet = sh.filter(col("bucket") === SplitBuckets - 1)
      .select(explode(col("shh")).as("g")).distinct()
      .withColumn("hit", lit(1L))
    val trainEx = sh.filter(col("bucket") < SplitBuckets - 2)
      .select(col("doc_id"), explode(col("shh")).as("g"))
    trainEx.join(broadcast(testSet), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared"))
      .withColumn("contam_ratio",
        round(col("n_shared").cast("double") / col("n_shingles"), 6))
      .withColumn("is_contaminated", col("n_shared") > 0)
      .orderBy("doc_id")
  }

  /** p9 — curriculum ordering: cut the corpus into [[CurriculumStages]]
    * quality quantiles (stage 1 = highest t2 quality score, the "teach
    * clean data first" schedule) and give every document a deterministic
    * position inside its stage via an md5 shuffle key — the reproducible
    * within-stage shuffle a curriculum dataloader consumes.
    *
    * Both ranks run distributed ([[graft.ops.RankOps]]): the stage is
    * exact NTILE from a global quality rank + broadcast count, and the
    * within-stage position is a second global rank over (stage,
    * shuffle_key) minus the stage's CLOSED-FORM start offset — ntile tile
    * sizes are arithmetic in (n, k), so no data-driven per-stage count is
    * ever gathered. No single-task window at any scale. */
  val CurriculumStages = 4
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.RankOps
    val par = spark.sparkContext.defaultParallelism
    val scored = TextQueries.qualityStats(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    // Row count from the rank's totals job: the separate count(*) pass
    // would re-run the whole quality-scoring tokenization a second time.
    val (ranked, total) = RankOps
      .withGlobalRankAndTotal(scored, par, "__r", col("quality_score").desc, col("doc_id"))
    val staged = ranked
      .withColumn("__total", lit(total))
      .withColumn("stage", RankOps.ntileFromRank("__r", "__total", CurriculumStages))
      .withColumn("shuffle_key",
        expr("substr(md5(concat('cur|', cast(doc_id as string))), 1, 8)"))
    val q = s"(__total div $CurriculumStages)"
    val rem = s"(__total % $CurriculumStages)"
    RankOps
      .withGlobalRank(staged, par, "__r2",
        col("stage"), col("shuffle_key"), col("doc_id"))
      // stage s (1-based) starts at (s-1)*q + min(s-1, rem) rows in
      .withColumn("stage_pos", expr(
        s"CAST(__r2 - ((stage - 1) * $q + least(stage - 1, $rem)) + 1 AS BIGINT)"))
      .select(col("doc_id"), col("quality_score"), col("stage"), col("stage_pos"))
      .orderBy("stage", "stage_pos")
  }

  /** p10 — weighted reservoir sample (Efraimidis–Spirakis A-ES): keep the
    * [[ReservoirK]] docs per source with the smallest `-ln(u)/w` key
    * (equivalently the largest `u^(1/w)`), weight w = n_chars — the
    * length-biased per-source sample a corpus-inspection job draws. The
    * "randomness" u derives from an md5 hash of the doc_id, so the draw
    * is a pure per-row projection: reproducible under retries, identical
    * on both engines, and mergeable across partitions (A-ES's defining
    * property — a distributed top-k by key IS the reservoir merge; the
    * rank<=k filter rewrites to WindowGroupLimit's bounded per-source
    * heap). Ranking compares the ROUNDED key (t5 discipline). */
  val ReservoirK = 5
  def reservoirSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.load(spark, dir, "documents")
      .withColumn("u", expr(
        "(cast(conv(substr(md5(concat('res|', cast(doc_id as string))), 1, 8), 16, 10) " +
          "as double) + 1.0D) / 4294967296.0D"))
      .withColumn("skey", expr("round(-ln(u) / n_chars, 9)"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("skey").asc, col("doc_id").asc)).cast("long"))
      .filter(col("rk") <= ReservoirK)
      .select(col("doc_id"), col("source"), col("n_chars"), col("skey"), col("rk"))
      .orderBy("source", "rk")
  }

  /** p11 — epoch scheduling: materialize the "repeat high-value sources
    * N times per training run" mixture lever (1-3 epochs per source,
    * derived from the source id like p5's rates stand in for config).
    * Each (doc, epoch) replica gets its own md5 shuffle key, so repeats
    * of a document land far apart in the global training order — the
    * property epoch-level upsampling needs (adjacent repeats would
    * effectively raise the local learning rate on that doc). A
    * sequence-explode per row; no shuffle until the harness sort. */
  def epochSchedule(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("epochs", expr("1 + cast(substring(source, 4) as int) % 3"))
      .select(col("doc_id"), col("source"), col("epochs"),
        explode(expr("sequence(1, epochs)")).as("epoch"))
      .withColumn("shuffle_key", expr(
        "substr(md5(concat('ep|', cast(doc_id as string), '|', cast(epoch as string))), 1, 12)"))
      .select(col("doc_id"), col("source"), col("epochs").cast("long").as("epochs"),
        col("epoch").cast("long").as("epoch"), col("shuffle_key"))
      .orderBy("doc_id", "epoch")

  /** p12 — packed-shard boundary manifest: for every p2 shard, the
    * in-order list of `doc_id@offset` boundaries — the attention-reset /
    * loss-mask metadata a packed-sequence trainer loads next to the
    * token file (without it, cross-document attention leaks). Offsets
    * are each doc's start position inside its shard (`tok_before mod
    * budget`), derived from the same RankOps distributed prefix sum as
    * p2 — one extra aggregate, no new shuffle shape; the boundary string
    * is collect_list + array_sort (per-shard doc counts are bounded by
    * budget/min-doc-len, so the per-group state is small by
    * construction). */
  def packBoundaries(spark: SparkSession, dir: String): DataFrame = {
    packedPrefix(spark, dir)
      .withColumn("shard", expr(s"tok_before div $PackBudget"))
      .withColumn("off", col("tok_before") - col("shard") * PackBudget)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        expr("array_join(transform(array_sort(collect_list(struct(doc_id, off))), " +
          "s -> concat(s.doc_id, '@', s.off)), ' ')").as("boundaries"))
      .orderBy("shard")
  }

  /** p13 — the corpus data card: the one-row release profile every
    * training corpus ships (doc/lang/source counts, token volume, exact
    * duplication, median length). One aggregate scan plus
    * [[graft.ops.MedianOps.exactMedian]] for the length median (the
    * sketch-bracketed selection — no full sort, no single percentile
    * buffer), so the whole card costs a handful of narrow passes at any
    * corpus size. */
  def datacard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"),
      sum(size(split(lower(col("text")), " ")).cast("long")).as("total_toks"),
      (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupe_docs"))
    val med = graft.ops.MedianOps
      .exactMedian(docs, col("n_chars"), col("doc_id"))
      .select(col("median").as("median_chars"))
    stats.crossJoin(med)
  }

  /** p16 — priority survivorship: when identical documents arrive from
    * several sources, keep the copy from the most-trusted source (lowest
    * source index — think "curated > crawl"), tie-break min doc_id — the
    * policy layer a multi-source ingest runs ON TOP of d1's exact-dup
    * groups (d1 answers "which docs collide", p16 answers "which copy
    * ships").
    *
    * One HASH aggregate: the (priority, doc_id) argmin packs into a
    * single BIGINT `prio·2⁴⁰ + doc_id` (doc_id < 2⁴⁰, priority < 2²³ —
    * far above any source count), whose `min` is the lexicographic
    * argmin with a combinable map-side partial. A `min(struct(...))`
    * formulation is semantically identical but plans as SortAggregate
    * (struct min has no hash-agg buffer) and sorts every partition by
    * text; the packed key keeps the whole reduction in HashAggregate.
    * The survivor's source is reconstructed from the priority
    * (`source = 'src' || prio`) — no join back, no window, no second
    * shuffle, vs the row_number formulation the oracle cross-checks
    * with. */
  def prioritySurvivor(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("prio", expr("cast(substr(source, 4) as bigint)"))
      .groupBy(col("text"))
      .agg(min(col("prio") * lit(1L << 40) + col("doc_id")).as("k"),
        count(lit(1)).as("n_copies"))
      .select(expr(s"k % ${1L << 40}").as("doc_id"),
        concat(lit("src"), expr(s"k div ${1L << 40}").cast("string")).as("source"),
        col("n_copies"))
      .orderBy("doc_id")

  /** p17 — rendezvous (HRW) shard assignment and minimal-movement
    * resharding audit: every doc goes to the shard maximizing
    * `h(doc, shard)`; growing the ring from [[HrwShards]] to
    * [[HrwShards]]+1 reassigns ONLY the docs whose new argmax is the new
    * shard (expected 1/(N+1) of the corpus) — vs `hash mod N`, which
    * moves ~N/(N+1) of everything. The per-shard movement ledger is the
    * audit a 100 TB layout publishes before a reshard.
    *
    * One broadcast cross join against the (N+1)-row shard dim and one
    * hash aggregate: both assignments come from conditional `max` over
    * the same packed `hash·256 + shard` key (48-bit hash, shard < 2⁸ —
    * exact in a BIGINT), so the old and new rings never scan the corpus
    * twice. */
  val HrwShards = 10
  def rendezvousReshard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shards = (0 to HrwShards).toDF("shard")
    val packed = Tables.load(spark, dir, "documents").select(col("doc_id"))
      .join(broadcast(shards))
      .withColumn("pk", expr(
        "cast(conv(substr(md5(concat(cast(doc_id as string), '#', cast(shard as string))), 1, 12), 16, 10) as bigint)" +
          " * 256 + shard"))
      .groupBy(col("doc_id"))
      .agg(max(when(col("shard") < HrwShards, col("pk"))).as("p_old"),
        max(col("pk")).as("p_new"))
      .select(col("doc_id"), expr("p_old % 256").as("s_old"),
        expr("p_new % 256").as("s_new"))
    packed.groupBy(col("s_new").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s_old") =!= col("s_new"), 1L).otherwise(0L)).as("n_moved_in"))
      .orderBy("shard")
  }

  /** p18 — per-source contribution cap: keep at most [[CapPerSource]]
    * documents per source, best quality first (ties → lower doc_id) —
    * the domain-dominance control every web-scale corpus applies so no
    * single crawl source swamps the mixture (C4-style per-domain caps).
    *
    * Scale shape — the naive form is a full per-source sort window over
    * the corpus; this plans the 100 TB version instead: (1) the top-N
    * PER SOURCE comes from a `row_number <= N` filter that Spark rewrites
    * to WindowGroupLimit (bounded per-partition heaps pre-shuffle);
    * (2) each source's admission THRESHOLD (its N-th best
    * (quality, −doc_id) key) is a |sources|-row frame broadcast back;
    * (3) the corpus pass flags `kept` by comparing against the
    * threshold struct — a per-row projection, so the full corpus is
    * never sorted per source. The DuckDB oracle states the naive
    * row_number formulation, proving the two result-identical (the p16
    * differential discipline). */
  val CapPerSource = 20
  def sourceCap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def joined = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(TextQueries.qualityStats(spark, dir)
        .select(col("doc_id"), col("quality_score")), Seq("doc_id"))
      .withColumn("k", struct(col("quality_score"),
        (lit(0L) - col("doc_id")).as("nid")))
    val thresholds = joined
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("quality_score").desc, col("doc_id").asc)))
      .filter(col("rk") <= CapPerSource)
      .groupBy(col("source")).agg(min(col("k")).as("t"))
    joined.join(broadcast(thresholds), Seq("source"))
      .select(col("doc_id"), col("source"),
        (col("k") >= col("t")).cast("int").as("kept"))
      .orderBy("doc_id")
  }

  /** p19 — seeded deterministic global shuffle: the training-order
    * permutation. Every epoch of LM training consumes the corpus in a
    * pseudo-random order that must be REPRODUCIBLE (elastic restarts,
    * re-sharded retries, and audit re-runs must all see the same order),
    * so the permutation is keyed, not drawn: `shuffle_key =
    * md5(seed # doc_id)` and `position` = global rank under that key.
    *
    * Scale shape: the rank is [[graft.ops.RankOps.withGlobalRank]] —
    * range-partition on the hash key (uniform by construction, so the
    * range partitioner needs no skew handling) + per-partition offsets;
    * never a single-task `row_number() OVER (ORDER BY ...)` window. The
    * same two-job pass would lay out a 100 TB corpus across P writers
    * with each writer streaming its range in order. */
  val ShuffleSeed = 42
  def seededShuffle(spark: SparkSession, dir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val keyed = Tables.load(spark, dir, "documents")
      .select(col("doc_id"))
      .withColumn("shuffle_key",
        md5(concat_ws("#", lit(ShuffleSeed), col("doc_id"))))
    graft.ops.RankOps
      .withGlobalRank(keyed, par, "position", col("shuffle_key"), col("doc_id"))
      .select(col("doc_id"), col("shuffle_key"), col("position"))
      .orderBy("doc_id")
  }

  /** p20 — sequence-length bucketing / padding-waste audit: assign each
    * doc to the smallest power-of-two token bucket that fits it and
    * report, per bucket, the document count, real token mass, padded
    * token mass (`bucket · n_docs` — what the accelerator actually
    * processes when batches are padded to the bucket width), and the
    * waste as exact ppm. This is the readout that decides bucket
    * boundaries for batch packing: too few buckets → padding waste; too
    * many → small batches. Pure projection + one hash aggregate over ~10
    * groups — embarrassingly scalable; the when-chain keeps the bucket
    * math integer-exact (no float log2 at bucket boundaries).
    *
    * Contract: `sum_toks <= padded_toks` in EVERY bucket (so waste_ppm
    * ∈ [0, 1e6]) — documents longer than the [[PadMaxBucket]] terminal
    * bucket are accounted at their TRUNCATED length (`least(n_toks,
    * max)`), modeling what the accelerator actually sees when the
    * packer truncates to the widest bucket; without the clamp a single
    * over-long doc would make padded < real and the ppm negative. */
  val PadBuckets: Seq[Long] = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L)
  val PadMaxBucket = 2048L
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame =
    lengthBucketsOf(Tables.load(spark, dir, "documents")
      .select(size(split(lower(col("text")), " ")).cast("long").as("n_toks")))

  /** The bucket audit over any 1-column `n_toks` frame (spec entry for
    * the overflow branch the fixture's short docs never reach). */
  def lengthBucketsOf(toks: DataFrame): DataFrame = {
    val bucket = PadBuckets.foldRight(lit(PadMaxBucket): org.apache.spark.sql.Column) {
      (b, acc) => when(col("n_toks") <= b, b).otherwise(acc)
    }
    toks.withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("n_toks"), lit(PadMaxBucket))).as("sum_toks"))
      .withColumn("padded_toks", col("bucket") * col("n_docs"))
      .withColumn("waste_ppm", expr(
        "cast((cast(padded_toks - sum_toks as decimal(38,0)) * 1000000) div padded_toks as bigint)"))
      .select("bucket", "n_docs", "sum_toks", "padded_toks", "waste_ppm")
      .orderBy("bucket")
  }

  /** p21 — corpus version diff: the dataset-versioning readout between
    * two corpus snapshots — which documents were added, removed, changed
    * (content hash differs) or unchanged. Every corpus release ships
    * this ledger ("v2 adds N docs, edits M, drops K"), and incremental
    * pipelines schedule work off it (re-embed only added+changed).
    * The two versions are synthesized deterministically from the one
    * fixture: v_old lacks `doc_id % 10 = 0` (those appear in v_new →
    * added), v_new lacks `doc_id % 13 = 0` (removed) and revises the
    * text of `doc_id % 7 = 0` (changed).
    *
    * Scale shape: one full-outer equi-join of the two hash manifests on
    * doc_id — the manifests carry (id, 128-bit digest) only, never the
    * payloads, so the diff of a 100 TB corpus joins ~16 bytes/doc; the
    * status column is a per-row projection on the join output. */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val vOld = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("h_old"))
    val vNew = docs.filter(col("doc_id") % 13 =!= 0)
      .select(col("doc_id"), md5(when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" [rev2]"))).otherwise(col("text"))).as("h_new"))
    vOld.join(vNew, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .orderBy("doc_id")
  }

  /** p22 — small-file compaction plan: over p7's shard manifest, group
    * adjacent undersized shards (within a split, in shard order) into
    * compaction bins of ~[[CompactTarget]] tokens via the p2 exclusive
    * prefix-sum rule, and emit the per-bin work order — input shard
    * range, shard count, and output size. This is the maintenance job
    * every lakehouse schedules against small-file buildup; planning on
    * the MANIFEST (metadata scale: one row per shard, ~corpus/2048
    * rows) rather than the data is what makes it schedulable at 100 TB.
    * The per-split running sum is a window over the manifest — at full
    * scale that is ≤ a few million metadata rows per split, not corpus
    * data. */
  val CompactTarget = 4096L
  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("split")).orderBy(col("shard").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    shardManifest(spark, dir)
      .select(col("split"), col("shard"), col("n_chunks"), col("n_tokens"))
      .withColumn("tok_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cast(tok_before div $CompactTarget as bigint)"))
      .groupBy(col("split"), col("bin"))
      .agg(count(lit(1)).as("n_input_shards"),
        min(col("shard")).as("first_shard"), max(col("shard")).as("last_shard"),
        sum(col("n_chunks")).as("n_chunks"), sum(col("n_tokens")).as("out_tokens"))
      .orderBy("split", "bin")
  }

  /** p23 — mixture-proportional epoch ordering (weighted fair
    * interleave): a single deterministic global order in which EVERY
    * prefix holds each source at ≈ its temperature share — the order a
    * mixture-trained model should actually consume, vs p19's uniform
    * shuffle (which only converges to the mixture in expectation) or
    * per-source files (which destroy the mixture entirely). Classic
    * weighted-fair-queueing virtual time: within each source docs rank
    * by a seeded hash; the k-th doc of source s finishes at virtual
    * time `k·1e9 div w_s` (w_s = p14's sqrt-temperature micro-weight),
    * and the epoch order is ascending virtual time. WFQ bounds each
    * source's lag in any prefix to O(1) items — the test asserts it.
    *
    * Scale shape: both ranks are RankOps passes (per-source rank via
    * group-rank = global rank minus broadcast offsets; final position
    * via the range-partition global rank) — never a per-source or
    * global single-reducer window; weights are a |sources|-row
    * broadcast. */
  def mixtureOrder(spark: SparkSession, dir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val weights = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("wm", expr("cast(round(sqrt(n) * 1000000.0D, 0) as bigint)"))
      .select(col("source"), col("wm"))
    val ranked = graft.ops.RankOps.withGroupRank(
      docs.withColumn("h", md5(concat_ws("|", lit("ord"), col("doc_id")))),
      par, "k0", Seq("source"), Seq(col("h"), col("doc_id")))
    val vt = ranked.join(broadcast(weights), "source")
      .withColumn("k_in_source", col("k0") + 1L)
      .withColumn("vt", expr(
        "cast(cast(k_in_source as decimal(38,0)) * 1000000000 div wm as bigint)"))
    graft.ops.RankOps
      .withGlobalRank(vt, par, "position", col("vt"), col("source"), col("doc_id"))
      .select(col("doc_id"), col("source"), col("k_in_source"), col("vt"),
        col("position"))
      .orderBy("doc_id")
  }

  /** p24 — water-filling token-budget allocation across sources: given
    * each source's token supply `s_i` and a mixture weight `w_i`, find
    * the largest integer water level λ with
    * `Σ min(s_i, λ·w_i) ≤ B` (budget B = [[BudgetPct]] % of corpus
    * tokens) and allocate `min(s_i, λ·w_i)` — the standard capped
    * proportional-mixture solve (a DoReMi-style weighted budget where
    * small sources saturate and the remainder redistributes to the
    * rest). Reports per source the supply, weight, allocation and a
    * saturation flag, plus the chosen λ.
    *
    * Allocation-vs-λ is piecewise linear and nondecreasing, so the
    * optimal integer λ lies in a finite candidate set: every saturation
    * breakpoint `floor(s_i / w_i)`, plus for each saturation regime the
    * linear solve `(B − Σ_sat s_j) div Σ_unsat w_j` (sources at or below
    * the regime's breakpoint saturated, the rest sharing the residual
    * budget by weight), plus the no-saturation solve `B div Σw`. The
    * search is a candidates × sources cross join — |sources|² rows,
    * metadata-scale at any corpus size since supplies come out of a
    * map-side-combined per-source aggregate. Integer division
    * throughout; the remainder below B is reported, not
    * force-allocated. */
  val BudgetPct = 50L
  def budgetAlloc(spark: SparkSession, dir: String): DataFrame = {
    val supply = Tables.load(spark, dir, "documents")
      .select(col("source"),
        size(split(lower(col("text")), " ")).cast("long").as("n_toks"))
      .groupBy(col("source")).agg(sum(col("n_toks")).as("supply"))
      .withColumn("weight", expr(
        "cast(conv(substr(md5(source), 1, 6), 16, 10) % 3 + 1 as bigint)"))
    val tot = supply.agg(sum(col("supply")).as("tot_toks"),
      sum(col("weight")).as("tot_w"))
    // |sources|-row frame referenced by FIVE downstream subtrees (regime's
    // self-cross, cands, lamStar, the final select) — without the cut each
    // reference re-runs the corpus token aggregate (measured: 18 AQE
    // stage-jobs for a metadata-scale solve). localCheckpoint executes the
    // corpus pass once; everything after operates on ≤ |sources|² rows.
    val base = supply.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"tot_toks * $BudgetPct div 100"))
      .withColumn("ratio", expr("supply div weight"))
      .localCheckpoint()
    // one regime solve per breakpoint threshold t: sources with
    // ratio <= t saturated, the rest share (B - sat_supply) by weight
    val regime = base.select(col("ratio").as("t")).distinct()
      .crossJoin(base.select(col("ratio"), col("supply"), col("weight"), col("budget")))
      .groupBy(col("t"), col("budget"))
      .agg(sum(when(col("ratio") <= col("t"), col("supply")).otherwise(0L)).as("sat_s"),
        sum(when(col("ratio") > col("t"), col("weight")).otherwise(0L)).as("unsat_w"))
      .filter(col("unsat_w") > 0L && col("budget") > col("sat_s"))
      .select(expr("(budget - sat_s) div unsat_w").as("lam"))
    val cands = base.select(col("ratio").as("lam"))
      .unionAll(regime)
      .unionAll(base.select(expr("budget div tot_w").as("lam")).limit(1))
      .distinct()
    val lamStar = base.crossJoin(broadcast(cands))
      .groupBy(col("lam"), col("budget"))
      .agg(sum(least(col("supply"), col("lam") * col("weight"))).as("alloc_tot"))
      .filter(col("alloc_tot") <= col("budget"))
      .agg(max(col("lam")).as("lambda_star"))
    base.crossJoin(broadcast(lamStar))
      .withColumn("alloc", least(col("supply"), col("lambda_star") * col("weight")))
      .select(col("source"), col("supply"), col("weight"), col("alloc"),
        (col("alloc") === col("supply")).cast("int").as("saturated"),
        col("lambda_star"), col("budget"))
      .orderBy("source")
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p24_budget_alloc" -> ((s, d) => budgetAlloc(s, d)),
    "p23_mixture_order" -> ((s, d) => mixtureOrder(s, d)),
    "p22_compaction_plan" -> ((s, d) => compactionPlan(s, d)),
    "p21_corpus_diff" -> ((s, d) => corpusDiff(s, d)),
    "p19_seeded_shuffle" -> ((s, d) => seededShuffle(s, d)),
    "p20_length_buckets" -> ((s, d) => lengthBuckets(s, d)),
    "p18_source_cap" -> ((s, d) => sourceCap(s, d)),
    "p17_rendezvous" -> ((s, d) => rendezvousReshard(s, d)),
    "p16_priority_survivor" -> ((s, d) => prioritySurvivor(s, d)),
    "p13_datacard" -> ((s, d) => datacard(s, d)),
    "p12_pack_boundaries" -> ((s, d) => packBoundaries(s, d)),
    "p11_epochs" -> ((s, d) => epochSchedule(s, d)),
    "p10_reservoir" -> ((s, d) => reservoirSample(s, d)),
    "p8_decontaminate" -> ((s, d) => decontaminate(s, d)),
    "p9_curriculum" -> ((s, d) => curriculum(s, d)),
    "p1_stratified_sample" -> ((s, d) => stratifiedSample(s, d)),
    "p6_zorder" -> ((s, d) => zorderLayout(s, d)),
    "p7_manifest" -> ((s, d) => shardManifest(s, d)),
    "p2_token_packing" -> ((s, d) => tokenPacking(s, d)),
    "p3_chunk" -> ((s, d) => chunk(s, d)),
    "p4_split" -> ((s, d) => trainValTestSplit(s, d)),
    "p5_mixture" -> ((s, d) => mixtureSample(s, d)),
    "p14_temperature" -> ((s, d) => temperatureMix(s, d)),
    "p15_exact_split" -> ((s, d) => exactSplit(s, d)),
    "p25_shard_balance" -> ((s, d) => shardBalance(s, d)),
    "p26_bpe_packing" -> ((s, d) => bpePacking(s, d)),
    "p27_survivor_funnel" ->
      ((s, d) => graft.pipelines.TrainingDataPipeline.survivorFunnel(s, d)),
    "p28_token_funnel" ->
      ((s, d) => graft.pipelines.TrainingDataPipeline.tokenFunnel(s, d)),
    "p29_composed_manifest" ->
      ((s, d) => graft.pipelines.TrainingDataPipeline.composedManifest(s, d))
  )

  /** p15 — exact-quota stratified split: within each stratum (lang),
    * docs ranked by doc_id; the first `floor(0.9·n_s)` go to train, the
    * rest are held out. p4's hash split only hits its proportions in
    * expectation — an eval-set contract ("exactly 10% per language,
    * reproducibly") needs rank-based quotas. The quota test is pure
    * integer arithmetic (`rank·10 ≤ n_s·9` ⇔ rank ≤ 0.9·n_s): no float
    * anywhere. Strata ranking runs through
    * [[graft.ops.RankOps.withGroupRank]] (distributed global rank minus
    * broadcast per-group offsets), NOT a per-stratum window — a corpus
    * with 5 langs would otherwise sort 20% of 100 TB through each of 5
    * reducers. Output is the per-(stratum, part) audit. */
  def exactSplit(spark: SparkSession, dir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val d = Tables.load(spark, dir, "documents").select(col("doc_id"), col("lang"))
    val ranked = graft.ops.RankOps.withGroupRank(
      d, par, "rk", Seq("lang"), Seq(col("doc_id").asc))
    val cnt = d.groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
    ranked.join(broadcast(cnt), "lang")
      .withColumn("part",
        when((col("rk") + 1) * 10 <= col("n_s") * 9, "train").otherwise("held"))
      .groupBy(col("lang"), col("part"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("lang", "part")
  }

  /** p14 — temperature-scaled source mixture (the multilingual/DoReMi
    * `w_s ∝ n_s^α` reweighting that upsamples small sources relative to
    * their raw share; α = 0.5 here). Where p5 APPLIES a configured mix,
    * p14 COMPUTES one from corpus counts. α = 0.5 makes the power an
    * IEEE `sqrt` — correctly rounded by both engines, so the weights are
    * bit-identical without a micro-unit detour; the weight NORMALIZATION
    * still goes through micro-unit BIGINTs (summing raw doubles across
    * sources would reintroduce merge-order drift). `alloc_10k` is the
    * floor integer allocation of a 10 000-sample budget — what the
    * sampler downstream actually consumes.
    *
    * Scale shape: one combinable count per source (the corpus reduces
    * map-side to |sources| rows), then arithmetic on a broadcast
    * single-row total. Nothing else moves. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.load(spark, dir, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      .withColumn("wm", expr("cast(round(sqrt(n_docs) * 1000000.0D, 0) as bigint)"))
    val tot = cnt.agg(sum(col("n_docs")).as("n_total"), sum(col("wm")).as("w_total"))
    cnt.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        round(col("n_docs") / col("n_total"), 6).as("raw_share"),
        round(col("wm") / col("w_total"), 6).as("temp_share"),
        expr("wm * 10000 div w_total").as("alloc_10k"))
      .orderBy("source")
  }

  /** The p7 manifest as portable SQL (no trailing ORDER BY) — p7's oracle
    * totals-orders it; p22's oracle nests it as a CTE to plan bins. */
  private lazy val duckManifestSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks FROM documents),
       |ch AS (SELECT doc_id, toks, len(toks) n,
       |         unnest(range(0, len(toks), $ChunkStride)) st
       |       FROM t),
       |chunks AS (SELECT doc_id,
       |             CAST(least($ChunkSize, n - st) AS BIGINT) chunk_len,
       |             md5(array_to_string(
       |               list_slice(toks, st + 1, st + least($ChunkSize, n - st)), ' ')) cmd5
       |           FROM ch),
       |r AS (SELECT doc_id,
       |        coalesce(sum(CAST(len(toks) AS BIGINT)) OVER (ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) tok_before
       |      FROM t),
       |sh AS (SELECT doc_id, CAST(tok_before // $PackBudget AS BIGINT) shard FROM r),
       |sp AS (SELECT doc_id,
       |         ('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 8))::BIGINT
       |           % $SplitBuckets b
       |       FROM documents),
       |sps AS (SELECT doc_id,
       |          CASE WHEN b < ${SplitBuckets - 2} THEN 'train'
       |               WHEN b = ${SplitBuckets - 2} THEN 'val'
       |               ELSE 'test' END split
       |        FROM sp)
       |SELECT split, shard, count(*) AS n_chunks,
       |       CAST(sum(chunk_len) AS BIGINT) AS n_tokens,
       |       md5(string_agg(cmd5, ',' ORDER BY cmd5)) AS content_md5
       |FROM chunks JOIN sh USING (doc_id) JOIN sps USING (doc_id)
       |GROUP BY split, shard""".stripMargin

  // lazy: oracle SQL bodies cross-reference sibling modules (t27→Dedup,
  /** The composed pipeline's cumulative stage conditions — shared by the
    * p27 (doc-count) and p28 (token-mass) funnel oracles AND mirrored by
    * the engine's gateFlags conjunctions. */
  private val duckStageConds: Seq[(String, String)] = Seq(
    "s0_documents_in" -> "TRUE",
    "s1_quality" -> "f_quality",
    "s2_repetition" -> "f_quality AND f_rep",
    "s3_exact_dedup" -> "f_quality AND f_rep AND f_exact",
    "s4_lsh_roots" -> "f_quality AND f_rep AND f_exact AND f_lsh",
    "s5_ann_mp_roots" ->
      "f_quality AND f_rep AND f_exact AND f_lsh AND f_ann",
    "s6_mixture" ->
      "f_quality AND f_rep AND f_exact AND f_lsh AND f_ann AND f_mix",
    "s7_decontaminated" ->
      "f_quality AND f_rep AND f_exact AND f_lsh AND f_ann AND f_mix AND f_clean")

  /** The full gate-flag WITH prefix (recomputes EVERY doc-grain gate of
    * the composed pipeline independently: t2's quality formula, t11's
    * repetition ratio, d1's exact keep, the complete minhash-LSH
    * component chain, the multi-probe ANN component chain — suffixed E
    * so the two recursive closures coexist; DuckDB allows multiple
    * recursive CTEs per WITH RECURSIVE — p5's mixture hash, p4's split
    * bucket and p8's decontamination probe), ending at
    * `flags(doc_id, f_quality … f_clean)`. Shared by p27 and p28. */
  private lazy val duckGateFlagsWith: String = {
      import graft.pipelines.TrainingDataPipeline.{QualityThreshold, RepetitionMax}
      // the probe-shell CTEs come from the shared builder at the build's
      // ProbeDepth — the f_ann gate flows through mpEdges, whose depth
      // follows the dial, so the funnel oracle must track it too (the
      // r14 review finding: a hardcoded depth-1 chain diverges from the
      // engine under SPARK_GRAFT_PROBE_DEPTH=2). The index side joins
      // the CAPPED cidxE (DefaultBucketCap keep rule), not raw bandsE:
      // mpEdges probes the capped production index, and an uncapped
      // oracle silently diverges the moment any bucket exceeds the cap
      // (r14 ADVICE — depth 2 multiplies collision mass).
      val annChain =
        s"""${SimilarityQueries.duckCappedIdxSfx("E")},
           |${SimilarityQueries.duckMpProbes(sfx = "E")},
           |pE AS (SELECT DISTINCT least(pq.qid, i.vec_id) lo,
           |         greatest(pq.qid, i.vec_id) hi
           |       FROM probesE pq JOIN cidxE i
           |         ON i.bid = pq.bid AND CAST(i.bkey AS BIGINT) = pq.pkey
           |        AND i.vec_id <> pq.qid),
           |peE AS (SELECT lo, hi FROM pE
           |        JOIN e x ON x.vec_id = pE.lo JOIN e y ON y.vec_id = pE.hi
           |        WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6)
           |                >= ${DedupQueries.EmbDupThreshold}),
           |undE AS (SELECT lo a, hi b FROM peE
           |         UNION ALL SELECT hi a, lo b FROM peE),
           |reachE AS (
           |  SELECT vec_id node, vec_id x FROM e
           |  UNION
           |  SELECT r.node, u.b FROM reachE r JOIN undE u ON u.a = r.x),
           |ccE AS (SELECT node, min(x) canon FROM reachE GROUP BY node)""".stripMargin
      val gates =
        s"""tq AS (SELECT doc_id, text, string_split(lower(text), ' ') toks
           |       FROM documents),
           |qc AS (SELECT doc_id, len(toks) n_toks,
           |         len(list_filter(toks, w -> w IN ('the','a','of'))) n_stop,
           |         len(regexp_extract_all(text, '[^a-z0-9 ]')) n_punct,
           |         length(text) n_chars
           |       FROM tq),
           |qf AS (SELECT doc_id,
           |         (round((least(n_toks, 100) / 100.0)
           |                * (1.0 - n_stop * 1.0 / n_toks)
           |                * (1.0 - n_punct * 1.0 / n_chars), 6)
           |            >= $QualityThreshold) fq
           |       FROM qc),
           |rtk AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
           |rs AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-2)) i
           |       FROM rtk WHERE len(tk) >= 3),
           |rtri AS (SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] tri
           |         FROM rs),
           |rmult AS (SELECT doc_id, tri, count(*) m FROM rtri GROUP BY 1, 2),
           |ragg AS (SELECT doc_id, CAST(sum(m) AS BIGINT) n_tri,
           |           CAST(count(*) AS BIGINT) n_tri_distinct
           |         FROM rmult GROUP BY doc_id),
           |rf AS (SELECT doc_id,
           |         (round(1.0 - n_tri_distinct * 1.0 / n_tri, 6)
           |            <= $RepetitionMax) fr
           |       FROM ragg),
           |exk AS (SELECT min(doc_id) keep_id FROM documents GROUP BY text),
           |mixf AS (SELECT doc_id,
           |           (('0x' || substr(md5('mix|' || doc_id::VARCHAR), 1, 8))::BIGINT
           |              % $MixtureBuckets
           |            < 200 + (CAST(substr(source, 4) AS BIGINT) % 4) * 200) fm
           |         FROM documents),
           |sb AS (SELECT doc_id,
           |         ('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 8))::BIGINT
           |           % $SplitBuckets bucket
           |       FROM documents),
           |csh AS (SELECT doc_id,
           |          list_distinct(list_transform(generate_series(1, len(tk)-2),
           |            i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) sh
           |        FROM rtk WHERE len(tk) >= $ContamNgram),
           |ctests AS (SELECT DISTINCT unnest(csh.sh) g
           |           FROM csh JOIN sb USING (doc_id)
           |           WHERE bucket = ${SplitBuckets - 1}),
           |ctr AS (SELECT doc_id, unnest(csh.sh) g
           |        FROM csh JOIN sb USING (doc_id)
           |        WHERE bucket < ${SplitBuckets - 2}),
           |contam AS (SELECT DISTINCT ctr.doc_id FROM ctr JOIN ctests USING (g))""".stripMargin
      // the f_lsh chain tracks the SPARK_GRAFT_TEXT_CAP dial exactly
      // like the ann chain tracks ProbeDepth (the r14 oracle-dial
      // precedent): capped gate engine-side ⇒ capped chain oracle-side
      val (lshChain, lshJoin, lshFlag) =
        if (graft.pipelines.TrainingDataPipeline.TextCapGate)
          (DedupQueries.duckCappedTextChain,
            "JOIN ccT ON ccT.node = d.doc_id",
            "(ccT.canon = d.doc_id) f_lsh")
        else
          (DedupQueries.duckComponentsSql,
            "JOIN cc ON cc.node = d.doc_id",
            "(cc.cluster_root = d.doc_id) f_lsh")
      s"""WITH RECURSIVE ${DedupQueries.duckShingled},
         |${DedupQueries.duckMinhashed},
         |bands AS MATERIALIZED (
         |${DedupQueries.duckBands}),
         |$lshChain,
         |${SimilarityQueries.duckEmb},
         |${SimilarityQueries.duckScaledBandsNamed("TRUE", 0, "E")},
         |$annChain,
         |$gates,
         |flags AS (
         |  SELECT d.doc_id,
         |    coalesce(qf.fq, FALSE) f_quality,
         |    coalesce(rf.fr, TRUE) f_rep,
         |    (exk.keep_id IS NOT NULL) f_exact,
         |    $lshFlag,
         |    coalesce(ccE.canon = d.doc_id, TRUE) f_ann,
         |    coalesce(mixf.fm, FALSE) f_mix,
         |    (ct.doc_id IS NULL) f_clean
         |  FROM documents d
         |  LEFT JOIN qf USING (doc_id)
         |  LEFT JOIN rf USING (doc_id)
         |  LEFT JOIN exk ON exk.keep_id = d.doc_id
         |  $lshJoin
         |  LEFT JOIN ccE ON ccE.node = d.doc_id
         |  LEFT JOIN mixf USING (doc_id)
         |  LEFT JOIN contam ct ON ct.doc_id = d.doc_id)""".stripMargin
  }

  // s24→Text…); eager Maps would make object-init order a correctness
  // hazard (NPE on whichever module clinit runs first).
  lazy val oracles: Map[String, String] = Map(
    "p27_survivor_funnel" -> {
      val stages = duckStageConds.map { case (name, cond) =>
        s"SELECT '$name' stage, CAST(sum(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) n FROM flags"
      }.mkString("\nUNION ALL\n")
      s"""$duckGateFlagsWith
         |SELECT stage, n FROM (
         |$stages)
         |ORDER BY stage""".stripMargin
    },

    // p29: the WHOLE composed pipeline in one statement — the gate-flag
    // prefix picks survivors, the d33 chain (x-prefixed CTEs) plans the
    // provenance-preferred cuts, the d29 membership pattern applies them
    // and the PII regexes scrub, p3's pattern chunks the clean text,
    // duckBpeRounds prices it in trained-subword units and the p2
    // exclusive-prefix rule shards the survivors — then one (lang,
    // split, shard) rollup. A drift anywhere in the 11-stage composition
    // breaks this single hash compare.
    "p29_composed_manifest" -> {
      val bpeK = graft.ext.TextQueries.BpeRounds
      s"""$duckGateFlagsWith,
         |${graft.ext.TextQueries.duckBpeRounds},
         |srvids AS (SELECT doc_id FROM flags
         |           WHERE f_quality AND f_rep AND f_exact AND f_lsh
         |             AND f_ann AND f_mix AND f_clean),
         |xt AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
         |xs AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i
         |       FROM xt WHERE len(tk) >= 3),
         |xsh AS (SELECT doc_id, CAST(i - 1 AS BIGINT) pos,
         |          tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] shingle
         |        FROM xs),
         |xc AS (SELECT shingle FROM xsh GROUP BY shingle HAVING count(*) > 1),
         |xdup AS (SELECT xsh.doc_id, xsh.pos FROM xsh JOIN xc USING (shingle)),
         |xq AS (SELECT doc_id, pos,
         |         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) isl
         |       FROM xdup),
         |xruns AS (SELECT doc_id, CAST(min(pos) AS BIGINT) cut_start,
         |            CAST(min(pos) + count(*) + 2 AS BIGINT) cut_end
         |          FROM xq GROUP BY doc_id, isl),
         |xrng AS (SELECT doc_id, cut_start, cut_end FROM xruns
         |         WHERE cut_end - cut_start >= ${DedupQueries.MinCutSpanToks}),
         |xfp AS (SELECT r.doc_id, r.cut_start, r.cut_end, d.source,
         |          md5(array_to_string(
         |            t.tk[CAST(r.cut_start + 1 AS INT) : CAST(r.cut_end AS INT)],
         |            ' ')) span_fp
         |        FROM xrng r JOIN xt t ON t.doc_id = r.doc_id
         |                    JOIN documents d ON d.doc_id = r.doc_id),
         |xkept AS (SELECT span_fp, doc_id kept_doc_id, cut_start kept_start
         |          FROM (SELECT *, row_number() OVER (PARTITION BY span_fp
         |                  ORDER BY source, doc_id, cut_start) rn FROM xfp)
         |          WHERE rn = 1),
         |xcuts AS (SELECT f.doc_id, f.cut_start, f.cut_end
         |          FROM xfp f JOIN xkept k USING (span_fp)
         |          WHERE f.doc_id <> k.kept_doc_id OR f.cut_start <> k.kept_start),
         |yorig AS (SELECT doc_id, string_split(text, ' ') tk FROM documents),
         |ypos AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) i
         |         FROM yorig),
         |ysrv AS (SELECT p.doc_id, p.tk[p.i] tok, p.i FROM ypos p
         |         WHERE NOT EXISTS (SELECT 1 FROM xcuts c
         |           WHERE c.doc_id = p.doc_id
         |             AND p.i - 1 >= c.cut_start AND p.i - 1 < c.cut_end)),
         |ycut AS (SELECT o.doc_id,
         |           coalesce(a.ct, '') raw_clean
         |         FROM yorig o LEFT JOIN (
         |           SELECT doc_id, string_agg(tok, ' ' ORDER BY i) ct
         |           FROM ysrv GROUP BY doc_id) a USING (doc_id)),
         |yclean AS (SELECT doc_id,
         |             regexp_replace(regexp_replace(raw_clean,
         |               '[a-z0-9]+@[a-z]+\\.[a-z]+', '<EMAIL>', 'g'),
         |               '\\+1-555-[0-9]+', '<PHONE>', 'g') clean
         |           FROM ycut),
         |ysub AS (SELECT w, CAST(count(*) AS BIGINT) n_sub
         |         FROM s$bpeK GROUP BY w),
         |ybw AS (SELECT y.doc_id, unnest(string_split(lower(y.clean), ' ')) w
         |        FROM yclean y JOIN srvids USING (doc_id)),
         |ybn AS (SELECT ybw.doc_id,
         |          CAST(sum(coalesce(ysub.n_sub, length(ybw.w))) AS BIGINT) nb
         |        FROM ybw LEFT JOIN ysub ON ybw.w = ysub.w
         |        GROUP BY ybw.doc_id),
         |ypack AS (SELECT doc_id,
         |            CAST(coalesce(sum(nb) OVER (ORDER BY doc_id
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |              // $PackBudget AS BIGINT) shard
         |          FROM ybn),
         |ych AS (SELECT y.doc_id, string_split(lower(y.clean), ' ') toks
         |        FROM yclean y JOIN srvids USING (doc_id)),
         |ychunks AS (SELECT doc_id,
         |              CAST(least($ChunkSize, len(toks) - st) AS BIGINT) chunk_len
         |            FROM (SELECT doc_id, toks,
         |                    unnest(range(0, len(toks), $ChunkStride)) st
         |                  FROM ych)),
         |ysps AS (SELECT doc_id,
         |           CASE WHEN b < ${SplitBuckets - 2} THEN 'train'
         |                WHEN b = ${SplitBuckets - 2} THEN 'val'
         |                ELSE 'test' END split
         |         FROM (SELECT doc_id,
         |                 ('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 8))::BIGINT
         |                   % $SplitBuckets b
         |               FROM documents))
         |SELECT d.lang, ysps.split, ypack.shard,
         |       CAST(count(DISTINCT ychunks.doc_id) AS BIGINT) AS n_docs,
         |       CAST(count(*) AS BIGINT) AS n_chunks,
         |       CAST(sum(ychunks.chunk_len) AS BIGINT) AS n_tokens
         |FROM ychunks
         |JOIN documents d USING (doc_id)
         |JOIN ysps USING (doc_id)
         |JOIN ypack USING (doc_id)
         |GROUP BY d.lang, ysps.split, ypack.shard
         |ORDER BY d.lang, ysps.split, ypack.shard""".stripMargin
    },

    // p28: the same gate flags weighted by each doc's whitespace-token
    // mass — the "how many training tokens survive each stage" readout
    // a data budget is written in (doc and token funnels diverge when a
    // gate correlates with length).
    "p28_token_funnel" -> {
      val stages = duckStageConds.map { case (name, cond) =>
        s"SELECT '$name' stage, CAST(coalesce(sum(CASE WHEN $cond THEN tw.nt ELSE 0 END), 0) AS BIGINT) n_tokens " +
          "FROM flags JOIN tw USING (doc_id)"
      }.mkString("\nUNION ALL\n")
      s"""$duckGateFlagsWith,
         |tw AS (SELECT doc_id,
         |         CAST(len(string_split(lower(text), ' ')) AS BIGINT) nt
         |       FROM documents)
         |SELECT stage, n_tokens FROM (
         |$stages)
         |ORDER BY stage""".stripMargin
    },

    // p26 re-derives the trained-BPE per-doc counts with t32's CTE chain
    // (shared duckBpeRounds builder), then applies p2's exclusive-prefix
    // packing arithmetic over them.
    "p26_bpe_packing" ->
      s"""WITH ${graft.ext.TextQueries.duckBpeRounds},
         |sub AS (SELECT w, CAST(count(*) AS BIGINT) n_sub
         |        FROM s${graft.ext.TextQueries.BpeRounds} GROUP BY w),
         |dt AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) w
         |       FROM documents),
         |nb AS (SELECT dt.doc_id,
         |         CAST(sum(coalesce(sub.n_sub, length(dt.w))) AS BIGINT)
         |           n_bpe_tokens
         |       FROM dt LEFT JOIN sub ON dt.w = sub.w GROUP BY dt.doc_id),
         |r AS (SELECT doc_id, n_bpe_tokens,
         |        coalesce(sum(n_bpe_tokens) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          tok_before
         |      FROM nb)
         |SELECT doc_id, n_bpe_tokens,
         |       CAST(tok_before // $PackBudget AS BIGINT) AS shard
         |FROM r ORDER BY doc_id""".stripMargin,

    "p25_shard_balance" ->
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) n_toks
         |  FROM documents),
         |r AS (SELECT doc_id, n_toks,
         |    CAST(row_number() OVER (ORDER BY n_toks DESC, doc_id) - 1
         |      AS BIGINT) g_rank
         |  FROM t)
         |SELECT doc_id, n_toks, g_rank,
         |  CAST(CASE WHEN (g_rank // $BalanceShards) % 2 = 0
         |    THEN g_rank % $BalanceShards
         |    ELSE $BalanceShards - 1 - (g_rank % $BalanceShards)
         |    END AS BIGINT) AS shard
         |FROM r ORDER BY doc_id""".stripMargin,

    "p24_budget_alloc" ->
      s"""WITH sup AS (
         |  SELECT source,
         |         CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) supply,
         |         CAST(('0x' || substr(md5(source), 1, 6))::BIGINT % 3 + 1
         |           AS BIGINT) weight
         |  FROM documents GROUP BY source),
         |tot AS (SELECT sum(supply) tot_toks, sum(weight) tot_w FROM sup),
         |b AS (SELECT sup.*, tot_toks * $BudgetPct // 100 AS budget,
         |        supply // weight AS ratio
         |      FROM sup, tot),
         |reg AS (SELECT (budget - sat_s) // unsat_w lam FROM (
         |          SELECT t.t, any_value(b.budget) budget,
         |            sum(CASE WHEN b.ratio <= t.t THEN b.supply ELSE 0 END) sat_s,
         |            sum(CASE WHEN b.ratio > t.t THEN b.weight ELSE 0 END) unsat_w
         |          FROM (SELECT DISTINCT ratio t FROM b) t, b
         |          GROUP BY t.t)
         |        WHERE unsat_w > 0 AND budget > sat_s),
         |cand AS (SELECT DISTINCT lam FROM (
         |           SELECT ratio lam FROM b
         |           UNION ALL SELECT lam FROM reg
         |           UNION ALL SELECT budget // tot_w FROM b, tot)),
         |feas AS (SELECT max(lam) lambda_star FROM (
         |           SELECT c.lam, any_value(b.budget) budget,
         |             sum(least(b.supply, c.lam * b.weight)) alloc_tot
         |           FROM cand c, b GROUP BY c.lam)
         |         WHERE alloc_tot <= budget)
         |SELECT b.source, b.supply, b.weight,
         |       CAST(least(b.supply, f.lambda_star * b.weight) AS BIGINT) AS alloc,
         |       CAST(CASE WHEN least(b.supply, f.lambda_star * b.weight) = b.supply
         |            THEN 1 ELSE 0 END AS INTEGER) AS saturated,
         |       CAST(f.lambda_star AS BIGINT) AS lambda_star,
         |       CAST(b.budget AS BIGINT) AS budget
         |FROM b, feas f ORDER BY source""".stripMargin,
    // Independent formulation: plain per-source and global row_number
    // windows (vs the engine's two RankOps passes).
    "p23_mixture_order" ->
      """WITH c AS (SELECT source, count(*) n FROM documents GROUP BY 1),
        |w AS (SELECT source,
        |        CAST(round(sqrt(n) * 1000000.0, 0) AS BIGINT) wm FROM c),
        |r AS (SELECT doc_id, source,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY md5('ord|' || doc_id::VARCHAR), doc_id) k
        |      FROM documents),
        |v AS (SELECT doc_id, r.source, CAST(k AS BIGINT) k_in_source,
        |        CAST(CAST(k AS HUGEINT) * 1000000000 // wm AS BIGINT) vt
        |      FROM r JOIN w ON r.source = w.source)
        |SELECT doc_id, source, k_in_source, vt,
        |       CAST(row_number() OVER (ORDER BY vt, source, doc_id) - 1
        |            AS BIGINT) AS position
        |FROM v ORDER BY doc_id""".stripMargin,

    "p21_corpus_diff" ->
      """WITH vold AS (
        |  SELECT doc_id, md5(text) h_old FROM documents WHERE doc_id % 10 <> 0),
        |vnew AS (
        |  SELECT doc_id,
        |         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]'
        |             ELSE text END) h_new
        |  FROM documents WHERE doc_id % 13 <> 0)
        |SELECT coalesce(vold.doc_id, vnew.doc_id) AS doc_id,
        |       CASE WHEN vold.doc_id IS NULL THEN 'added'
        |            WHEN vnew.doc_id IS NULL THEN 'removed'
        |            WHEN h_old <> h_new THEN 'changed'
        |            ELSE 'unchanged' END AS status
        |FROM vold FULL OUTER JOIN vnew ON vold.doc_id = vnew.doc_id
        |ORDER BY doc_id""".stripMargin,

    // Independent formulation: a plain global row_number window
    // differentially checks the RankOps range-partition rank.
    "p19_seeded_shuffle" ->
      s"""SELECT doc_id,
         |       md5($ShuffleSeed || '#' || doc_id::VARCHAR) AS shuffle_key,
         |       CAST(row_number() OVER (
         |         ORDER BY md5($ShuffleSeed || '#' || doc_id::VARCHAR), doc_id)
         |         - 1 AS BIGINT) AS position
         |FROM documents ORDER BY doc_id""".stripMargin,

    "p20_length_buckets" -> {
      val caseSql = PadBuckets.map(b => s"WHEN n_toks <= $b THEN $b")
        .mkString("CASE ", " ", s" ELSE $PadMaxBucket END")
      s"""WITH t AS (SELECT len(string_split(lower(text), ' '))::BIGINT n_toks
         |           FROM documents),
         |b AS (SELECT CAST($caseSql AS BIGINT) bucket,
         |        least(n_toks, $PadMaxBucket) n_toks FROM t),
         |g AS (SELECT bucket, count(*) n_docs, CAST(sum(n_toks) AS BIGINT) sum_toks
         |      FROM b GROUP BY bucket)
         |SELECT bucket, n_docs, sum_toks,
         |       CAST(bucket * n_docs AS BIGINT) AS padded_toks,
         |       CAST((bucket * n_docs - sum_toks) * 1000000
         |            // (bucket * n_docs) AS BIGINT) AS waste_ppm
         |FROM g ORDER BY bucket""".stripMargin
    },
    // Independent formulation: the naive full row_number-over-source
    // window differentially checks the broadcast-threshold plan.
    "p18_source_cap" ->
      s"""WITH t AS (SELECT doc_id, source, text,
         |        string_split(lower(text), ' ') toks FROM documents),
         |c AS (SELECT doc_id, source,
         |        len(toks) n_toks,
         |        len(list_filter(toks, w -> w IN ('the','a','of'))) n_stop,
         |        len(regexp_extract_all(text, '[^a-z0-9 ]')) n_punct,
         |        length(text) n_chars
         |      FROM t),
         |q AS (SELECT doc_id, source,
         |        round((least(n_toks, 100) / 100.0) * (1.0 - n_stop * 1.0 / n_toks)
         |              * (1.0 - n_punct * 1.0 / n_chars), 6) quality_score
         |      FROM c),
         |r AS (SELECT doc_id, source,
         |        row_number() OVER (PARTITION BY source
         |          ORDER BY quality_score DESC, doc_id ASC) rn
         |      FROM q)
         |SELECT doc_id, source,
         |       CAST(CASE WHEN rn <= $CapPerSource THEN 1 ELSE 0 END AS INTEGER) AS kept
         |FROM r ORDER BY doc_id""".stripMargin,

    "p17_rendezvous" ->
      s"""WITH sh AS (SELECT unnest(range(0, ${HrwShards + 1})) shard),
         |pk AS (
         |  SELECT doc_id, shard,
         |         ('0x' || substr(md5(doc_id::VARCHAR || '#' || shard::VARCHAR),
         |            1, 12))::BIGINT * 256 + shard pk
         |  FROM documents, sh),
         |a AS (
         |  SELECT doc_id,
         |         CAST(max(CASE WHEN shard < $HrwShards THEN pk END) % 256 AS BIGINT) s_old,
         |         CAST(max(pk) % 256 AS BIGINT) s_new
         |  FROM pk GROUP BY doc_id)
         |SELECT s_new AS shard, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN s_old <> s_new THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_moved_in
         |FROM a GROUP BY s_new ORDER BY shard""".stripMargin,

    // Independent formulation: row_number-over-window survivor pick
    // differentially checks the min(struct) aggregate plan.
    "p16_priority_survivor" ->
      """WITH p AS (
        |  SELECT doc_id, source, text,
        |         CAST(substr(source, 4) AS INT) prio
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY text ORDER BY prio, doc_id) rn,
        |         count(*) OVER (PARTITION BY text) n_copies
        |  FROM p)
        |SELECT doc_id, source, CAST(n_copies AS BIGINT) AS n_copies
        |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    "p14_temperature" ->
      """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) n_docs
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source, n_docs,
        |        CAST(round(sqrt(n_docs) * 1000000.0, 0) AS BIGINT) wm FROM c),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) n_total,
        |        CAST(sum(wm) AS BIGINT) w_total FROM w)
        |SELECT source, n_docs,
        |       round(n_docs / n_total, 6) AS raw_share,
        |       round(wm / w_total, 6) AS temp_share,
        |       CAST(wm * 10000 // w_total AS BIGINT) AS alloc_10k
        |FROM w, t ORDER BY source""".stripMargin,

    "p15_exact_split" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) rk,
        |         count(*) OVER (PARTITION BY lang) n_s
        |  FROM documents)
        |SELECT lang,
        |       CASE WHEN rk * 10 <= n_s * 9 THEN 'train' ELSE 'held' END AS part,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM r GROUP BY 1, 2 ORDER BY lang, part""".stripMargin,

    "p13_datacard" ->
      """SELECT count(*) AS n_docs,
        |       count(DISTINCT lang) AS n_langs,
        |       count(DISTINCT source) AS n_sources,
        |       CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS total_toks,
        |       count(*) - count(DISTINCT md5(text)) AS n_dupe_docs,
        |       round(quantile_cont(n_chars, 0.5), 6) AS median_chars
        |FROM documents""".stripMargin,

    "p12_pack_boundaries" ->
      s"""WITH t AS (SELECT doc_id,
         |             CAST(len(string_split(lower(text), ' ')) AS BIGINT) n_toks
         |           FROM documents),
         |r AS (SELECT doc_id, n_toks,
         |        coalesce(sum(n_toks) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) tok_before
         |      FROM t),
         |s AS (SELECT doc_id, n_toks,
         |        CAST(tok_before // $PackBudget AS BIGINT) shard,
         |        tok_before - (tok_before // $PackBudget) * $PackBudget AS off
         |      FROM r)
         |SELECT shard, count(*) AS n_docs,
         |       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
         |       string_agg(doc_id || '@' || off, ' ' ORDER BY doc_id) AS boundaries
         |FROM s GROUP BY shard ORDER BY shard""".stripMargin,

    "p11_epochs" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         1 + CAST(substr(source, 4) AS INT) % 3 epochs
        |  FROM documents),
        |x AS (SELECT doc_id, source, epochs,
        |        unnest(generate_series(1, epochs)) epoch
        |      FROM d)
        |SELECT doc_id, source, CAST(epochs AS BIGINT) AS epochs,
        |       CAST(epoch AS BIGINT) AS epoch,
        |       substr(md5('ep|' || doc_id::VARCHAR || '|' || epoch::VARCHAR), 1, 12)
        |         AS shuffle_key
        |FROM x ORDER BY doc_id, epoch""".stripMargin,

    "p10_reservoir" ->
      s"""WITH d AS (
         |  SELECT doc_id, source, n_chars,
         |         (('0x' || substr(md5('res|' || doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE
         |           + 1.0) / 4294967296.0 u
         |  FROM documents),
         |k AS (SELECT doc_id, source, n_chars, round(-ln(u) / n_chars, 9) skey FROM d),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
         |        ORDER BY skey ASC, doc_id ASC) AS BIGINT) rk FROM k)
         |SELECT doc_id, source, n_chars, skey, rk
         |FROM r WHERE rk <= $ReservoirK ORDER BY source, rk""".stripMargin,

    "p8_decontaminate" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
         |sh AS (SELECT doc_id,
         |         list_distinct(list_transform(generate_series(1, len(tk)-2),
         |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) sh
         |       FROM t WHERE len(tk) >= $ContamNgram),
         |b AS (SELECT doc_id,
         |        ('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 8))::BIGINT
         |          % $SplitBuckets bucket
         |      FROM documents),
         |tests AS (SELECT DISTINCT unnest(sh.sh) g
         |          FROM sh JOIN b USING (doc_id)
         |          WHERE bucket = ${SplitBuckets - 1}),
         |tr AS (SELECT doc_id, unnest(sh.sh) g
         |       FROM sh JOIN b USING (doc_id)
         |       WHERE bucket < ${SplitBuckets - 2}),
         |agg AS (SELECT tr.doc_id,
         |          CAST(count(*) AS BIGINT) n_shingles,
         |          CAST(count(tests.g) AS BIGINT) n_shared
         |        FROM tr LEFT JOIN tests USING (g)
         |        GROUP BY tr.doc_id)
         |SELECT doc_id, n_shingles, n_shared,
         |       round(n_shared * 1.0 / n_shingles, 6) AS contam_ratio,
         |       n_shared > 0 AS is_contaminated
         |FROM agg ORDER BY doc_id""".stripMargin,

    "p9_curriculum" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') toks FROM documents),
         |c AS (SELECT doc_id,
         |        len(toks) n_toks,
         |        len(list_filter(toks, w -> w IN ('the','a','of'))) n_stop,
         |        len(regexp_extract_all(text, '[^a-z0-9 ]')) n_punct,
         |        length(text) n_chars
         |      FROM t),
         |q AS (SELECT doc_id,
         |        round((least(n_toks, 100) / 100.0) * (1.0 - n_stop * 1.0 / n_toks)
         |              * (1.0 - n_punct * 1.0 / n_chars), 6) quality_score
         |      FROM c),
         |st AS (SELECT doc_id, quality_score,
         |         CAST(ntile($CurriculumStages) OVER
         |           (ORDER BY quality_score DESC, doc_id) AS BIGINT) stage
         |       FROM q),
         |sk AS (SELECT *, substr(md5('cur|' || doc_id::VARCHAR), 1, 8) shuffle_key
         |       FROM st)
         |SELECT doc_id, quality_score, stage,
         |       CAST(row_number() OVER (PARTITION BY stage
         |         ORDER BY shuffle_key, doc_id) AS BIGINT) AS stage_pos
         |FROM sk ORDER BY stage, stage_pos""".stripMargin,

    "p1_stratified_sample" ->
      s"""SELECT doc_id, lang,
         |       ('0x' || substr(md5(lang || '|' || doc_id::VARCHAR), 1, 8))::BIGINT
         |         % $SampleBuckets AS bucket
         |FROM documents
         |WHERE ('0x' || substr(md5(lang || '|' || doc_id::VARCHAR), 1, 8))::BIGINT
         |        % $SampleBuckets = 0
         |ORDER BY doc_id""".stripMargin,

    "p2_token_packing" ->
      s"""WITH t AS (SELECT doc_id,
         |             CAST(len(string_split(lower(text), ' ')) AS BIGINT) n_toks
         |           FROM documents),
         |r AS (SELECT doc_id, n_toks,
         |        coalesce(sum(n_toks) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) tok_before
         |      FROM t)
         |SELECT doc_id, n_toks, CAST(tok_before // $PackBudget AS BIGINT) AS shard
         |FROM r ORDER BY doc_id""".stripMargin,

    "p3_chunk" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks FROM documents),
         |s AS (SELECT doc_id, toks, len(toks) n,
         |        unnest(range(0, len(toks), $ChunkStride)) st
         |      FROM t)
         |SELECT doc_id,
         |       CAST(st // $ChunkStride AS BIGINT) AS chunk_idx,
         |       CAST(st AS BIGINT) AS start,
         |       CAST(least($ChunkSize, n - st) AS BIGINT) AS chunk_len,
         |       array_to_string(list_slice(toks, st + 1, st + least($ChunkSize, n - st)), ' ')
         |         AS chunk_text
         |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    "p4_split" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |         ('0x' || substr(md5('split|' || doc_id::VARCHAR), 1, 8))::BIGINT
         |           % $SplitBuckets AS bucket
         |  FROM documents)
         |SELECT doc_id, bucket,
         |       CASE WHEN bucket < ${SplitBuckets - 2} THEN 'train'
         |            WHEN bucket = ${SplitBuckets - 2} THEN 'val'
         |            ELSE 'test' END AS split
         |FROM b ORDER BY doc_id""".stripMargin,

    "p5_mixture" ->
      s"""WITH b AS (
         |  SELECT source,
         |         200 + (CAST(substr(source, 4) AS BIGINT) % 4) * 200 AS rate_millis,
         |         CASE WHEN ('0x' || substr(md5('mix|' || doc_id::VARCHAR), 1, 8))::BIGINT
         |                   % $MixtureBuckets
         |                 < 200 + (CAST(substr(source, 4) AS BIGINT) % 4) * 200
         |              THEN 1 ELSE 0 END AS keep
         |  FROM documents)
         |SELECT source, rate_millis, count(*) AS n_total,
         |       CAST(sum(keep) AS BIGINT) AS n_kept,
         |       round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS achieved_rate
         |FROM b GROUP BY source, rate_millis ORDER BY source""".stripMargin,

    "p7_manifest" -> (duckManifestSql + "\nORDER BY split, shard"),

    // p22 nests the p7 manifest as a CTE and plans bins over it with the
    // p2 exclusive-prefix rule — an independent window formulation vs
    // the engine's manifest reuse.
    "p22_compaction_plan" ->
      s"""WITH m AS ($duckManifestSql),
         |r AS (SELECT split, shard, n_chunks, n_tokens,
         |        coalesce(sum(n_tokens) OVER (PARTITION BY split ORDER BY shard
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) tok_before
         |      FROM m),
         |b AS (SELECT split, shard, n_chunks, n_tokens,
         |        CAST(tok_before // $CompactTarget AS BIGINT) bin FROM r)
         |SELECT split, bin, count(*) AS n_input_shards,
         |       min(shard) AS first_shard, max(shard) AS last_shard,
         |       CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
         |       CAST(sum(n_tokens) AS BIGINT) AS out_tokens
         |FROM b GROUP BY split, bin ORDER BY split, bin""".stripMargin,

    "p6_zorder" -> {
      val duckZ = (0 until ZBits).map { i =>
        s"((ux // ${1 << i}) % 2) * ${1L << (2 * i + 1)} + " +
          s"((dyn // ${1 << i}) % 2) * ${1L << (2 * i)}"
      }.mkString(" + ")
      s"""WITH b AS (
         |  SELECT event_id, user_id % 256 AS ux,
         |         CAST(extract(day FROM ts) - 1 AS BIGINT) AS dy
         |  FROM events),
         |n AS (SELECT event_id, ux, dy, dy * 255 // 30 AS dyn FROM b),
         |z AS (SELECT event_id, ux, dy, $duckZ AS z FROM n),
         |f AS (SELECT ux, dy,
         |        CAST(ntile($ZFiles) OVER (ORDER BY z, event_id) AS BIGINT) AS file
         |      FROM z)
         |SELECT file, count(*) AS n,
         |       min(ux) AS u_min, max(ux) AS u_max,
         |       min(dy) AS d_min, max(dy) AS d_max
         |FROM f GROUP BY file ORDER BY file""".stripMargin
    }
  )
}
