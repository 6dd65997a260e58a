package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column queries: `documents.text` bytes stand in for media
  * payloads (the container has no codecs — see [[Multimodal]]); the
  * binary-column plumbing, metadata schema and typed decode path are real.
  */
object MultimodalQueries {

  /** m1 — binary payload metadata projection (expression path). */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("digest"),
        (col("n_chars") % 64 + 1).as("fake_width"),
        (col("n_chars") % 48 + 1).as("fake_height"))
      .orderBy("doc_id")

  /** m2 — typed mapPartitions decode path ([[Multimodal.decodeMeta]]);
    * the stub derives dimensions from payload header bytes, which the
    * oracle reproduces via ascii() on the (ASCII) text column. */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    Multimodal.decodeMeta(spark, payloads)
      .toDF()
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("channels").cast("long").as("channels"), col("n_bytes"))
      .orderBy("doc_id")
  }

  /** m3 — typed feature-extraction path ([[Multimodal.extractFeatures]]):
    * payload → fixed-dim vector (stride-mean stub standing in for an
    * encoder), rounded by the engine so the oracle's rounding matches. */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    val payloads = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    Multimodal.extractFeatures(spark, payloads)
      .toDF()
      .select(col("doc_id") +: (0 until 8).map(k => round(col(s"f$k"), 6).as(s"f$k")): _*)
      .orderBy("doc_id")
  }

  /** m4 — frame sampling: slice each payload into fixed 16-byte "frames",
    * keep every 2nd (the video keyframe-sampling shape: one row in, N
    * sampled frames out, payload bytes never shuffled before sampling). */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("nf", ceil(length(col("payload")) / lit(16.0)).cast("int"))
      // nf=0 would make sequence(0, nf-1) the DESCENDING array [0,-1] and
      // emit a spurious zero-length frame; the oracle's range(0,0) emits none.
      .where(col("nf") > 0)
      .select(col("doc_id"), explode(expr(
        "filter(transform(sequence(0, nf-1), " +
          "i -> struct(i as idx, substring(payload, i*16+1, 16) as fb)), " +
          "x -> x.idx % 2 = 0)")).as("f"))
      .select(col("doc_id"),
        col("f.idx").cast("long").as("frame_idx"),
        md5(col("f.fb")).as("frame_md5"),
        length(col("f.fb")).cast("long").as("frame_len"))
      .orderBy("doc_id", "frame_idx")

  /** m5 — resize: stride-2 decimation of the payload (every 2nd byte
    * dropped — the downsample-by-2 stub; a real resize swaps in a codec
    * scaler). Emits the new size and a digest of the resized bytes so the
    * transformation itself is verified, not just its metadata. */
  def resizeStub(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("rz", regexp_replace(col("text"), "(.).", "$1"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("orig_bytes"),
        length(col("rz")).cast("long").as("resized_bytes"),
        md5(col("rz").cast("binary")).as("resized_md5"))
      .orderBy("doc_id")

  /** m6 — perceptual hash (aHash shape) for image dedup: sample a fixed
    * 16-"pixel" grid from the payload (stride positions over the byte
    * stream — a real implementation reads the decoded downscaled
    * grayscale), threshold each pixel against the grid mean, pack the
    * bits. The mean comparison is `16*p > sum` so the whole hash is exact
    * integer arithmetic on both engines. Per-hash group counts ride along
    * — equal-phash groups are the image-dedup candidate buckets (hamming
    * widening = d7's flip-enumeration on this column). */
  val PhashBits = 16

  /** The (doc_id, phash16) projection shared by m6 (group counts) and m13
    * (hamming pairs) — a cheap narrow scan, recomputed per call. */
  private def phashBase(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .withColumn("n", length(col("text")))
    val withPix = (0 until PhashBits).foldLeft(base) { (d, i) =>
      d.withColumn(s"p$i", expr(
        s"ascii(substr(text, cast((($i * n) div $PhashBits) + 1 as int), 1))"))
    }
    val ps = (0 until PhashBits).map(i => s"p$i").mkString(" + ")
    val bits = (0 until PhashBits)
      .map(i => s"(CASE WHEN $PhashBits * p$i > ps THEN ${1 << i} ELSE 0 END)")
      .mkString(" + ")
    withPix.withColumn("ps", expr(ps))
      .withColumn("phash16", expr(bits).cast("long"))
      .select(col("doc_id"), col("phash16"))
  }

  def phash(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    phashBase(spark, dir)
      .select(col("doc_id"), col("phash16"),
        count(lit(1)).over(Window.partitionBy(col("phash16")))
          .cast("long").as("n_same_hash"))
      .orderBy("doc_id")
  }

  /** m13 — perceptual near-duplicate pairs: payloads whose perceptual
    * hashes differ by at most [[PhashMaxHamming]] bit — the image-dedup
    * candidate generator (a re-encoded/slightly-cropped image keeps an
    * almost-identical phash). The d7 flip-enumeration algebra on the m6
    * hash column: distance-0 pairs from an equi-join on the full hash,
    * distance-1 from joining each hash against every one-bit FLIP-DOWN
    * of the other — never a bit_count over all pairs, so the work is
    * bucket-join-shaped and scales like the hash cardinality, not n².
    * The DuckDB oracle states the naive all-pairs bit_count formulation,
    * proving the flip algebra result-identical. */
  val PhashMaxHamming = 1
  def phashPairs(spark: SparkSession, dir: String): DataFrame = {
    val h = phashBase(spark, dir)
    val same = h.as("a")
      .join(h.as("b"),
        col("a.phash16") === col("b.phash16") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    val flips = (0 until PhashBits)
      .map(b => s"phash16 ^ ${1 << b}").mkString(", ")
    val flipped = h
      .select(col("doc_id"), col("phash16"),
        explode(expr(s"array($flips)")).as("fkey"))
      // keep only flips that CLEAR a bit: for a distance-1 pair the lower
      // hash equals exactly one flip-down of the higher one (d7's rule)
      .filter(col("fkey") < col("phash16"))
    val dist1 = h.as("a")
      .join(flipped.as("b"), col("a.phash16") === col("b.fkey"))
      .select(
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        lit(1L).as("hamming"))
    same.unionAll(dist1).orderBy("doc_a", "doc_b")
  }

  /** m7 — aspect-ratio bucketing: group images by shape class (tall /
    * square / wide from the m2 header-stub dimensions), pack each bucket
    * into fixed [[AspectBatch]]-image batches in doc_id order, and report
    * each batch's canvas (max w × max h) and padding waste — the
    * batch-shape homogenization an image-training pipeline runs so a
    * batch shares one resolution and pad-to-canvas cost stays low
    * (SDXL-style aspect bucketing).
    *
    * Bucket edges are exact integer cross-products (4w<3h / 3w>4h), so
    * both engines classify identically — no float ratio at the boundary.
    * Batch numbering is [[graft.ops.RankOps.withGroupRank]] — a bucket is
    * one reducer's worth of data under a plain PARTITION BY window (3
    * buckets total!), so the within-bucket rank runs as a distributed
    * global rank minus broadcast bucket offsets instead. */
  val AspectBatch = 32
  def aspectBuckets(spark: SparkSession, dir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val b = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        expr("ascii(substr(text, 1, 1)) % 64 + 1").as("w"),
        expr("ascii(substr(text, 2, 1)) % 48 + 1").as("h"))
      .withColumn("bucket", expr(
        "CASE WHEN 4 * w < 3 * h THEN 'tall' WHEN 3 * w > 4 * h THEN 'wide' " +
          "ELSE 'square' END"))
    graft.ops.RankOps.withGroupRank(b, par, "__r", Seq("bucket"), Seq(col("doc_id")))
      .withColumn("batch_idx", expr(s"CAST(__r div $AspectBatch AS BIGINT)"))
      .groupBy(col("bucket"), col("batch_idx"))
      .agg(
        count(lit(1)).as("n_imgs"),
        max(col("w")).cast("long").as("w_max"),
        max(col("h")).cast("long").as("h_max"),
        sum(expr("w * h")).cast("long").as("area_sum"))
      // waste = batch canvas area minus actual pixels (what pad-to-canvas
      // burns); derived after the agg so it's one pass over the batch.
      .withColumn("pad_waste",
        col("n_imgs") * col("w_max") * col("h_max") - col("area_sum"))
      .drop("area_sum")
      .orderBy("bucket", "batch_idx")
  }

  /** m8 — frame energy profile (the audio-feature stub): slice the
    * payload into m4's 16-byte frames, compute each frame's energy as the
    * integer sum of squared byte values (a real pipeline swaps in decoded
    * PCM RMS — the frame/window plumbing is identical), and report the
    * per-doc profile: frame count, total energy, and the peak frame
    * (ties to the earliest index). Pure integer arithmetic end-to-end,
    * one explode + one per-doc aggregate. */
  /** (doc_id, frame_idx, energy) for every 16-byte frame — shared by the
    * m8 profile and m9's run detection. */
  private def framesWithEnergy(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("n", length(col("text")))
      .where(col("n") > 0)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, cast(ceil(n / 16.0) as int) - 1), " +
          "i -> struct(i as idx, substr(text, i * 16 + 1, 16) as fb))")).as("f"))
      .select(col("doc_id"), col("f.idx").cast("long").as("frame_idx"),
        expr("aggregate(transform(sequence(1, length(f.fb)), " +
          "i -> ascii(substr(f.fb, i, 1))), cast(0 as bigint), " +
          "(acc, x) -> acc + cast(x as bigint) * x)").as("energy"))

  def frameEnergy(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = framesWithEnergy(spark, dir)
    frames
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("energy").desc, col("frame_idx").asc)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(col("energy")).as("total_energy"),
        max(when(col("rk") === 1, col("frame_idx"))).as("peak_idx"),
        max(when(col("rk") === 1, col("energy"))).as("peak_energy"))
      .orderBy("doc_id")
  }

  /** m9 — quiet-run detection (voice-activity / black-frame trimming, on
    * the stub energy signal): consecutive frames whose energy sits below
    * [[QuietThreshold]] form a run; per payload, report how many runs,
    * the longest one, and where it starts (ties to the earliest start) —
    * the spans a media-curation pipeline trims or splits on.
    *
    * Gaps-and-islands inside the frame stream: quiet frames key by
    * `frame_idx − row_number()` (constant exactly within a consecutive
    * run), runs reduce by key, the per-doc summary is `max_by` — the
    * only per-doc ordering work rides the balanced (doc, frame) window,
    * payload bytes themselves never shuffle. */
  val QuietThreshold = 150000L
  def quietRuns(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE tree, not a totals-subtree joined to a runs-subtree (that shape
    // re-executes the whole per-byte energy fold): every frame flows
    // through one window pass; quiet frames get an island key
    // (frame_idx − running quiet count, constant within a consecutive
    // run), loud frames share the NULL island. The (doc, isl) rollup
    // then carries both the run structure (non-null islands) and the
    // totals (all islands) into one final per-doc aggregate.
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    framesWithEnergy(spark, dir)
      .withColumn("quiet", col("energy") < QuietThreshold)
      .withColumn("isl", when(col("quiet"),
        col("frame_idx") - sum(when(col("quiet"), 1L).otherwise(0L)).over(w)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(count(lit(1)).as("cnt"), min(col("frame_idx")).as("run_start"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_frames"),
        sum(when(col("isl").isNotNull, col("cnt")).otherwise(0L)).as("quiet_frames"),
        count(col("isl")).as("n_runs"),
        coalesce(max(when(col("isl").isNotNull, col("cnt"))), lit(0L))
          .as("longest_run"),
        max_by(when(col("isl").isNotNull, col("run_start")),
          struct(coalesce(when(col("isl").isNotNull, col("cnt")), lit(-1L)),
            -col("run_start"))).as("longest_start"))
      .orderBy("doc_id")
  }

  /** m10 — scene-cut detection (the shot-boundary stub): a cut is a
    * frame whose energy jumps by more than [[CutThreshold]] (~p95 of
    * frame deltas) from its predecessor — the thresholded-frame-difference
    * detector every video ingest pipeline runs before per-shot sampling,
    * on the same 16-byte stub frames as m8/m9 (a real pipeline swaps in
    * decoded luma histograms; the lag/threshold/segment plumbing is
    * identical). Per payload: cut count, first cut, max delta, and the
    * resulting segment count. One per-doc window over the frame stream +
    * one aggregate — frames never leave their doc partition. */
  val CutThreshold = 40000L
  def sceneCuts(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx").asc)
    framesWithEnergy(spark, dir)
      .withColumn("delta", abs(col("energy") - lag(col("energy"), 1).over(w)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("delta") > CutThreshold, 1L).otherwise(0L)).as("n_cuts"),
        min(when(col("delta") > CutThreshold, col("frame_idx"))).as("first_cut_idx"),
        max(col("delta")).as("max_delta"))
      .withColumn("n_segments", col("n_cuts") + lit(1L))
      .orderBy("doc_id")
  }

  /** m11 — content-defined chunking (the CAS/backup dedup shape): each
    * payload splits at positions where a 4-byte polynomial rolling hash
    * hits `≡ 0 (mod 16)` — boundaries follow CONTENT, not offsets, so an
    * insertion early in a payload shifts only the chunk it lands in and
    * every later chunk still fingerprints identically (the property that
    * makes chunk-level dedup survive edits, unlike m4's fixed frames).
    * Per doc: chunk count, bytes, how many of its chunks also occur in
    * some other document, and that as an integer ppm share — the
    * storage-dedup savings estimate.
    *
    * All byte math is `ascii(substr(...))` integer arithmetic through
    * SQL higher-order functions — engine-identical, and one narrow
    * projection per document until the small (fp → doc count) aggregate
    * joins back; payload bytes shuffle only as their chunk fingerprints. */
  val CdcWindow = 4
  val CdcMask = 16
  /** The CDC chunk frame `(doc_id, start, len, fp)` — the CAS store's
    * ingest view. CPU-dominant (the per-byte rolling hash), and probed
    * twice inside m11's own DAG (chunk side + fingerprint-df side) plus
    * by m15's store rollup — so it is built once per (session, dir) and
    * checkpointed like the dedup/text indexes (freed by
    * [[clearCaches]]). */
  private val caches = new DirCaches
  private val chunkCache = caches.newCache()
  private val rareChunkCache = caches.newCache()
  def clearCaches(): Unit = caches.clear()

  private def chunkFrame(spark: SparkSession, dir: String): DataFrame = {
    caches.evictOtherDirs(spark, dir)
    chunkCache.getOrElseUpdate((spark, dir), chunkFrameBuild(spark, dir).localCheckpoint())
  }

  private def chunkFrameBuild(spark: SparkSession, dir: String): DataFrame = {
    val B1 = 31 * 31 * 31; val B2 = 31 * 31; val B3 = 31
    // Two performance traps, both measured in the hundreds of seconds at
    // sf0.1 before being designed out:
    //  (1) ascii(substr(text, i, 1)) inside the position lambda is O(i)
    //      per call (UTF8String re-scans to the char offset) — the
    //      boundary pass goes O(n²) per document. So the byte codes
    //      materialize once as an array and positions read element_at.
    //  (2) a `withColumn` alias for that array gets INLINED by
    //      CollapseProject into every lambda reference, re-evaluating the
    //      whole array build per element — same O(n²), sneakier. A
    //      1-element `transform(array(<expensive>), x -> ...)` is the
    //      SQL LET: the input evaluates exactly once and the lambda var
    //      is a cheap bound attribute. Both bindings below use it.
    val rolling = s"(element_at(codes, cast(i as int) - 3) * $B1 + " +
      s"element_at(codes, cast(i as int) - 2) * $B2 + " +
      s"element_at(codes, cast(i as int) - 1) * $B3 + " +
      s"element_at(codes, cast(i as int)))"
    // sequence(lo, hi) runs DESCENDING when hi < lo (the m4 trap): docs
    // shorter than the window get no hash positions, only the final
    // boundary.
    val endsExpr =
      s"""element_at(transform(array(transform(split(text, '') , c -> ascii(c))),
         |  codes -> array_distinct(concat(
         |    case when size(codes) >= $CdcWindow then
         |      filter(sequence(${CdcWindow}L, size(codes)), i -> $rolling % $CdcMask = 0)
         |    else cast(array() as array<bigint>) end,
         |    array(cast(size(codes) as bigint))))), 1)""".stripMargin
    val spansExpr =
      s"""element_at(transform(array($endsExpr),
         |  ends -> transform(ends, (e, k) -> struct(
         |    case when k = 0 then 1L else element_at(ends, k) + 1L end as s,
         |    e as e))), 1)""".stripMargin
    Tables.load(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      // single-row-group fixture → one input split; the per-byte rolling
      // hash is the whole cost, so fan out before it (see levenshteinPairs)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), col("text"), explode(expr(spansExpr)).as("sp"))
      .select(col("doc_id"),
        col("sp.s").as("start"), (col("sp.e") - col("sp.s") + 1L).as("len"),
        expr("md5(substr(text, cast(sp.s as int), cast(sp.e - sp.s + 1 as int)))")
          .as("fp"))
  }

  def cdcChunks(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunkFrame(spark, dir)
    // how many documents contain each chunk fingerprint — the CAS index
    val fpDocs = chunks.select(col("fp"), col("doc_id")).distinct()
      .groupBy(col("fp")).agg(count(lit(1)).as("n_docs"))
    chunks.join(fpDocs, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("len")).as("n_bytes"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .withColumn("shared_ppm", expr("n_shared * 1000000L div n_chunks"))
      .orderBy("doc_id")
  }

  /** m15 — CAS chunk-store savings rollup: the store-level view of m11's
    * per-document profile — logical chunks/bytes as ingested vs unique
    * chunks/bytes actually stored, and the dedup savings in exact ppm.
    * This single row is the headline number a content-addressed payload
    * store reports ("the corpus dedups to X% of its logical size") and
    * the go/no-go input for enabling CDC dedup on an ingest path.
    *
    * Cost: two aggregates over the cached chunk frame (one distinct on
    * the fingerprint — the same shuffle width as the CAS index build);
    * payload bytes never move, only fingerprints. */
  def casSavings(spark: SparkSession, dir: String): DataFrame = {
    val chunks = chunkFrame(spark, dir)
    val logical = chunks.agg(
      count(lit(1)).as("logical_chunks"),
      sum(col("len")).as("logical_bytes"))
    val stored = chunks.groupBy(col("fp"))
      .agg(min(col("len")).as("len"))
      .agg(count(lit(1)).as("stored_chunks"), sum(col("len")).as("stored_bytes"))
    logical.crossJoin(stored)
      .withColumn("savings_ppm", expr(
        "cast((cast(logical_bytes - stored_bytes as decimal(38,0)) * 1000000) " +
          "div logical_bytes as bigint)"))
  }

  /** m12 — payload byte-entropy profile: Shannon entropy (nats) of each
    * payload's byte histogram — the compressibility/corruption gate a
    * media-curation pipeline runs before decode. Near-zero entropy means
    * padding/black frames/stuck encoders; near-maximal (ln 256 ≈ 5.55)
    * means encrypted or noise payloads — both get quarantined before
    * they waste decoder time.
    *
    * Per doc the histogram folds over the payload's OWN distinct byte
    * values (≤ 256, so O(n·|alphabet|) per row, embarrassingly
    * parallel) — no (doc, byte) explode, no shuffle; the byte-codes
    * array materializes once via the m11 LET discipline. Per-count
    * ln c is rounded to 6 then quantized to micro-units (t10's float
    * discipline), so `sum_clnc_micro` is an exact integer and the
    * emitted entropy `H = ln n − (Σ c·ln c)/n` evaluates one identical
    * float expression tree on both engines. */
  def byteEntropy(spark: SparkSession, dir: String): DataFrame = {
    val statsExpr =
      """element_at(transform(array(transform(split(text, ''), c -> ascii(c))),
        |  codes -> element_at(transform(array(array_distinct(codes)),
        |    db -> struct(
        |      cast(size(codes) as bigint) as n_bytes,
        |      cast(size(db) as bigint) as n_distinct,
        |      aggregate(transform(db, v -> cast(size(filter(codes, x -> x = v)) as bigint)),
        |        cast(0 as bigint),
        |        (acc, c) -> acc + c * cast(round(round(ln(c), 6) * 1000000.0D, 0) as bigint))
        |        as sum_clnc_micro)), 1)), 1)""".stripMargin
    Tables.load(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      // per-byte CPU-bound over a single-row-group fixture: fan out first
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), expr(statsExpr).as("st"))
      .select(col("doc_id"), col("st.n_bytes").as("n_bytes"),
        col("st.n_distinct").as("n_distinct"),
        col("st.sum_clnc_micro").as("sum_clnc_micro"))
      .withColumn("entropy", round(
        expr("round(ln(n_bytes), 6) - sum_clnc_micro / 1000000.0D / n_bytes"), 6))
      .orderBy("doc_id")
  }

  /** m14 — lead/tail silence trim (the VAD-style boundary cut): per
    * payload, find the FIRST and LAST frame at-or-above the m9 energy
    * threshold and report how many leading/trailing quiet frames a trim
    * would drop and how many frames survive. m9 reports interior quiet
    * runs (split points); m14 is the complementary edge operation every
    * audio/video ingest applies before chunking — leading/trailing
    * silence is storage with zero training signal. An all-quiet payload
    * trims to zero frames (`first_loud`/`last_loud` NULL).
    *
    * Shape: the frame explode feeds ONE conditional min/max aggregate —
    * no window, no second scan; the trim arithmetic is a 500-row
    * projection on the aggregate output. */
  def silenceTrim(spark: SparkSession, dir: String): DataFrame =
    framesWithEnergy(spark, dir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        min(when(col("energy") >= QuietThreshold, col("frame_idx")))
          .as("first_loud"),
        max(when(col("energy") >= QuietThreshold, col("frame_idx")))
          .as("last_loud"))
      .withColumn("kept_frames",
        coalesce(col("last_loud") - col("first_loud") + 1, lit(0L)))
      .withColumn("trim_lead", coalesce(col("first_loud"), col("n_frames")))
      .withColumn("trim_tail", when(col("last_loud").isNull, 0L)
        .otherwise(col("n_frames") - 1 - col("last_loud")))
      .orderBy("doc_id")

  /** The m11/m15 chunking as portable SQL — both oracles share this CTE
    * chain verbatim (ends with the `fp` frame of (doc_id, len, fp)). */
  private lazy val duckChunkSql: String = {
    val rolling = "(ascii(substr(text, CAST(i - 3 AS INT), 1)) * 29791 + " +
      "ascii(substr(text, CAST(i - 2 AS INT), 1)) * 961 + " +
      "ascii(substr(text, CAST(i - 1 AS INT), 1)) * 31 + " +
      "ascii(substr(text, CAST(i AS INT), 1)))"
    s"""b0 AS (
       |  SELECT doc_id, text,
       |         list_filter(range(${CdcWindow}, length(text) + 1),
       |                     i -> $rolling % $CdcMask = 0) bounds
       |  FROM documents WHERE length(text) > 0),
       |b AS (
       |  SELECT doc_id, text,
       |         CASE WHEN len(bounds) > 0
       |                   AND bounds[-1] = CAST(length(text) AS BIGINT)
       |              THEN bounds
       |              ELSE list_concat(bounds, [CAST(length(text) AS BIGINT)])
       |         END ends
       |  FROM b0),
       |sp AS (
       |  SELECT doc_id, text, unnest(range(1, len(ends) + 1)) k, ends
       |  FROM b),
       |ch AS (
       |  SELECT doc_id,
       |         CASE WHEN k = 1 THEN 1 ELSE ends[CAST(k - 1 AS INT)] + 1 END s,
       |         ends[CAST(k AS INT)] e
       |  FROM sp),
       |fp AS (
       |  SELECT doc_id, e - s + 1 AS len,
       |         md5(substr(text, CAST(s AS INT), CAST(e - s + 1 AS INT))) AS fp
       |  FROM ch JOIN b USING (doc_id))""".stripMargin
  }

  /** m16 — CAS chunk-level near-dup pairs: payload pairs sharing at
    * least [[MinSharedChunks]] content-defined chunks, scored by chunk
    * containment (`shared / min(|A|, |B|)` in exact ppm) — the binary-
    * payload near-dup detector (partial re-uploads, appended variants,
    * embedded copies) that token-shingle dedup (d3/d4) cannot see.
    * Chunks with document frequency above [[MaxChunkDf]] are dropped
    * before pairing — ubiquitous boilerplate chunks don't discriminate
    * AND their posting lists are the quadratic fanout risk, the same
    * df-cap discipline as d4's prefix filter. Candidates come from the
    * inverted-index self-join on the chunk fingerprint over the cached
    * chunk frame; count frames join co-partitioned on doc id with no
    * broadcast hint (they are corpus-scale). */
  val MinSharedChunks = 2L
  val MaxChunkDf = 50L
  /** The df-capped candidate build behind m16's cached frame — the
    * quadratic-fanout guard lives HERE, before any pairing; exposed
    * un-checkpointed so PlanAuditSpec can pin the cap in the build
    * plan (the checkpoint hides it from the query's own explain). */
  private def rareChunksBuild(ch: DataFrame): DataFrame =
    ch.join(
      ch.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= MaxChunkDf).select(col("fp")), "fp")

  /** Audit hook: the m16 candidate frame's build plan (no checkpoint). */
  def rareChunksForAudit(spark: SparkSession, dir: String): DataFrame =
    rareChunksBuild(chunkFrame(spark, dir).select(col("doc_id"), col("fp")).distinct())

  def chunkPairs(spark: SparkSession, dir: String): DataFrame = {
    val ch = chunkFrame(spark, dir).select(col("doc_id"), col("fp")).distinct()
    val counts = ch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
    // both self-join branches read this frame — materialize the
    // distinct + df-cap ONCE instead of paying it per branch (a
    // (doc_id, fp) pair list, ~16 bytes/chunk; cached per (session, dir)
    // under the module's eviction/teardown discipline)
    val rare = rareChunkCache.getOrElseUpdate((spark, dir),
      rareChunksBuild(ch).localCheckpoint())
    rare.as("a")
      .join(rare.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedChunks)
      .join(counts.select(col("doc_id").as("doc_a"), col("n_chunks").as("n_a")), "doc_a")
      .join(counts.select(col("doc_id").as("doc_b"), col("n_chunks").as("n_b")), "doc_b")
      .withColumn("containment_ppm", expr(
        "cast((cast(n_shared as decimal(38,0)) * 1000000) div least(n_a, n_b) as bigint)"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"),
        col("n_b"), col("containment_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  /** m17 — container sniffing by magic bytes: classify every binary
    * payload by its leading signature (RIFF / PNG / ID3 / ftyp, else
    * unknown) and report the per-source container mix (row counts and
    * byte mass; the unknown rows are the quarantine set) — the first
    * gate of any multimodal
    * ingest (dispatch to the right decoder, quarantine unrecognized
    * blobs) run as a pure projection: the sniff reads a 4-byte prefix,
    * classification is a literal CASE over its hex, and the only wide op
    * is the (source × container)-row aggregate. Magic prefixes are
    * synthesized deterministically onto the fixture payloads
    * (`doc_id % 5` picks the container; one class stays bare = unknown)
    * so both engines see identical bytes.
    *
    * Scale shape: payload bytes never shuffle — the prefix hex and
    * container label are extracted in the scan projection; at 100 TB
    * this is a free rider on the ingest pass (the m1 discipline). */
  def magicSniff(spark: SparkSession, dir: String): DataFrame = {
    val payload = Tables.load(spark, dir, "documents")
      .withColumn("magic", expr(
        "CASE cast(doc_id % 5 as int) " +
          "WHEN 0 THEN X'52494646' " +  // 'RIFF'
          "WHEN 1 THEN X'89504E47' " +  // PNG
          "WHEN 2 THEN X'494433' " +    // 'ID3'
          "WHEN 3 THEN X'66747970' " +  // 'ftyp'
          "ELSE X'' END"))
      .withColumn("payload", concat(col("magic"), col("text").cast("binary")))
    payload
      .withColumn("pfx", upper(hex(expr("substring(payload, 1, 4)"))))
      .withColumn("container", expr(
        "CASE WHEN pfx LIKE '52494646%' THEN 'riff' " +
          "WHEN pfx LIKE '89504E47%' THEN 'png' " +
          "WHEN pfx LIKE '494433%' THEN 'id3' " +
          "WHEN pfx LIKE '66747970%' THEN 'ftyp' " +
          "ELSE 'unknown' END"))
      .groupBy(col("source"), col("container"))
      .agg(count(lit(1)).as("n_payloads"),
        sum(length(col("payload")).cast("long")).as("total_bytes"))
      .orderBy("source", "container")
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m17_magic_sniff" -> ((s, d) => magicSniff(s, d)),
    "m16_chunk_pairs" -> ((s, d) => chunkPairs(s, d)),
    "m15_cas_savings" -> ((s, d) => casSavings(s, d)),
    "m14_silence_trim" -> ((s, d) => silenceTrim(s, d)),
    "m12_byte_entropy" -> ((s, d) => byteEntropy(s, d)),
    "m11_cdc_chunks" -> ((s, d) => cdcChunks(s, d)),
    "m10_scene_cuts" -> ((s, d) => sceneCuts(s, d)),
    "m9_quiet_runs" -> ((s, d) => quietRuns(s, d)),
    "m8_frame_energy" -> ((s, d) => frameEnergy(s, d)),
    "m7_aspect_buckets" -> ((s, d) => aspectBuckets(s, d)),
    "m13_phash_pairs" -> ((s, d) => phashPairs(s, d)),
    "m6_phash" -> ((s, d) => phash(s, d)),
    "m1_multimodal_meta" -> ((s, d) => multimodalMeta(s, d)),
    "m2_multimodal_decode" -> ((s, d) => multimodalDecode(s, d)),
    "m3_multimodal_features" -> ((s, d) => multimodalFeatures(s, d)),
    "m4_frame_sample" -> ((s, d) => frameSample(s, d)),
    "m5_resize" -> ((s, d) => resizeStub(s, d))
  )

  // lazy: oracle SQL bodies cross-reference sibling modules (t27→Dedup,
  // s24→Text…); eager Maps would make object-init order a correctness
  // hazard (NPE on whichever module clinit runs first).
  lazy val oracles: Map[String, String] = Map(
    "m17_magic_sniff" ->
      """WITH p AS (
        |  SELECT source,
        |         (CASE CAST(doc_id % 5 AS INT)
        |            WHEN 0 THEN '\x52\x49\x46\x46'::BLOB
        |            WHEN 1 THEN '\x89\x50\x4E\x47'::BLOB
        |            WHEN 2 THEN '\x49\x44\x33'::BLOB
        |            WHEN 3 THEN '\x66\x74\x79\x70'::BLOB
        |            ELSE ''::BLOB END) || encode(text) AS payload
        |  FROM documents),
        |c AS (SELECT source, payload,
        |        substr(upper(hex(payload)), 1, 8) pfx
        |      FROM p),
        |k AS (SELECT source, octet_length(payload) nb,
        |        CASE WHEN pfx LIKE '52494646%' THEN 'riff'
        |             WHEN pfx LIKE '89504E47%' THEN 'png'
        |             WHEN pfx LIKE '494433%' THEN 'id3'
        |             WHEN pfx LIKE '66747970%' THEN 'ftyp'
        |             ELSE 'unknown' END AS container
        |      FROM c)
        |SELECT source, container, count(*) AS n_payloads,
        |       CAST(sum(nb) AS BIGINT) AS total_bytes
        |FROM k GROUP BY source, container
        |ORDER BY source, container""".stripMargin,
    "m16_chunk_pairs" ->
      s"""WITH $duckChunkSql,
         |cd AS (SELECT DISTINCT doc_id, fp FROM fp),
         |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_chunks
         |        FROM cd GROUP BY 1),
         |rare AS (SELECT cd.doc_id, cd.fp FROM cd
         |         JOIN (SELECT fp FROM cd GROUP BY fp
         |               HAVING count(*) <= $MaxChunkDf) r USING (fp)),
         |pr AS (SELECT a.doc_id doc_a, b.doc_id doc_b,
         |         CAST(count(*) AS BIGINT) n_shared
         |       FROM rare a JOIN rare b
         |         ON a.fp = b.fp AND a.doc_id < b.doc_id
         |       GROUP BY 1, 2
         |       HAVING count(*) >= $MinSharedChunks)
         |SELECT doc_a, doc_b, n_shared,
         |       ca.n_chunks AS n_a, cb.n_chunks AS n_b,
         |       CAST(CAST(n_shared AS HUGEINT) * 1000000
         |            // least(ca.n_chunks, cb.n_chunks) AS BIGINT)
         |         AS containment_ppm
         |FROM pr JOIN cnt ca ON ca.doc_id = pr.doc_a
         |        JOIN cnt cb ON cb.doc_id = pr.doc_b
         |ORDER BY doc_a, doc_b""".stripMargin,

    "m14_silence_trim" ->
      s"""WITH g AS (
         |  SELECT doc_id, text,
         |         unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) i
         |  FROM documents WHERE length(text) > 0),
         |fr AS (SELECT doc_id, i frame_idx,
         |         substr(text, CAST(i * 16 + 1 AS INT), 16) fb
         |       FROM g),
         |en AS (SELECT doc_id, frame_idx,
         |         CAST(list_aggregate(list_transform(range(1, len(fb) + 1),
         |           j -> ascii(substr(fb, CAST(j AS INT), 1))
         |                * ascii(substr(fb, CAST(j AS INT), 1))), 'sum') AS BIGINT) energy
         |       FROM fr),
         |ag AS (SELECT doc_id, count(*) n_frames,
         |         min(CASE WHEN energy >= $QuietThreshold THEN frame_idx END)
         |           first_loud,
         |         max(CASE WHEN energy >= $QuietThreshold THEN frame_idx END)
         |           last_loud
         |       FROM en GROUP BY doc_id)
         |SELECT doc_id, n_frames, first_loud, last_loud,
         |       CAST(coalesce(last_loud - first_loud + 1, 0) AS BIGINT)
         |         AS kept_frames,
         |       CAST(coalesce(first_loud, n_frames) AS BIGINT) AS trim_lead,
         |       CAST(CASE WHEN last_loud IS NULL THEN 0
         |            ELSE n_frames - 1 - last_loud END AS BIGINT) AS trim_tail
         |FROM ag ORDER BY doc_id""".stripMargin,

    "m12_byte_entropy" ->
      """WITH t AS (SELECT doc_id,
        |        list_transform(string_split(text, ''), c -> ascii(c)) codes
        |      FROM documents WHERE length(text) > 0),
        |s AS (SELECT doc_id,
        |        CAST(len(codes) AS BIGINT) n_bytes,
        |        list_distinct(codes) db,
        |        codes
        |      FROM t),
        |x AS (SELECT doc_id, n_bytes,
        |        CAST(len(db) AS BIGINT) n_distinct,
        |        CAST(list_aggregate(list_transform(db, v ->
        |          len(list_filter(codes, c -> c = v))
        |          * CAST(round(round(ln(len(list_filter(codes, c -> c = v))), 6)
        |                 * 1000000.0, 0) AS BIGINT)), 'sum') AS BIGINT) sum_clnc_micro
        |      FROM s)
        |SELECT doc_id, n_bytes, n_distinct, sum_clnc_micro,
        |       round(round(ln(n_bytes), 6) - sum_clnc_micro / 1000000.0 / n_bytes, 6)
        |         AS entropy
        |FROM x ORDER BY doc_id""".stripMargin,

    "m11_cdc_chunks" ->
      s"""WITH $duckChunkSql,
         |fd AS (SELECT fp, count(DISTINCT doc_id) n_docs FROM fp GROUP BY fp)
         |SELECT doc_id,
         |       COUNT(*) AS n_chunks,
         |       CAST(SUM(len) AS BIGINT) AS n_bytes,
         |       CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_shared,
         |       CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) * 1000000
         |            // COUNT(*) AS BIGINT) AS shared_ppm
         |FROM fp JOIN fd USING (fp)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "m15_cas_savings" ->
      s"""WITH $duckChunkSql,
         |lg AS (SELECT count(*) logical_chunks,
         |         CAST(sum(len) AS BIGINT) logical_bytes FROM fp),
         |st AS (SELECT count(*) stored_chunks,
         |         CAST(sum(len) AS BIGINT) stored_bytes
         |       FROM (SELECT fp, min(len) len FROM fp GROUP BY fp))
         |SELECT logical_chunks, logical_bytes, stored_chunks, stored_bytes,
         |       CAST((logical_bytes - stored_bytes) * 1000000
         |            // logical_bytes AS BIGINT) AS savings_ppm
         |FROM lg, st""".stripMargin,
    "m10_scene_cuts" ->
      s"""WITH g AS (
         |  SELECT doc_id, text,
         |         unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) i
         |  FROM documents WHERE length(text) > 0),
         |fr AS (SELECT doc_id, i frame_idx,
         |         substr(text, CAST(i * 16 + 1 AS INT), 16) fb
         |       FROM g),
         |en AS (SELECT doc_id, frame_idx,
         |         CAST(list_aggregate(list_transform(range(1, len(fb) + 1),
         |           j -> ascii(substr(fb, CAST(j AS INT), 1))
         |                * ascii(substr(fb, CAST(j AS INT), 1))), 'sum') AS BIGINT) energy
         |       FROM fr),
         |dl AS (SELECT doc_id, frame_idx,
         |         abs(energy - lag(energy) OVER (PARTITION BY doc_id
         |           ORDER BY frame_idx)) delta
         |       FROM en)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
         |       CAST(sum(CASE WHEN delta > $CutThreshold THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_cuts,
         |       min(CASE WHEN delta > $CutThreshold THEN frame_idx END) AS first_cut_idx,
         |       CAST(max(delta) AS BIGINT) AS max_delta,
         |       CAST(sum(CASE WHEN delta > $CutThreshold THEN 1 ELSE 0 END) + 1 AS BIGINT)
         |         AS n_segments
         |FROM dl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "m9_quiet_runs" ->
      s"""WITH g AS (
         |  SELECT doc_id, text,
         |         unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) i
         |  FROM documents WHERE length(text) > 0),
         |fr AS (SELECT doc_id, i frame_idx,
         |         substr(text, CAST(i * 16 + 1 AS INT), 16) fb
         |       FROM g),
         |en AS (SELECT doc_id, frame_idx,
         |         CAST(list_aggregate(list_transform(range(1, len(fb) + 1),
         |           j -> ascii(substr(fb, CAST(j AS INT), 1))
         |                * ascii(substr(fb, CAST(j AS INT), 1))), 'sum') AS BIGINT) energy
         |       FROM fr),
         |q AS (SELECT doc_id, frame_idx,
         |        frame_idx - row_number() OVER (PARTITION BY doc_id
         |          ORDER BY frame_idx) isl
         |      FROM en WHERE energy < $QuietThreshold),
         |runs AS (SELECT doc_id, isl, count(*) run_len, min(frame_idx) run_start
         |         FROM q GROUP BY 1, 2),
         |top AS (SELECT doc_id, run_len, run_start FROM (
         |          SELECT *, row_number() OVER (PARTITION BY doc_id
         |            ORDER BY run_len DESC, run_start ASC) rn FROM runs)
         |        WHERE rn = 1),
         |rs AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_runs FROM runs GROUP BY 1),
         |tot AS (SELECT doc_id, count(*) n_frames,
         |          CAST(sum(CASE WHEN energy < $QuietThreshold THEN 1 ELSE 0 END)
         |               AS BIGINT) quiet_frames
         |        FROM en GROUP BY 1)
         |SELECT t.doc_id, t.n_frames, t.quiet_frames,
         |       coalesce(rs.n_runs, 0) AS n_runs,
         |       CAST(coalesce(top.run_len, 0) AS BIGINT) AS longest_run,
         |       top.run_start AS longest_start
         |FROM tot t LEFT JOIN rs ON t.doc_id = rs.doc_id
         |           LEFT JOIN top ON t.doc_id = top.doc_id
         |ORDER BY t.doc_id""".stripMargin,

    "m8_frame_energy" ->
      """WITH g AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) i
        |  FROM documents WHERE length(text) > 0),
        |fr AS (SELECT doc_id, i frame_idx,
        |         substr(text, CAST(i * 16 + 1 AS INT), 16) fb
        |       FROM g),
        |en AS (SELECT doc_id, frame_idx,
        |         CAST(list_aggregate(list_transform(range(1, len(fb) + 1),
        |           j -> ascii(substr(fb, CAST(j AS INT), 1))
        |                * ascii(substr(fb, CAST(j AS INT), 1))), 'sum') AS BIGINT) energy
        |       FROM fr),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |         ORDER BY energy DESC, frame_idx ASC) r FROM en)
        |SELECT doc_id, count(*) AS n_frames,
        |       CAST(sum(energy) AS BIGINT) AS total_energy,
        |       max(CASE WHEN r = 1 THEN frame_idx END) AS peak_idx,
        |       max(CASE WHEN r = 1 THEN energy END) AS peak_energy
        |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "m7_aspect_buckets" ->
      s"""WITH d AS (SELECT doc_id,
         |             ascii(substr(text, 1, 1)) % 64 + 1 w,
         |             ascii(substr(text, 2, 1)) % 48 + 1 h
         |           FROM documents),
         |b AS (SELECT doc_id, w, h,
         |        CASE WHEN 4 * w < 3 * h THEN 'tall'
         |             WHEN 3 * w > 4 * h THEN 'wide'
         |             ELSE 'square' END bucket
         |      FROM d),
         |r AS (SELECT *, CAST((row_number() OVER (PARTITION BY bucket
         |        ORDER BY doc_id) - 1) // $AspectBatch AS BIGINT) batch_idx
         |      FROM b),
         |a AS (SELECT bucket, batch_idx, count(*) n_imgs,
         |        CAST(max(w) AS BIGINT) w_max, CAST(max(h) AS BIGINT) h_max,
         |        CAST(sum(w * h) AS BIGINT) area_sum
         |      FROM r GROUP BY bucket, batch_idx)
         |SELECT bucket, batch_idx, n_imgs, w_max, h_max,
         |       n_imgs * w_max * h_max - area_sum AS pad_waste
         |FROM a ORDER BY bucket, batch_idx""".stripMargin,

    "m13_phash_pairs" -> {
      // Naive all-pairs bit_count formulation — the independent check of
      // the engine's flip-enumeration algebra.
      val pix = (0 until PhashBits)
        .map(i => s"ascii(substr(text, CAST((($i * n) // $PhashBits) + 1 AS INT), 1)) p$i")
        .mkString(",\n       ")
      val ps = (0 until PhashBits).map(i => s"p$i").mkString(" + ")
      val bits = (0 until PhashBits)
        .map(i => s"(CASE WHEN $PhashBits * p$i > ps THEN ${1 << i} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH b AS (SELECT doc_id, text, length(text) n FROM documents),
         |p AS (SELECT doc_id,
         |       $pix
         |      FROM b),
         |s AS (SELECT *, $ps ps FROM p),
         |h AS (SELECT doc_id, CAST($bits AS BIGINT) phash16 FROM s)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.phash16, b.phash16)) AS BIGINT) AS hamming
         |FROM h a JOIN h b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.phash16, b.phash16)) <= $PhashMaxHamming
         |ORDER BY doc_a, doc_b""".stripMargin
    },

    "m6_phash" -> {
      val pix = (0 until PhashBits)
        .map(i => s"ascii(substr(text, CAST((($i * n) // $PhashBits) + 1 AS INT), 1)) p$i")
        .mkString(",\n       ")
      val ps = (0 until PhashBits).map(i => s"p$i").mkString(" + ")
      val bits = (0 until PhashBits)
        .map(i => s"(CASE WHEN $PhashBits * p$i > ps THEN ${1 << i} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH b AS (SELECT doc_id, text, length(text) n FROM documents),
         |p AS (SELECT doc_id,
         |       $pix
         |      FROM b),
         |s AS (SELECT *, $ps ps FROM p),
         |h AS (SELECT doc_id, CAST($bits AS BIGINT) phash16 FROM s)
         |SELECT doc_id, phash16,
         |       CAST(count(*) OVER (PARTITION BY phash16) AS BIGINT) AS n_same_hash
         |FROM h ORDER BY doc_id""".stripMargin
    },

    "m1_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS digest,
        |       n_chars % 64 + 1 AS fake_width, n_chars % 48 + 1 AS fake_height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m2_multimodal_decode" ->
      """SELECT doc_id,
        |       CAST(ascii(substr(text, 1, 1)) % 64 + 1 AS BIGINT) AS width,
        |       CAST(ascii(substr(text, 2, 1)) % 48 + 1 AS BIGINT) AS height,
        |       CAST(3 AS BIGINT) AS channels,
        |       octet_length(encode(text)) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m3_multimodal_features" -> {
      val dims = (0 until 8).map { k =>
        s"round(coalesce(list_aggregate(list_transform(range(1, n + 1), " +
          s"i -> CASE WHEN (i - 1) % 8 = $k THEN ascii(substr(text, CAST(i AS INT), 1)) " +
          s"ELSE 0 END), 'sum'), 0) * 1.0 / n, 6) AS f$k"
      }.mkString(",\n       ")
      // greatest(n, 1) mirrors the engine's empty-payload guard
      // (featureStub divides by max(len, 1)) so a zero-length document
      // yields f0..f7 = 0 on BOTH sides instead of NULL-vs-0 divergence.
      s"""WITH s AS (SELECT doc_id, text, greatest(length(text), 1) n FROM documents)
         |SELECT doc_id,
         |       $dims
         |FROM s ORDER BY doc_id""".stripMargin
    },

    "m5_resize" ->
      """SELECT doc_id,
        |       CAST(length(text) AS BIGINT) AS orig_bytes,
        |       CAST(length(regexp_replace(text, '(.).', '\1', 'g')) AS BIGINT) AS resized_bytes,
        |       md5(regexp_replace(text, '(.).', '\1', 'g')) AS resized_md5
        |FROM documents ORDER BY doc_id""".stripMargin,

    "m4_frame_sample" ->
      """WITH g AS (
        |  SELECT doc_id, text,
        |         unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) AS i
        |  FROM documents)
        |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        |       md5(substr(text, CAST(i * 16 + 1 AS INT), 16)) AS frame_md5,
        |       CAST(length(substr(text, CAST(i * 16 + 1 AS INT), 16)) AS BIGINT) AS frame_len
        |FROM g WHERE i % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
