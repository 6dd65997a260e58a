package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis over the `documents` table: language-ID heuristic,
  * quality scoring, token counting, document fingerprinting.
  *
  * Everything is a single narrow projection over the scan — no shuffle at
  * any scale (the per-doc work is embarrassingly parallel; the only wide
  * op is the final harness sort).
  */
object TextQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", split(lower(col("text")), " "))

  private val EnMarkers = "('the','a','of')"
  private val EsMarkers = "('el','la','los')"
  private val DeMarkers = "('der','die','und')"

  /** t1 — marker-token language-ID heuristic (argmax over marker counts,
    * ties and all-zero fall through deterministically). */
  def langId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("cnt_en", expr(s"size(filter(toks, w -> w IN $EnMarkers))").cast("long"))
      .withColumn("cnt_es", expr(s"size(filter(toks, w -> w IN $EsMarkers))").cast("long"))
      .withColumn("cnt_de", expr(s"size(filter(toks, w -> w IN $DeMarkers))").cast("long"))
      .withColumn("pred_lang", expr(
        """CASE WHEN cnt_en > cnt_es AND cnt_en > cnt_de THEN 'en'
          |     WHEN cnt_es > cnt_de THEN 'es'
          |     WHEN cnt_de > cnt_en THEN 'de'
          |     ELSE 'und' END""".stripMargin))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        col("cnt_en"), col("cnt_es"), col("cnt_de"), col("pred_lang"))
      .orderBy("doc_id")

  /** The per-document quality-stat frame (doc_id + the numeric stats,
    * no text), checkpointed once per (session, dir): t2's probe, d13's
    * survivor pick and p9's curriculum all rank on these scores, and the
    * tokenize-and-fold pass over the corpus is the expensive part —
    * built once like the tf/bigram/shingle indexes. */
  private lazy val scoreCache = caches.newCache()
  def qualityStats(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    scoreCache.getOrElseUpdate((spark, dir), {
      qualityOf(docs(spark, dir))
        .select(col("doc_id"), col("n_toks"), col("tok_chars"),
          col("stop_ratio_raw"), col("punct_ratio_raw"), col("quality_score"))
        .localCheckpoint()
    })
  }

  /** t2 — quality scoring: token stats + stopword/punctuation ratios folded
    * into a bounded [0,1] score. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    qualityStats(spark, dir)
      .select(
        col("doc_id"), col("n_toks"),
        round(expr("tok_chars * 1.0D / n_toks"), 6).as("avg_token_len"),
        round(col("stop_ratio_raw"), 6).as("stop_ratio"),
        round(col("punct_ratio_raw"), 6).as("punct_ratio"),
        col("quality_score"))
      .orderBy("doc_id")

  /** Quality over an arbitrary (doc_id, text, toks) frame — shared by the
    * batch query and the streaming ingest pipeline. Appends the stat
    * columns and `quality_score` without narrowing or sorting (a pure
    * per-row projection, so it runs identically under a watermark). */
  def qualityOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("tok_chars", expr("aggregate(toks, 0, (acc, w) -> acc + length(w))").cast("long"))
      .withColumn("n_stop", expr(s"size(filter(toks, w -> w IN $EnMarkers))").cast("long"))
      .withColumn("n_punct", expr("size(regexp_extract_all(text, '[^a-z0-9 ]', 0))").cast("long"))
      // 1.0D / 100.0D: Spark 4's ANSI parser reads bare decimal literals as
      // DECIMAL, which would silently turn these ratios into DECIMAL(29,6)
      // and break schema parity with the oracle's DOUBLE.
      .withColumn("stop_ratio_raw", expr("n_stop * 1.0D / n_toks"))
      // greatest(len, 1): empty text would divide 0.0/0 into NaN, and
      // Spark orders NaN ABOVE every number — so a NaN quality_score
      // PASSES a `>= threshold` gate. Exactly the degenerate rows a
      // quality gate exists to drop must not ride its NaN semantics in.
      // (Fixture docs are non-empty, so the oracle parity of t2 is
      // untouched.)
      .withColumn("punct_ratio_raw",
        expr("n_punct * 1.0D / greatest(length(text), 1)"))
      .withColumn("quality_score", round(expr(
        "(least(n_toks, 100) / 100.0D) * (1.0D - stop_ratio_raw) * (1.0D - punct_ratio_raw)"), 6))

  /** t3 — token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter runs | digit runs | single non-alnum). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("ws_tokens"),
        expr("size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))")
          .cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  /** Rolling polynomial hash over md5-derived token values, mod 1e9+7 so
    * both engines stay in exact BIGINT range. */
  private val tokenVal: String = (1 to 4)
    .map(k => s"(instr('0123456789abcdef', substr(md5(w), $k, 1)) - 1)")
    .reduce((a, b) => s"(($a) * 16 + $b)")

  /** t4 — document fingerprints: order-insensitive md5 of the sorted
    * distinct token set + an order-sensitive rolling hash. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(col("toks"))))).as("fp_set"),
        expr(s"aggregate(transform(toks, w -> cast($tokenVal as bigint)), " +
          "cast(0 as bigint), (acc, x) -> (acc * 31 + x) % 1000000007)").as("fp_rolling"))
      .orderBy("doc_id")

  /** t5 — TF-IDF top-3 terms per document. The classic two-aggregation
    * shape: term frequency shuffles on (doc, term), document frequency on
    * term; the corpus size joins in as a broadcast scalar (never a driver
    * round-trip). Ranking runs on the ROUNDED score so both engines order
    * identical values (an unrounded libm ln() could differ in the last ulp
    * across engines and flip a rank at the tie boundary). */
  val TfIdfTopK = 3

  /** Term-frequency index for t5, checkpointed once per (session, dir):
    * the score join's left side and the df aggregate both scan it, and
    * the (doc, term, tf) frame is the inverted index a text pipeline
    * builds once and reuses. */
  private val caches = new DirCaches
  private val tfCache = caches.newCache()

  /** Evict/clear hooks mirroring [[graft.ext.DedupQueries]]'s cache
    * discipline (Bench/Verify call clearCaches at teardown). */
  /** t10's tokenized bigram stream `(doc_id, w1, w2)` — the corpus-side
    * artifact both LM count tables and the scoring probe read; cached
    * like [[tfCache]]. */
  private val bgCache = caches.newCache()

  /** The positional shingle stream `(doc_id, pos, shingle)` out of the
    * native [[graft.functions.ShingleExplode]] generator — t13 exposes
    * it, d15's multiplicity table and join probe both scan it; cached so
    * neither query runs the generator twice. */
  private val posShingleCache = caches.newCache()
  private val bpeSegCache = caches.newCache()
  private val bpeBatchSegCache = caches.newCache()
  /** Driver-side merge tables keyed alongside [[bpeSegCache]] — tiny
    * (K rows), so no checkpoint discipline; registered as SIDE caches so
    * the one-hot-dir eviction removes them with their seg frames (a
    * session walking many dirs must not accumulate merge tables). */
  private val bpeMergesCache =
    caches.newSideCache[Seq[(Long, String, String, String, Long)]]()
  private val bpeBatchMergesCache =
    caches.newSideCache[Seq[(Long, Long, String, String, String, Long)]]()

  def clearCaches(): Unit = caches.clear()

  /** Cached positional shingles (see [[posShingleCache]]). */
  def posShingles(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    posShingleCache.getOrElseUpdate((spark, dir), {
      graft.functions.GraftFunctions.register(spark)
      Tables.load(spark, dir, "documents")
        // single-row-group fixture → one input split, and the generator
        // keeps its parent's partitioning — unfanned, this token-grain
        // frame checkpointed as ONE 28 MB partition at sf0.1 and every
        // consumer's first stage re-scanned it serially (the d2
        // discipline; explicit derived count, or AQE coalesces it back)
        .repartition(graft.ops.PlanHints.computeFanout(
          DedupQueries.docCount(spark, dir)), col("doc_id"))
        .selectExpr("doc_id", "shingle_explode(text, 3) AS (pos, shingle)")
        .localCheckpoint()
    })
  }

  private def evictOtherDirs(spark: SparkSession, dir: String): Unit =
    caches.evictOtherDirs(spark, dir)

  private def termFreq(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    tfCache.getOrElseUpdate((spark, dir), {
      docs(spark, dir).select(col("doc_id"), explode(col("toks")).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
    })
  }

  /** t21 — head-vocabulary coverage / OOV-rate audit: per document, what
    * fraction of token occurrences falls outside the corpus's
    * [[OovVocabK]] most frequent terms — the tokenizer-health readout
    * that decides vocabulary size and flags documents a fixed vocab
    * serves poorly (head size 10 here: the synthetic corpus has ~31
    * distinct tokens, so a production-sized head would be degenerate).
    *
    * Rides the cached (doc, term, tf) inverted index: the head vocab is
    * one tiny aggregate of it (total count desc, term asc — fully
    * deterministic), broadcast back as a membership probe; the per-doc
    * rollup is integer ppm. Nothing re-tokenizes the corpus. */
  val OovVocabK = 10
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    val tf = termFreq(spark, dir)
    val vocab = tf.groupBy(col("term"))
      .agg(sum(col("tf")).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(OovVocabK)
      .select(col("term").as("v_term"))
    tf.join(broadcast(vocab), col("term") === col("v_term"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_toks"),
        sum(when(col("v_term").isNull, col("tf")).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000L div n_toks"))
      .orderBy("doc_id")
  }

  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = termFreq(spark, dir)
    // df falls out of tf (one row per (doc, term) = one doc containing the
    // term) — aggregating the already-reduced tf frame instead of
    // re-shuffling the full exploded corpus through a distinct.
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs(spark, dir).agg(count(lit(1)).as("n"))
    val sc = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log((col("n") + lit(1.0)) / (col("df") + lit(1.0))), 6))
    sc.withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)).cast("long"))
      .filter(col("rk") <= TfIdfTopK)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  /** t14 — Okapi BM25 ranked retrieval over the inverted index: the
    * classic `idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))` scoring for a
    * fixed term query, top-[[Bm25TopK]] documents. Per-term contributions
    * are rounded to micro-unit BIGINTs before the per-doc sum, so the
    * cross-engine aggregate is exact integer math (double `sum()` order
    * differs between engines; see s6's discipline).
    *
    * Scale shape: the tf index ([[termFreq]], built once) filters to the
    * query terms FIRST — the postings join probes only `df(t)` rows per
    * term, never the corpus; df and the corpus stats broadcast as
    * single-row/|Q|-row frames. The only corpus-sized side is the
    * doc-length table, partition-aligned with tf on doc_id. */
  val Bm25QueryTerms: Seq[String] = Seq("hash", "merge", "dup")
  val Bm25TopK = 10
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    val tf = termFreq(spark, dir)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("tt"))
    val qtf = tf.filter(col("term").isin(Bm25QueryTerms: _*))
    val dfq = qtf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    qtf.join(broadcast(dfq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("tt") / col("n"))
      // idf/tf-norm written with the same literal constants and the same
      // parenthesization as the oracle SQL: double IEEE ops are
      // deterministic, so identical expression trees give identical bits.
      .withColumn("idf", log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("cm", expr(
        "cast(round(idf * (tf * 2.2D) / (tf + 1.2D * (0.25D + 0.75D * (dl / avgdl)))" +
          " * 1000000.0D, 0) as bigint)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cm")).as("score_micro"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col("doc_id").asc)
      .limit(Bm25TopK)
  }

  /** t15 — PMI collocation mining over the corpus bigram stream:
    * `pmi(w1,w2) = ln(P(w1,w2) / (P(w1)·P(w2)))` with positional
    * marginals (w1 counted as left element, w2 as right), the standard
    * collocation/multi-word-expression detector for tokenizer and
    * phrase-vocabulary construction. The ratio is computed as a chain of
    * double divisions (`c12/c1/c2*nb`) — never `c12*nb` as integers,
    * which would overflow BIGINT at corpus scale (1e12 bigrams × 1e12
    * pair count). One ln() of an exactly-agreed double, rounded — no
    * double aggregation anywhere.
    *
    * Scale shape: three combinable counts over the cached bigram stream
    * (pair / left / right keys), then joins on VOCABULARY-sized frames
    * (bigram types, not tokens) — the corpus is reduced map-side and
    * never reshuffled. */
  val PmiMinCount = 5
  val PmiTopK = 50
  def pmiCollocations(spark: SparkSession, dir: String): DataFrame = {
    val bg = bigrams(spark, dir)
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val c2 = bg.groupBy(col("w2")).agg(count(lit(1)).as("c2"))
    val nb = bg.agg(count(lit(1)).as("nb"))
    c12.filter(col("c12") >= PmiMinCount)
      .join(broadcast(c1), "w1").join(broadcast(c2), "w2")
      .crossJoin(broadcast(nb))
      .withColumn("pmi", round(log(col("c12") / col("c1") / col("c2") * col("nb")), 6))
      .select(col("w1"), col("w2"), col("c12"), col("pmi"))
      .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
      .limit(PmiTopK)
  }

  /** t16 — Zipf rank-frequency fit: least-squares slope/intercept of
    * `ln(freq)` against `ln(rank)` over the corpus vocabulary — the
    * one-row diagnostic that tells a corpus curator whether token
    * frequencies look natural (slope ≈ −1), templated (flat), or
    * degenerate. Both logs are rounded to micro-unit BIGINTs FIRST, so
    * every regression sum is exact integer math and the closed-form
    * slope/intercept divide one exactly-agreed integer by another — the
    * cross-engine regression without `regr_slope`'s float-merge-order
    * hazard. Sums are BIGINT here (exact up to ~1e5-term vocabularies;
    * beyond that the same shape sums decimal(38,0) or drops to
    * milli-units).
    *
    * Scale shape: the corpus reduces map-side to a vocabulary-sized
    * frequency frame; ranking that frame goes through
    * [[graft.ops.RankOps.withGlobalRank]] (range partition on
    * (c desc, term) + per-partition offsets — P balanced tasks, never a
    * single-task global `Window.orderBy`; a web-scale vocabulary is
    * 10⁸–10⁹ terms and would otherwise sort on one executor); the
    * regression is a single-row aggregate. */
  def zipfFit(spark: SparkSession, dir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val vocab = docs(spark, dir)
      .select(explode(col("toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val freq = graft.ops.RankOps
      .withGlobalRank(vocab, par, "__r0", col("c").desc, col("term").asc)
      // RankOps ranks are 0-based; Zipf (and the oracle's row_number)
      // are 1-based.
      .withColumn("rank", col("__r0") + lit(1L))
      .select(
        expr("cast(round(ln(cast(rank as double)) * 1000000.0D, 0) as bigint)").as("xm"),
        expr("cast(round(ln(cast(c as double)) * 1000000.0D, 0) as bigint)").as("ym"))
    // The closed-form cross-products (sy·sxx etc.) reach ~1e22 even on a
    // 30-term vocabulary — decimal(38,0), not BIGINT, keeps them exact;
    // the final integer→double conversions round identically everywhere.
    freq.agg(
        count(lit(1)).cast("decimal(38,0)").as("n_terms"),
        sum(col("xm").cast("decimal(38,0)")).as("sx"),
        sum(col("ym").cast("decimal(38,0)")).as("sy"),
        // products fit BIGINT per-row but their corpus-wide sums don't:
        // widen BEFORE the sum, not after.
        sum(expr("cast(xm * ym as decimal(38,0))")).as("sxy"),
        sum(expr("cast(xm * xm as decimal(38,0))")).as("sxx"))
      .select(col("n_terms").cast("long").as("n_terms"),
        round(expr("cast(n_terms * sxy - sx * sy as double) / " +
          "cast(n_terms * sxx - sx * sx as double)"), 6).as("slope"),
        round(expr("(cast(sy * sxx - sx * sxy as double) / " +
          "cast(n_terms * sxx - sx * sx as double)) / 1000000.0D"), 6).as("intercept"))
  }

  /** t17 — per-source distribution drift: KL(source ∥ corpus) over token
    * unigram distributions — the drift monitor a continuously-ingesting
    * corpus runs per source/crawl-batch to catch domain shift and
    * template floods before they skew the mix. Per-term log-ratios are
    * rounded to micro-units FIRST; the per-source reduction
    * `Σ c_st · lrm` is then exact integer math (widened to decimal
    * before summing — token counts × 1e7-scale log-ratios overflow
    * BIGINT at corpus scale), divided once at the end.
    *
    * Scale shape: the corpus reduces map-side to a (source × vocab)
    * count frame; the corpus-marginal and per-source-total frames are
    * vocab-/source-sized broadcasts. Nothing corpus-sized shuffles
    * twice. */
  def klDrift(spark: SparkSession, dir: String): DataFrame = {
    val st = docs(spark, dir)
      .select(col("source"), explode(col("toks")).as("term"))
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("c_st"))
    val ct = st.groupBy(col("term")).agg(sum(col("c_st")).as("c_t"))
    val ns = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val tot = ct.agg(sum(col("c_t")).as("n"))
    st.join(broadcast(ct), "term").join(broadcast(ns), "source")
      .crossJoin(broadcast(tot))
      .withColumn("lrm", expr(
        "cast(round(ln(cast(c_st as double) / n_s / c_t * n) * 1000000.0D, 0) as bigint)"))
      .groupBy(col("source"))
      .agg(max(col("n_s")).as("n_toks"),
        // Widen an OPERAND, not the product: c_st * lrm in BIGINT can wrap
        // (c_st ~ 1e12 occurrences x |lrm| ~ 2.8e7 micro-units > 2^63)
        // before a cast applied to the result ever sees it.
        sum(expr("cast(c_st as decimal(38,0)) * lrm")).as("klsum"))
      .select(col("source"), col("n_toks"),
        round(expr("cast(klsum as double) / n_toks / 1000000.0D"), 6).as("kl"))
      .orderBy("source")
  }

  /** t6 — KMV (k-minimum-values) distinct-count sketch per language: the
    * estimate is (k-1) * |hash space| / h_(k), needing only the k smallest
    * 60-bit md5-derived hash values per group — a bounded sketch where
    * exact distinct needs the full value set shuffled. Deterministic (no
    * random seed), so the DuckDB oracle replicates it bit-for-bit; the
    * exact count rides along to show the estimate lands. */
  val KmvK = 16
  private val HashSpace = "1152921504606846976.0D" // 2^60 = 16^15
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = docs(spark, dir)
      .select(col("lang"), explode(col("toks")).as("w")).distinct()
      .withColumn("h", expr("cast(conv(substr(md5(w), 1, 15), 16, 10) as bigint)"))
    val ranked = dist.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("lang")).orderBy(col("h").asc)))
    val kth = ranked.filter(col("rk") === KmvK)
      .select(col("lang"), col("h").as("kth_hash"))
    val exact = dist.groupBy(col("lang")).agg(count(lit(1)).as("n_exact"))
    exact.join(kth, Seq("lang"), "left")
      .withColumn("est", round(
        when(col("kth_hash").isNotNull,
          lit(KmvK - 1) * expr(HashSpace) / col("kth_hash"))
          .otherwise(col("n_exact").cast("double")), 4))
      .select(col("lang"), col("n_exact"), col("kth_hash"), col("est"))
      .orderBy("lang")
  }

  /** t7 — lexical diversity: type-token ratio, Gini-Simpson index and
    * hapax ratio per document — the repetition/diversity axis of corpus
    * quality filtering (boilerplate and template spam score near 0
    * diversity; natural prose near 1). Deliberately log-free: every score
    * is rational arithmetic over exact integer counts, so both engines
    * compute bit-identical doubles (a Shannon-entropy variant would hang
    * parity on last-ulp libm ln() agreement). Two hash aggregates —
    * (doc, term) then doc — the same shuffle shape as t5's TF stage. */
  def diversity(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(col("toks")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_toks"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).as("c2"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(
        col("doc_id"), col("n_toks"), col("n_types"),
        round(expr("n_types * 1.0D / n_toks"), 6).as("ttr"),
        round(expr("1.0D - c2 * 1.0D / (n_toks * n_toks)"), 6).as("simpson"),
        round(expr("n_hapax * 1.0D / n_types"), 6).as("hapax_ratio"))
      .orderBy("doc_id")

  /** t8 — PII redaction: scrub emails and phone numbers from text before
    * it can enter a training shard, reporting per-doc redaction counts —
    * the compliance pass every corpus pipeline runs. The fixture corpus
    * is synthetic (no real PII), so a deterministic contact line derived
    * from doc_id is appended first; the scrubber then has real matches to
    * find, and the oracle replicates injection + redaction exactly. The
    * redacted text itself is reported as an md5 (parity-stable, and the
    * full text would bloat the compare). Pure per-row regex projection —
    * narrow, codegen'd, no shuffle at any scale. */
  val EmailRe = "[a-z0-9]+@[a-z]+\\.[a-z]+"
  val PhoneRe = "\\+1-555-[0-9]+"
  private def sqlLit(re: String): String = re.replace("\\", "\\\\")

  /** Scrub emails/phones out of `text` in place — the composed pipeline's
    * PII stage (runs BEFORE chunking: a chunk boundary could otherwise
    * split a match and leave half of it unredacted). */
  def scrubbed(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"))
  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val dirty = concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or +1-555-"),
      lpad(col("doc_id").cast("string"), 7, "0"))
    Tables.load(spark, dir, "documents")
      .withColumn("dirty", dirty)
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("dirty"), EmailRe, "<EMAIL>"),
          PhoneRe, "<PHONE>"))
      .select(
        col("doc_id"),
        // Spark SQL string literals process backslash escapes, so the
        // regex's \. and \+ need doubling inside expr() text (the Column
        // regexp_replace above takes the pattern verbatim).
        expr(s"size(regexp_extract_all(dirty, '${sqlLit(EmailRe)}', 0))")
          .cast("long").as("n_emails"),
        expr(s"size(regexp_extract_all(dirty, '${sqlLit(PhoneRe)}', 0))")
          .cast("long").as("n_phones"),
        length(col("redacted")).cast("long").as("n_chars_redacted"),
        md5(col("redacted")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  /** t9 — count-min-sketch heavy hitters: estimate the top-K term
    * frequencies through a d×w CMS (md5-derived row hashes, so the oracle
    * replicates the sketch bit-for-bit) and report them against the exact
    * counts. The sketch is built FROM the partially-aggregated term
    * frequencies (CMS addition is associative, so summing per-term counts
    * into buckets equals streaming every occurrence) — the map-side
    * combine shape that makes the sketch cheap at corpus scale: the
    * shuffle carries d·w bucket cells, never the vocabulary. Estimates
    * are upper bounds (n_est >= n_exact, equality when no collision). */
  val CmsRows = 4
  val CmsWidth = 512
  val CmsTopK = 20
  private def cmsBucket(row: String): String =
    s"cast(conv(substr(md5(concat('cms', $row, '|', term)), 1, 8), 16, 10) as bigint) % $CmsWidth"
  def cmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val freq = termFreq(spark, dir)
      .groupBy(col("term")).agg(sum(col("tf")).as("n_exact"))
    val cells = freq
      .select(col("term"), col("n_exact"),
        explode(expr(s"sequence(0, ${CmsRows - 1})")).as("r"))
      .withColumn("bucket", expr(cmsBucket("cast(r as string)")))
    val sketch = cells.groupBy(col("r"), col("bucket"))
      .agg(sum(col("n_exact")).as("c"))
    val topk = freq
      .orderBy(col("n_exact").desc, col("term").asc).limit(CmsTopK)
    topk
      .select(col("term"), col("n_exact"),
        explode(expr(s"sequence(0, ${CmsRows - 1})")).as("r"))
      .withColumn("bucket", expr(cmsBucket("cast(r as string)")))
      .join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy(col("term"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
      .orderBy(col("n_exact").desc, col("term").asc)
  }

  /** t10 — bigram language-model scoring: train a bigram LM on the corpus
    * itself (count tables), then score every document by its mean bigram
    * log-probability `avg ln(c(w1,w2)/c(w1·))` — the KenLM-style fluency
    * filter a training pipeline runs to drop gibberish (low avg_logprob)
    * and flag the single most surprising transition (min_lp). No
    * smoothing needed for well-definedness: each document's bigrams are
    * in the corpus by construction, so c12 >= 1.
    *
    * Scale shape: the count tables are VOCABULARY-sized (bigram types,
    * not tokens), so both probes broadcast — the corpus-sized bigram
    * stream is never shuffled on the word key, only reduced per doc on
    * doc_id with map-side partial aggregation. Per-bigram log-probs are
    * rounded before averaging so both engines aggregate identical
    * doubles (t5 discipline). */
  /** Cached corpus bigram stream `(doc_id, w1, w2)` (see [[bgCache]]) —
    * t10's LM count tables and t15's collocation mining both reduce it. */
  private def bigrams(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    bgCache.getOrElseUpdate((spark, dir), {
      docs(spark, dir)
        .filter(size(col("toks")) >= 2)
        .withColumn("b", explode(expr(
          "transform(sequence(0, size(toks)-2), " +
            "i -> struct(toks[i] as w1, toks[i+1] as w2))")))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .localCheckpoint()
    })
  }

  /** Per-doc LM scores, checkpointed once per (session, dir) (r15
    * optimization): t25's rank/bucket machinery reads this frame several
    * times per invocation (the group-rank kernel's count/start frames
    * plus its own tercile counts), and each un-cached read re-ran the
    * two count-table aggregates over the bigram stream — ~5 recomputes
    * per t25 call, the whole 173 MB/pass block-read signature. */
  private val lmScoreCache = caches.newCache()
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    lmScoreCache.getOrElseUpdate((spark, dir),
      lmScoreBuild(spark, dir).localCheckpoint())
  }

  /** The lazy build plan (the cached frame is an ExistingRDD; the plan
    * audit inspects THIS). */
  private[graft] def lmScoreBuild(spark: SparkSession, dir: String): DataFrame = {
    val bg = bigrams(spark, dir)
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    // denominator = bigram-context count of w1 (occurrences followed by
    // anything), so per-context probabilities sum to 1
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bg.join(broadcast(c12), Seq("w1", "w2")).join(broadcast(c1), Seq("w1"))
      // micro-unit BIGINT log-probs: summing doubles would make the
      // per-doc mean depend on partition visit order (observed: a 6th-
      // decimal flip on an avg() rounding boundary). Integer sums are
      // order-independent, so the mean is bit-stable on both engines —
      // the s8 discipline.
      .withColumn("lpm", expr(
        "cast(round(round(ln(c12 / c1), 6) * 1000000.0D, 0) as bigint)"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("lpm")).as("s"),
        min(col("lpm")).as("mn"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("s").cast("double") / col("n_bigrams") / lit(1000000.0), 6)
          .as("avg_logprob"),
        round(col("mn").cast("double") / lit(1000000.0), 6).as("min_lp"))
      .orderBy("doc_id")
  }

  /** t11 — within-document repetition: the fraction of a document's
    * trigrams that are repeats of an earlier trigram, plus the worst
    * single trigram's multiplicity — the Gopher-style "repetition"
    * quality gate that catches boilerplate loops and degenerate
    * generations (quality scoring t2 is blind to them: a document
    * repeating one clean sentence forever scores well).
    *
    * Shape: explode to (doc, trigram) and aggregate twice (multiplicity,
    * then per-doc stats) — the shuffle key is (doc_id, trigram), so the
    * reduction is map-side-combinable and per-doc bounded. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val tri = docs(spark, dir)
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))")).as("tri"))
    tri.groupBy(col("doc_id"), col("tri")).agg(count(lit(1)).as("m"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("m")).as("n_tri"),
        count(lit(1)).as("n_tri_distinct"),
        max(col("m")).as("max_repeat"))
      .withColumn("dup_ratio",
        round(lit(1.0) - col("n_tri_distinct").cast("double") / col("n_tri"), 6))
      .orderBy("doc_id")
  }

  /** t12 — BPE merge-candidate mining: the first iteration of byte-pair-
    * encoding tokenizer training, as a corpus aggregate. Every whitespace
    * token contributes its adjacent character pairs (the initial symbol
    * alphabet is single characters); the top candidates by occurrence
    * count — with the distinct-token reach alongside — are exactly the
    * merges BPE would perform first. At 100 TB this is one explode + one
    * combinable count per pair (map-side partial over ≤ ~1k live pair
    * keys) + a TakeOrdered top-k: no sort of the corpus, no driver loop.
    * Subsequent BPE rounds re-run the same aggregate over re-segmented
    * tokens. */
  val BpeTopK = 20
  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("w")).as("n_tokens"))
      .orderBy(col("n_occurrences").desc, col("pair").asc)
      .limit(BpeTopK)

  /** t31 — iterative BPE tokenizer training: the K-round merge loop that
    * t12 mines only the first level of — the operator an LLM pipeline
    * actually runs to TRAIN a tokenizer (Sennrich et al., "Neural Machine
    * Translation of Rare Words with Subword Units"). Round r counts
    * adjacent symbol pairs over the CURRENT segmentation (weighted by
    * word frequency, every adjacent position counted), merges the argmax
    * pair leftmost-greedy non-overlapping in every word, and records the
    * merge; ties break (count desc, lhs asc, rhs asc) so the merge table
    * is deterministic on any partitioning and any engine.
    *
    * Scale shape (the d19/s27/KMeansOps driver-coordinated-loop
    * discipline): the corpus collapses ONCE into the distinct
    * (word, freq) vocabulary — the classic BPE-training reduction; all K
    * rounds then run over that vocabulary-scale frame, never re-reading
    * the corpus. Per round exactly ONE row (the winning pair) crosses to
    * the driver via a TakeOrdered(limit=1) over the map-side-combinable
    * pair count, and the re-segmentation is a per-row HOF fold (a
    * leftmost-greedy streaming merge — no shuffle), checkpointed so the
    * next round's lineage stays flat; superseded round checkpoints are
    * released eagerly. The oracle unrolls the same K rounds as chained
    * CTEs (positional gaps-and-islands form of the same greedy merge —
    * odd-rank candidates within each run of consecutive candidate
    * positions are exactly the non-overlapping leftmost merges).
    *
    * PRODUCTION-K LIMIT: at a real tokenizer's K ≈ 30-50k merges the
    * per-round driver round-trip (one TakeOrdered(1) job per merge)
    * dominates wall clock. The batched form is implemented as
    * [[bpeTrainBatched]] (t33): top-B non-interacting pairs per round —
    * disjoint symbol sets merge safely in one pass, ~B× fewer driver
    * crossings. The remaining headroom is maintaining the pair-count
    * frame incrementally (a merge only perturbs counts of pairs
    * overlapping the merged symbol — the classic priority-queue BPE
    * trainer, distributed as a delta-aggregate). This 5-round loop pins
    * the exact per-round semantics those optimizations must preserve
    * (t33's B=1 degeneration spec ties the two together). */
  val BpeRounds = 5
  /** One BPE round's winning pair over a segmentation frame
    * `(freq, syms)` — exposed for the plan audit: partial/final hash
    * aggregate over the pair keys, then a 1-row bounded TakeOrdered;
    * nothing corpus- or vocabulary-sized ever heads to the driver. */
  private[graft] def bpeRoundWinner(seg: DataFrame): DataFrame =
    bpeRoundTop(seg, 1)

  /** Top-`c` pairs of one BPE round — the bounded driver crossing shared
    * by the one-merge-per-round loop (c = 1) and the batched trainer
    * (c = [[BpeCandWindow]]); plans as partial/final hash aggregates into
    * a TakeOrdered(c). */
  private[graft] def bpeRoundTop(seg: DataFrame, c: Int): DataFrame =
    // fully-merged words (size 1) must drop out BEFORE the explode:
    // sequence(0, size-2) DESCENDS for size=1 (sequence(0,-1) = [0,-1]),
    // which would fabricate (sym, null)/(null, null) pair rows the
    // oracle's `WHERE nxt IS NOT NULL` never counts.
    seg.filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] as lhs, syms[i + 1] as rhs))")).as("p"))
      .select(col("freq"), col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .groupBy(col("lhs"), col("rhs"))
      .agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("lhs").asc, col("rhs").asc)
      .limit(c)

  /** The vocabulary frame `(w, freq, syms)`: distinct words with corpus
    * frequency, segmented to single characters. The word column rides
    * along untouched so [[bpeApply]] can join the trained segmentation
    * back onto document tokens. Exposed for the audit. */
  private[graft] def bpeVocab(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"),
        expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))").as("syms"))

  /** The leftmost-greedy non-overlapping merge of one winning pair, as a
    * per-row streaming fold: carry (emitted prefix, pending symbol); a
    * (pending=l, cur=r) hit emits the merged symbol and clears the
    * pending slot, so the merged token never re-merges with a following
    * r within the same round — the single-pass BPE contract ("aaa" with
    * (a,a) → ["aa","a"]; "aaaa" → ["aa","aa"]). Winner strings bind as
    * lit() Columns, never interpolated into SQL text (quote/escape-safe).
    * Exposed for the replay spec, which pins the self-overlap contract
    * directly against literal symbol arrays. */
  private[graft] def bpeMergedCol(l: String, r: String): Column =
    bpeMergedSetCol(Seq((l, r)))

  /** The same single-pass fold over a SET of merge rules — sound only
    * when no two rules share a symbol (the batched trainer's selection
    * invariant): then at most one rule can match any (pending, cur)
    * position, occurrences of different rules never overlap, and the
    * per-rule leftmost-greedy parity is exactly the single-rule
    * contract. Rules chain as `when` clauses; a merged token goes
    * straight to `out` and never re-pends, so it cannot feed another
    * rule within the same round. */
  private[graft] def bpeMergedSetCol(pairs: Seq[(String, String)]): Column = {
    require(pairs.nonEmpty)
    aggregate(
      col("syms"),
      struct(array().cast("array<string>").as("out"),
        lit(null).cast("string").as("pending")),
      (st: Column, s: Column) => {
        val out = st.getField("out"); val pend = st.getField("pending")
        val base = when(pend.isNull, struct(out.as("out"), s.as("pending")))
        pairs.foldLeft(base) { case (acc, (l, r)) =>
          acc.when(pend === lit(l) && s === lit(r),
            struct(array_append(out, concat(lit(l), lit(r))).as("out"),
              lit(null).cast("string").as("pending")))
        }
          .otherwise(
            struct(array_append(out, pend).as("out"), s.as("pending")))
      },
      (st: Column) => when(st.getField("pending").isNull, st.getField("out"))
        .otherwise(array_append(st.getField("out"), st.getField("pending"))))
  }

  /** Run the K-round training loop once per (session, dir): the FINAL
    * vocabulary segmentation `(w, freq, syms)` lands in the checkpoint
    * cache (t31 reads the merge table, t32 applies the segmentation —
    * neither re-trains), the merge table in [[bpeMergesCache]]. */
  private def bpeTrained(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    bpeSegCache.getOrElseUpdate((spark, dir), {
      var seg = bpeVocab(spark, dir).localCheckpoint()
      val merges = Seq.newBuilder[(Long, String, String, String, Long)]
      var round = 1
      var exhausted = false
      while (round <= BpeRounds && !exhausted) {
        // take(1), not head(): a degenerate corpus can run out of
        // adjacent pairs before BpeRounds completes (every word merged
        // to a single symbol) — then the merge table simply truncates,
        // exactly like the oracle's chained CTEs (an empty w_r leaves
        // all later segmentations unchanged), instead of crashing.
        bpeRoundWinner(seg).take(1) match {
          case Array(win) =>
            val (l, r, n) = (win.getString(0), win.getString(1), win.getLong(2))
            merges += ((round.toLong, l, r, l + r, n))
            val prev = seg
            seg = seg.withColumn("syms", bpeMergedCol(l, r)).localCheckpoint()
            graft.CheckpointUtil.release(prev)
          case _ => exhausted = true
        }
        round += 1
      }
      bpeMergesCache((spark, dir)) = merges.result()
      seg
    })
  }

  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    bpeTrained(spark, dir)
    import spark.implicits._
    bpeMergesCache((spark, dir))
      .toDF("merge_round", "lhs", "rhs", "merged", "n_occurrences")
      .orderBy("merge_round")
  }

  /** t33 — BATCHED BPE training, the production-K form t31's Scaladoc
    * names: at a real tokenizer's K ≈ 30-50k merges, one driver
    * round-trip per merge dominates wall clock, so each round ships the
    * top-[[BpeCandWindow]] pairs once (a bounded TakeOrdered — the SAME
    * single crossing as t31, just wider) and the driver greedily selects
    * up to [[BpeBatch]] NON-INTERACTING pairs from that ranked window:
    * walking in (count desc, lhs, rhs) order, a pair is taken iff
    * neither of its symbols was taken this round. Disjoint symbol sets
    * make simultaneous application exact — two selected rules can never
    * match overlapping positions (an overlap forces a shared symbol),
    * so one [[bpeMergedSetCol]] fold applies the whole batch and the
    * driver crossings shrink by ~B× at identical per-merge semantics.
    * The cost is fidelity to strict BPE: a lower-ranked pair whose
    * count would change under a higher-ranked merge in the SAME batch
    * is taken at its pre-batch count — the standard batched-trainer
    * tradeoff, bounded by the non-interaction rule (a pair sharing a
    * symbol with a selected merge — the only way its count can change —
    * is never co-selected).
    *
    * Output carries (merge_round, batch_rank): the merge table a
    * tokenizer consumes is the flattened (round, rank) order. */
  val BpeBatch = 3
  val BpeCandWindow = 12
  /** The driver loop at an explicit batch size `b` and candidate-window
    * bound `cand` (production rule of thumb: cand ≈ 4·b, so conflict
    * skips rarely starve a round — the BpeDialSpec B-sweep drives this
    * knob). Total driver crossings for a K-merge tokenizer ≈ K/b. */
  private[graft] def bpeBatchedLoop(spark: SparkSession, dir: String,
      b: Int, rounds: Int, cand: Int = BpeCandWindow)
      : (Seq[(Long, Long, String, String, String, Long)], DataFrame) = {
    var seg = bpeVocab(spark, dir).localCheckpoint()
    val merges = Seq.newBuilder[(Long, Long, String, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val window = bpeRoundTop(seg, cand).take(cand)
      val used = scala.collection.mutable.Set.empty[String]
      val picked = Seq.newBuilder[(String, String, Long)]
      var taken = 0
      window.foreach { row =>
        val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
        if (taken < b && !used(l) && !used(r)) {
          picked += ((l, r, n)); used += l; used += r; taken += 1
        }
      }
      val batch = picked.result()
      if (batch.isEmpty) exhausted = true
      else {
        batch.zipWithIndex.foreach { case ((l, r, n), i) =>
          merges += ((round.toLong, (i + 1).toLong, l, r, l + r, n))
        }
        val prev = seg
        seg = seg.withColumn("syms",
          bpeMergedSetCol(batch.map { case (l, r, _) => (l, r) }))
          .localCheckpoint()
        graft.CheckpointUtil.release(prev)
      }
      round += 1
    }
    (merges.result(), seg)
  }

  private def bpeBatchTrained(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    bpeBatchSegCache.getOrElseUpdate((spark, dir), {
      val (merges, seg) = bpeBatchedLoop(spark, dir, BpeBatch, BpeRounds)
      bpeBatchMergesCache((spark, dir)) = merges
      seg
    })
  }

  def bpeTrainBatched(spark: SparkSession, dir: String): DataFrame = {
    bpeBatchTrained(spark, dir)
    import spark.implicits._
    bpeBatchMergesCache((spark, dir))
      .toDF("merge_round", "batch_rank", "lhs", "rhs", "merged",
        "n_occurrences")
      .orderBy("merge_round", "batch_rank")
  }

  /** t34 — batched BPE with INTRA-ROUND REFILL: the r10 B-sweep found a
    * single crossing's batch is SUPPLY-capped, not B-capped (B=16 took 5
    * merges — the ranked window holds only so many pairwise
    * symbol-DISJOINT pairs). The refill recovers the skipped supply
    * without another crossing: after the greedy pass closes, walk the
    * window again and take any remaining pair whose COUNT IS PROVABLY
    * UNCHANGED by every already-taken merge, repeating until B or no
    * pass takes anything.
    *
    * The screen (the exactness core): applying merge (a,b) destroys
    * only adjacencies of the form (·,a) and (b,·) and creates only
    * adjacencies touching the new "ab" symbol — so a skipped pair
    * (l,r) keeps its exact pre-round count iff `r` is no taken LHS,
    * `l` is no taken RHS, and neither equals a taken merge's output
    * string. Position-wise the same argument shows every surviving
    * pair's occurrences are untouched by the taken merges, so the
    * WHOLE round (all passes' rules together) still applies in ONE
    * [[bpeMergedSetCol]] fold: rules from different passes may share a
    * LHS or RHS (unlike within a pass), but the screen forbids exactly
    * the `rule1.rhs = rule2.lhs` chains that could overlap, and the
    * fold's leftmost-greedy (pending, current) dispatch is
    * deterministic when no two rules match the same position. The
    * oracle re-derives the multi-pass selection as one recursive walk
    * (step = (pass, window rank)) and applies the union rule set with
    * the same single parity-islands pass as t33.
    *
    * Dial: merges per crossing rises strictly (pass 1 IS t33's
    * selection), so a K-merge tokenizer needs ≤ K/supply crossings
    * instead of K/disjoint-supply — measured on the fixture in
    * BpeTrainSpec and at 30× in BASELINE.md. */
  val BpeRefillB = 16
  val BpeRefillWindow = 64
  private[graft] def bpeRefillLoop(spark: SparkSession, dir: String,
      b: Int, rounds: Int, cand: Int)
      : (Seq[(Long, Long, Long, String, String, String, Long)], DataFrame) = {
    var seg = bpeVocab(spark, dir).localCheckpoint()
    val merges = Seq.newBuilder[(Long, Long, Long, String, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= rounds && !exhausted) {
      val window = bpeRoundTop(seg, cand).take(cand)
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // closed-pass screens: taken LHS set (kills pairs whose rhs is in
      // it), taken RHS set (kills pairs whose lhs is in it), and the
      // taken merges' output strings (kill either side)
      val clA = scala.collection.mutable.Set.empty[String]
      val clB = scala.collection.mutable.Set.empty[String]
      val clM = scala.collection.mutable.Set.empty[String]
      val takenIdx = scala.collection.mutable.Set.empty[Int]
      val taken = Seq.newBuilder[(Long, String, String, Long)] // (pass, l, r, n)
      var total = 0
      var pass = 1
      var progress = true
      while (total < b && progress) {
        val used = scala.collection.mutable.Set.empty[String]
        val passRows = scala.collection.mutable.Buffer.empty[(String, String, Long)]
        window.zipWithIndex.foreach { case ((l, r, n), k) =>
          if (total + passRows.size < b && !takenIdx(k) &&
              !used(l) && !used(r) &&
              !clB(l) && !clM(l) && !clA(r) && !clM(r)) {
            passRows += ((l, r, n)); used += l; used += r; takenIdx += k
          }
        }
        if (passRows.isEmpty) progress = false
        else {
          passRows.foreach { case (l, r, n) =>
            taken += ((pass.toLong, l, r, n))
          }
          total += passRows.size
          passRows.foreach { case (l, r, _) =>
            clA += l; clB += r; clM += (l + r)
          }
          pass += 1
        }
      }
      val batch = taken.result()
      if (batch.isEmpty) exhausted = true
      else {
        batch.zipWithIndex.foreach { case ((p, l, r, n), i) =>
          merges += ((round.toLong, p, (i + 1).toLong, l, r, l + r, n))
        }
        val prev = seg
        // ONE fold with the union rule set — exact under the screen
        seg = seg.withColumn("syms",
          bpeMergedSetCol(batch.map { case (_, l, r, _) => (l, r) }))
          .localCheckpoint()
        graft.CheckpointUtil.release(prev)
      }
      round += 1
    }
    (merges.result(), seg)
  }

  private val bpeRefillSegCache = caches.newCache()
  private val bpeRefillMergesCache =
    caches.newSideCache[Seq[(Long, Long, Long, String, String, String, Long)]]()

  def bpeTrainRefill(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    bpeRefillSegCache.getOrElseUpdate((spark, dir), {
      val (merges, seg) =
        bpeRefillLoop(spark, dir, BpeRefillB, BpeRounds, BpeRefillWindow)
      bpeRefillMergesCache((spark, dir)) = merges
      seg
    })
    import spark.implicits._
    bpeRefillMergesCache((spark, dir))
      .toDF("merge_round", "refill_pass", "batch_rank", "lhs", "rhs",
        "merged", "n_occurrences")
      .orderBy("merge_round", "batch_rank")
  }

  /** t32 — trained-tokenizer application: per-document token counts
    * under the t31 merge table — the inference half of BPE, and the
    * budget readout a packing/pricing pass actually needs (whitespace
    * tokens over-count by the subword expansion factor). Each document
    * token joins the trained segmentation; words outside the vocabulary
    * (length < 2 — the training filter) contribute their character
    * count. expansion_ppm = subword/whitespace ratio in exact ppm.
    *
    * Scale shape: the corpus-grain token stream joins the
    * VOCABULARY-grain segmentation (broadcast at fixture scale, a
    * standard shuffled equi-join on the word when the vocabulary
    * outgrows the threshold) and reduces map-side per doc — training
    * cost is paid once in the shared [[bpeTrained]] cache, never per
    * query. */
  def bpeApply(spark: SparkSession, dir: String): DataFrame =
    bpeApplyOf(spark, dir,
      Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")))
      .withColumn("expansion_ppm",
        expr("n_bpe_tokens * 1000000L div n_ws_tokens"))
      .orderBy("doc_id")

  /** The t32 inference kernel over ANY (doc_id, text) frame: per-doc
    * whitespace and trained-subword token counts under the `dir`-trained
    * merge table — the composed pipeline prices its CUT+SCRUBBED survivor
    * text through this (tokenizer trained once on the raw corpus, applied
    * to whatever text the pipeline is about to pack — the deployment
    * shape). Same vocabulary-grain join + map-side reduce as t32. */
  def bpeApplyOf(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val sub = bpeTrained(spark, dir)
      .select(col("w"), size(col("syms")).cast("long").as("n_sub"))
    docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .join(sub, Seq("w"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_ws_tokens"),
        sum(coalesce(col("n_sub"), length(col("w")).cast("long")))
          .as("n_bpe_tokens"))
  }

  /** t13 — positional shingle stream via the native table-generating
    * function [[graft.functions.ShingleExplode]] (the UDTF category,
    * SURVEY §2.8): one text row in, `(pos, shingle)` rows out, streamed
    * by GenerateExec without materializing the per-doc shingle array the
    * HOF formulation allocates. The oracle reproduces the rows with
    * DuckDB's unnest, so the custom generator's semantics (lowercase,
    * empty-token-preserving split, n = 3) are differentially pinned. */
  def shingleStream(spark: SparkSession, dir: String): DataFrame =
    posShingles(spark, dir).orderBy("doc_id", "pos")

  /** t18 — inter-document n-gram novelty: the share of a document's
    * distinct trigrams that appear in NO other document (corpus df == 1)
    * — the "how much of this doc is new text" score a curriculum or
    * quality-weighted sampler ranks on (near-dups score ~0, unique docs
    * ~1).
    *
    * Shares [[DedupQueries.shingled]]'s checkpointed fingerprint index
    * (64-bit trigram hashes, the d4/d16 machinery) instead of
    * re-shingling, and the checkpointed [[DedupQueries.shingleDf]] df
    * aggregate the prefix ordering already pays for — per call this is
    * one explode over the cached index + a broadcast join back; the
    * corpus-wide df count is never recomputed. */
  def novelty(spark: SparkSession, dir: String): DataFrame = {
    val ex = DedupQueries.shingled(spark, dir)
      .select(col("doc_id"), explode(col("shh")).as("g"))
    val df = DedupQueries.shingleDf(spark, dir)
    ex.join(broadcast(df), "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_shingles"), 6).as("novelty"))
      .orderBy("doc_id")
  }

  /** t19 — classifier evaluation in-engine: the confusion matrix of t1's
    * marker language-ID against the labeled `lang`, with per-cell corpus
    * share — the self-audit a pipeline publishes before trusting a
    * heuristic gate for routing/filtering (same discipline as s12's
    * linear-probe confusion grid and d10's LSH recall). One combinable
    * count over a |langs|·|preds| key space on top of t1's narrow
    * projection — no extra corpus pass beyond t1's own. */
  def langIdConfusion(spark: SparkSession, dir: String): DataFrame = {
    val cm = langId(spark, dir)
      .groupBy(col("labeled_lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    // Total via a 1-row aggregate of the tiny cell frame, broadcast back
    // — no driver-side count(), no unpartitioned window.
    val tot = cm.agg(sum(col("n")).as("tot"))
    cm.crossJoin(broadcast(tot))
      .withColumn("share", round(col("n").cast("double") / col("tot"), 6))
      .withColumn("is_hit", col("labeled_lang") === col("pred_lang"))
      .select(col("labeled_lang"), col("pred_lang"), col("n"), col("share"),
        col("is_hit"))
      .orderBy("labeled_lang", "pred_lang")
  }

  /** t20 — readability scoring: Flesch-reading-ease-shaped formula over
    * deterministic proxies — syllables as vowel-group runs per word
    * (min 1, so consonant-only tokens still count one), sentences as
    * fixed 15-token pseudo-sentences (the corpus carries no terminal
    * punctuation; a real corpus would count `[.!?]+` runs the same
    * way). The score orders documents by structural complexity for
    * curriculum/quality gates. Pure per-row projection — one codegen'd
    * scan, no shuffle; both factors are exact-integer ratios pushed
    * through one fixed double expression tree (t2's emission
    * discipline). */
  def readability(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("n_syll", expr(
        "aggregate(toks, 0L, (acc, w) -> acc + " +
          "greatest(cast(size(regexp_extract_all(w, '[aeiou]+', 0)) as bigint), 1L))"))
      .withColumn("n_sent", expr("greatest((n_toks + 14L) div 15L, 1L)"))
      .withColumn("flesch", round(
        expr("206.835D - 1.015D * (n_toks * 1.0D / n_sent) " +
          "- 84.6D * (n_syll * 1.0D / n_toks)"), 6))
      .select(col("doc_id"), col("n_toks"), col("n_syll"), col("n_sent"),
        col("flesch"))
      .orderBy("doc_id")

  /** t22 — Gopher-style quality-rule battery (Rae et al. 2021 §A1.1,
    * adapted): the published multi-rule document gate with PER-RULE
    * attribution — corpus curation tunes thresholds off which rule
    * rejects how much, so the gate must emit each rule's verdict, not
    * just the conjunction. Rules (every comparison exact-integer via
    * cross-multiplication — no float ratio ever compared):
    *   r_len      word count ≥ [[GateMinToks]]
    *   r_meanlen  mean token length in [3.8, 5.2]  (10·chars ⋛ 38·n / 52·n)
    *   r_ttr      type-token ratio ≥ 0.4           (5·distinct ≥ 2·n)
    *   r_top      top-token fraction ≤ 0.2         (5·top ≤ n)
    *   r_stop     ≥ 1 stopword present
    * Scale shape: pure per-row projection over one scan — the top-token
    * count folds over the doc's own distinct-token array (docs are
    * bounded; O(|doc|·|vocab_doc|) per row, embarrassingly parallel)
    * instead of an explode→groupBy corpus shuffle. No shuffle at any SF
    * beyond the harness sort. */
  val GateMinToks = 20

  /** Gopher rules over an arbitrary (doc_id, toks) frame — a pure per-row
    * projection (no shuffle, no state), so it runs identically under a
    * streaming watermark ([[qualityOf]]'s shape; StreamBatchEqualitySpec
    * pins stream = batch for it). Appends the five rule verdicts and
    * `pass` without narrowing. */
  def gopherRulesOf(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("tok_chars",
        expr("aggregate(toks, 0, (acc, w) -> acc + length(w))").cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("top_tok", expr(
        "array_max(transform(array_distinct(toks), " +
          "u -> size(filter(toks, w -> w = u))))").cast("long"))
      .withColumn("n_stop",
        expr("size(filter(toks, w -> w IN ('the','a','of','and','to')))").cast("long"))
      .withColumn("r_len", (col("n_toks") >= GateMinToks).cast("int"))
      .withColumn("r_meanlen",
        (col("tok_chars") * 10 >= col("n_toks") * 38 &&
          col("tok_chars") * 10 <= col("n_toks") * 52).cast("int"))
      .withColumn("r_ttr", (col("n_distinct") * 5 >= col("n_toks") * 2).cast("int"))
      .withColumn("r_top", (col("top_tok") * 5 <= col("n_toks")).cast("int"))
      .withColumn("r_stop", (col("n_stop") >= 1).cast("int"))
      .withColumn("pass",
        least(col("r_len"), col("r_meanlen"), col("r_ttr"), col("r_top"), col("r_stop")))

  def gopherGate(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOf(docs(spark, dir))
      .select(col("doc_id"), col("n_toks"), col("r_len"), col("r_meanlen"),
        col("r_ttr"), col("r_top"), col("r_stop"), col("pass"))
      .orderBy("doc_id")

  /** t23 — DSIR-style importance weights (Xie et al. 2023, "Data
    * Selection for Language Models via Importance Resampling"): score
    * every document by how much its hashed-bigram profile looks like a
    * TARGET domain (here sources src0/src1) versus the rest of the
    * corpus. Per-bucket weight = ln p̂_target(b) − ln p̂_raw(b) with
    * add-1 smoothing over [[DsirBuckets]] hashed buckets; a document's
    * log-importance is the sum over its bigram occurrences. The score
    * frame is what importance RESAMPLING consumes (rank/threshold =
    * p9/p10 territory).
    *
    * Cross-engine float discipline (t10's): each bucket's ln is rounded
    * to 6 decimals THEN quantized to micro-unit BIGINT; documents sum
    * integers, so the emitted `logw_micro` is exact and partition-order
    * independent — no double ever aggregated.
    *
    * Scale shape: one explode scan builds (doc, bucket) pairs; the
    * bucket histogram is B×2 counters via map-side combine; the weight
    * table (B rows — model state, like k-means centroids) broadcasts
    * back onto the same pairs; per-doc sums combine map-side on doc_id.
    * Two corpus-sized passes, no all-pairs, no skew (buckets are
    * md5-uniform). */
  val DsirBuckets = 64
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val pairs = docs(spark, dir)
      // single-row-group fixture → one input split, and the bigram
      // explode + per-bigram md5 is this query's whole CPU (profiled
      // r16: 0.5 s serial in the scan task while 31 cores idled — the
      // d2/t30 discipline). Explicit derived count: AQE coalesces
      // byte-light shuffles back to one task otherwise.
      .repartition(graft.ops.PlanHints.computeFanout(
        DedupQueries.docCount(spark, dir)), col("doc_id"))
      .withColumn("is_tgt", col("source").isin("src0", "src1").cast("int"))
      .select(col("doc_id"), col("is_tgt"),
        explode(expr("transform(sequence(0, size(toks)-2), " +
          "i -> concat(toks[i], ' ', toks[i+1]))")).as("g"))
      .withColumn("b",
        expr(s"cast(conv(substr(md5(g), 1, 8), 16, 10) as bigint) % $DsirBuckets"))
      .select(col("doc_id"), col("is_tgt"), col("b"))
    val cnts = pairs.groupBy(col("b")).agg(
      sum(col("is_tgt")).cast("long").as("tgt_b"),
      sum(lit(1) - col("is_tgt")).cast("long").as("raw_b"))
    // bucket spine 0..B-1: absent buckets still carry +1 smoothing mass
    val spine = spark.range(0, DsirBuckets.toLong).select(col("id").as("b"))
    val filled = spine.join(cnts, Seq("b"), "left")
      .select(col("b"), coalesce(col("tgt_b"), lit(0L)).as("tgt_b"),
        coalesce(col("raw_b"), lit(0L)).as("raw_b"))
    val tot = filled.agg(sum(col("tgt_b")).as("tgt_tot"), sum(col("raw_b")).as("raw_tot"))
    val wtab = filled.crossJoin(broadcast(tot))
      .withColumn("wm", expr(
        s"cast(round(round(ln((tgt_b + 1) * 1.0D / (tgt_tot + $DsirBuckets)), 6) * 1000000.0D, 0) as bigint) " +
          s"- cast(round(round(ln((raw_b + 1) * 1.0D / (raw_tot + $DsirBuckets)), 6) * 1000000.0D, 0) as bigint)"))
      .select(col("b"), col("wm"))
    pairs.join(broadcast(wtab), "b")
      .groupBy(col("doc_id"), col("is_tgt"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("wm")).as("logw_micro"))
      .select(col("doc_id"), col("is_tgt"), col("n_bigrams"), col("logw_micro"))
      .orderBy("doc_id")
  }

  /** t24 — hashing-trick featurizer (Weinberger et al. 2009): each
    * document's token stream folds into a fixed [[HashFeatDim]]-wide
    * count vector via md5 bucket hashing — the input representation a
    * fastText-style linear quality classifier consumes (s12's linear
    * probe is the consumer shape; t23 uses the same trick for bigram
    * importance). Emitted flattened (f0..f15, the s12 MediaFeatures
    * discipline) plus the exact integer squared L2 norm so downstream
    * normalization needs no second pass.
    *
    * One shuffle-free scan: the bucket codes materialize once per doc
    * via the m11 LET discipline (md5 once per token, not once per
    * (token, bucket) probe), and each feature is a fold over that
    * array. */
  val HashFeatDim = 16
  def hashFeatures(spark: SparkSession, dir: String): DataFrame = {
    val fields = (0 until HashFeatDim)
      .map(b => s"cast(size(filter(bs, x -> x = $b)) as bigint) as f$b")
      .mkString(", ")
    val statsExpr =
      s"""element_at(transform(array(transform(toks,
         |  w -> cast(conv(substr(md5(w), 1, 8), 16, 10) as bigint) % $HashFeatDim)),
         |  bs -> struct(cast(size(bs) as bigint) as n_toks, $fields)), 1)""".stripMargin
    val norm2 = (0 until HashFeatDim).map(b => s"f$b * f$b").mkString(" + ")
    docs(spark, dir)
      .select(col("doc_id"), expr(statsExpr).as("st"))
      .select(col("doc_id") +: col("st.n_toks").as("n_toks") +:
        (0 until HashFeatDim).map(b => col(s"st.f$b").as(s"f$b")): _*)
      .withColumn("norm2", expr(norm2))
      .orderBy("doc_id")
  }

  /** t25 — CCNet-style per-language quantile buckets (Wenzek et al.
    * 2020): rank every document WITHIN its language by LM fluency (t10's
    * score) and split into head/middle/tail terciles — the calibration
    * step that makes fluency thresholds comparable ACROSS languages (a
    * global cutoff over-prunes whichever language the LM scores low).
    *
    * Scale shape: per-language ranking goes through
    * [[graft.ops.RankOps.withGroupRank]] — a balanced global range
    * partition on (lang, score) minus broadcast group offsets — NOT a
    * `PARTITION BY lang` window, which would sort each language's whole
    * corpus on one reducer (few languages = few reducers at 100 TB).
    * The rank key is the integer micro fluency with doc_id tie-break,
    * and the tercile is exact integer arithmetic from the 0-based rank,
    * so both engines bucket identically. */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    val scored = lmScore(spark, dir).select(col("doc_id"), col("avg_logprob"))
      .join(Tables.load(spark, dir, "documents").select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      .withColumn("alp_micro",
        expr("cast(round(avg_logprob * 1000000.0D, 0) as bigint)"))
    val ranked = graft.ops.RankOps.withGroupRank(scored, par, "rk0",
      Seq("lang"), Seq(lit(0L) - col("alp_micro"), col("doc_id")))
    val counts = scored.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
    ranked.join(broadcast(counts), Seq("lang"))
      .select(col("doc_id"), col("lang"),
        (col("rk0") + 1).cast("long").as("rank_in_lang"),
        expr("CASE WHEN rk0 * 3 div nl = 0 THEN 'head' " +
          "WHEN rk0 * 3 div nl = 1 THEN 'middle' ELSE 'tail' END").as("bucket"))
      .orderBy("doc_id")
  }

  /** t26 — term burstiness (variance-to-mean ratio) for the corpus's
    * top-[[BurstTopK]] terms: a term whose occurrences CLUMP into few
    * documents (VMR ≫ 1) behaves like content vocabulary; a term spread
    * evenly (VMR ≈ 1, the Poisson baseline) behaves like function-word
    * glue — the Church–Gale dispersion diagnostic used to pick stopword
    * lists and spot template/boilerplate vocabulary at corpus scale.
    *
    * VMR is exact integer ppm over the INCLUDING-ZEROS distribution:
    * `vmr_ppm = (N·Σtf² − (Σtf)²) · 1e6 div (N·Σtf)` (decimal-widened;
    * Cauchy–Schwarz keeps the numerator non-negative, so truncating
    * division is floor on both engines). Rides the cached (doc, term,
    * tf) inverted index — one per-term aggregate plus a broadcast
    * 1-row corpus count; nothing re-tokenizes. */
  val BurstTopK = 20
  def burstiness(spark: SparkSession, dir: String): DataFrame = {
    val n = docs(spark, dir).agg(count(lit(1)).as("n"))
    termFreq(spark, dir)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        sum(col("tf") * col("tf")).as("sum_tf2"))
      .crossJoin(broadcast(n))
      // Widen BEFORE the products (the q115/s23 pattern): total_tf ~1e12
      // squared overflows int64 at the 100 TB target, and the DuckDB
      // oracle computes the same numerator in HUGEINT.
      .withColumn("vmr_ppm", expr(
        "cast((cast(n as decimal(38,0)) * sum_tf2 " +
          "- cast(total_tf as decimal(38,0)) * total_tf) * 1000000 " +
          "div (cast(n as decimal(38,0)) * total_tf) as bigint)"))
      .orderBy(col("total_tf").desc, col("term").asc)
      .limit(BurstTopK)
      .select(col("term"), col("df"), col("total_tf"), col("sum_tf2"), col("vmr_ppm"))
      .orderBy(col("term"))
  }

  /** t27 — cross-source vocabulary overlap matrix: pairwise Jaccard of
    * the distinct trigram-shingle vocabularies of each source, in exact
    * ppm — the provenance diagnostic that spots near-mirror crawl
    * sources (high overlap → candidate for source-level dedup before
    * any document-level pass) and quantifies how much each source
    * actually diversifies the corpus. Complements t17 (unigram
    * DISTRIBUTION drift) with set-level n-gram identity.
    *
    * Rides the d2-d4 checkpointed shingle index on its 64-bit
    * fingerprints (the p8/d4 collision argument: P ≈ n²/2^65, so
    * fingerprint-set Jaccard equals string-set Jaccard and the oracle
    * states the string side). Shape: ONE fingerprint-keyed exchange —
    * the raw (source, fp) stream groups by fp with a map-side partial
    * `collect_set` (bounded by |sources|, so no skew risk), singleton
    * fingerprints (the overwhelming majority in a diverse corpus — they
    * can never pair) die before pair generation, and the sorted source
    * set explodes its C(k,2) ordered pairs map-side into a tiny
    * (src_a, src_b) partial aggregate. The r9 10× scale readout caught
    * the previous self-join shape shuffling the full vocabulary twice
    * and probing every singleton (59 MB shuffle, 22× CPU at 10×); this
    * form ships each posting once and Spark's ReuseExchange shares the
    * fp exchange between the pair branch and the size frame. */
  /** The fp → sorted-source-set posting index, checkpointed once per
    * (session, dir): t27 reads it on THREE branches (pair explosion +
    * two size frames), and without materialization each branch re-runs
    * the explode + distinct + set aggregate — the 100x blow-up measured
    * the posting exchange paid ~2x (440 MB shuffled for ~210 MB of
    * distinct postings; static ReusedExchange does not match across the
    * branches). Same d28 multi-reference-subframe lesson, and the frame
    * IS an index artifact (vocabulary-grain, tiny next to the corpus). */
  private val sourcePostingCache = caches.newCache()
  private def sourcePosting(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    sourcePostingCache.getOrElseUpdate((spark, dir),
      DedupQueries.shingledWithSource(spark, dir)
        .select(col("source"), explode(col("shh")).as("fp"))
        // explicit fixed-width distinct BEFORE the set aggregate:
        // collapsing incidences in a codegen HashAggregate instead of
        // the object-buffer partial cut measured build CPU 3x at the
        // 100x blow-up (731 -> 241 s)
        .distinct()
        .groupBy(col("fp"))
        .agg(sort_array(collect_set(col("source"))).as("srcs"))
        .localCheckpoint())
  }

  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val posting = sourcePosting(spark, dir)
    val sizes = posting
      .select(explode(col("srcs")).as("source"))
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    posting
      .filter(size(col("srcs")) >= 2)
      .select(explode(expr(
        """flatten(transform(srcs, (a, i) ->
          |  transform(slice(srcs, i + 2, size(srcs) - i - 1), b ->
          |    struct(a AS src_a, b AS src_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.select(col("source").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))), "src_b")
      .withColumn("jaccard_ppm", expr(
        "cast((cast(n_common as decimal(38,0)) * 1000000) div (n_a + n_b - n_common) as bigint)"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        col("n_common"), col("jaccard_ppm"))
      .orderBy("src_a", "src_b")
  }

  /** t28 — blocklist gate (the C4 "bad words" filter shape): per
    * document, total occurrences and distinct hits against a fixed
    * blocklist, plus the C4-style hard verdict (any hit → drop). The
    * list here is a stand-in drawn from the fixture vocabulary (real
    * deployments plug in their word list — the operator is the same
    * membership probe); C4 famously applied exactly this gate to every
    * page. Pure projection against a literal set — the list is plan
    * metadata, no broadcast, no shuffle; at any corpus size this is a
    * free rider on the ingest scan. */
  val Blocklist: Seq[String] = Seq("slow", "error", "drop")
  def blocklistGate(spark: SparkSession, dir: String): DataFrame = {
    val listLit = Blocklist.map(w => s"'$w'").mkString("array(", ", ", ")")
    docs(spark, dir)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        expr(s"cast(size(filter(toks, t -> array_contains($listLit, t))) as bigint)")
          .as("n_blocked"),
        expr(s"cast(size(array_intersect(array_distinct(toks), $listLit)) as bigint)")
          .as("n_distinct_blocked"))
      .withColumn("pass", (col("n_blocked") === 0L).cast("int"))
      .orderBy("doc_id")
  }

  /** t29 — winnowing fingerprint selection (Schleimer–Wilkerson–Aiken,
    * the MOSS algorithm): hash every [[WinnowK]]-gram, slide a
    * [[WinnowW]]-hash window, and in each window select the RIGHTMOST
    * minimal hash — the local-fingerprinting scheme whose guarantee
    * (every ≥ w+k−1-token match shares a selected print; expected
    * density 2/(w+1)) is what plagiarism/near-copy detectors actually
    * deploy, vs t4's single whole-doc rolling hash and d2's global
    * minhash. Per doc: gram count, selected positions, distinct prints
    * and selection density in exact ppm of windows.
    *
    * Scale shape: pure per-row HOFs over the token array (hash once,
    * window-min by slice/reverse/position — O(n·w) integer ops, no
    * joins, no shuffle before the final doc-grain projection); documents
    * shorter than one window (< w+k−1 tokens) carry no fingerprint and
    * are excluded on both engines. Hashes are 60-bit md5 slices (the d2
    * discipline), so numeric min == lexicographic-free min on both
    * engines and the rightmost-tie rule is pure integer comparison. */
  val WinnowK = 3
  val WinnowW = 4
  def winnowing(spark: SparkSession, dir: String): DataFrame = {
    val hashG = "cast(conv(substr(md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])), 1, 15), 16, 10) as bigint)"
    docs(spark, dir)
      .filter(size(col("toks")) >= WinnowK + WinnowW - 1)
      .withColumn("hs", expr(
        s"transform(sequence(0, size(toks) - $WinnowK), i -> $hashG)"))
      // window j selects position p = j + w - (1-based index of the min
      // in the REVERSED window slice) — the rightmost minimum
      .withColumn("sel", expr(
        s"array_distinct(transform(sequence(0, size(hs) - $WinnowW), j -> " +
          s"j + $WinnowW - array_position(reverse(slice(hs, j + 1, $WinnowW)), " +
          s"array_min(slice(hs, j + 1, $WinnowW)))))"))
      .select(
        col("doc_id"),
        size(col("hs")).cast("long").as("n_grams"),
        (size(col("hs")) - lit(WinnowW) + 1).cast("long").as("n_windows"),
        size(col("sel")).cast("long").as("n_selected"),
        expr("cast(size(array_distinct(transform(sel, p -> hs[cast(p as int)]))) as bigint)")
          .as("n_prints"))
      .withColumn("density_ppm",
        expr("n_selected * 1000000L div n_windows"))
      .orderBy("doc_id")
  }

  /** t30 — RAKE keyword extraction (Rose et al. 2010): candidate
    * phrases are the maximal token runs between stopwords, and each
    * word scores `deg(w)/freq(w)` — degree counts phrase co-members
    * (Σ length of phrases containing w), so multi-word technical terms
    * outrank bare frequency — the classic unsupervised corpus
    * keyword/tagging pass (t5's TF-IDF weights terms per DOCUMENT;
    * RAKE surfaces corpus-level keyphrases). Top-[[RakeTopK]] words by
    * exact-ppm score, ties by word.
    *
    * Shape: the phrase split is a PER-ROW HOF fold (accumulate the
    * current run, close it at each stopword), emitting (word,
    * phrase_len) pairs straight out of the scan — no token-grain
    * shuffle, no per-doc window, no (doc, seg) join-back; the only wide
    * op is the vocabulary-sized word rollup (map-side combinable) and
    * the top-k is TakeOrderedAndProject. The oracle derives the same
    * relation through an independent posexplode + running-stop-count
    * window formulation. The stopword list is plan metadata (t2's
    * set). */
  val RakeTopK = 20
  val RakeStops: Seq[String] = Seq("the", "a", "of")
  def rakeKeywords(spark: SparkSession, dir: String): DataFrame = {
    val stopsLit = RakeStops.map(w => s"'$w'").mkString("(", ", ", ")")
    val emptyRuns = "cast(array() as array<array<string>>)"
    val emptyCur = "cast(array() as array<string>)"
    docs(spark, dir)
      // single-row-group fixture → one input split; spread the per-token
      // fold across cores (the d2 discipline). Explicit derived count:
      // AQE coalesces byte-light shuffles otherwise.
      .repartition(graft.ops.PlanHints.computeFanout(
        DedupQueries.docCount(spark, dir)), col("doc_id"))
      .select(expr(
        s"""aggregate(toks,
           |  named_struct('runs', $emptyRuns, 'cur', $emptyCur),
           |  (acc, w) -> IF(w IN $stopsLit,
           |    named_struct(
           |      'runs', IF(size(acc.cur) > 0, concat(acc.runs, array(acc.cur)), acc.runs),
           |      'cur', $emptyCur),
           |    named_struct('runs', acc.runs, 'cur', concat(acc.cur, array(w)))),
           |  acc -> IF(size(acc.cur) > 0, concat(acc.runs, array(acc.cur)), acc.runs))
           |""".stripMargin).as("runs"))
      .select(explode(expr(
        "flatten(transform(runs, r -> transform(r, w -> struct(w AS w, size(r) AS len))))"))
        .as("p"))
      .groupBy(col("p.w").as("word"))
      .agg(count(lit(1)).as("freq"), sum(col("p.len")).cast("long").as("deg"))
      .withColumn("score_ppm", expr("deg * 1000000L div freq"))
      .orderBy(col("score_ppm").desc, col("word").asc)
      .limit(RakeTopK)
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t30_rake" -> ((s, d) => rakeKeywords(s, d)),
    "t29_winnowing" -> ((s, d) => winnowing(s, d)),
    "t28_blocklist_gate" -> ((s, d) => blocklistGate(s, d)),
    "t27_source_overlap" -> ((s, d) => sourceOverlap(s, d)),
    "t26_burstiness" -> ((s, d) => burstiness(s, d)),
    "t25_ccnet_buckets" -> ((s, d) => ccnetBuckets(s, d)),
    "t24_hash_features" -> ((s, d) => hashFeatures(s, d)),
    "t23_dsir" -> ((s, d) => dsirWeights(s, d)),
    "t22_gopher_gate" -> ((s, d) => gopherGate(s, d)),
    "t20_readability" -> ((s, d) => readability(s, d)),
    "t19_langid_confusion" -> ((s, d) => langIdConfusion(s, d)),
    "t18_novelty" -> ((s, d) => novelty(s, d)),
    "t13_shingle_udtf" -> ((s, d) => shingleStream(s, d)),
    "t12_bpe_pairs" -> ((s, d) => bpePairs(s, d)),
    "t31_bpe_train" -> ((s, d) => bpeTrain(s, d)),
    "t33_bpe_train_batched" -> ((s, d) => bpeTrainBatched(s, d)),
    "t34_bpe_refill" -> ((s, d) => bpeTrainRefill(s, d)),
    "t32_bpe_apply" -> ((s, d) => bpeApply(s, d)),
    "t11_repetition" -> ((s, d) => repetition(s, d)),
    "t10_lm_score" -> ((s, d) => lmScore(s, d)),
    "t1_langid" -> ((s, d) => langId(s, d)),
    "t9_cms_heavy_hitters" -> ((s, d) => cmsHeavyHitters(s, d)),
    "t7_diversity" -> ((s, d) => diversity(s, d)),
    "t8_pii_redact" -> ((s, d) => piiRedact(s, d)),
    "t2_quality" -> ((s, d) => quality(s, d)),
    "t3_tokencount" -> ((s, d) => tokenCount(s, d)),
    "t4_fingerprint" -> ((s, d) => fingerprint(s, d)),
    "t5_tfidf" -> ((s, d) => tfidf(s, d)),
    "t6_kmv_distinct" -> ((s, d) => kmvDistinct(s, d)),
    "t14_bm25" -> ((s, d) => bm25(s, d)),
    "t15_pmi" -> ((s, d) => pmiCollocations(s, d)),
    "t16_zipf" -> ((s, d) => zipfFit(s, d)),
    "t17_kl_drift" -> ((s, d) => klDrift(s, d)),
    "t21_oov_rate" -> ((s, d) => oovRate(s, d))
  )

  private val duckTokenVal: String = (1 to 4)
    .map(k => s"(strpos('0123456789abcdef', substr(md5(w), $k, 1)) - 1)")
    .reduce((a, b) => s"(($a) * 16 + $b)")

  // lazy: oracle SQL bodies cross-reference sibling modules (t27→Dedup,
  // s24→Text…); eager Maps would make object-init order a correctness
  // hazard (NPE on whichever module clinit runs first).
  /** Shared t31/t32 CTE chain: vocabulary (wd), character segmentation
    * (s0), then K rounds — a{r} adds each position's next symbol, w{r}
    * is the 1-row argmax pair, c{r} marks candidates via LEFT JOIN ON
    * TRUE (an EMPTY w{r} — degenerate corpus out of pairs — leaves cand
    * false everywhere, so s{r} = s{r-1}, exactly the engine's
    * loop-break-and-keep-last semantics), g{r} selects the leftmost
    * non-overlapping merge starts (odd rank within each run of
    * consecutive candidate positions — gaps-and-islands), s{r} rebuilds
    * the segmentation.
    *
    * Every CTE is AS MATERIALIZED: DuckDB 1.0 otherwise INLINES each
    * single-reference CTE, and since s{r} expands to ~4 copies of
    * c{r} (via the two g{r} joins), the chain re-evaluates ~4^K times —
    * t32's s{K} read took >15 min CPU at sf0.01 plain vs 0.5 s
    * materialized (measured). */
  private[ext] lazy val duckBpeRounds: String = {
    val rounds = (1 to BpeRounds).map { r =>
      s"""a$r AS MATERIALIZED (SELECT w, freq, pos, sym,
         |  lead(sym) OVER (PARTITION BY w ORDER BY pos) nxt FROM s${r - 1}),
         |w$r AS MATERIALIZED (SELECT lhs, rhs, n FROM (
         |    SELECT sym lhs, nxt rhs, sum(freq) n FROM a$r
         |    WHERE nxt IS NOT NULL GROUP BY sym, nxt)
         |  ORDER BY n DESC, lhs ASC, rhs ASC LIMIT 1),
         |c$r AS MATERIALIZED (SELECT a.w, a.freq, a.pos, a.sym, a.nxt,
         |    coalesce(a.sym = q.lhs AND a.nxt = q.rhs, FALSE) cand
         |  FROM a$r a LEFT JOIN w$r q ON TRUE),
         |g$r AS MATERIALIZED (SELECT w, pos FROM (
         |    SELECT w, pos, row_number() OVER (PARTITION BY w, grp ORDER BY pos) rn
         |    FROM (SELECT w, pos,
         |            pos - row_number() OVER (PARTITION BY w ORDER BY pos) grp
         |          FROM c$r WHERE cand)) WHERE rn % 2 = 1),
         |s$r AS MATERIALIZED (SELECT c.w, c.freq,
         |    row_number() OVER (PARTITION BY c.w ORDER BY c.pos) pos,
         |    CASE WHEN st.pos IS NOT NULL THEN c.sym || c.nxt ELSE c.sym END sym
         |  FROM c$r c
         |  LEFT JOIN g$r st ON st.w = c.w AND st.pos = c.pos
         |  LEFT JOIN g$r cons ON cons.w = c.w AND cons.pos = c.pos - 1
         |  WHERE cons.pos IS NULL)""".stripMargin
    }.mkString(",\n")
    s"""wd AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) freq FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) w FROM documents)
       |  WHERE length(w) >= 2 GROUP BY w),
       |s0 AS MATERIALIZED (SELECT w, freq, pos, w[CAST(pos AS INT)] sym FROM (
       |    SELECT w, freq, unnest(range(1, length(w) + 1)) pos FROM wd)),
       |$rounds""".stripMargin
  }

  /** The batched variant of [[duckBpeRounds]]: per round, the top-1 CTE
    * becomes a bounded ranked window (rk) + a RECURSIVE greedy walk
    * (pick) that carries the used-symbol list and takes a pair iff
    * neither symbol was taken — the literal SQL form of the engine's
    * driver-side selection. Candidate marking joins the up-to-B rule
    * set; the parity-islands merge is UNCHANGED because selected rules
    * share no symbol, so adjacent candidate positions can only belong
    * to the same self-pair run (a cross-rule adjacency would force a
    * shared symbol). */
  private lazy val duckBpeBatchedRounds: String = {
    val sel = "len(p.sl) < " + BpeBatch +
      " AND NOT list_contains(p.used, r.lhs)" +
      " AND NOT list_contains(p.used, r.rhs)"
    val rounds = (1 to BpeRounds).map { r =>
      s"""ba$r AS MATERIALIZED (SELECT w, freq, pos, sym,
         |  lead(sym) OVER (PARTITION BY w ORDER BY pos) nxt FROM bs${r - 1}),
         |rk$r AS MATERIALIZED (SELECT lhs, rhs, n,
         |    CAST(row_number() OVER (ORDER BY n DESC, lhs ASC, rhs ASC)
         |      AS BIGINT) k
         |  FROM (SELECT sym lhs, nxt rhs, sum(freq) n FROM ba$r
         |        WHERE nxt IS NOT NULL GROUP BY sym, nxt
         |        ORDER BY n DESC, lhs ASC, rhs ASC LIMIT $BpeCandWindow)),
         |pick$r AS (
         |  SELECT CAST(0 AS BIGINT) k, CAST([] AS VARCHAR[]) used,
         |         CAST([] AS VARCHAR[]) sl, CAST([] AS VARCHAR[]) sr,
         |         CAST([] AS BIGINT[]) sn
         |  UNION ALL
         |  SELECT r.k,
         |    CASE WHEN $sel THEN list_append(list_append(p.used, r.lhs), r.rhs)
         |         ELSE p.used END,
         |    CASE WHEN $sel THEN list_append(p.sl, r.lhs) ELSE p.sl END,
         |    CASE WHEN $sel THEN list_append(p.sr, r.rhs) ELSE p.sr END,
         |    CASE WHEN $sel THEN list_append(p.sn, CAST(r.n AS BIGINT))
         |         ELSE p.sn END
         |  FROM pick$r p JOIN rk$r r ON r.k = p.k + 1),
         |bw$r AS MATERIALIZED (SELECT unnest(sl) lhs, unnest(sr) rhs,
         |    unnest(sn) n
         |  FROM pick$r WHERE k = (SELECT max(k) FROM pick$r)),
         |bc$r AS MATERIALIZED (SELECT a.w, a.freq, a.pos, a.sym, a.nxt,
         |    (q.lhs IS NOT NULL) cand
         |  FROM ba$r a LEFT JOIN bw$r q ON a.sym = q.lhs AND a.nxt = q.rhs),
         |bg$r AS MATERIALIZED (SELECT w, pos FROM (
         |    SELECT w, pos, row_number() OVER (PARTITION BY w, grp ORDER BY pos) rn
         |    FROM (SELECT w, pos,
         |            pos - row_number() OVER (PARTITION BY w ORDER BY pos) grp
         |          FROM bc$r WHERE cand)) WHERE rn % 2 = 1),
         |bs$r AS MATERIALIZED (SELECT c.w, c.freq,
         |    row_number() OVER (PARTITION BY c.w ORDER BY c.pos) pos,
         |    CASE WHEN st.pos IS NOT NULL THEN c.sym || c.nxt ELSE c.sym END sym
         |  FROM bc$r c
         |  LEFT JOIN bg$r st ON st.w = c.w AND st.pos = c.pos
         |  LEFT JOIN bg$r cons ON cons.w = c.w AND cons.pos = c.pos - 1
         |  WHERE cons.pos IS NULL)""".stripMargin
    }.mkString(",\n")
    s"""bwd AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) freq FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) w FROM documents)
       |  WHERE length(w) >= 2 GROUP BY w),
       |bs0 AS MATERIALIZED (SELECT w, freq, pos, w[CAST(pos AS INT)] sym FROM (
       |    SELECT w, freq, unnest(range(1, length(w) + 1)) pos FROM bwd)),
       |$rounds""".stripMargin
  }

  /** The refill variant of [[duckBpeBatchedRounds]]: the pick recursion
    * walks STEPS t = (pass − 1)·|window| + k instead of window ranks,
    * carrying (i) the taken window indices, (ii) the CLOSED passes'
    * lhs/rhs/merged-output screens (cla/clb/clm — the count-invariance
    * condition), and (iii) the current pass's used-symbol and
    * pending-roll lists (cu/pl/pr/pm). At each pass boundary the pass
    * lists roll into the closed screens; recursion stops (`done`) when
    * a pass takes nothing or B is reached. The application is the SAME
    * single parity-islands pass as t33 over the round's UNION rule set:
    * the screen forbids exactly the rule1.rhs = rule2.lhs chains that
    * could make two different rules' candidate sites adjacent, so
    * adjacent candidate positions still only occur in self-pair runs
    * and the parity rule stays exact. */
  private lazy val duckBpeRefillRounds: String = {
    val B = BpeRefillB
    val W = BpeRefillWindow
    val sel = s"len(p.sl) < $B" +
      " AND NOT list_contains(p.tk, r.k)" +
      " AND NOT list_contains(p.cu, r.lhs)" +
      " AND NOT list_contains(p.cu, r.rhs)" +
      " AND NOT list_contains(p.clb, r.lhs)" +
      " AND NOT list_contains(p.clm, r.lhs)" +
      " AND NOT list_contains(p.cla, r.rhs)" +
      " AND NOT list_contains(p.clm, r.rhs)"
    // post-take values of the current-pass and take-order lists — each
    // repeated wherever the flat recursive SELECT needs them
    val PL1 = s"(CASE WHEN $sel THEN list_append(p.pl, r.lhs) ELSE p.pl END)"
    val PR1 = s"(CASE WHEN $sel THEN list_append(p.pr, r.rhs) ELSE p.pr END)"
    val PM1 = s"(CASE WHEN $sel THEN list_append(p.pm, r.lhs || r.rhs) ELSE p.pm END)"
    val SL1 = s"(CASE WHEN $sel THEN list_append(p.sl, r.lhs) ELSE p.sl END)"
    val rounds = (1 to BpeRounds).map { r =>
      s"""ra$r AS MATERIALIZED (SELECT w, freq, pos, sym,
         |  lead(sym) OVER (PARTITION BY w ORDER BY pos) nxt FROM rfs${r - 1}),
         |rrk$r AS MATERIALIZED (SELECT lhs, rhs, n,
         |    CAST(row_number() OVER (ORDER BY n DESC, lhs ASC, rhs ASC)
         |      AS BIGINT) k
         |  FROM (SELECT sym lhs, nxt rhs, sum(freq) n FROM ra$r
         |        WHERE nxt IS NOT NULL GROUP BY sym, nxt
         |        ORDER BY n DESC, lhs ASC, rhs ASC LIMIT $W)),
         |rnk$r AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) nk FROM rrk$r),
         |rpick$r AS (
         |  SELECT CAST(0 AS BIGINT) t, FALSE done,
         |         CAST([] AS BIGINT[]) tk,
         |         CAST([] AS VARCHAR[]) cla, CAST([] AS VARCHAR[]) clb,
         |         CAST([] AS VARCHAR[]) clm, CAST([] AS VARCHAR[]) cu,
         |         CAST([] AS VARCHAR[]) pl, CAST([] AS VARCHAR[]) pr,
         |         CAST([] AS VARCHAR[]) pm,
         |         CAST([] AS VARCHAR[]) sl, CAST([] AS VARCHAR[]) sr,
         |         CAST([] AS BIGINT[]) sn, CAST([] AS BIGINT[]) sp,
         |         CAST(1 AS BIGINT) pass
         |  UNION ALL
         |  SELECT p.t + 1,
         |    ((p.t + 1) % q.nk) = 0 AND
         |      (len($PL1) = 0 OR len($SL1) >= $B),
         |    CASE WHEN $sel THEN list_append(p.tk, r.k) ELSE p.tk END,
         |    CASE WHEN ((p.t + 1) % q.nk) = 0
         |         THEN list_concat(p.cla, $PL1) ELSE p.cla END,
         |    CASE WHEN ((p.t + 1) % q.nk) = 0
         |         THEN list_concat(p.clb, $PR1) ELSE p.clb END,
         |    CASE WHEN ((p.t + 1) % q.nk) = 0
         |         THEN list_concat(p.clm, $PM1) ELSE p.clm END,
         |    CASE WHEN ((p.t + 1) % q.nk) = 0 THEN CAST([] AS VARCHAR[])
         |         WHEN $sel THEN list_append(list_append(p.cu, r.lhs), r.rhs)
         |         ELSE p.cu END,
         |    CASE WHEN ((p.t + 1) % q.nk) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE $PL1 END,
         |    CASE WHEN ((p.t + 1) % q.nk) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE $PR1 END,
         |    CASE WHEN ((p.t + 1) % q.nk) = 0 THEN CAST([] AS VARCHAR[])
         |         ELSE $PM1 END,
         |    $SL1,
         |    CASE WHEN $sel THEN list_append(p.sr, r.rhs) ELSE p.sr END,
         |    CASE WHEN $sel THEN list_append(p.sn, CAST(r.n AS BIGINT))
         |         ELSE p.sn END,
         |    CASE WHEN $sel THEN list_append(p.sp, p.pass) ELSE p.sp END,
         |    CASE WHEN ((p.t + 1) % q.nk) = 0 THEN p.pass + 1 ELSE p.pass END
         |  FROM rpick$r p, rnk$r q, rrk$r r
         |  WHERE NOT p.done AND q.nk > 0 AND r.k = (p.t % q.nk) + 1),
         |rbw$r AS MATERIALIZED (
         |  SELECT unnest(sl) lhs, unnest(sr) rhs FROM rpick$r
         |  WHERE t = (SELECT max(t) FROM rpick$r)),
         |rbm$r AS MATERIALIZED (
         |  SELECT unnest(sp) refill_pass,
         |         unnest(range(1, len(sl) + 1)) batch_rank,
         |         unnest(sl) lhs, unnest(sr) rhs, unnest(sn) n
         |  FROM rpick$r WHERE t = (SELECT max(t) FROM rpick$r)),
         |rc$r AS MATERIALIZED (SELECT a.w, a.freq, a.pos, a.sym, a.nxt,
         |    (q.lhs IS NOT NULL) cand
         |  FROM ra$r a LEFT JOIN rbw$r q ON a.sym = q.lhs AND a.nxt = q.rhs),
         |rg$r AS MATERIALIZED (SELECT w, pos FROM (
         |    SELECT w, pos, row_number() OVER (PARTITION BY w, grp ORDER BY pos) rn
         |    FROM (SELECT w, pos,
         |            pos - row_number() OVER (PARTITION BY w ORDER BY pos) grp
         |          FROM rc$r WHERE cand)) WHERE rn % 2 = 1),
         |rfs$r AS MATERIALIZED (SELECT c.w, c.freq,
         |    row_number() OVER (PARTITION BY c.w ORDER BY c.pos) pos,
         |    CASE WHEN st.pos IS NOT NULL THEN c.sym || c.nxt ELSE c.sym END sym
         |  FROM rc$r c
         |  LEFT JOIN rg$r st ON st.w = c.w AND st.pos = c.pos
         |  LEFT JOIN rg$r cons ON cons.w = c.w AND cons.pos = c.pos - 1
         |  WHERE cons.pos IS NULL)""".stripMargin
    }.mkString(",\n")
    s"""rwd AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) freq FROM (
       |    SELECT unnest(string_split(lower(text), ' ')) w FROM documents)
       |  WHERE length(w) >= 2 GROUP BY w),
       |rfs0 AS MATERIALIZED (SELECT w, freq, pos, w[CAST(pos AS INT)] sym FROM (
       |    SELECT w, freq, unnest(range(1, length(w) + 1)) pos FROM rwd)),
       |$rounds""".stripMargin
  }

  lazy val oracles: Map[String, String] = Map(
    "t34_bpe_refill" -> {
      val sel = (1 to BpeRounds).map(r =>
        s"SELECT CAST($r AS BIGINT) merge_round, " +
          "CAST(refill_pass AS BIGINT) refill_pass, " +
          "CAST(batch_rank AS BIGINT) batch_rank, lhs, rhs, " +
          "lhs || rhs merged, CAST(n AS BIGINT) n_occurrences FROM rbm$r"
            .replace("$r", r.toString))
        .mkString("\nUNION ALL ")
      s"""WITH RECURSIVE $duckBpeRefillRounds,
         |m AS ($sel)
         |SELECT * FROM m ORDER BY merge_round, batch_rank""".stripMargin
    },

    "t30_rake" -> {
      val stopsSql = RakeStops.map(w => s"'$w'").mkString("(", ", ", ")")
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks
         |           FROM documents),
         |p AS (SELECT doc_id, CAST(i AS BIGINT) pos, toks[CAST(i AS INT)] w
         |      FROM t, unnest(range(1, len(toks) + 1)) u(i)),
         |s AS (SELECT doc_id, pos, w,
         |        CASE WHEN w IN $stopsSql THEN 1 ELSE 0 END is_stop,
         |        sum(CASE WHEN w IN $stopsSql THEN 1 ELSE 0 END)
         |          OVER (PARTITION BY doc_id ORDER BY pos) seg
         |      FROM p),
         |wd AS (SELECT doc_id, seg, w FROM s WHERE is_stop = 0),
         |ph AS (SELECT doc_id, seg, CAST(count(*) AS BIGINT) phrase_len
         |       FROM wd GROUP BY doc_id, seg)
         |SELECT wd.w AS word, CAST(count(*) AS BIGINT) AS freq,
         |       CAST(sum(ph.phrase_len) AS BIGINT) AS deg,
         |       CAST(CAST(sum(ph.phrase_len) AS HUGEINT) * 1000000
         |         // count(*) AS BIGINT) AS score_ppm
         |FROM wd JOIN ph USING (doc_id, seg)
         |GROUP BY wd.w
         |ORDER BY score_ppm DESC, word ASC LIMIT $RakeTopK""".stripMargin
    },

    // 1-based list positions: Duck's selected q = Spark's p + 1 — counts
    // and prints agree, the position sets are never emitted.
    "t29_winnowing" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks
         |           FROM documents),
         |g AS (SELECT doc_id,
         |        list_transform(generate_series(1, len(toks) - ${WinnowK - 1}), i ->
         |          ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
         |           1, 15))::BIGINT) hs
         |      FROM t WHERE len(toks) >= ${WinnowK + WinnowW - 1}),
         |s AS (SELECT doc_id, hs,
         |        list_distinct(list_transform(generate_series(1, len(hs) - ${WinnowW - 1}), j ->
         |          j + $WinnowW - list_position(list_reverse(hs[j:j+${WinnowW - 1}]),
         |            list_aggregate(hs[j:j+${WinnowW - 1}], 'min')))) sel
         |      FROM g)
         |SELECT doc_id,
         |       CAST(len(hs) AS BIGINT) AS n_grams,
         |       CAST(len(hs) - ${WinnowW - 1} AS BIGINT) AS n_windows,
         |       CAST(len(sel) AS BIGINT) AS n_selected,
         |       CAST(len(list_distinct(list_transform(sel,
         |            p -> hs[CAST(p AS INT)]))) AS BIGINT) AS n_prints,
         |       CAST(len(sel) AS BIGINT) * 1000000
         |         // (len(hs) - ${WinnowW - 1}) AS density_ppm
         |FROM s ORDER BY doc_id""".stripMargin,

    "t28_blocklist_gate" -> {
      val listSql = Blocklist.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks
         |           FROM documents)
         |SELECT doc_id,
         |       CAST(len(toks) AS BIGINT) AS n_toks,
         |       CAST(len(list_filter(toks, x -> list_contains($listSql, x)))
         |            AS BIGINT) AS n_blocked,
         |       CAST(len(list_filter(list_distinct(toks),
         |            x -> list_contains($listSql, x))) AS BIGINT)
         |         AS n_distinct_blocked,
         |       CAST(CASE WHEN len(list_filter(toks,
         |            x -> list_contains($listSql, x))) = 0
         |            THEN 1 ELSE 0 END AS INTEGER) AS pass
         |FROM t ORDER BY doc_id""".stripMargin
    },

    // States the STRING-shingle side of the d4 fingerprint argument.
    "t27_source_overlap" ->
      s"""WITH ${DedupQueries.duckShingled},
         |sv AS (SELECT DISTINCT d.source, u.fp
         |       FROM (SELECT doc_id, unnest(sh) fp FROM shingled) u
         |       JOIN documents d USING (doc_id)),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) n FROM sv GROUP BY 1),
         |it AS (SELECT a.source src_a, b.source src_b,
         |         CAST(count(*) AS BIGINT) n_common
         |       FROM sv a JOIN sv b ON a.fp = b.fp AND a.source < b.source
         |       GROUP BY 1, 2)
         |SELECT src_a, src_b, za.n AS n_a, zb.n AS n_b, n_common,
         |       CAST(CAST(n_common AS HUGEINT) * 1000000
         |            // (za.n + zb.n - n_common) AS BIGINT) AS jaccard_ppm
         |FROM it JOIN sz za ON za.source = it.src_a
         |        JOIN sz zb ON zb.source = it.src_b
         |ORDER BY src_a, src_b""".stripMargin,

    "t26_burstiness" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) term
         |           FROM documents),
         |tf AS (SELECT doc_id, term, count(*) tf FROM t GROUP BY 1, 2),
         |n AS (SELECT count(*) n FROM documents),
         |g AS (SELECT term, CAST(count(*) AS BIGINT) df,
         |        CAST(sum(tf) AS BIGINT) total_tf,
         |        CAST(sum(tf * tf) AS BIGINT) sum_tf2
         |      FROM tf GROUP BY term),
         |top AS (SELECT * FROM g, n
         |        ORDER BY total_tf DESC, term ASC LIMIT $BurstTopK)
         |SELECT term, df, total_tf, sum_tf2,
         |       CAST(CAST(n * sum_tf2 - total_tf * total_tf AS HUGEINT) * 1000000
         |            // (n * total_tf) AS BIGINT) AS vmr_ppm
         |FROM top ORDER BY term""".stripMargin,
    "t25_ccnet_buckets" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
        |s AS (SELECT doc_id, tk, unnest(range(1, len(tk))) i
        |      FROM t WHERE len(tk) >= 2),
        |bg AS (SELECT doc_id, tk[i] w1, tk[i+1] w2 FROM s),
        |c12 AS (SELECT w1, w2, count(*) c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) c1 FROM bg GROUP BY 1),
        |j AS (SELECT doc_id,
        |        CAST(round(round(ln(c12.c12 * 1.0 / c1.c1), 6) * 1000000.0, 0)
        |          AS BIGINT) lpm
        |      FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)),
        |lm AS (SELECT doc_id,
        |         round(CAST(sum(lpm) AS DOUBLE) / count(*) / 1000000.0, 6)
        |           avg_logprob
        |       FROM j GROUP BY doc_id),
        |sc AS (SELECT lm.doc_id, d.lang,
        |         CAST(round(avg_logprob * 1000000.0, 0) AS BIGINT) alp
        |       FROM lm JOIN documents d USING (doc_id)),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang
        |          ORDER BY alp DESC, doc_id ASC) - 1 rk0,
        |        count(*) OVER (PARTITION BY lang) nl
        |      FROM sc)
        |SELECT doc_id, lang, CAST(rk0 + 1 AS BIGINT) AS rank_in_lang,
        |       CASE WHEN rk0 * 3 // nl = 0 THEN 'head'
        |            WHEN rk0 * 3 // nl = 1 THEN 'middle'
        |            ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,

    "t24_hash_features" -> {
      val fields = (0 until HashFeatDim)
        .map(b => s"CAST(len(list_filter(bs, x -> x = $b)) AS BIGINT) f$b")
        .mkString(",\n         |       ")
      val norm2 = (0 until HashFeatDim).map(b => s"f$b * f$b").mkString(" + ")
      s"""WITH t AS (SELECT doc_id,
         |        list_transform(string_split(lower(text), ' '),
         |          w -> ('0x' || substr(md5(w), 1, 8))::BIGINT % $HashFeatDim) bs
         |      FROM documents),
         |f AS (SELECT doc_id, CAST(len(bs) AS BIGINT) n_toks,
         |       $fields
         |      FROM t)
         |SELECT *, $norm2 AS norm2 FROM f ORDER BY doc_id""".stripMargin
    },

    "t23_dsir" ->
      s"""WITH t AS (SELECT doc_id,
         |        CASE WHEN source IN ('src0','src1') THEN 1 ELSE 0 END is_tgt,
         |        string_split(lower(text), ' ') toks
         |      FROM documents),
         |g AS (SELECT doc_id, is_tgt,
         |        ('0x' || substr(md5(gg), 1, 8))::BIGINT % $DsirBuckets b
         |      FROM (SELECT doc_id, is_tgt,
         |              unnest(list_transform(range(1, len(toks)),
         |                i -> toks[i] || ' ' || toks[i+1])) gg
         |            FROM t)),
         |c AS (SELECT b, SUM(is_tgt) tgt_b, SUM(1 - is_tgt) raw_b FROM g GROUP BY b),
         |sp AS (SELECT unnest(range(0, $DsirBuckets)) b),
         |cc AS (SELECT sp.b, coalesce(tgt_b, 0) tgt_b, coalesce(raw_b, 0) raw_b
         |       FROM sp LEFT JOIN c USING (b)),
         |tot AS (SELECT SUM(tgt_b) tgt_tot, SUM(raw_b) raw_tot FROM cc),
         |w AS (SELECT b,
         |        CAST(round(round(ln((tgt_b + 1) * 1.0 / (tgt_tot + $DsirBuckets)), 6)
         |             * 1000000.0, 0) AS BIGINT)
         |        - CAST(round(round(ln((raw_b + 1) * 1.0 / (raw_tot + $DsirBuckets)), 6)
         |             * 1000000.0, 0) AS BIGINT) wm
         |      FROM cc CROSS JOIN tot)
         |SELECT doc_id, is_tgt, CAST(count(*) AS BIGINT) AS n_bigrams,
         |       CAST(SUM(wm) AS BIGINT) AS logw_micro
         |FROM g JOIN w USING (b)
         |GROUP BY doc_id, is_tgt ORDER BY doc_id""".stripMargin,

    "t22_gopher_gate" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks
         |           FROM documents),
         |s AS (SELECT doc_id,
         |        CAST(len(toks) AS BIGINT) n_toks,
         |        CAST(list_aggregate(list_transform(toks, w -> len(w)), 'sum')
         |             AS BIGINT) tok_chars,
         |        CAST(len(list_distinct(toks)) AS BIGINT) n_distinct,
         |        CAST(list_aggregate(list_transform(list_distinct(toks),
         |               u -> len(list_filter(toks, w -> w = u))), 'max')
         |             AS BIGINT) top_tok,
         |        CAST(len(list_filter(toks,
         |               w -> w IN ('the','a','of','and','to'))) AS BIGINT) n_stop
         |      FROM t),
         |r AS (SELECT doc_id, n_toks,
         |        CASE WHEN n_toks >= $GateMinToks THEN 1 ELSE 0 END r_len,
         |        CASE WHEN tok_chars * 10 >= n_toks * 38
         |              AND tok_chars * 10 <= n_toks * 52 THEN 1 ELSE 0 END r_meanlen,
         |        CASE WHEN n_distinct * 5 >= n_toks * 2 THEN 1 ELSE 0 END r_ttr,
         |        CASE WHEN top_tok * 5 <= n_toks THEN 1 ELSE 0 END r_top,
         |        CASE WHEN n_stop >= 1 THEN 1 ELSE 0 END r_stop
         |      FROM s)
         |SELECT doc_id, n_toks, r_len, r_meanlen, r_ttr, r_top, r_stop,
         |       least(r_len, r_meanlen, r_ttr, r_top, r_stop) AS pass
         |FROM r ORDER BY doc_id""".stripMargin,

    "t21_oov_rate" ->
      s"""WITH tf AS (
         |  SELECT doc_id, w AS term, count(*) AS tf FROM (
         |    SELECT doc_id, unnest(string_split(lower(text), ' ')) w
         |    FROM documents)
         |  GROUP BY doc_id, w),
         |vocab AS (
         |  SELECT term FROM (
         |    SELECT term, CAST(SUM(tf) AS BIGINT) cnt FROM tf GROUP BY term)
         |  ORDER BY cnt DESC, term ASC LIMIT $OovVocabK)
         |SELECT doc_id,
         |       CAST(SUM(tf) AS BIGINT) AS n_toks,
         |       CAST(SUM(CASE WHEN term IN (SELECT term FROM vocab)
         |                     THEN 0 ELSE tf END) AS BIGINT) AS n_oov,
         |       CAST(SUM(CASE WHEN term IN (SELECT term FROM vocab)
         |                     THEN 0 ELSE tf END) * 1000000
         |            // SUM(tf) AS BIGINT) AS oov_ppm
         |FROM tf
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t20_readability" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks
        |           FROM documents),
        |s AS (SELECT doc_id,
        |        CAST(len(toks) AS BIGINT) n_toks,
        |        CAST(list_aggregate(list_transform(toks, w ->
        |          greatest(len(regexp_extract_all(w, '[aeiou]+')), 1)),
        |          'sum') AS BIGINT) n_syll
        |      FROM t)
        |SELECT doc_id, n_toks, n_syll,
        |       greatest((n_toks + 14) // 15, 1) AS n_sent,
        |       round(206.835 - 1.015 * (CAST(n_toks AS DOUBLE) /
        |               greatest((n_toks + 14) // 15, 1))
        |             - 84.6 * (CAST(n_syll AS DOUBLE) / n_toks), 6) AS flesch
        |FROM s ORDER BY doc_id""".stripMargin,

    "t19_langid_confusion" ->
      s"""WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') toks FROM documents),
         |c AS (SELECT doc_id, lang,
         |        len(list_filter(toks, w -> w IN $EnMarkers)) cnt_en,
         |        len(list_filter(toks, w -> w IN $EsMarkers)) cnt_es,
         |        len(list_filter(toks, w -> w IN $DeMarkers)) cnt_de
         |      FROM t),
         |p AS (SELECT lang labeled_lang,
         |        CASE WHEN cnt_en > cnt_es AND cnt_en > cnt_de THEN 'en'
         |             WHEN cnt_es > cnt_de THEN 'es'
         |             WHEN cnt_de > cnt_en THEN 'de'
         |             ELSE 'und' END pred_lang
         |      FROM c),
         |cm AS (SELECT labeled_lang, pred_lang, CAST(count(*) AS BIGINT) n
         |       FROM p GROUP BY 1, 2),
         |tt AS (SELECT CAST(sum(n) AS BIGINT) tot FROM cm)
         |SELECT labeled_lang, pred_lang, n,
         |       round(n::DOUBLE / tot, 6) AS share,
         |       labeled_lang = pred_lang AS is_hit
         |FROM cm, tt ORDER BY labeled_lang, pred_lang""".stripMargin,

    "t18_novelty" ->
      s"""WITH ${DedupQueries.duckShingled},
         |ex AS (SELECT doc_id, unnest(sh) g FROM shingled),
         |f AS (SELECT g, count(*) f FROM ex GROUP BY g)
         |SELECT doc_id, count(*) AS n_shingles,
         |       CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |       round(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6)
         |         AS novelty
         |FROM ex JOIN f USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t13_shingle_udtf" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
        |s AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i
        |      FROM t WHERE len(tk) >= 3)
        |SELECT doc_id, CAST(i - 1 AS INT) AS pos,
        |       tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
        |FROM s ORDER BY doc_id, pos""".stripMargin,

    // K BPE rounds unrolled as chained CTEs (the d19/s27 discipline) via
    // the shared [[duckBpeRounds]] builder; the merge table is the union
    // of the per-round 1-row argmax frames.
    "t31_bpe_train" -> {
      val sel = (1 to BpeRounds).map(r =>
        s"SELECT CAST($r AS BIGINT) merge_round, lhs, rhs, lhs || rhs merged, " +
          s"CAST(n AS BIGINT) n_occurrences FROM w$r")
        .mkString("\nUNION ALL ")
      s"""WITH $duckBpeRounds
         |$sel
         |ORDER BY merge_round""".stripMargin
    },

    "t33_bpe_train_batched" -> {
      val sel = (1 to BpeRounds).map(r =>
        s"SELECT CAST($r AS BIGINT) merge_round, " +
          "CAST(row_number() OVER (ORDER BY n DESC, lhs ASC, rhs ASC) " +
          "AS BIGINT) batch_rank, lhs, rhs, lhs || rhs merged, " +
          s"CAST(n AS BIGINT) n_occurrences FROM bw$r")
        .mkString("\nUNION ALL ")
      s"""WITH RECURSIVE $duckBpeBatchedRounds,
         |m AS ($sel)
         |SELECT * FROM m ORDER BY merge_round, batch_rank""".stripMargin
    },

    // the trained segmentation s{K} applied back to the document token
    // stream; out-of-vocabulary words (length < 2) fall back to their
    // character count, exactly like the engine's left-join coalesce.
    "t32_bpe_apply" ->
      s"""WITH $duckBpeRounds,
         |sub AS (SELECT w, CAST(count(*) AS BIGINT) n_sub
         |        FROM s$BpeRounds GROUP BY w),
         |dt AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) w
         |       FROM documents)
         |SELECT dt.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_ws_tokens,
         |       CAST(sum(coalesce(sub.n_sub, length(dt.w))) AS BIGINT)
         |         AS n_bpe_tokens,
         |       CAST(sum(coalesce(sub.n_sub, length(dt.w))) * 1000000
         |            // count(*) AS BIGINT) AS expansion_ppm
         |FROM dt LEFT JOIN sub ON dt.w = sub.w
         |GROUP BY dt.doc_id
         |ORDER BY dt.doc_id""".stripMargin,

    "t12_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest(string_split(lower(text), ' ')) w FROM documents),
         |p AS (SELECT w,
         |        unnest(list_transform(range(1, length(w)),
         |          i -> substr(w, CAST(i AS INT), 2))) pair
         |      FROM w WHERE length(w) >= 2)
         |SELECT pair, count(*) AS n_occurrences,
         |       count(DISTINCT w) AS n_tokens
         |FROM p GROUP BY pair
         |ORDER BY n_occurrences DESC, pair ASC LIMIT $BpeTopK""".stripMargin,

    "t11_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
        |s AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk)-2)) i
        |      FROM t WHERE len(tk) >= 3),
        |tri AS (SELECT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] tri FROM s),
        |mult AS (SELECT doc_id, tri, count(*) m FROM tri GROUP BY 1, 2),
        |agg AS (SELECT doc_id,
        |          CAST(sum(m) AS BIGINT) n_tri,
        |          CAST(count(*) AS BIGINT) n_tri_distinct,
        |          CAST(max(m) AS BIGINT) max_repeat
        |        FROM mult GROUP BY doc_id)
        |SELECT doc_id, n_tri, n_tri_distinct, max_repeat,
        |       round(1.0 - n_tri_distinct * 1.0 / n_tri, 6) AS dup_ratio
        |FROM agg ORDER BY doc_id""".stripMargin,

    "t10_lm_score" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
        |s AS (SELECT doc_id, tk, unnest(range(1, len(tk))) i
        |      FROM t WHERE len(tk) >= 2),
        |bg AS (SELECT doc_id, tk[i] w1, tk[i+1] w2 FROM s),
        |c12 AS (SELECT w1, w2, count(*) c12 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) c1 FROM bg GROUP BY 1),
        |j AS (SELECT doc_id,
        |        CAST(round(round(ln(c12.c12 * 1.0 / c1.c1), 6) * 1000000.0, 0)
        |          AS BIGINT) lpm
        |      FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       round(CAST(sum(lpm) AS DOUBLE) / count(*) / 1000000.0, 6)
        |         AS avg_logprob,
        |       round(min(lpm) / 1000000.0, 6) AS min_lp
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "t9_cms_heavy_hitters" ->
      s"""WITH ex AS (
        |  SELECT unnest(string_split(lower(text), ' ')) term FROM documents),
        |freq AS (SELECT term, CAST(count(*) AS BIGINT) n_exact FROM ex GROUP BY 1),
        |rs AS (SELECT unnest(range(0, $CmsRows)) r),
        |cb AS (SELECT term, n_exact, r,
        |         ('0x' || substr(md5('cms' || r::VARCHAR || '|' || term), 1, 8))::BIGINT
        |           % $CmsWidth AS bucket
        |       FROM freq, rs),
        |sketch AS (SELECT r, bucket, sum(n_exact) c FROM cb GROUP BY 1, 2),
        |topk AS (SELECT term, n_exact FROM freq
        |         ORDER BY n_exact DESC, term LIMIT $CmsTopK),
        |tb AS (SELECT term, n_exact, r,
        |         ('0x' || substr(md5('cms' || r::VARCHAR || '|' || term), 1, 8))::BIGINT
        |           % $CmsWidth AS bucket
        |       FROM topk, rs)
        |SELECT t.term, t.n_exact, CAST(min(s.c) AS BIGINT) AS n_est
        |FROM tb t JOIN sketch s ON t.r = s.r AND t.bucket = s.bucket
        |GROUP BY t.term, t.n_exact
        |ORDER BY n_exact DESC, term""".stripMargin,

    "t8_pii_redact" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         text || ' contact user' || doc_id::VARCHAR ||
        |           '@example.com or +1-555-' || lpad(doc_id::VARCHAR, 7, '0') AS dirty
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, dirty,
        |         regexp_replace(regexp_replace(dirty,
        |           '[a-z0-9]+@[a-z]+\.[a-z]+', '<EMAIL>', 'g'),
        |           '\+1-555-[0-9]+', '<PHONE>', 'g') AS redacted
        |  FROM d)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(dirty, '[a-z0-9]+@[a-z]+\.[a-z]+')) AS BIGINT)
        |         AS n_emails,
        |       CAST(len(regexp_extract_all(dirty, '\+1-555-[0-9]+')) AS BIGINT)
        |         AS n_phones,
        |       CAST(len(redacted) AS BIGINT) AS n_chars_redacted,
        |       md5(redacted) AS redacted_md5
        |FROM r ORDER BY doc_id""".stripMargin,

    "t7_diversity" ->
      """WITH ex AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) w FROM documents),
        |tf AS (SELECT doc_id, w, count(*) c FROM ex GROUP BY 1, 2),
        |ag AS (SELECT doc_id,
        |         CAST(sum(c) AS BIGINT) n_toks,
        |         CAST(count(*) AS BIGINT) n_types,
        |         CAST(sum(c * c) AS BIGINT) c2,
        |         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) n_hapax
        |       FROM tf GROUP BY 1)
        |SELECT doc_id, n_toks, n_types,
        |       round(n_types * 1.0 / n_toks, 6) AS ttr,
        |       round(1.0 - c2 * 1.0 / (n_toks * n_toks), 6) AS simpson,
        |       round(n_hapax * 1.0 / n_types, 6) AS hapax_ratio
        |FROM ag ORDER BY doc_id""".stripMargin,

    "t1_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') toks FROM documents),
         |c AS (SELECT doc_id, lang,
         |        len(list_filter(toks, w -> w IN $EnMarkers)) cnt_en,
         |        len(list_filter(toks, w -> w IN $EsMarkers)) cnt_es,
         |        len(list_filter(toks, w -> w IN $DeMarkers)) cnt_de
         |      FROM t)
         |SELECT doc_id, lang AS labeled_lang, cnt_en, cnt_es, cnt_de,
         |       CASE WHEN cnt_en > cnt_es AND cnt_en > cnt_de THEN 'en'
         |            WHEN cnt_es > cnt_de THEN 'es'
         |            WHEN cnt_de > cnt_en THEN 'de'
         |            ELSE 'und' END AS pred_lang
         |FROM c ORDER BY doc_id""".stripMargin,

    "t2_quality" ->
      s"""WITH t AS (SELECT doc_id, text, string_split(lower(text), ' ') toks FROM documents),
         |c AS (SELECT doc_id, text,
         |        len(toks) n_toks,
         |        list_aggregate(list_transform(toks, w -> len(w)), 'sum') tok_chars,
         |        len(list_filter(toks, w -> w IN $EnMarkers)) n_stop,
         |        len(regexp_extract_all(text, '[^a-z0-9 ]')) n_punct
         |      FROM t)
         |SELECT doc_id, n_toks,
         |       round(tok_chars * 1.0 / n_toks, 6) AS avg_token_len,
         |       round(n_stop * 1.0 / n_toks, 6) AS stop_ratio,
         |       round(n_punct * 1.0 / length(text), 6) AS punct_ratio,
         |       round((least(n_toks, 100) / 100.0) * (1.0 - n_stop * 1.0 / n_toks)
         |             * (1.0 - n_punct * 1.0 / length(text)), 6) AS quality_score
         |FROM c ORDER BY doc_id""".stripMargin,

    "t3_tokencount" ->
      """SELECT doc_id,
        |       len(string_split(text, ' ')) AS ws_tokens,
        |       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "t4_fingerprint" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks FROM documents)
         |SELECT doc_id,
         |       md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp_set,
         |       list_reduce(list_prepend(CAST(0 AS BIGINT),
         |         list_transform(toks, w -> CAST($duckTokenVal AS BIGINT))),
         |         (acc, x) -> (acc * 31 + x) % 1000000007) AS fp_rolling
         |FROM t ORDER BY doc_id""".stripMargin,

    "t5_tfidf" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') toks FROM documents),
         |ex AS (SELECT doc_id, unnest(toks) term FROM t),
         |tf AS (SELECT doc_id, term, count(*) tf FROM ex GROUP BY 1, 2),
         |df AS (SELECT term, count(DISTINCT doc_id) df FROM ex GROUP BY 1),
         |n AS (SELECT count(*) n FROM documents),
         |sc AS (SELECT doc_id, term, tf.tf, df.df,
         |         round(tf.tf * ln((n.n + 1.0) / (df.df + 1.0)), 6) score
         |       FROM tf JOIN df USING (term), n),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |         ORDER BY score DESC, term ASC) AS BIGINT) rk FROM sc)
         |SELECT doc_id, term, tf, df, score, rk
         |FROM rk WHERE rk <= $TfIdfTopK ORDER BY doc_id, rk""".stripMargin,

    "t6_kmv_distinct" ->
      s"""WITH t AS (SELECT doc_id, lang, string_split(lower(text), ' ') toks FROM documents),
         |dist AS (SELECT DISTINCT lang, w FROM (SELECT lang, unnest(toks) w FROM t)),
         |h AS (SELECT lang, w, ('0x' || substr(md5(w), 1, 15))::BIGINT h FROM dist),
         |ranked AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h ASC) rk FROM h),
         |kth AS (SELECT lang, h kth_hash FROM ranked WHERE rk = $KmvK),
         |exact AS (SELECT lang, count(*) n_exact FROM dist GROUP BY 1)
         |SELECT exact.lang, n_exact, kth_hash,
         |       round(CASE WHEN kth_hash IS NOT NULL
         |             THEN ${KmvK - 1} * 1152921504606846976.0 / kth_hash
         |             ELSE n_exact * 1.0 END, 4) AS est
         |FROM exact LEFT JOIN kth ON exact.lang = kth.lang
         |ORDER BY exact.lang""".stripMargin,

    // Fractional literals are ::DOUBLE so DuckDB doesn't read them as
    // DECIMAL (decimal-exact `tf * 2.2` would differ from Spark's
    // double(tf)*double(2.2) in the last ulp).
    "t14_bm25" -> {
      val terms = Bm25QueryTerms.map(t => s"'$t'").mkString("(", ",", ")")
      s"""WITH ex AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) tf FROM ex GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) dl FROM tf GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(dl) AS BIGINT) tt FROM dl),
         |qt AS (SELECT * FROM tf WHERE term IN $terms),
         |dfq AS (SELECT term, CAST(count(*) AS BIGINT) df FROM qt GROUP BY 1),
         |sc AS (SELECT q.doc_id,
         |         CAST(round(ln(1.0::DOUBLE + (st.n - dfq.df + 0.5::DOUBLE) / (dfq.df + 0.5::DOUBLE))
         |           * (q.tf * 2.2::DOUBLE)
         |           / (q.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * (d.dl / (st.tt / st.n))))
         |           * 1000000.0::DOUBLE, 0) AS BIGINT) cm
         |       FROM qt q JOIN dfq USING (term) JOIN dl d USING (doc_id), st)
         |SELECT doc_id, CAST(sum(cm) AS BIGINT) AS score_micro,
         |       CAST(count(*) AS BIGINT) AS n_terms
         |FROM sc GROUP BY doc_id
         |ORDER BY score_micro DESC, doc_id ASC LIMIT $Bm25TopK""".stripMargin
    },

    "t15_pmi" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
         |s AS (SELECT doc_id, tk, unnest(range(1, len(tk))) i
         |      FROM t WHERE len(tk) >= 2),
         |bg AS (SELECT doc_id, tk[i] w1, tk[i+1] w2 FROM s),
         |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) c12 FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) c1 FROM bg GROUP BY 1),
         |c2 AS (SELECT w2, CAST(count(*) AS BIGINT) c2 FROM bg GROUP BY 1),
         |nb AS (SELECT CAST(count(*) AS BIGINT) nb FROM bg)
         |SELECT w1, w2, c12, round(ln(c12 / c1 / c2 * nb), 6) AS pmi
         |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), nb
         |WHERE c12 >= $PmiMinCount
         |ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT $PmiTopK""".stripMargin,

    "t16_zipf" ->
      """WITH ex AS (SELECT unnest(string_split(lower(text), ' ')) term FROM documents),
        |f AS (SELECT term, CAST(count(*) AS BIGINT) c FROM ex GROUP BY 1),
        |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) rank FROM f),
        |m AS (SELECT CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0, 0) AS BIGINT) xm,
        |             CAST(round(ln(CAST(c AS DOUBLE)) * 1000000.0, 0) AS BIGINT) ym
        |      FROM r),
        |a AS (SELECT CAST(count(*) AS BIGINT) n_terms, sum(xm) sx, sum(ym) sy,
        |             sum(xm * ym) sxy, sum(xm * xm) sxx FROM m)
        |SELECT n_terms,
        |       round(CAST(n_terms * sxy - sx * sy AS DOUBLE)
        |             / CAST(n_terms * sxx - sx * sx AS DOUBLE), 6) AS slope,
        |       round(CAST(sy * sxx - sx * sxy AS DOUBLE)
        |             / CAST(n_terms * sxx - sx * sx AS DOUBLE) / 1000000.0, 6) AS intercept
        |FROM a""".stripMargin,

    "t17_kl_drift" ->
      """WITH ex AS (SELECT source, unnest(string_split(lower(text), ' ')) term
        |            FROM documents),
        |st AS (SELECT source, term, CAST(count(*) AS BIGINT) c_st FROM ex GROUP BY 1, 2),
        |ct AS (SELECT term, CAST(sum(c_st) AS BIGINT) c_t FROM st GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c_st) AS BIGINT) n_s FROM st GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_t) AS BIGINT) n FROM ct),
        |j AS (SELECT st.source, st.c_st, ns.n_s,
        |        CAST(round(ln(CAST(c_st AS DOUBLE) / n_s / c_t * n) * 1000000.0, 0)
        |          AS BIGINT) lrm
        |      FROM st JOIN ct USING (term) JOIN ns USING (source), tot)
        |SELECT source, max(n_s) AS n_toks,
        |       round(CAST(sum(CAST(c_st AS HUGEINT) * lrm) AS DOUBLE) / max(n_s) / 1000000.0, 6) AS kl
        |FROM j GROUP BY source ORDER BY source""".stripMargin
  )
}
