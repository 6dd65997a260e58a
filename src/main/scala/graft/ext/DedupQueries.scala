package graft.ext

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table — the LLM-pipeline
  * extension surface (exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup).
  *
  * Every hash primitive is md5-based so the DuckDB oracle can replicate the
  * computation bit-for-bit (md5 is the one cryptographic hash both engines
  * share; Spark's murmur `hash`/`xxhash64` have no DuckDB twin). MinHash
  * over hex strings works because lexicographic min of fixed-width hex ==
  * numeric min.
  *
  * Scale posture: nothing here ever cross-joins the corpus. LSH candidates
  * come from an equi-join on band keys (shuffle on band key, the classic
  * bucket join); exact n-gram Jaccard uses an inverted-index join on
  * shingles; embedding pairs go through the same band trick in
  * SimilarityQueries. At 100 TB the only all-pairs work done is inside a
  * bucket.
  */
object DedupQueries {

  val NumHashes = 16
  val NumBands  = 8          // 8 bands x 2 rows: P(candidate | j=0.8) ≈ 1 - 0.36^8 ≈ 0.9997
  val JaccardThreshold = 0.5 // planted near-dups sit at >=0.8, noise <0.2

  /** One combined persisted frame per (session, dir):
    * `(doc_id, shh, hs0..hs3)` — 64-bit shingle fingerprints plus one
    * 4-field minhash struct per salt. d2/d3/d4 each reference this subtree
    * 2-4 times in their DAGs, and lazy evaluation would otherwise re-read
    * the parquet and re-shingle on every reference. The persist boundary
    * also forces SINGLE evaluation of the salted md5 digest arrays:
    * interpreted higher-order expressions get no common-subexpression
    * elimination, so a collapsed projection where 4 min-extract columns
    * each reference the same `transform(sh, md5...)` recomputes the whole
    * digest array 4x (the old two-cache layout paid exactly that, plus a
    * second persisted copy of the big shingle-string arrays).
    */
  private val caches = new DirCaches
  private val baseCache = caches.newCache()

  /** d4's prefix posting lists (df-ordered, length-annotated, exploded) —
    * derived from [[base]] but expensive enough (global df aggregate +
    * per-doc collect_list/sort/slice) to checkpoint once per (session,
    * dir) themselves: the candidate stage probes this frame on BOTH join
    * sides, and index reuse is what an inverted-index join amortizes in a
    * real pipeline (build once, query at every threshold sweep). */
  private val prefixCache = caches.newCache()

  /** Evict cached frames for `spark` keyed to a different dir: a long-lived
    * session walking several scale factors (Bench warmup dir → target dir)
    * would otherwise accumulate persisted blocks indefinitely. Only one dir
    * per session is ever hot at a time. */
  private def evictOtherDirs(spark: SparkSession, dir: String): Unit =
    caches.evictOtherDirs(spark, dir)

  /** Drop every cached frame (Bench/Verify teardown hook) — shared
    * [[DirCaches]] discipline, eager unpersist. */
  def clearCaches(): Unit = caches.clear()

  /** Accumulator init for the per-salt slice minima: 2^32 exceeds every
    * 8-hex value, so folding `least` over the digest array reproduces
    * `array_min` exactly. */
  private val SliceMax = "4294967296L"

  /** Per-row shingle + salted-minhash projection over ANY frame carrying
    * (doc_id, text, …): pure row-local expressions — no corpus state, no
    * shuffle — so the SAME kernel feeds the batch index build ([[base]])
    * and the streaming near-dup operator
    * ([[graft.streaming.StreamOps.streamingNearDupPairs]]), which is what
    * makes their pair sets provably comparable. Emits the input columns
    * minus text/helpers, plus `shh` and the hs0..hs3 minhash structs.
    * Rows with <3 tokens carry no shingle and drop (the d2 contract). */
  private[graft] def withSignatures(docs: DataFrame): DataFrame = {
    val sh = docs
      .withColumn("toks", split(lower(col("text")), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", expr(
        "array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))
    val withMins = (0 until Salts).foldLeft(sh) { (d, j) =>
      // transform() is the aggregate's input argument, so the digest
      // array materializes once and all 4 slice minima fold over it in
      // a single traversal.
      val accInit = (0 until SlicesPerSalt)
        .map(k => s"'m$k', $SliceMax").mkString(", ")
      val accStep = (0 until SlicesPerSalt)
        .map(k => s"'m$k', least(acc.m$k, ${hexSliceSpark("m", 8 * k + 1, 8)})")
        .mkString(", ")
      d.withColumn(s"hs$j", expr(
        s"aggregate(transform(sh, s -> md5(concat('$j|', s))), " +
          s"named_struct($accInit), (acc, m) -> named_struct($accStep))"))
    }
    val keep = docs.columns.filterNot(_ == "text").map(col)
    withMins
      // 64-bit shingle fingerprints, SORTED once per document: exact-
      // Jaccard verification merge-counts these instead of intersecting
      // the string arrays (long comparisons + zero allocation vs a hash
      // set per candidate pair). Distinct strings collide in 64 bits
      // with P ≈ n²/2^65 (~1e-8 for this corpus), so |sh ∩| == |shh ∩|
      // and the oracle's string-side Jaccard matches.
      .withColumn("shh", expr("array_sort(transform(sh, s -> xxhash64(s)))"))
      .select(keep ++ (col("shh") +:
        (0 until Salts).map(j => col(s"hs$j"))): _*)
  }

  /** The 16 flat minhash columns h0..h15 out of the hs0..hs3 structs. */
  private[graft] def flatHashCols: Seq[Column] =
    (0 until NumHashes).map { i =>
      val (j, k) = (i / SlicesPerSalt, i % SlicesPerSalt)
      col(s"hs$j").getField(s"m$k").as(s"h$i")
    }

  private def base(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    evictOtherDirs(spark, dir)
    baseCache.getOrElseUpdate((spark, dir), {
      // `source` rides the index build (the documents scan already pays
      // for it): provenance consumers (t27, d25-adjacent) read it off
      // the checkpoint instead of a doc-grain join back to documents —
      // at the 100x blow-up that join crossed the broadcast tier and
      // shuffled the fat shh-array side (662 MB measured) for a column
      // the build had in hand.
      withSignatures(Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
        // documents.parquet is a single file → a single input split; the
        // md5-heavy shingle/minhash work downstream would otherwise run
        // on one core. Spread rows with an EXPLICIT derived count — a
        // bare repartition(col) is coalesced back to ~1 partition by
        // AQE's byte-based rule (graft.ops.PlanHints.computeFanout).
        .repartition(graft.ops.PlanHints.computeFanout(docCount(spark, dir)),
          col("doc_id")))
        // localCheckpoint, not persist: both cache the rows, but persist
        // leaves the full shingle/minhash expression forest in the lineage
        // of every consumer, and d3/d4/d8's self-joins then re-analyze and
        // re-optimize that forest 2-4x per action (~0.5 s of pure planning
        // per query at ANY scale factor — it dwarfed execution at sf0.01).
        // Checkpointing makes every downstream plan start from a
        // LogicalRDD leaf. Eviction happens by dropping the reference:
        // the ContextCleaner unpersists the backing RDD once unreachable.
        .localCheckpoint()
    })
  }

  /** `(doc_id, shh)` view of [[base]] for Jaccard verification; exposed to
    * the package so p8's decontamination probe shares the checkpointed
    * shingle index instead of re-shingling the corpus. */
  private[ext] def shingled(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir).select(col("doc_id"), col("shh"))

  /** Shingle fingerprints with the provenance column, straight off the
    * checkpointed index — NO doc-grain join back to documents. */
  private[ext] def shingledWithSource(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir).select(col("doc_id"), col("source"), col("shh"))

  private[ext] val duckShingled =
    """toks AS (SELECT doc_id, string_split(lower(text), ' ') t FROM documents),
      |shingled AS MATERIALIZED (
      |  SELECT doc_id,
      |         list_distinct(list_transform(generate_series(1, len(t)-2),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) sh
      |  FROM toks WHERE len(t) >= 3)""".stripMargin

  /** MinHash hash family: 4 salted md5 digests per shingle, each digest's
    * 32 hex chars sliced into 4 independent 8-hex (32-bit) values → 16
    * genuinely independent hash functions from 4 digests (vs 16 with one
    * md5 per function). NOT an affine family h_i = (a_i*x+b_i) mod p over
    * a shared x: that one degenerates — any element whose `x mod p` is
    * small (P ≈ elements/1000 per doc) minimizes EVERY h_i at once, which
    * silently collapsed LSH recall on ~3%% of docs. Hash values are
    * BIGINTs, so numeric min == min.
    */
  val Salts = 4
  val SlicesPerSalt = NumHashes / Salts // 4 x 8 hex chars = the full digest

  /** Parse hex digits [start, start+len) of `mdExpr` as a BIGINT — one
    * radix conversion per slice (`conv` / `0x`-cast), not a per-character
    * `instr` chain: the chain was 8 string searches per hash value and
    * dominated minhash materialization. Both engines parse the identical
    * substring, so the values are bit-equal. */
  private def hexSliceSpark(mdExpr: String, start: Int, len: Int): String =
    s"cast(conv(substr($mdExpr, $start, $len), 16, 10) as bigint)"

  private def hexSliceDuck(mdExpr: String, start: Int, len: Int): String =
    s"('0x' || substr($mdExpr, $start, $len))::BIGINT"

  /** `(doc_id, h0..h15)` minhash view of [[base]]: post-persist struct
    * field access, so the 16 columns cost nothing beyond the cached
    * 4-struct layout. */
  private def minhashed(spark: SparkSession, dir: String): DataFrame =
    base(spark, dir).select(col("doc_id") +:
      (0 until NumHashes).map { i =>
        val (j, k) = (i / SlicesPerSalt, i % SlicesPerSalt)
        col(s"hs$j").getField(s"m$k").as(s"h$i")
      }: _*)

  private[ext] val duckMinhashed: String = {
    val xss = (0 until Salts)
      .map(j => s"list_transform(sh, s -> md5('$j|' || s)) xs$j")
      .mkString(",\n         ")
    val hs = (0 until NumHashes)
      .map { i =>
        val (j, k) = (i / SlicesPerSalt, i % SlicesPerSalt)
        s"list_aggregate(list_transform(xs$j, m -> ${hexSliceDuck("m", 8 * k + 1, 8)}), 'min') h$i"
      }
      .mkString(",\n         ")
    s"""hexed AS (
       |  SELECT doc_id, sh,
       |         $xss
       |  FROM shingled),
       |minhashed AS MATERIALIZED (
       |  SELECT doc_id, sh,
       |         $hs
       |  FROM hexed)""".stripMargin
  }

  /** d1 — exact dedup: canonical (minimum) doc_id per identical text. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("text"))
      .orderBy("keep_id")

  /** d22 — word-order-insensitive (bag-of-words) dedup: canonicalize
    * each document as the md5 of its sorted distinct token set and keep
    * the minimum doc_id per signature. This catches the permutation/
    * reshuffle duplicates that exact dedup (d1) misses and MinHash (d3)
    * only catches probabilistically — scraped pages re-rendered with
    * reordered boilerplate collapse to the same token set. `n_texts >
    * 1` rows are exactly the groups where BOW dedup beat exact dedup.
    *
    * Scale shape: one per-row projection (tokenize, sort the ~100-token
    * set, hash) and one hash aggregate keyed on a 128-bit digest —
    * embarrassingly parallel, uniform keys, no index needed. */
  def bowDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("bow_sig", md5(concat_ws(" ",
        array_sort(array_distinct(split(lower(col("text")), " "))))))
      .groupBy(col("bow_sig"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_docs"),
        countDistinct(col("text")).as("n_texts"))
      .select(col("keep_id"), col("bow_sig"), col("n_docs"), col("n_texts"))
      .orderBy("keep_id")

  /** d23 — cluster-weighted soft dedup (duplication-aware sampling):
    * instead of hard-dropping near-duplicates, keep each document with
    * probability ~1/|its d8 cluster| via a deterministic hash draw
    * (`bucket(doc) · size < 1000` with a 1000-bucket md5 draw), so
    * every duplicate GROUP contributes ~one expected copy while unique
    * documents pass untouched. This is the softened dedup several
    * curation pipelines prefer over hard survivorship — it preserves a
    * duplicate group's chance of representation without letting its
    * multiplicity bias the mixture, stays reproducible under retries
    * (hash draw, no RNG state), and composes with any downstream
    * sampler. A cluster can draw zero copies — that is sampling
    * semantics, not a bug (hard survivorship is d8/d13's job).
    *
    * Cost beyond the shared component labels: one tiny size aggregate
    * broadcast back and a per-row projection. */
  def softDedupSample(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dedupClusters(spark, dir)
    val sizes = clusters.groupBy(col("cluster_root"))
      .agg(count(lit(1)).as("cluster_size"))
    // NO broadcast hint on sizes: it has ~one row per CLUSTER, which at
    // corpus scale is corpus-sized (singletons dominate) — exactly the
    // scale-growing-broadcast trap the TPC-H battery was cured of. Both
    // sides key on cluster_root, so the planner co-partitions them (and
    // AQE still broadcasts at fixture scale where sizes is tiny).
    clusters.join(sizes, Seq("cluster_root"))
      .withColumn("bucket", expr(
        "cast(conv(substr(md5(concat('soft|', cast(doc_id as string))), 1, 8), 16, 10) as bigint) % 1000"))
      .select(col("doc_id"), col("cluster_root"), col("cluster_size"),
        (col("bucket") * col("cluster_size") < 1000L).cast("int").as("kept"))
      .orderBy("doc_id")
  }

  /** d24 — b-bit minhash accuracy audit (Li & König): for every verified
    * near-dup pair, the exact Jaccard next to its 16-hash minhash
    * estimate AND the 1-bit-per-hash estimate (`Ĵ₁ = max(2A−1, 0)` over
    * parity agreements) — the sketch-compression trade-off table. b-bit
    * minhash stores 32× less per signature; this readout is how a
    * deployment decides whether the cheaper sketch's variance is
    * acceptable before re-indexing a 100 TB corpus.
    *
    * Cost: the verified pair frame is cached (d3's index); the audit
    * joins it to the signature frame twice on doc id and computes 32
    * equality terms per pair — pairs-scale work, not corpus-scale. */
  def bbitMinhashAudit(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashed(spark, dir)
    def side(p: String) = sigs.select(col("doc_id").as(s"${p}_id") +:
      (0 until NumHashes).map(i => col(s"h$i").as(s"${p}h$i")): _*)
    val agreeFull = (0 until NumHashes)
      .map(i => when(col(s"ah$i") === col(s"bh$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    val agree1 = (0 until NumHashes)
      .map(i => when(col(s"ah$i") % 2 === col(s"bh$i") % 2, 1L).otherwise(0L))
      .reduce(_ + _)
    lshPairsRaw(spark, dir)
      .join(side("a"), col("doc_a") === col("a_id"))
      .join(side("b"), col("doc_b") === col("b_id"))
      .withColumn("n_agree_full", agreeFull)
      .withColumn("n_agree_1bit", agree1)
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        col("n_agree_full"), col("n_agree_1bit"),
        expr(s"n_agree_full * 1000000L div $NumHashes").as("est_full_ppm"),
        expr(s"greatest(2L * n_agree_1bit - $NumHashes, 0L) * 1000000L div $NumHashes")
          .as("est_1bit_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  /** d25 — duplication provenance: the verified near-dup pairs broken
    * down by the SOURCE pair they connect — is the duplication
    * intra-site boilerplate (same source twice) or cross-site
    * syndication/mirroring? The answer routes the remediation: template
    * stripping and t28-style gates for intra-source mass, source-level
    * dedup (t27's overlap matrix) for cross-source mirrors. Pairs-scale
    * work off the cached verified index plus two dimension joins on the
    * doc id; sources order canonically so (a,b) and (b,a) collapse. */
  def dupProvenance(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    lshPairsRaw(spark, dir)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_lo"),
        greatest(col("sa"), col("sb")).as("source_hi"))
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("intra_source",
        (col("source_lo") === col("source_hi")).cast("int"))
      .orderBy("source_lo", "source_hi")
  }

  /** d2 — MinHash signatures: one md5 digest over the 16 minhashes. */
  def minhashSignature(spark: SparkSession, dir: String): DataFrame =
    minhashed(spark, dir)
      .select(col("doc_id"),
        md5(concat_ws("|", (0 until NumHashes).map(i => col(s"h$i")): _*)).as("sig"))
      .orderBy("doc_id")

  /** d3 — MinHash LSH near-dup pairs: band-bucket equi-join for candidates,
    * exact Jaccard verification, threshold filter. */
  def lshPairs(spark: SparkSession, dir: String): DataFrame =
    lshPairsRaw(spark, dir).orderBy("doc_a", "doc_b")

  /** The verified LSH pair set is itself an index artifact (d3 publishes
    * it, d8 clusters it, d10 audits it) — checkpoint once per
    * (session, dir) like the shingle/signature bases. */
  private val lshPairCache = caches.newCache()

  private def lshPairsRaw(spark: SparkSession, dir: String): DataFrame =
    lshPairCache.getOrElseUpdate((spark, dir),
      lshPairsBuild(spark, dir).localCheckpoint())

  /** `explode` of the [[NumBands]] (bid, bkey) band structs over flat
    * h0..h15 columns — the LSH banding kernel, shared by [[bandsOf]] and
    * the streaming band view. */
  private[graft] def bandExplodeExpr: String = {
    val bandStructs = (0 until NumBands).map { b =>
      val ks = (0 until NumHashes / NumBands).map(r => s"h${b * (NumHashes / NumBands) + r}")
      s"struct(cast($b as int) as bid, md5(concat_ws('|', ${ks.mkString(",")})) as bkey)"
    }.mkString(",")
    s"explode(array($bandStructs))"
  }

  /** Banded `(doc_id, bid, bkey)` view of the minhash signatures — the
    * LSH bucket table d3's self-join and d11's new-vs-old probe share. */
  private def bandsOf(h: DataFrame): DataFrame =
    h.select(col("doc_id"), expr(bandExplodeExpr).as("u"))
      .select(col("doc_id"), col("u.bid").as("bid"), col("u.bkey").as("bkey"))

  /** Streaming-compatible banded-signature view of ANY (doc_id, text)
    * frame: `(doc_id, shh, bid, bkey)` — one row per (doc, band), built
    * from pure per-row projections ([[withSignatures]] + [[bandExplodeExpr]]),
    * so it composes with `readStream` sources. The streaming near-dup
    * operator keys its state on (bid, bkey); `shh` rides along for the
    * in-state exact-Jaccard verification. */
  private[graft] def bandedSignatures(docs: DataFrame,
      extra: Seq[String] = Nil): DataFrame = {
    val keep = (Seq("doc_id", "shh") ++ extra).map(col)
    withSignatures(docs)
      .select(keep ++ flatHashCols: _*)
      .select(keep :+ expr(bandExplodeExpr).as("u"): _*)
      .select(keep :+ col("u.bid").as("bid") :+ col("u.bkey").as("bkey"): _*)
  }

  private def lshPairsBuild(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingled(spark, dir)
    val bands = bandsOf(minhashed(spark, dir))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    jaccardVerify(cand, sets)
  }

  /** d4 — exact n-gram Jaccard pairs via *prefix filtering* (PPJoin-style):
    * order every shingle set by global document frequency (rarest first,
    * shingle text as tie-break) and index only the first
    * `n - ceil(t*n) + 1` shingles of each set. Two sets with Jaccard >= t
    * are guaranteed to collide on at least one prefix shingle, so recall
    * is exact — but high-df shingles (this corpus has a tiny vocabulary,
    * so common trigrams co-occur everywhere) are pushed out of the
    * prefixes and the posting-list self-join stops exploding: a naive
    * share-any-shingle candidate join was ~30 s at sf0.1, the prefix
    * variant is seconds. Candidates then pay one exact set intersection.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairsRaw(spark, dir).orderBy("doc_a", "doc_b")

  /** Exact pair set, cached like [[lshPairCache]] (d4 publishes, d10
    * audits against it). */
  private val exactPairCache = caches.newCache()

  /** Per-doc shingle fingerprints in GLOBAL df-ascending (rarest-first)
    * order, fingerprint tie-break — the one corpus-wide ordering both
    * prefix-filter joins (d4 Jaccard, d16 containment) slice their
    * prefixes from. One df aggregate + one per-doc sort, checkpointed
    * per (session, dir); each consumer then pays only a `slice`. */
  private val dfSortedCache = caches.newCache()

  /** Per-shingle global document frequency `(g, f)` — ONE corpus df
    * aggregate shared by the prefix ordering below and t18's novelty
    * score (TextQueries). Tiny output (the bounded trigram vocabulary),
    * checkpointed per (session, dir). */
  private val shingleDfCache = caches.newCache()

  private[ext] def shingleDf(spark: SparkSession, dir: String): DataFrame =
    shingleDfCache.getOrElseUpdate((spark, dir),
      shingled(spark, dir).select(explode(col("shh")).as("g"))
        .groupBy(col("g")).agg(count(lit(1)).as("f"))
        .localCheckpoint())

  private def dfSorted(spark: SparkSession, dir: String): DataFrame =
    dfSortedCache.getOrElseUpdate((spark, dir), {
      val ex = shingled(spark, dir).select(col("doc_id"), explode(col("shh")).as("g"))
      val freq = shingleDf(spark, dir)
      ex.join(broadcast(freq), "g")
        .groupBy(col("doc_id")).agg(collect_list(struct(col("f"), col("g"))).as("fg"))
        .select(col("doc_id"), size(col("fg")).as("n"),
          expr("transform(array_sort(fg), x -> x.g)").as("gs"))
        .localCheckpoint()
    })

  private def ngramJaccardPairsRaw(spark: SparkSession, dir: String): DataFrame =
    exactPairCache.getOrElseUpdate((spark, dir),
      ngramJaccardPairsBuild(spark, dir).localCheckpoint())

  private def ngramJaccardPairsBuild(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingled(spark, dir)
    // The whole candidate stage runs on the 64-bit shingle fingerprints,
    // never the strings: prefix filtering only needs SOME deterministic
    // global order shared by all docs (df-ascending, fingerprint
    // tie-break works as well as shingle text), and the posting-list
    // self-join then probes on long equality instead of UTF8 hashing.
    // The oracle generates candidates its own way (share-any-shingle);
    // only the verified, thresholded output must match — and verification
    // intersects the same fingerprint arrays either way.
    val exP = prefixCache.getOrElseUpdate((spark, dir), {
      val prefixed = dfSorted(spark, dir).select(col("doc_id"), col("n"), expr(
        s"slice(gs, 1, n - cast(ceil(${JaccardThreshold}D * n) as int) + 1)")
        .as("pref"))
      // The checkpoint is both the index materialization (the candidate
      // stage self-joins this frame — without a barrier the whole df-join
      // + collect_list + slice chain runs twice per query) and the cache
      // payload (a prefix posting list is ~|pref| ≈ (1-t)·n rows per doc,
      // far smaller than the corpus).
      prefixed.select(col("doc_id"), col("n"),
        posexplode(col("pref")).as(Seq("pos", "g")))
        .localCheckpoint()
    })
    // Length filter: J(A,B) >= t forces t*|A| <= |B| <= |A|/t. Positional
    // filter (PPJoin): both prefix arrays share one global (df, shingle)
    // sort order, so the FIRST common token at 0-based (pa, pb) bounds the
    // whole overlap by 1 + min(|A|-pa-1, |B|-pb-1); J >= t needs overlap
    // >= t/(1+t)·(|A|+|B|). A true pair always passes on its first common
    // token, so recall stays exact while late-prefix-only collisions drop.
    val posBound = lit(1) +
      least(col("a.n") - col("a.pos") - 1, col("b.n") - col("b.pos") - 1)
    val reqOverlap = ceil(
      (col("a.n") + col("b.n")) * lit(JaccardThreshold / (1 + JaccardThreshold)))
    val cand = exP.as("a")
      .join(exP.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id") &&
        col("b.n") * lit(JaccardThreshold) <= col("a.n") &&
        col("a.n") * lit(JaccardThreshold) <= col("b.n") &&
        posBound >= reqOverlap)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    jaccardVerify(cand, sets)
  }

  /** Containment threshold for d16: c(A→B) = |A∩B| / |A| — the directional
    * "A is (nearly) a subset of B" signal Jaccard misses when |A| << |B|
    * (a quoted snippet inside a long doc has tiny Jaccard but containment
    * ≈ 1). Planted near-dups sit well above it, unrelated docs far below. */
  val ContainThreshold = 0.8

  /** d16 — near-superset detection: every DIRECTED pair (a contained-in b)
    * with shingle containment `|A∩B|/|A| >=` [[ContainThreshold]] — the
    * dedup flavor that catches snippet/quote/subset duplicates whose
    * symmetric Jaccard stays under d4's threshold.
    *
    * Exact recall by ONE-SIDED prefix filtering: |A∩B| >= ceil(t·|A|)
    * forces at least one of A's rarest-first prefix of size
    * `|A| - ceil(t·|A|) + 1` to land in B (fewer than ceil(t·|A|)
    * elements sit outside the prefix), so joining the contained side's
    * prefix against the container side's FULL posting list cannot miss a
    * true pair; rarest-first ordering keeps the probe lists short.
    * Unlike d4, the container side is never prefixed — containment puts
    * no upper bound on |B| — and the only extra prune is
    * `|B| >= ceil(t·|A|)`. Candidates then pay the same
    * sorted-fingerprint merge-count verification as d4. */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingled(spark, dir)
    val ds = dfSorted(spark, dir)
    val pref = ds.select(col("doc_id"), col("n"), explode(expr(
      s"slice(gs, 1, n - cast(ceil(${ContainThreshold}D * n) as int) + 1)")).as("g"))
    val full = ds.select(col("doc_id"), col("n"), explode(col("gs")).as("g"))
    // Pin the candidate join to shuffle-hash: both sides are explodes over
    // the checkpointed index whose size ESTIMATES straddle the broadcast
    // threshold, so the static plan would otherwise flip between broadcast
    // and sort-merge run to run. Hash on g with the (smaller) prefix side
    // as build is the 100 TB shape anyway — posting lists are corpus-sized
    // (never broadcastable) and need no sort order.
    val cand = pref.as("a").hint("shuffle_hash")
      .join(full.as("b"), col("a.g") === col("b.g") &&
        col("a.doc_id") =!= col("b.doc_id") &&
        col("b.n") >= ceil(col("a.n") * lit(ContainThreshold)))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sets.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sets.as("y"), col("doc_b") === col("y.doc_id"))
      .withColumn("i", expr("sorted_intersect_count(x.shh, y.shh)").cast("double"))
      .withColumn("cont", col("i") / size(col("x.shh")))
      // Filter on the EXACT ratio: the prefix filter only guarantees recall
      // for cont >= t, so a pair in [t - 5e-7, t) that ROUNDS to t would be
      // emitted nondeterministically (only if it happens to share a prefix
      // shingle). Rounding is display-only; the oracle filter matches.
      .filter(col("cont") >= ContainThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("cont"), 6).as("containment"))
      .orderBy("doc_a", "doc_b")
  }

  /** Join candidate pairs back to shingle sets, compute exact Jaccard
    * (merge-count over the sorted 64-bit fingerprint arrays — the codegen
    * [[graft.functions.SortedIntersectCount]] primitive), filter at the
    * threshold. */
  private def jaccardVerify(cand: DataFrame, sets: DataFrame): DataFrame =
    cand
      .join(sets.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sets.as("y"), col("doc_b") === col("y.doc_id"))
      .withColumn("i", expr("sorted_intersect_count(x.shh, y.shh)").cast("double"))
      .withColumn("jac", col("i") / (size(col("x.shh")) + size(col("y.shh")) - col("i")))
      // Exact-ratio filter for the same reason as containmentPairs: the
      // prefix/LSH candidate guarantee covers jac >= t, not round(jac) >= t.
      .filter(col("jac") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
      // No sort here: d8's edge build and d10's recall join consume these
      // pairs as inputs — only the harness-facing d3/d4 wrappers add the
      // total-order ORDER BY the oracle compare needs.

  /** Verified-pairs CTE parameterized by candidate CTE name — lets one
    * oracle statement carry both the LSH and the exact pair sets (d10). */
  private def duckVerifiedCte(cand: String, out: String): String =
    s"""${out}_v AS (
       |  SELECT doc_a, doc_b,
       |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
       |         len(x.sh) + len(y.sh) tot
       |  FROM $cand JOIN shingled x ON $cand.doc_a = x.doc_id
       |             JOIN shingled y ON $cand.doc_b = y.doc_id),
       |$out AS (SELECT doc_a, doc_b FROM ${out}_v
       |         WHERE i/(tot-i) >= $JaccardThreshold)""".stripMargin

  private val duckJaccardTail =
    s"""verified AS (
       |  SELECT doc_a, doc_b,
       |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
       |         len(x.sh) + len(y.sh) tot
       |  FROM cand JOIN shingled x ON cand.doc_a = x.doc_id
       |            JOIN shingled y ON cand.doc_b = y.doc_id)
       |SELECT doc_a, doc_b, round(i/(tot-i), 6) AS jaccard
       |FROM verified WHERE i/(tot-i) >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** 16-bit SimHash over distinct tokens, bits drawn from md5 hex digits
    * (identical arithmetic on both engines); shared by d5 and d7. */
  val SimhashBits = 16

  /** Signature index: like [[prefixCache]], the simhash frame is an index
    * (one long per doc) shared by d5 and d7 and probed from four scan
    * sites in d7's ball join — build + checkpoint once per (session, dir). */
  private val sigCache = caches.newCache()

  private def simhashBase(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    sigCache.getOrElseUpdate((spark, dir), simhashBaseBuild(spark, dir).localCheckpoint())
  }

  private def simhashBaseBuild(spark: SparkSession, dir: String): DataFrame = {
    // One md5 per distinct token, its first 4 hex digits parsed ONCE into a
    // 16-bit int (single radix conversion) — the 16 per-bit aggregates then
    // run pure integer shift/mask math instead of an instr+substr string
    // scan per token per bit (16x). Bit b of the signature is bit k=b%4 of
    // hex digit i=b/4, i.e. bit (12-4i+k) of the parsed int, so the output
    // is bit-identical to the per-digit extraction the oracle computes.
    val base = Tables.load(spark, dir, "documents")
      .withColumn("dv", expr(
        "transform(array_distinct(split(lower(text), ' ')), " +
          "w -> cast(conv(substr(md5(w), 1, 4), 16, 10) as int))"))
    val withSums = (0 until SimhashBits).foldLeft(base) { (d, b) =>
      val shift = 1 << (12 - 4 * (b / 4) + b % 4)
      d.withColumn(s"s$b", expr(
        s"aggregate(dv, 0, (acc, v) -> acc + " +
          s"CASE WHEN (v div $shift) % 2 = 1 THEN 1 ELSE -1 END)"))
    }
    val hashExpr = (0 until SimhashBits)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b}L ELSE 0L END)")
      .mkString(" + ")
    withSums.select(col("doc_id"), expr(hashExpr).cast("long").as("simhash16"))
  }

  /** d5 — per-document SimHash signatures. */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashBase(spark, dir).orderBy("doc_id")

  /** d7 — SimHash near-dup pairs at Hamming distance <= [[MaxHamming]]
    * (=1) via an EXACT Hamming-ball join: enumerate the ball instead of
    * approximating it. Distance-0 pairs self-join on signature equality;
    * distance-1 pairs join a signature against the 16 one-bit flips of the
    * other side, kept only in the flip-down direction (clearing a set bit)
    * so each unordered pair materializes exactly once. Candidates ARE
    * results — no popcount verification filter and no distinct pass over
    * the (huge, clustered) pair stream, which the earlier band-join
    * formulation both paid. The join keys are full 16-bit signatures (up
    * to 65536 buckets vs the band join's 256), so the shuffle spreads
    * wider at corpus scale. */
  val MaxHamming = 1
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // simhashBase is checkpointed (see sigCache): the four scans below
    // (both distance-0 join sides, flip enumeration, distance-1 probe)
    // all start from the materialized index.
    val sh = simhashBase(spark, dir)
    val same = sh.as("a")
      .join(sh.as("b"),
        col("a.simhash16") === col("b.simhash16") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        lit(0L).as("hamming"))
    val flips = (0 until SimhashBits)
      .map(b => s"simhash16 ^ ${1 << b}").mkString(", ")
    val flipped = sh
      .select(col("doc_id"), col("simhash16"),
        explode(expr(s"array($flips)")).as("fkey"))
      // Keep only flips that CLEAR a bit: for a distance-1 pair the lower
      // signature equals exactly one flip-down of the higher one.
      .filter(col("fkey") < col("simhash16"))
    val dist1 = sh.as("a")
      .join(flipped.as("b"), col("a.simhash16") === col("b.fkey"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"),
        lit(1L).as("hamming"))
    same.unionAll(dist1).orderBy("doc_a", "doc_b")
  }

  // ---- DuckDB oracles --------------------------------------------------

  /** Shared simhash CTE chain ending in `shh(doc_id, h)`. */
  private val duckSimhashCte: String = {
    val sums = (0 until SimhashBits).map { b =>
      val digit = b / 4 + 1
      val pow = 1 << (b % 4)
      s"list_aggregate(list_transform(dt, w -> CASE WHEN " +
        s"((strpos('0123456789abcdef', substr(md5(w), $digit, 1)) - 1) // $pow) % 2 = 1 " +
        s"THEN 1 ELSE -1 END), 'sum') s$b"
    }.mkString(",\n       ")
    val hashExpr = (0 until SimhashBits)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""base AS (
       |  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) dt FROM documents),
       |sums AS (
       |  SELECT doc_id,
       |       $sums
       |  FROM base),
       |shh AS (SELECT doc_id, CAST($hashExpr AS BIGINT) h FROM sums)""".stripMargin
  }

  private[ext] val duckBands: String = {
    val rows = NumHashes / NumBands
    (0 until NumBands).map { b =>
      val ks = (0 until rows).map(r => s"h${b * rows + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b bid, md5($ks) bkey FROM minhashed"
    }.mkString("\nUNION ALL\n")
  }

  /** The LSH-candidate → verified-pair → connected-component CTE chain
    * (requires `shingled`/`minhashed`/`bands` in scope, needs WITH
    * RECURSIVE) — shared verbatim by the d8/d21/d23 oracles; ends at
    * `cc(node, cluster_root)`. */
  private[ext] lazy val duckComponentsSql: String =
    s"""cand AS (
       |  SELECT a.doc_id doc_a, b.doc_id doc_b
       |  FROM bands a JOIN bands b
       |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |verified AS (
       |  SELECT doc_a, doc_b,
       |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
       |         len(x.sh) + len(y.sh) tot
       |  FROM cand JOIN shingled x ON cand.doc_a = x.doc_id
       |            JOIN shingled y ON cand.doc_b = y.doc_id),
       |pairs AS (SELECT doc_a, doc_b FROM verified
       |          WHERE i/(tot-i) >= $JaccardThreshold),
       |undirected AS (
       |  SELECT doc_a a, doc_b b FROM pairs
       |  UNION ALL SELECT doc_b a, doc_a b FROM pairs),
       |reach AS (
       |  SELECT doc_id node, doc_id x FROM documents
       |  UNION
       |  SELECT r.node, u.b FROM reach r JOIN undirected u ON u.a = r.x),
       |cc AS (SELECT node, min(x) cluster_root FROM reach GROUP BY node)""".stripMargin

  /** The CAPPED text chain as DuckDB CTEs (requires
    * `shingled`/`minhashed`/`bands`, needs WITH RECURSIVE): capped
    * index → probe×index candidates → exact-Jaccard verification →
    * reachability → `ccT (node, canon)`. Shared by the d35 and d36
    * oracles — [[cappedTextDedup]]'s keep rule, join and threshold
    * verbatim. */
  private[ext] lazy val duckCappedTextChain: String =
    s"""cidxT AS MATERIALIZED (SELECT doc_id, bid, bkey FROM (
       |  SELECT doc_id, bid, bkey,
       |    row_number() OVER (PARTITION BY bid, bkey
       |      ORDER BY doc_id) occ_rk FROM bands)
       |  WHERE occ_rk <= $TextBucketCap),
       |candT AS (SELECT DISTINCT least(p.doc_id, i.doc_id) lo,
       |            greatest(p.doc_id, i.doc_id) hi
       |          FROM bands p JOIN cidxT i
       |            ON i.bid = p.bid AND i.bkey = p.bkey
       |           AND i.doc_id <> p.doc_id),
       |verT AS (SELECT lo, hi,
       |           len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
       |           len(x.sh) + len(y.sh) tot
       |         FROM candT JOIN shingled x ON candT.lo = x.doc_id
       |                    JOIN shingled y ON candT.hi = y.doc_id),
       |pairsT AS (SELECT lo, hi FROM verT
       |           WHERE i/(tot-i) >= $JaccardThreshold),
       |undT AS (
       |  SELECT lo a, hi b FROM pairsT
       |  UNION ALL SELECT hi a, lo b FROM pairsT),
       |reachT AS (
       |  SELECT doc_id node, doc_id x FROM documents
       |  UNION
       |  SELECT r.node, u.b FROM reachT r JOIN undT u ON u.a = r.x),
       |ccT AS (SELECT node, min(x) canon FROM reachT GROUP BY node)""".stripMargin

  /** d6 — edit-distance fuzzy matching: near-identical customer names
    * within a nation block (classic blocked record-linkage dedup; both
    * engines implement Levenshtein as unit-cost edit distance). Blocking
    * bounds the pair space to sum-of-squares over blocks — the same
    * contract as LSH buckets, with a domain key instead of a hash. */
  val MaxEditDistance = 2
  def levenshteinPairs(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_name"))
    // Plan shape matters more than the DP here: the block key has only
    // ~25 distinct values, so a sort-merge self-join would run ≤25 skewed
    // tasks. Broadcasting the (small) build side makes this a hash join
    // whose probe parallelism follows the input partitioning — which the
    // single-row-group fixture file would otherwise cap at 1, hence the
    // explicit fan-out. At 100 TB block both sides by (key, salt) instead.
    val probe = c.repartition(spark.sparkContext.defaultParallelism).as("a")
    probe.join(broadcast(c.as("b")),
        col("a.c_nationkey") === col("b.c_nationkey") &&
          col("a.c_custkey") < col("b.c_custkey"))
      // 3-arg levenshtein runs a banded DP that bails out at the
      // threshold (O(d·n) instead of O(n²) per pair, -1 when exceeded) —
      // the in-block pair count is quadratic, so the per-pair constant is
      // what this operator's scale bill is made of.
      .withColumn("dist",
        levenshtein(col("a.c_name"), col("b.c_name"), MaxEditDistance).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("a.c_custkey").as("cust_a"), col("b.c_custkey").as("cust_b"),
        col("dist"))
      .orderBy("cust_a", "cust_b")
  }

  /** d8 — near-duplicate CLUSTERS: connected components over the d3 LSH
    * pair graph, labels = min reachable doc_id, singletons rooted at
    * themselves. The closing step of corpus dedup — pairs alone don't say
    * which documents to keep; components do (keep each root, drop the
    * rest).
    *
    * Implementation is min-label propagation: each BSP round joins the
    * current labels across the undirected edge list and keeps the
    * element-wise minimum, terminating when a round changes nothing —
    * the classic large-graph CC (GraphX/Pregel) loop expressed as
    * DataFrame joins, converging in O(component diameter) rounds (near-dup
    * components are dense and shallow, so 2-3 in practice). The driver
    * only ever sees one Boolean per round (the convergence check), never
    * data. */
  /** d8's undirected edge list — the LSH pair graph, an index like the
    * prefix/signature caches: built once per (session, dir), clustered
    * repeatedly. */
  private val edgeCache = caches.newCache()

  /** The d8 BSP loop, factored so d9 can run it over the cosine pair
    * graph: min-label connected components over an undirected edge frame
    * (cols `doc_a`, `doc_b`, both directions present). Returns
    * `(doc_id, label)` for every node that APPEARS IN AN EDGE — label =
    * min reachable id, the component root; callers re-attach singletons
    * with a left join + coalesce.
    *
    * localCheckpoint = materialize AND truncate lineage. Without it every
    * round's logical plan re-embeds the full pair-generation tree (the
    * minhash / band / verify expression forest), and the per-round lineage
    * DOUBLES (the edge frame appears under both join inputs) — Catalyst
    * then spends ~1 s per action re-analyzing and re-optimizing a plan
    * whose physical work is milliseconds. Checkpointing each round's label
    * frame keeps every loop plan a join of two LogicalRDD leaves — the
    * same lineage-truncation discipline GraphX applies to Pregel state.
    * The loop state is ONLY the docs that appear in an edge — near-dup
    * graphs are sparse, so every per-round frame broadcasts. */
  private def minLabelComponents(rawUnd: DataFrame): DataFrame = {
    // STAR CONTRACTION first (r15, the d31-wall program generalized):
    // one per-partition streaming union-find over the incoming edge
    // list replaces it with (component-min, member) stars — components
    // provably identical (the StarContraction exactness argument,
    // spec-pinned), while a dense duplicate cluster's O(|V|²) edges
    // enter the BSP as O(|V|) stars of diameter 2, so the loop both
    // reads far less per round AND converges in a handful of rounds.
    // Every component consumer (d8 text clusters, d18 semdedup, d30,
    // d31) gets the reduction for free; the contraction itself adds no
    // exchange (it rides the input's existing partitions).
    val ss = rawUnd.sparkSession
    import ss.implicits._
    val starsCanon = StarContraction.stars(
        rawUnd.select(col("doc_a").as("_1"), col("doc_b").as("_2"))
          .as[(Long, Long)])
      .toDF("doc_a", "doc_b")
      .distinct()
      .localCheckpoint()
    val und = starsCanon.unionAll(starsCanon
      .select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
    // Round 1 is degenerate — every node's label IS its id, so gathering
    // neighbor labels needs no join: min(doc_a) grouped by doc_b, with the
    // self-label via the identity union. Later rounds join the previous
    // round's labels across the edges — one broadcast + one shuffle agg.
    // Duplicate doc_ids in the unaggregated unions are harmless under min.
    var labels: DataFrame = und
      .select(col("doc_b").as("doc_id"), col("doc_a").as("label"))
      .unionAll(und.select(col("doc_a").as("doc_id"), col("doc_a").as("label")))
      .groupBy(col("doc_id")).agg(min(col("label")).as("label"))
      .localCheckpoint()
    // Labels only ever decrease (min-propagation), so sum(label) strictly
    // decreases until the fixed point: an unchanged sum IS convergence —
    // one scalar crosses to the driver per round, never data. Summed as
    // decimal(38,0): labels are doc_ids, so a 64-bit sum could wrap at
    // corpus scale and a wrapped non-converged sum could collide with the
    // previous round's, terminating early with wrong clusters.
    def labelSum(d: DataFrame): java.math.BigDecimal =
      Option(d.agg(sum(col("label").cast("decimal(38,0)"))).first().get(0))
        .map(_.asInstanceOf[java.math.BigDecimal])
        .getOrElse(java.math.BigDecimal.ZERO)
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val next = und
        .join(broadcast(labels), und("doc_a") === labels("doc_id"))
        .select(col("doc_b").as("doc_id"), col("label"))
        .unionAll(labels)
        .groupBy(col("doc_id")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      val s = labelSum(next)
      // next is materialized (localCheckpoint is eager), so the previous
      // round's checkpoint blocks are dead — free them now rather than
      // after a GC cycle.
      graft.CheckpointUtil.release(labels)
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
    }
    // the converged labels frame is materialized; the star edges are
    // dead — free their checkpoint blocks now
    graft.CheckpointUtil.release(starsCanon)
    labels
  }

  /** The converged min-label frame, cached per (session, dir): FIVE
    * consumers (d8 itself, d13 reps, d23 soft dedup, d25 provenance,
    * d26 agreement) each re-ran the whole BSP loop (~0.65 s warm at
    * sf0.1 apiece), and — since the loop's final frame is a
    * localCheckpoint that nobody released — each call also leaked one
    * labels copy. The cache both amortizes the loop and puts the frame
    * under the module's eviction/teardown discipline. */
  private val docLabelsCache = caches.newCache()
  private val agreementCache = caches.newCache()
  private def docLabels(spark: SparkSession, dir: String): DataFrame =
    docLabelsCache.getOrElseUpdate((spark, dir),
      minLabelComponents(undirectedEdges(spark, dir)))

  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    // Singletons (label = own id by construction) join back after
    // convergence.
    val labels = docLabels(spark, dir)
    Tables.load(spark, dir, "documents").select(col("doc_id"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_root"))
      .orderBy("doc_id")
  }

  /** d19 — bounded-round label-propagation communities over the near-dup
    * graph: each round every node adopts the most frequent label among
    * its neighbors PLUS its own previous label (ties → min label), run
    * for exactly [[LpaRounds]] synchronous rounds. Communities REFINE
    * d8's components: a bridge edge joins two cliques into one component,
    * but each clique out-votes the single cross-edge, so LPA keeps them
    * apart — the structure a dedup reviewer wants when one borderline
    * pair chains two otherwise-distinct duplicate groups together.
    *
    * The self-vote is load-bearing, not a tweak: pure synchronous LPA
    * OSCILLATES on bipartite structures (an isolated similar pair swaps
    * labels forever); counting the node's own previous label breaks the
    * symmetry and the pair converges to its min id in one round. The
    * fixed round count (production practice — LPA is run capped) keeps
    * the operator deterministic and lets the DuckDB oracle unroll the
    * rounds as chained CTEs (the d12 discipline; standard SQL forbids
    * aggregation inside a recursive term).
    *
    * Scale shape: per round one broadcast join across the sparse edge
    * list and one map-side-combinable (node, label) count — the d8 BSP
    * loop with a mode-vote instead of a min; every round's frame is
    * localCheckpointed and the previous round's blocks are freed. */
  val LpaRounds = 3
  def lpaCommunities(spark: SparkSession, dir: String): DataFrame = {
    val und = undirectedEdges(spark, dir)
    var labels: DataFrame = und.select(col("doc_a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    for (_ <- 1 to LpaRounds) {
      val next = und
        .join(broadcast(labels), und("doc_a") === labels("node"))
        .select(col("doc_b").as("node"), col("label"))
        .unionAll(labels) // the self-vote
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("c"))
        // argmax by (count desc, label asc): max over (c, -label) structs
        .groupBy(col("node"))
        .agg(max(struct(col("c"), (lit(0L) - col("label")).as("nl"))).as("best"))
        .select(col("node"), (lit(0L) - col("best.nl")).as("label"))
        .localCheckpoint()
      graft.CheckpointUtil.release(labels)
      labels = next
    }
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("n_members"))
    Tables.load(spark, dir, "documents").select(col("doc_id"))
      .join(broadcast(labels.withColumnRenamed("node", "doc_id")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("community"))
      .join(broadcast(sizes.withColumnRenamed("label", "community")),
        Seq("community"), "left")
      .select(col("doc_id"), col("community"),
        coalesce(col("n_members"), lit(1L)).as("n_members"))
      .orderBy("doc_id")
  }

  /** d10 — LSH index quality audit: recall/precision of the d3 LSH pair
    * set against the d4 exact PPJoin result at the same threshold — the
    * self-measurement a production dedup pipeline publishes with every
    * index build (band/row parameters are chosen FROM this number).
    * Precision is 1 by construction (d3 exact-verifies its candidates);
    * recall is the probabilistic part (P(candidate | j>=t) from the band
    * curve). One full-outer join of two small pair sets + one aggregate —
    * the corpus-sized work is all in the shared cached indexes. */
  def lshRecall(spark: SparkSession, dir: String): DataFrame = {
    val lsh = lshPairsRaw(spark, dir).select(col("doc_a"), col("doc_b"))
      .withColumn("in_lsh", lit(1L))
    val exact = ngramJaccardPairsRaw(spark, dir).select(col("doc_a"), col("doc_b"))
      .withColumn("in_exact", lit(1L))
    exact.join(lsh, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(coalesce(col("in_exact"), lit(0L))).as("n_exact"),
        sum(coalesce(col("in_lsh"), lit(0L))).as("n_lsh"),
        sum(coalesce(col("in_exact"), lit(0L)) * coalesce(col("in_lsh"), lit(0L)))
          .as("n_common"))
      .select(
        col("n_exact"), col("n_lsh"), col("n_common"),
        round(col("n_common").cast("double") / col("n_exact"), 6).as("recall"),
        // "prec", not "precision": PRECISION is a DuckDB type keyword and
        // the oracle alias must match byte-for-byte.
        round(col("n_common").cast("double") / col("n_lsh"), 6).as("prec"))
  }

  /** d9 — embedding-cosine near-dup dedup: the embedding flavor of
    * duplicate removal. `canon_id` is the TRANSITIVE representative: the
    * minimum vec_id reachable through the cosine near-dup graph (pairs at
    * [[EmbDupThreshold]]), computed with the same min-label BSP loop d8
    * uses for shingle dedup ([[minLabelComponents]]). `is_kept` marks the
    * component roots — so every dropped vector's canon_id references a
    * KEPT vector (never another dropped one; in a chain a–b, b–c with no
    * a–c edge, both b and c resolve to a), and the kept set is exactly
    * one survivor per connected component.
    *
    * Pair generation is label-blocked here (the corpus's natural
    * cluster key); the unblocked scale path swaps in s4's
    * random-hyperplane LSH buckets — either way no all-pairs join ever
    * materializes, and the BSP loop shuffles one (lo, hi) row per
    * candidate pair, never vectors. */
  val EmbDupThreshold = SimilarityQueries.NearDupThreshold
  /** d9's converged label frame, cached per (session, dir) like
    * [[docLabels]] (two consumers: the d9 query and d26's agreement —
    * and the uncached version leaked its final checkpoint per call). */
  private val embLabelsCache = caches.newCache()
  def embeddingDedup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // this path loads embeddings directly (no base()/lshPairsRaw, which
    // evict transitively) — apply the one-hot-dir discipline explicitly
    evictOtherDirs(spark, dir)
    val e = Tables.load(spark, dir, "embeddings")
      // single row-group fixture → one input split; fan out before the
      // quadratic in-block cosine work (see levenshteinPairs). Explicit
      // derived count: AQE would coalesce the byte-light shuffle otherwise.
      .repartition(graft.ops.PlanHints.computeFanout(
        SimilarityQueries.corpusCount(spark, dir)), col("vec_id"))
      .select(col("vec_id"), col("label"), col("embedding"))
    val labels = embLabelsCache.getOrElseUpdate((spark, dir), {
      val pairs = e.as("a")
        .join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .filter(round(expr("cosine_sim(a.embedding, b.embedding)"), 6) >= EmbDupThreshold)
        .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
      val und = pairs
        .unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .localCheckpoint()
      val l = minLabelComponents(und)
      // The loop's per-round frames are all materialized off `und` by now.
      graft.CheckpointUtil.release(und)
      l
    })
    e.select(col("vec_id"))
      .join(broadcast(labels), col("vec_id") === col("doc_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("canon_id"))
      .withColumn("is_kept", col("canon_id") === col("vec_id"))
      .orderBy("vec_id")
  }

  /** d30 — ANN-backed embedding dedup: d9's transitive keep-one-per-
    * component dedup with candidate pairs from the adaptive multi-table
    * LSH index instead of label blocks — the unblocked 100 TB path d9's
    * Scaladoc names, now first-class (the same s26 → s30 move: label
    * blocks are quadratic per block, the scaled index holds bucket
    * occupancy ≈ constant so candidate mass stays linear in the corpus).
    * Candidates that clear [[EmbDupThreshold]] by exact cosine become
    * edges; components come from the shared min-label BSP loop. Edges
    * here need no label agreement, so cross-label near-dups d9 cannot
    * see ARE found — and a true near-dup pair missed by all L tables is
    * the recall tradeoff s31/s32 measure (at near-dup-grade cosine
    * ≥ 0.9 the per-table collision probability is high and L=8 tables
    * make a corpus-wide miss rare).
    *
    * Scale shape: rides [[SimilarityQueries.scaledCandScores]] — the
    * checkpointed band index self-join ships only narrow (vec_id, bid,
    * bkey) rows, pairs dedupe across tables before the embedding attach,
    * cosine runs once per distinct pair; the BSP loop then shuffles one
    * (lo, hi) row per edge, never vectors. */
  private val annLabelsCache = caches.newCache()
  def annDedup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    evictOtherDirs(spark, dir)
    val labels = annLabelsCache.getOrElseUpdate((spark, dir), {
      // scaledCandScores emits BOTH directions of every colliding pair
      // (a ≠ b join), which is exactly the undirected edge list the BSP
      // loop wants — no union-swap needed.
      val und = SimilarityQueries.scaledCandScores(spark, dir, lit(true))
        .filter(col("cosine") >= EmbDupThreshold)
        .select(col("vec_id").as("doc_a"), col("nbr_id").as("doc_b"))
        .localCheckpoint()
      val l = minLabelComponents(und)
      graft.CheckpointUtil.release(und)
      l
    })
    Tables.load(spark, dir, "embeddings").select(col("vec_id"))
      .join(broadcast(labels), col("vec_id") === col("doc_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("canon_id"))
      .withColumn("is_kept", col("canon_id") === col("vec_id"))
      .orderBy("vec_id")
  }

  /** d31 — MULTI-PROBE ANN dedup: d30 with s32's measured recall dial
    * wired into the operator that ships keep/drop decisions (the round-9
    * gap — the dial was measured, the consumers still probed single
    * buckets). Every vector probes, per table, its own bucket plus the
    * b one-bit-flip buckets, so a true near-dup pair missed by all L
    * exact buckets is still found when exactly one hyperplane disagreed
    * in some table.
    * Measured on the sf0.01 fixture: d32's readout shows single-bucket
    * candidates miss BOTH label-blocked exact dup pairs (0/2 found)
    * while multi-probe finds 2/2, and d31 merges 8 more docs than d30
    * overall (495 → 487 kept) — threshold-grade pairs at 0.45 cosine
    * have per-table collision probability ≈ 0.648^b, low enough at the
    * adaptive width that the flip buckets carry real recall.
    *
    * Scale shape: the probe side is corpus-grain here, so the bucket
    * join is a SHUFFLED equi-join (never a broadcast — this is all-pairs
    * candidate generation); candidate mass ≈ n·L·(b+1)·occ stays linear
    * in the corpus because the adaptive width holds occupancy constant,
    * and the (b+1)× factor is the price of the measured recall lift.
    * Edges come from [[SimilarityQueries.mpForestEdges]] (r15): scored
    * in the probe join, thresholded before any pair-grain exchange, and
    * contracted to per-partition min-root stars by a streaming
    * union-find riding the join's own partitions — components are
    * provably identical to the full survivor set's while the BSP input
    * drops from O(Σ survivors) (quadratic in a dense duplicate
    * cluster: zipf-500k's 105k-doc head priced mpEdges+BSP at 27 min)
    * to ≤ one star edge per (partition, member). The BSP component
    * loop itself is byte-identical to d9/d30's. */
  private val annMpLabelsCache = caches.newCache()
  def annDedupMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    evictOtherDirs(spark, dir)
    val labels = annMpLabelsCache.getOrElseUpdate((spark, dir), {
      // star edges are canonical (min, member); symmetrized here into
      // the undirected list the BSP wants
      val canon = SimilarityQueries
        .mpForestEdges(spark, dir, EmbDupThreshold)
        .select(col("vec_id").as("doc_a"), col("nbr_id").as("doc_b"))
        .localCheckpoint()
      val und = canon.union(canon.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b")))
      val l = minLabelComponents(und)
      graft.CheckpointUtil.release(canon)
      l
    })
    Tables.load(spark, dir, "embeddings").select(col("vec_id"))
      .join(broadcast(labels), col("vec_id") === col("doc_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("canon_id"))
      .withColumn("is_kept", col("canon_id") === col("vec_id"))
      .orderBy("vec_id")
  }

  /** d32 — missed-duplicate readout for the ANN dedup path: how many of
    * the EXACT label-blocked duplicate pairs (d9's edge rule — the
    * scale-sane ground truth: block size is bounded, so truth mass is
    * linear in the corpus, unlike an all-pairs scan) are found by the
    * single-bucket candidates (t0_single ≡ d30's edge rule) vs the
    * multi-probe candidates (t1_multi1 ≡ d31's). One row per probe mode
    * with the shared exact denominator — the before/after that
    * justifies shipping d31 as the dedup default.
    *
    * sf0.01 fixture: 2 true label-blocked pairs at [[EmbDupThreshold]];
    * t0 finds 0, t1 finds both — the s32 recall lift translated into
    * dedup terms (the denominator is small because the synthetic
    * corpus's near-dup mass is mostly CROSS-label, which d31 also
    * finds but the truth set cannot contain; this readout measures
    * misses against the exact set we can afford at scale, not
    * extras). */
  private val mpTruthCache = caches.newCache()
  /** The label-blocked exact near-dup truth pairs (windowed at the
    * recall cap) — shared by d32 and d34 under the module cache. */
  private def mpTruth(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    evictOtherDirs(spark, dir)
    // checkpointed under the module caches: the truth frame is read three
    // times per consuming query (two membership joins + the denominator)
    // — the d28 multi-reference-subframe lesson
    mpTruthCache.getOrElseUpdate((spark, dir), {
      val lbl = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"))
        // single row-group fixture → fan out before the per-block work
        // (explicit derived count: AQE coalesces byte-light shuffles
        // otherwise)
        .repartition(graft.ops.PlanHints.computeFanout(
          SimilarityQueries.corpusCount(spark, dir)), col("vec_id"))
      // Truth LEFT endpoints pinned to a fixed id window (the recall-
      // sample cap): a deterministic sub-census that is the FULL truth
      // at fixture scale (every sf0.01 id < 640) and keeps the audit
      // LINEAR under blow-up — the fixture holds label cardinality
      // fixed, so unwindowed label blocks grow with the corpus and the
      // exact side would go quadratic (30x measured 202 s before the
      // window; a deployment's label cardinality scales instead).
      val truthPairs = lbl.as("a")
        .filter(col("a.vec_id") < SimilarityQueries.RecallSampleCap)
        .join(lbl.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"))
      SimilarityQueries.attachCosine(spark, dir, truthPairs)
        .filter(col("cosine") >= EmbDupThreshold)
        .select(col("vec_id").as("lo"), col("nbr_id").as("hi"))
        .localCheckpoint()
    })
  }

  /** Truth-membership count for one candidate source (d32/d34 rows). */
  private def mpFound(truth: DataFrame, cands: DataFrame,
      mode: String): DataFrame =
    truth.join(cands.filter(col("vec_id") < col("nbr_id"))
        .select(col("vec_id").as("lo"), col("nbr_id").as("hi")),
      Seq("lo", "hi"))
      .agg(count(lit(1)).as("n_found"))
      .select(lit(mode).as("probe_mode"), col("n_found"))

  private def mpRecallReadout(truth: DataFrame, f: DataFrame): DataFrame =
    f.crossJoin(truth.agg(count(lit(1)).as("n_true_pairs")))
      .select(col("probe_mode"), col("n_true_pairs"), col("n_found"),
        (col("n_true_pairs") - col("n_found")).as("n_missed"),
        expr("n_found * 1000000L div greatest(n_true_pairs, 1L)")
          .as("found_ppm"))
      .orderBy("probe_mode")

  /** The d32/d34 multi-probe row label tracks the production
    * [[SimilarityQueries.ProbeDepth]] dial (t1_multi1 at the depth-1
    * default, t1_multi2 under SPARK_GRAFT_PROBE_DEPTH=2) so a depth-2
    * verification sweep reads honestly. */
  private[graft] def multiLabel = s"t1_multi${SimilarityQueries.ProbeDepth}"

  def mpDedupRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = mpTruth(spark, dir)
    val f = mpFound(truth,
        SimilarityQueries.scaledCandPairsFull(spark, dir), "t0_single")
      .unionAll(mpFound(truth,
        SimilarityQueries.mpCandPairsFull(spark, dir), multiLabel))
    mpRecallReadout(truth, f)
  }

  /** d34 — DESCENT-ASSISTED dedup recall: the d32 candidate-source
    * frontier extended by one NN-descent round (s39). Rows: direct
    * bucket collisions (`t0_single`), 1-bit multi-probe (`t1_multi1`) —
    * both cross-pinning d32 exactly — and `t2_descent`: t0 UNIONED with
    * the s39 G1 edge set, symmetrized. Neighbors-of-neighbors reach
    * near-dup pairs that never shared a bucket, at n·[[SimilarityQueries.KnnK]]
    * extra edge mass instead of multiprobe's n·L·(b+1) probe mass — the
    * dedup-side readout of the s39 retrieval lift, against the same
    * label-blocked exact truth (windowed at the recall cap). The
    * deployment question this answers: which candidate source (probing
    * wider vs descending the graph you already built) buys more dedup
    * recall per unit of join mass on YOUR corpus.
    *
    * Measured answer (clustered 20k corpus, r12): multi-probe 811,881
    * ppm vs descent-assisted 298,701 vs direct 297,090 — for DEDUP the
    * probe wins decisively, and the reason is structural, not a tuning
    * artifact: dedup truth in duplicate-heavy data is DENSE (each
    * sampled vector here has ~300 true partners), and a top-K graph
    * contributes at most n·K new pairs by construction — the wrong
    * shape for dense pair coverage, even though the SAME round buys
    * +25% relative top-K retrieval recall (s39). Descent refines
    * retrieval graphs; probing covers duplicate clusters. Both halves
    * of that sentence are now measurements. */
  def descentDedupRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = mpTruth(spark, dir)
    val (_, g1) = SimilarityQueries.nnDescentGraphs(spark, dir)
    val g1sym = g1.union(
      g1.select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id")))
    val t2 = SimilarityQueries.scaledCandPairsFull(spark, dir)
      .union(g1sym).distinct()
    val f = mpFound(truth,
        SimilarityQueries.scaledCandPairsFull(spark, dir), "t0_single")
      .unionAll(mpFound(truth,
        SimilarityQueries.mpCandPairsFull(spark, dir), multiLabel))
      .unionAll(mpFound(truth, t2, "t2_descent"))
    mpRecallReadout(truth, f)
  }

  /** d11 — incremental dedup: screen a NEWLY ARRIVED batch against the
    * existing corpus index — the production ingest path (the d3/d8 batch
    * jobs rebuild the whole pair graph; a pipeline admitting documents
    * continuously instead probes each new document against the standing
    * LSH index and drops near-dups on admission). Odd doc_ids stand in
    * for the new batch, even ids for the indexed corpus.
    *
    * Scale shape: the new batch joins the standing band table on band
    * key — the new side is a trickle relative to the corpus, so the
    * shuffle is bounded by the batch, and the index side is the
    * checkpointed artifact d2-d4 already maintain. Verification pays
    * exact Jaccard only on in-bucket candidates, as everywhere else. */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val bands = bandsOf(minhashed(spark, dir))
    val newB = bands.filter(col("doc_id") % 2 === 1)
    val oldB = bands.filter(col("doc_id") % 2 === 0)
    val cand = newB.as("a")
      .join(oldB.as("b"), col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // one verification arithmetic for the whole engine: reuse
    // jaccardVerify (d3/d4's exact check) rather than an inline copy
    // that could silently drift from it.
    val verified = jaccardVerify(cand, shingled(spark, dir))
      .withColumnRenamed("doc_a", "doc_new")
      .withColumnRenamed("doc_b", "doc_old")
      .withColumn("jac", col("jaccard"))
      .groupBy(col("doc_new"))
      .agg(count(lit(1)).as("n_matches"), max(round(col("jac"), 6)).as("best_jaccard"))
    shingled(spark, dir).select(col("doc_id")).filter(col("doc_id") % 2 === 1)
      .join(broadcast(verified), col("doc_id") === col("doc_new"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(col("best_jaccard"), lit(0.0)).as("best_jaccard"),
        col("n_matches").isNotNull.as("is_dup"))
      .orderBy("doc_id")
  }

  /** d12 — PageRank over the near-dup similarity graph: centrality on the
    * d3 pair graph surfaces the template/boilerplate HUBS of a corpus
    * (documents near-duplicating many others score high even when no
    * single pair is exact) — the ranking a dedup triage dashboard sorts
    * by. [[PagerankIters]] fixed iterations of the standard damped
    * update, BSP-style like d8: per round one aggregate over the edge
    * list joined to the previous ranks, lineage truncated per round.
    *
    * All arithmetic is micro-unit BIGINT (rank starts at 1e6; share =
    * `rank div degree`; update = `150000 + (85 * contrib) div 100`):
    * float contributions would sum in partition order and drift between
    * engines, integer floors are bit-identical everywhere — so the
    * oracle can replay the exact trajectory as unrolled SQL. Ranks for
    * the (broadcast-sized) edge-connected node set ride through the
    * loop; singletons take the closed-form dangling rank after round 1
    * and join back at the end. */
  val PagerankIters = 5
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val und = undirectedEdges(spark, dir)
    val deg = und.groupBy(col("doc_a").as("doc_id"))
      .agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // the per-node degree RIDES the rank frame (r16): joining the deg
    // frame separately cost one extra broadcast build + join per round
    // (and two at the readout) for a value that is loop-invariant — the
    // broadcast-sized frame just carries one more int column instead.
    var ranks = deg.select(col("doc_id"), lit(1000000L).as("rank_micro"),
        col("deg"))
      .localCheckpoint()
    (1 to PagerankIters).foreach { _ =>
      val prev = ranks
      val contrib = und
        .join(broadcast(prev), und("doc_a") === prev("doc_id"))
        .groupBy(col("doc_b").as("doc_id"))
        .agg(sum(expr("rank_micro div deg")).as("c"))
      ranks = deg
        .join(broadcast(contrib), Seq("doc_id"), "left")
        .select(col("doc_id"),
          (lit(150000L) + expr("(85 * coalesce(c, 0L)) div 100")).as("rank_micro"),
          col("deg"))
        .localCheckpoint()
      graft.CheckpointUtil.release(prev)
    }
    // Dangling singletons receive no contributions: rank fixed at the
    // base 150000 from round 1 onward.
    Tables.load(spark, dir, "documents").select(col("doc_id"))
      .join(broadcast(ranks), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("rank_micro"), lit(150000L)).as("rank_micro"),
        coalesce(col("deg"), lit(0L)).as("degree"))
      .orderBy("doc_id")
  }

  /** d8/d12's undirected edge list — the LSH pair graph doubled into both
    * directions. */
  private def undirectedEdges(spark: SparkSession, dir: String): DataFrame =
    edgeCache.getOrElseUpdate((spark, dir), {
      val pairs = lshPairsRaw(spark, dir).select(col("doc_a"), col("doc_b"))
      pairs
        .unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
        .localCheckpoint()
    })

  /** d17 — multi-source BFS hop distance over the near-dup graph: every
    * graph participant whose id is ≡ 0 (mod 10) seeds at hops 0 (the
    * "known-bad set"), and each reachable document reports its minimum
    * near-duplication distance to any seed — the contamination-radius
    * question (everything within k hops of a bad document is suspect).
    * Completes the graph-algorithm family: d8 computes components
    * (min-label), d12 stationary mass (PageRank), d14 local density
    * (triangles); this is (multi-)source distance.
    *
    * Classic frontier BSP: per round, the frontier's neighbors minus the
    * visited set become the next frontier at hops+1 — rounds = the
    * seeded components' eccentricity, and each round's frontier/visited
    * frames are localCheckpointed so no lineage accumulates (the d8
    * discipline). The FRONTIER join is size-gated through
    * [[graft.ops.PlanHints.broadcastIfSmall]] — frontiers are usually
    * tiny, but a 10 %-of-corpus seed set makes round 1 corpus-scale, and
    * a raw hint there has no AQE fallback. The VISITED anti-join side is
    * deliberately NOT hinted at all: visited grows monotonically toward
    * the whole reachable region, so it must stay a co-partitioned
    * shuffle anti-join (one long column — cheap to shuffle; AQE may
    * still promote small instances at runtime). The driver sees ONE
    * scalar per round (the frontier size), never data. The oracle walks
    * the same graph as a bounded recursive CTE ((node, hops) pairs — the
    * bound caps cycle replay; near-dup components are dense,
    * diameter ≪ 100). */
  def bfsHops(spark: SparkSession, dir: String): DataFrame = {
    val und = undirectedEdges(spark, dir)
    var visited = und.select(col("doc_a").as("doc_id"))
      .filter(col("doc_id") % 10 === 0).distinct()
      .withColumn("hops", lit(0L))
      .localCheckpoint()
    var frontier = visited
    var frontierSize = visited.count()
    while (frontierSize > 0) {
      val next = bfsRound(und, frontier, visited).localCheckpoint()
      frontierSize = next.count()
      if (frontierSize > 0) {
        val nv = visited.unionAll(next).localCheckpoint()
        // In round 1 frontier IS visited (seeded from the same frame) —
        // release the shared frame once, not twice.
        if (!(frontier eq visited)) graft.CheckpointUtil.release(frontier)
        graft.CheckpointUtil.release(visited)
        visited = nv
        frontier = next
      } else if (!(frontier eq visited)) {
        graft.CheckpointUtil.release(frontier)
      }
    }
    visited.orderBy("doc_id")
  }

  /** One BSP round of [[bfsHops]], exposed so PlanAuditSpec can pin the
    * hint policy per round: the frontier join is size-gated (withheld
    * above the session threshold — no forced corpus-scale broadcast when
    * the seed set is large), and the growing `visited` anti-join side is
    * NEVER hinted (it trends toward the whole reachable region; the
    * co-partitioned shuffle anti-join over one long column is the shape
    * that survives 100 TB, with AQE still free to promote small
    * instances at runtime). */
  def bfsRound(und: DataFrame, frontier: DataFrame, visited: DataFrame): DataFrame = {
    val hintedFrontier = graft.ops.PlanHints.broadcastIfSmall(frontier)
    und
      .join(hintedFrontier, und("doc_a") === hintedFrontier("doc_id"))
      .select(col("doc_b").as("doc_id"), (col("hops") + 1L).as("hops"))
      .groupBy(col("doc_id")).agg(min(col("hops")).as("hops"))
      .join(visited.select(col("doc_id").as("seen")),
        col("doc_id") === col("seen"), "left_anti")
  }

  /** d13 — cluster representative selection: dedup's final emit. d8 says
    * which documents are interchangeable; this picks WHICH copy survives —
    * the highest t2 quality score per component, ties to the lowest
    * doc_id (so the pick is total-ordered and replayable). The survivor
    * set a near-dup pipeline actually ships is this frame, not the raw
    * cluster labels.
    *
    * The label frame is one row per DOCUMENT (d8 tiles the corpus), so
    * this is a corpus×corpus equi-join on doc_id — the standard shuffled
    * hash/sort-merge shape, deliberately NOT broadcast — followed by a
    * single `max_by` aggregate per component: no window sort, no
    * per-cluster subquery. rep_quality is `max(quality_score)` (the
    * argmax's own score by construction). */
  def clusterReps(spark: SparkSession, dir: String): DataFrame = {
    val clusters = dedupClusters(spark, dir)
    val qual = graft.ext.TextQueries.qualityStats(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    clusters.join(qual, Seq("doc_id"))
      .groupBy(col("cluster_root"))
      .agg(
        count(lit(1)).as("n_members"),
        max_by(col("doc_id"), struct(col("quality_score"), -col("doc_id")))
          .as("rep_doc_id"),
        max(col("quality_score")).as("rep_quality"))
      .orderBy("cluster_root")
  }

  /** d14 — triangle census of the near-dup graph: triangle count, wedge
    * (length-2 path) count, and the global clustering coefficient
    * 3T/W — the motif statistics that distinguish "chains of borderline
    * matches" (low coefficient → transitive-closure clustering is
    * risky) from "dense clone families" (high coefficient → components
    * are safe to collapse). Published alongside d10's recall as index
    * health metrics.
    *
    * The classic distributed triangle algorithm: edges oriented low→high
    * doc_id, so each triangle {a<b<c} is counted exactly once by joining
    * (a,b)⋈(b,c) wedges against the closing (a,c) edge — two equi-joins
    * over the cached verified pair set, no node ever enumerates its
    * whole neighborhood. Wedges come from the degree frame in exact
    * integer arithmetic. */
  def triangleCensus(spark: SparkSession, dir: String): DataFrame = {
    val e = lshPairsRaw(spark, dir).select(col("doc_a").as("a"), col("doc_b").as("b"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = e.select(col("a").as("n")).unionAll(e.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    val wedges = deg.agg(
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"),
      count(lit(1)).as("n_nodes"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(wedges).crossJoin(tri)
      .select(col("n_edges"), col("n_nodes"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          round(col("n_triangles") * lit(3.0) / col("n_wedges"), 6))
          .otherwise(lit(0.0)).as("clustering_coeff"))
  }

  /** d15 — duplicated-span extraction (the exact-substring dedup shape:
    * near-dup pair/cluster removal still leaves verbatim boilerplate
    * REGIONS inside otherwise-unique documents — this finds the regions).
    * A 3-gram is "duplicated" when it occurs more than once corpus-wide
    * (across documents or repeated within one); consecutive duplicated
    * positions inside a document merge into maximal spans, and each doc
    * reports its span count, duplicated-shingle load, and longest span
    * in tokens (span of k consecutive shingles covers k+2 tokens).
    *
    * Plan: positional shingles stream out of the native
    * [[graft.functions.ShingleExplode]] generator, the multiplicity
    * table is one combinable count per distinct shingle, and the
    * shuffled equi-join back is the standard big-big shape (AQE picks
    * the strategy; at corpus scale the count table is bucketed or
    * bloom-pruned). Span merging is m9's gaps-and-islands on the
    * (doc, pos)-balanced window. */
  /** Shared d15/d27 building block: per-document maximal runs of
    * consecutive duplicated shingle positions, `(doc_id, run_len,
    * run_start)`. The positional shingle stream is t13's cached artifact
    * (the generator runs once per (session, dir)); the multiplicity
    * table is one combinable count per distinct shingle fingerprint, and
    * the semi-join back onto the positions carries NO fan-out (one row
    * per duplicated position regardless of a shingle's df — the reason
    * this, unlike the m16 pair join, needs no df cap for safety; the
    * count table is the only df-shaped frame and it's already
    * aggregated). Run merging is m9's gaps-and-islands on the
    * (doc, pos)-balanced window. */
  private def dupRuns(spark: SparkSession, dir: String): DataFrame = {
    val sh = graft.ext.TextQueries.posShingles(spark, dir)
    val dupShingles = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
    sh.join(dupShingles, Seq("shingle"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
      .withColumn("isl", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)))
      .groupBy(col("doc_id"), col("isl"))
      .agg(count(lit(1)).as("run_len"), min(col("pos")).as("run_start"))
  }

  def dupSpans(spark: SparkSession, dir: String): DataFrame = {
    val runs = dupRuns(spark, dir)
    val perDoc = runs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("run_len")).as("n_dup"),
        (max(col("run_len")) + lit(2L)).as("longest_span_toks"),
        max_by(col("run_start"), struct(col("run_len"), -col("run_start")))
          .as("longest_start"))
    Tables.load(spark, dir, "documents").select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("longest_span_toks"), lit(0L)).as("longest_span_toks"),
        col("longest_start"))
      .orderBy("doc_id")
  }

  /** d27 — exact-substring CUT-RANGE extraction: the per-document
    * `[cut_start, cut_end)` token ranges a corpus-cleaning pass actually
    * consumes (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" — the suffix-array ExactSubstr dedup re-expressed at
    * the repo's shingle grain). d15 reports per-doc span STATISTICS;
    * this emits the spans themselves: every maximal run of consecutive
    * corpus-duplicated 3-gram positions whose token extent reaches
    * [[MinCutSpanToks]] becomes one cut range (a run of k shingles
    * starting at token p covers tokens [p, p+k+2)).
    *
    * Cut POLICY is cut-every-occurrence (boilerplate removal): all
    * copies of a duplicated span are emitted, including the "first" —
    * the policy a template/header scrubber wants. Keep-one-copy dedup
    * composes this frame with d25's provenance pick without re-scanning
    * the corpus — built and oracle-checked as [[provenanceCut]] (d33).
    *
    * Plan: the build rides the SAME cached shingle stream + gaps-and-
    * islands window as d15 (one shingle-fingerprint-bucketed count + a
    * fan-out-free semi-join + one (doc, pos) window), lands in the
    * checkpointed range index ([[cutRangesBase]]), and the warm query
    * is a projection + sort over the materialized span-grain rows. At
    * 100 TB the shingle grain bounds memory per task to the document's
    * positions, never the corpus. */
  val MinCutSpanToks = 5
  /** Floor-qualified, fingerprint-annotated cut-range frame, checkpointed
    * once per (session, dir): span-grain (tiny next to the corpus) and
    * consumed by three queries — d27 projects it, d28 references it on
    * BOTH sides of its kept-copy join, d29 rides d28 — so without the
    * checkpoint the gaps-and-islands window subtree AND the span-slicing
    * document join would re-run per reference (the d29 audit caught d28
    * planning the window twice). The md5 span fingerprint is computed
    * here (one corpus equi-join, span-grain md5 work) so d28's kept-copy
    * aggregate and its probe side read the same materialized rows.
    * Standard [[DirCaches]] build-once-probe-often index discipline. */
  private val cutRangeCache = caches.newCache()
  private def cutRangesBase(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    cutRangeCache.getOrElseUpdate((spark, dir), {
      val rng = dupRuns(spark, dir)
        .select(col("doc_id"), col("run_start").as("cut_start"),
          (col("run_start") + col("run_len") + lit(2L)).as("cut_end"))
        .withColumn("cut_len_toks", col("cut_end") - col("cut_start"))
        .filter(col("cut_len_toks") >= MinCutSpanToks)
      rng.join(Tables.load(spark, dir, "documents")
          .select(col("doc_id"), col("text")), Seq("doc_id"))
        .withColumn("span_fp", md5(concat_ws(" ",
          expr("slice(split(lower(text), ' '), cast(cut_start + 1 as int), " +
            "cast(cut_len_toks as int))"))))
        .select(col("doc_id"), col("cut_start"), col("cut_end"),
          col("cut_len_toks"), col("span_fp"))
        .localCheckpoint()
    })
  }

  def cutRanges(spark: SparkSession, dir: String): DataFrame =
    cutRangesBase(spark, dir)
      .select(col("doc_id"), col("cut_start"), col("cut_end"),
        col("cut_len_toks"))
      .orderBy("doc_id", "cut_start")

  /** d28 — keep-one-copy cut plan: the Lee et al. ExactSubstr POLICY over
    * d27's ranges. d27 cuts every occurrence (boilerplate scrub); this
    * keeps exactly ONE occurrence of each distinct duplicated span
    * corpus-wide — the lowest (doc_id, cut_start) — and emits the rest
    * as the actual cut list, each row carrying the span fingerprint and
    * the kept copy's location for provenance. Span identity is the md5
    * of the covered token slice, so only identical MAXIMAL spans group
    * (a span flanked by different duplicated context merges into a
    * different maximal run — the shingle-grain contract, documented).
    *
    * Plan: both sides read the checkpointed fingerprint-annotated range
    * frame ([[cutRangesBase]] — the document slice join and md5 ran once
    * at build); one combinable min-struct aggregate per fingerprint,
    * then a shuffled equi-join back on the fingerprint — no window, no
    * all-pairs; everything is span-grain, bounded by d27's output size. */
  def cutDedup(spark: SparkSession, dir: String): DataFrame = {
    val ranged = cutRangesBase(spark, dir)
      .select(col("doc_id"), col("cut_start"), col("cut_end"), col("span_fp"))
    val kept = ranged.groupBy(col("span_fp"))
      .agg(min(struct(col("doc_id"), col("cut_start"))).as("k"))
      .select(col("span_fp"), col("k.doc_id").as("kept_doc_id"),
        col("k.cut_start").as("kept_start"))
    ranged.join(kept, Seq("span_fp"))
      .filter(col("doc_id") =!= col("kept_doc_id") ||
        col("cut_start") =!= col("kept_start"))
      .select(col("doc_id"), col("cut_start"), col("cut_end"),
        col("span_fp"), col("kept_doc_id"), col("kept_start"))
      .orderBy("doc_id", "cut_start")
  }

  /** d33 — PROVENANCE-PREFERRED keep-one-copy cut plan: the d28 ∘ d25
    * composition d28's Scaladoc asserted, now a checked operator. d28
    * keeps the lowest (doc_id, cut_start) copy of each duplicated span;
    * a curation pass that trusts some sources over others wants the
    * KEPT copy chosen by PROVENANCE — here the canonically-lowest
    * source name wins each span cluster (d25's source dimension as the
    * keep key), ties broken by (doc_id, cut_start) so the plan stays
    * deterministic. Emits d28's cut-list shape plus the kept copy's
    * source.
    *
    * Composes WITHOUT re-scanning the corpus, as claimed: both sides
    * read the same checkpointed fingerprint-annotated range index d27
    * built ([[cutRangesBase]] — no re-shingle, no re-detection); the
    * only new work is a span-grain join against the (doc_id, source)
    * dimension projection and the same combinable min-struct aggregate
    * with source prepended to the keep key. */
  def provenanceCut(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val ranged = cutRangesBase(spark, dir)
      .select(col("doc_id"), col("cut_start"), col("cut_end"), col("span_fp"))
      .join(src, Seq("doc_id"))
    val kept = ranged.groupBy(col("span_fp"))
      .agg(min(struct(col("source"), col("doc_id"), col("cut_start"))).as("k"))
      .select(col("span_fp"), col("k.source").as("kept_source"),
        col("k.doc_id").as("kept_doc_id"), col("k.cut_start").as("kept_start"))
    ranged.join(kept, Seq("span_fp"))
      .filter(col("doc_id") =!= col("kept_doc_id") ||
        col("cut_start") =!= col("kept_start"))
      .select(col("doc_id"), col("cut_start"), col("cut_end"),
        col("span_fp"), col("kept_source"), col("kept_doc_id"),
        col("kept_start"))
      .orderBy("doc_id", "cut_start")
  }

  /** d29 — cut APPLICATION: the cleaned corpus after executing d28's
    * keep-one-copy plan — what the next pipeline stage actually trains
    * on. Detect (d15/d27) → plan (d28) → APPLY (this). Every document
    * is re-emitted with the tokens inside its d28 cut ranges removed:
    * `(doc_id, n_toks, n_cut, clean_text)`; docs with no cuts pass
    * through verbatim and a doc whose every token is cut emits ''.
    * Adjacent maximal runs separated by one non-duplicated shingle
    * position OVERLAP in token space (run [p, p+k+2) vs [p+k+1, ...)),
    * so removal is membership-based — a token dies if ANY range covers
    * it — never range-subtraction arithmetic.
    *
    * Plan: d28's span-grain output collapses to one bounded
    * `collect_list` row per affected doc (spans per doc, not corpus
    * grain), left-joins documents on doc_id (the standard corpus
    * equi-join), and the removal itself is a per-row `filter` HOF with
    * the positional lambda testing `exists` over the doc's own ranges —
    * O(tokens × ranges_in_doc) per row, NO join, NO window, nothing new
    * shuffles beyond d28's frames. The token/kept arrays are bound once
    * via the nested 1-element-transform LET (the q120/m11 discipline)
    * and the result struct is emitted through `inline` — a Generate
    * evaluates the chain exactly ONCE per row, where a 3-field
    * projection under CollapseProject would re-inline it per column. */
  def cutApply(spark: SparkSession, dir: String): DataFrame =
    cutAppliedOf(
      Tables.load(spark, dir, "documents").select(col("doc_id"), col("text")),
      cutDedup(spark, dir))
      .orderBy("doc_id")

  /** The d29 removal kernel over ANY (doc_id, text) frame and ANY cut
    * list carrying (doc_id, cut_start, cut_end) — the composed pipeline
    * applies the PROVENANCE-preferred plan ([[provenanceCut]], d33)
    * through this same membership-based token filter, so d29 and the
    * pipeline stage cannot drift. Emits (doc_id, n_toks, n_cut,
    * clean_text); extra cut-list columns are ignored. */
  def cutAppliedOf(docs: DataFrame, cutList: DataFrame): DataFrame = {
    val cuts = cutList
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("cut_start"), col("cut_end"))).as("cuts"))
    docs
      .select(col("doc_id"), col("text"))
      .join(cuts, Seq("doc_id"), "left")
      .selectExpr("doc_id",
        """inline(transform(array(split(text, ' ')), tk ->
          |  transform(array(filter(tk, (t, i) -> cuts IS NULL OR
          |      NOT exists(cuts, c -> i >= c.cut_start AND i < c.cut_end))),
          |    kt -> struct(
          |      CAST(size(tk) AS BIGINT) AS n_toks,
          |      CAST(size(tk) - size(kt) AS BIGINT) AS n_cut,
          |      concat_ws(' ', kt) AS clean_text))[0]))""".stripMargin)
  }

  /** d26 — cross-modality dedup agreement: the Adjusted Rand Index
    * between the token-level clustering (d8's shingle-LSH connected
    * components) and the embedding-level clustering (d9's cosine
    * components), over the shared id universe — the tuning readout for
    * a two-signal dedup pipeline ("do surface text and semantics agree
    * on what is a duplicate"; low ARI means the two passes prune
    * DIFFERENT pairs and should both run, ARI ≈ 1 means one is
    * redundant). Reports the co-membership pair masses of each side,
    * the agreeing pair mass, and ARI in exact ppm (chance-corrected, so
    * two all-singleton clusterings don't fake agreement).
    *
    * Pair counting is CONTINGENCY-based — Σ C(n_ij, 2) over the
    * (label_a × label_b) cell counts, never an all-pairs join; every
    * sum widens to decimal(38,0) before multiplying (pair counts are
    * O(n²) numbers) and ARI's closed form is cleared of fractions:
    * `num = 2·(S_ij·T − S_a·S_b)`, `den = (S_a+S_b)·T − 2·S_a·S_b`
    * with T = C(n,2); both engines truncate the ppm toward zero.
    *
    * NUMERIC-RANGE BOUND: the cleared form multiplies two O(n²) pair
    * masses (then ×1e6), so intermediates reach ~S·T·1e6 ≈ n⁴·1e6/4.
    * decimal(38,0) (and the oracle's HUGEINT) holds this up to
    * n ≈ 5×10⁷ ids in the WORST case of one giant cluster on each side
    * (S,T ≈ 1.25e15 → product ≈ 1.6e36); realistic dedup clusterings
    * (bounded cluster sizes, S ≪ T) extend far beyond. Past that bound
    * Spark yields null/overflow rather than a silently wrong ppm — at
    * genuine 100 TB corpus scale, run ARI on a fixed-size id sample
    * (the s28/p1 stratified-sample knob), which preserves the estimate
    * and the exact-arithmetic contract. */
  def dedupAgreement(spark: SparkSession, dir: String): DataFrame = {
    val a = dedupClusters(spark, dir)
      .select(col("doc_id"), col("cluster_root").as("la"))
    val b = embeddingDedup(spark, dir)
      .select(col("vec_id").as("doc_id"), col("canon_id").as("lb"))
    val j = agreementCache.getOrElseUpdate((spark, dir),
      a.join(b, Seq("doc_id")).localCheckpoint())
    def c2(x: String) = s"sum(cast($x as decimal(38,0)) * ($x - 1) div 2)"
    val sij = j.groupBy(col("la"), col("lb")).agg(count(lit(1)).as("nij"))
      .agg(expr(c2("nij")).as("sij"))
    val sa = j.groupBy(col("la")).agg(count(lit(1)).as("na"))
      .agg(expr(c2("na")).as("sa"))
    val sb = j.groupBy(col("lb")).agg(count(lit(1)).as("nb"))
      .agg(expr(c2("nb")).as("sb"))
    val tot = j.agg(count(lit(1)).as("n"))
      .select(col("n"), expr("cast(n as decimal(38,0)) * (n - 1) div 2").as("t"))
    // the joined label frame feeds four aggregates and is cached per
    // (session, dir) under the module's eviction/teardown discipline
    // (bounded: one (id, 2 labels) row per shared id).
    tot.crossJoin(sij).crossJoin(sa).crossJoin(sb)
      .select(col("n").as("n_items"),
        col("sa").cast("long").as("pairs_token"),
        col("sb").cast("long").as("pairs_embed"),
        col("sij").cast("long").as("pairs_agree"),
        expr("""CASE WHEN (sa + sb) * t - 2 * sa * sb = 0 THEN 1000000L
               |ELSE cast(2 * (sij * t - sa * sb) * 1000000
               |     div ((sa + sb) * t - 2 * sa * sb) as bigint) END
               |""".stripMargin).as("ari_ppm"))
  }

  /** TEXT bucket cap for corpus-grain candidate generation — the text
    * twin of [[SimilarityQueries.DefaultBucketCap]] (r15: the zipf text
    * corpora exposed the uncapped band self-join as the last Σ n_k²
    * wall; a 105k near-identical-text head implies ~5.5e9 Jaccard
    * verifications through d8's exact chain). Same keep rule: the cap
    * lowest doc_ids per (bid, bkey). */
  val TextBucketCap = 32

  /** `(doc_id, shh, bid, bkey)` FAT band rows off the checkpointed
    * index — [[bandsOf]] with the shingle fingerprints carried, so a
    * capped consumer can verify Jaccard IN the bucket join instead of
    * shipping a (pair, set) intermediate through an attach exchange
    * (the r13 mpEdges lesson, applied to text). */
  private def fatBands(spark: SparkSession, dir: String): DataFrame = {
    val withH = base(spark, dir).select(col("doc_id") +: col("shh") +:
      (0 until NumHashes).map { i =>
        val (j, k) = (i / SlicesPerSalt, i % SlicesPerSalt)
        col(s"hs$j").getField(s"m$k").as(s"h$i")
      }: _*)
    withH.select(col("doc_id"), col("shh"), expr(bandExplodeExpr).as("u"))
      .select(col("doc_id"), col("shh"),
        col("u.bid").as("bid"), col("u.bkey").as("bkey"))
  }

  /** Document cardinality, counted once per (session, dir) off the
    * checkpointed index — the text twin of
    * [[SimilarityQueries.corpusCount]], feeding the derived partition
    * count below. */
  private val docCountCache = caches.newSideCache[Long]()
  private[ext] def docCount(spark: SparkSession, dir: String): Long = {
    evictOtherDirs(spark, dir)
    // count the RAW load, not base(): base's fan-out is derived FROM
    // this count (a columnless scan needs no fan-out anyway)
    docCountCache.getOrElseUpdate((spark, dir),
      Tables.load(spark, dir, "documents").count())
  }

  /** Pair-grain partition count for the capped text chain, derived
    * from its own mass bound n·B·cap (the embedding side's
    * [[SimilarityQueries.derivedPairPartitionsFor]] discipline): the
    * fat band rows carry ~1 KB shingle arrays, so right-sizing the
    * join/window partitions is what keeps the per-task sort and
    * union-find state bounded at any corpus size without an env
    * knob. */
  private def derivedTextPairPartitions(spark: SparkSession,
      dir: String): Int = {
    val mass = docCount(spark, dir) * NumBands * TextBucketCap
    val want = (mass + SimilarityQueries.TargetPairRowsPerPartition - 1) /
      SimilarityQueries.TargetPairRowsPerPartition
    math.max(spark.sessionState.conf.numShufflePartitions.toLong,
      math.min(SimilarityQueries.MaxDerivedPartitions.toLong, want)).toInt
  }

  private val textCappedLabelsCache = caches.newCache()
  /** d35 — CAPPED-INDEX text near-dup dedup: d8's components with the
    * candidate kernel's index side held to [[TextBucketCap]] residents
    * per band bucket — the d30→d31 program ported to the minhash-LSH
    * chain. The PROBE side stays the full corpus (every doc always
    * knows its own band keys), so unlike a both-sides-capped self-join
    * every evicted resident still reaches its own bucket's kept set:
    * within-bucket duplicate groups stay connected BY CONSTRUCTION at
    * any occupancy (the mechanism the zipf-500k embedding census
    * proved), and candidate mass is hard-bounded at n·B·cap instead of
    * Σ n_k² — the bound that makes a 105k-doc identical-text head
    * feasible. No Hamming probe shells: md5 band keys carry no bit
    * structure, and the B independent bands already are the repetition
    * dial (a pair missed in one band collides in another).
    *
    * Semantics: candidates ⊆ d8's (capped index ⊆ full index), same
    * exact-Jaccard verification, same BSP — so d35's components REFINE
    * d8's: splits possible where a cross-bucket bridge pair had both
    * endpoints evicted, merges impossible. d36 prices that refinement;
    * the ExtSpec contract pins it. Verification runs in the join
    * (shh on both sides), the star contraction rides the join's
    * partitions, and only stars reach the BSP. */
  def cappedTextDedup(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    evictOtherDirs(spark, dir)
    val labels = textCappedLabelsCache.getOrElseUpdate((spark, dir), {
      import org.apache.spark.sql.expressions.Window
      import spark.implicits._
      val p0 = derivedTextPairPartitions(spark, dir)
      val fat = fatBands(spark, dir).repartition(p0, col("bid"), col("bkey"))
      val idx = fat.withColumn("occ_rk", row_number().over(
          Window.partitionBy(col("bid"), col("bkey")).orderBy(col("doc_id"))))
        .filter(col("occ_rk") <= TextBucketCap).drop("occ_rk")
      val scored = idx.as("i").join(fat.as("p"),
          col("i.bid") === col("p.bid") && col("i.bkey") === col("p.bkey") &&
            col("i.doc_id") =!= col("p.doc_id"))
        .withColumn("inter",
          expr("sorted_intersect_count(p.shh, i.shh)").cast("double"))
        .withColumn("jac", col("inter") /
          (size(col("p.shh")) + size(col("i.shh")) - col("inter")))
        .filter(col("jac") >= JaccardThreshold)
        .select(col("p.doc_id").as("_1"), col("i.doc_id").as("_2"))
      val canon = StarContraction.stars(scored.as[(Long, Long)])
        .toDF("doc_a", "doc_b").distinct().localCheckpoint()
      val und = canon.unionAll(canon.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b")))
      val l = minLabelComponents(und)
      graft.CheckpointUtil.release(canon)
      l
    })
    Tables.load(spark, dir, "documents").select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("canon_id"))
      .withColumn("is_kept", col("canon_id") === col("doc_id"))
      .orderBy("doc_id")
  }

  /** d36 — the capped chain's honest price: one row comparing d35's
    * components against d8's uncapped truth — cluster counts both ways
    * and how many docs kept the same root. Since d35 refines d8
    * (candidates are a subset), `n_clusters_capped ≥
    * n_clusters_uncapped` always; the gap IS the recall price of the
    * n·B·cap bound on this corpus, the number a deployment reads before
    * switching its consolidation to the capped chain at scale. */
  def textCapAgreement(spark: SparkSession, dir: String): DataFrame = {
    val un = dedupClusters(spark, dir)
    val cap = cappedTextDedup(spark, dir).select(col("doc_id"), col("canon_id"))
    un.join(cap, "doc_id")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_root")).as("n_clusters_uncapped"),
        countDistinct(col("canon_id")).as("n_clusters_capped"),
        sum(when(col("cluster_root") === col("canon_id"), 1L).otherwise(0L))
          .as("n_same_root"))
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d35_text_dedup_capped" -> ((s, d) => cappedTextDedup(s, d)),
    "d36_text_cap_agreement" -> ((s, d) => textCapAgreement(s, d)),
    "d26_dedup_agreement" -> ((s, d) => dedupAgreement(s, d)),
    "d16_containment" -> ((s, d) => containmentPairs(s, d)),
    "d15_dup_spans" -> ((s, d) => dupSpans(s, d)),
    "d27_cut_ranges" -> ((s, d) => cutRanges(s, d)),
    "d28_cut_dedup" -> ((s, d) => cutDedup(s, d)),
    "d29_cut_apply" -> ((s, d) => cutApply(s, d)),
    "d33_provenance_cut" -> ((s, d) => provenanceCut(s, d)),
    "d14_triangles" -> ((s, d) => triangleCensus(s, d)),
    "d13_cluster_reps" -> ((s, d) => clusterReps(s, d)),
    "d12_pagerank" -> ((s, d) => pagerank(s, d)),
    "d11_incremental_dedup" -> ((s, d) => incrementalDedup(s, d)),
    "d1_dedup_exact" -> ((s, d) => dedupExact(s, d)),
    "d22_bow_dedup" -> ((s, d) => bowDedup(s, d)),
    "d23_soft_dedup" -> ((s, d) => softDedupSample(s, d)),
    "d24_bbit_minhash" -> ((s, d) => bbitMinhashAudit(s, d)),
    "d25_dup_provenance" -> ((s, d) => dupProvenance(s, d)),
    "d9_embedding_dedup" -> ((s, d) => embeddingDedup(s, d)),
    "d30_ann_dedup" -> ((s, d) => annDedup(s, d)),
    "d31_ann_dedup_mp" -> ((s, d) => annDedupMultiprobe(s, d)),
    "d32_mp_dedup_recall" -> ((s, d) => mpDedupRecall(s, d)),
    "d34_descent_dedup_recall" -> ((s, d) => descentDedupRecall(s, d)),
    "d2_minhash_signature" -> ((s, d) => minhashSignature(s, d)),
    "d3_lsh_pairs" -> ((s, d) => lshPairs(s, d)),
    "d4_ngram_jaccard" -> ((s, d) => ngramJaccardPairs(s, d)),
    "d10_lsh_recall" -> ((s, d) => lshRecall(s, d)),
    "d5_simhash" -> ((s, d) => simhash(s, d)),
    "d6_levenshtein" -> ((s, d) => levenshteinPairs(s, d)),
    "d7_simhash_pairs" -> ((s, d) => simhashPairs(s, d)),
    "d8_dedup_clusters" -> ((s, d) => dedupClusters(s, d)),
    "d17_bfs_hops" -> ((s, d) => bfsHops(s, d)),
    "d19_lpa" -> ((s, d) => lpaCommunities(s, d)),
    "d20_threshold_sweep" -> ((s, d) => thresholdSweep(s, d)),
    "d21_dedup_funnel" -> ((s, d) => dedupFunnel(s, d))
  )

  /** d21 — the dedup funnel: corpus size after each dedup stage in one
    * readout — raw documents → exact-duplicate survivors (distinct
    * texts, the d1 key) → near-duplicate component representatives (one
    * per d8 connected component). This is the shrinkage report every
    * dedup pipeline publishes with a corpus release ("N raw, M after
    * exact, K after fuzzy"), with removal expressed as exact integer
    * ppm of the raw count.
    *
    * Cost: three tiny aggregates — a corpus count, a distinct-text
    * count (one shuffle on the text hash), and a distinct-root count
    * over the (cached) d8 component labels; the expensive BSP loop and
    * LSH index are shared with d8/d3, not rebuilt. */
  def dedupFunnel(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.load(spark, dir, "documents")
      .agg(count(lit(1)).as("n")).select(lit(0L).as("stage"),
        lit("raw").as("stage_name"), col("n"))
    val exact = Tables.load(spark, dir, "documents")
      .agg(countDistinct(col("text")).as("n")).select(lit(1L).as("stage"),
        lit("exact_dedup").as("stage_name"), col("n"))
    val fuzzy = dedupClusters(spark, dir)
      .agg(countDistinct(col("cluster_root")).as("n")).select(lit(2L).as("stage"),
        lit("near_dedup").as("stage_name"), col("n"))
    val stages = raw.unionAll(exact).unionAll(fuzzy)
    val total = stages.filter(col("stage") === 0).select(col("n").as("n_raw"))
    stages.crossJoin(broadcast(total))
      .select(col("stage"), col("stage_name"), col("n").as("n_docs"),
        expr("(n_raw - n) * 1000000L div n_raw").as("removed_ppm"))
      .orderBy("stage")
  }

  /** d20 — near-dup threshold sensitivity sweep: pair count and distinct
    * document coverage at each candidate Jaccard threshold in
    * [[SweepPcts]] (percent points at/above the [[JaccardThreshold]]
    * index floor) — the tuning dashboard that picks a production
    * threshold: how many pairs and how much of the corpus each setting
    * would implicate. d10 audits ONE threshold's recall; this shows the
    * whole operating curve in a single readout.
    *
    * Runs entirely over the cached verified exact-pair frame (built once
    * for d4/d10) — the corpus never re-scans; the sweep is a 5×
    * amplification of a pair set that is tiny relative to the corpus,
    * grouped with map-side combine on the 5-value threshold key. The
    * comparison uses the ROUNDED published jaccard on both engines, so
    * engine and oracle bucket identically at the boundaries. */
  val SweepPcts = Seq(90, 93, 95, 97, 99) // fixture near-dups sit in
                                          // [0.89, 0.99] — this range is
                                          // where the curve actually moves
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val arr = s"array(${SweepPcts.mkString(", ")})"
    val hit = ngramJaccardPairsRaw(spark, dir)
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        explode(expr(arr)).as("pct"))
      .filter(col("jaccard") >= col("pct").cast("double") / lit(100.0))
    val np = hit.groupBy(col("pct")).agg(count(lit(1)).as("n_pairs"))
    val nd = hit.select(col("pct"), col("doc_a").as("d"))
      .unionAll(hit.select(col("pct"), col("doc_b").as("d")))
      .distinct().groupBy(col("pct")).agg(count(lit(1)).as("n_docs"))
    // spine: thresholds with zero pairs still report (the dashboard's
    // whole point is seeing where the curve hits zero)
    spark.range(1).select(explode(expr(arr)).as("pct"))
      .join(np, Seq("pct"), "left").join(nd, Seq("pct"), "left")
      .select(col("pct").cast("long").as("threshold_pct"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy("threshold_pct")
  }

  // lazy: oracle SQL bodies cross-reference sibling modules (t27→Dedup,
  // s24→Text…); eager Maps would make object-init order a correctness
  // hazard (NPE on whichever module clinit runs first).
  lazy val oracles: Map[String, String] = Map(
    // d35: the capped text chain recomputed independently — capped
    // index keep rule, probe×index candidates, exact-Jaccard
    // verification, recursive reachability.
    "d35_text_dedup_capped" ->
      s"""WITH RECURSIVE $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |$duckCappedTextChain
         |SELECT node AS doc_id, canon AS canon_id,
         |       (canon = node) AS is_kept
         |FROM ccT ORDER BY node""".stripMargin,

    // d36: both closures in one statement — d8's uncapped components
    // (the shared duckComponentsSql chain) joined node-wise against the
    // capped chain's.
    "d36_text_cap_agreement" ->
      s"""WITH RECURSIVE $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |$duckComponentsSql,
         |$duckCappedTextChain
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(count(DISTINCT c.cluster_root) AS BIGINT)
         |         AS n_clusters_uncapped,
         |       CAST(count(DISTINCT t.canon) AS BIGINT)
         |         AS n_clusters_capped,
         |       CAST(sum(CASE WHEN c.cluster_root = t.canon
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_same_root
         |FROM cc c JOIN ccT t ON c.node = t.node""".stripMargin,
    // Composes the d8 components (cc) and the d9 embedding components
    // (ecc) from the shared CTE snippets, then pair-counts the
    // contingency in HUGEINT.
    "d26_dedup_agreement" ->
      s"""WITH RECURSIVE $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |$duckComponentsSql,
         |e AS (SELECT vec_id, label, embedding::DOUBLE[] v,
         |        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) nrm
         |      FROM embeddings),
         |ep AS (SELECT a.vec_id lo, b.vec_id hi
         |       FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |       WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
         |               >= $EmbDupThreshold),
         |eund AS (SELECT lo a, hi b FROM ep UNION ALL SELECT hi a, lo b FROM ep),
         |ereach AS (
         |  SELECT vec_id node, vec_id x FROM e
         |  UNION
         |  SELECT r.node, u.b FROM ereach r JOIN eund u ON u.a = r.x),
         |ecc AS (SELECT node, min(x) canon_id FROM ereach GROUP BY node),
         |j AS (SELECT cc.node id, cc.cluster_root la, ecc.canon_id lb
         |      FROM cc JOIN ecc ON ecc.node = cc.node),
         |cells AS (SELECT la, lb, CAST(count(*) AS HUGEINT) nij
         |          FROM j GROUP BY la, lb),
         |sij AS (SELECT sum(nij * (nij - 1) // 2) s FROM cells),
         |sa AS (SELECT sum(na * (na - 1) // 2) s FROM (
         |         SELECT CAST(count(*) AS HUGEINT) na FROM j GROUP BY la)),
         |sb AS (SELECT sum(nb * (nb - 1) // 2) s FROM (
         |         SELECT CAST(count(*) AS HUGEINT) nb FROM j GROUP BY lb)),
         |tt AS (SELECT CAST(count(*) AS BIGINT) n,
         |         CAST(count(*) AS HUGEINT) * (count(*) - 1) // 2 t FROM j)
         |SELECT tt.n AS n_items,
         |       CAST(sa.s AS BIGINT) AS pairs_token,
         |       CAST(sb.s AS BIGINT) AS pairs_embed,
         |       CAST(sij.s AS BIGINT) AS pairs_agree,
         |       CAST(CASE WHEN (sa.s + sb.s) * tt.t - 2 * sa.s * sb.s = 0
         |            THEN 1000000
         |            ELSE 2 * (sij.s * tt.t - sa.s * sb.s) * 1000000
         |                 // ((sa.s + sb.s) * tt.t - 2 * sa.s * sb.s) END
         |         AS BIGINT) AS ari_ppm
         |FROM tt, sij, sa, sb""".stripMargin,

    "d16_containment" ->
      s"""WITH $duckShingled,
         |ex AS (SELECT doc_id, unnest(sh) g FROM shingled),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2),
         |v AS (
         |  SELECT doc_a, doc_b,
         |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
         |         len(x.sh) nx
         |  FROM cand JOIN shingled x ON cand.doc_a = x.doc_id
         |            JOIN shingled y ON cand.doc_b = y.doc_id)
         |SELECT doc_a, doc_b, round(i/nx, 6) AS containment
         |FROM v WHERE i/nx >= $ContainThreshold
         |ORDER BY doc_a, doc_b""".stripMargin,

    "d15_dup_spans" ->
      """WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
        |s AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i
        |      FROM t WHERE len(tk) >= 3),
        |sh AS (SELECT doc_id, CAST(i - 1 AS BIGINT) pos,
        |         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] shingle
        |       FROM s),
        |c AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1),
        |dup AS (SELECT sh.doc_id, sh.pos FROM sh JOIN c USING (shingle)),
        |q AS (SELECT doc_id, pos,
        |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) isl
        |      FROM dup),
        |runs AS (SELECT doc_id, isl, count(*) run_len, min(pos) run_start
        |         FROM q GROUP BY 1, 2),
        |top AS (SELECT doc_id, run_len, run_start FROM (
        |          SELECT *, row_number() OVER (PARTITION BY doc_id
        |            ORDER BY run_len DESC, run_start ASC) rn FROM runs)
        |        WHERE rn = 1),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_spans,
        |          CAST(sum(run_len) AS BIGINT) n_dup
        |        FROM runs GROUP BY 1)
        |SELECT d.doc_id,
        |       coalesce(agg.n_dup, 0) AS n_dup,
        |       coalesce(agg.n_spans, 0) AS n_spans,
        |       CAST(coalesce(top.run_len + 2, 0) AS BIGINT) AS longest_span_toks,
        |       top.run_start AS longest_start
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |     LEFT JOIN top ON d.doc_id = top.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    "d27_cut_ranges" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
         |s AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i
         |      FROM t WHERE len(tk) >= 3),
         |sh AS (SELECT doc_id, CAST(i - 1 AS BIGINT) pos,
         |         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] shingle
         |       FROM s),
         |c AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1),
         |dup AS (SELECT sh.doc_id, sh.pos FROM sh JOIN c USING (shingle)),
         |q AS (SELECT doc_id, pos,
         |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) isl
         |      FROM dup),
         |runs AS (SELECT doc_id, CAST(min(pos) AS BIGINT) cut_start,
         |           CAST(min(pos) + count(*) + 2 AS BIGINT) cut_end
         |         FROM q GROUP BY doc_id, isl)
         |SELECT doc_id, cut_start, cut_end,
         |       cut_end - cut_start AS cut_len_toks
         |FROM runs WHERE cut_end - cut_start >= $MinCutSpanToks
         |ORDER BY doc_id, cut_start""".stripMargin,

    "d28_cut_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
         |s AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i
         |      FROM t WHERE len(tk) >= 3),
         |sh AS (SELECT doc_id, CAST(i - 1 AS BIGINT) pos,
         |         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] shingle
         |       FROM s),
         |c AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1),
         |dup AS (SELECT sh.doc_id, sh.pos FROM sh JOIN c USING (shingle)),
         |q AS (SELECT doc_id, pos,
         |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) isl
         |      FROM dup),
         |runs AS (SELECT doc_id, CAST(min(pos) AS BIGINT) cut_start,
         |           CAST(min(pos) + count(*) + 2 AS BIGINT) cut_end
         |         FROM q GROUP BY doc_id, isl),
         |rng AS (SELECT doc_id, cut_start, cut_end FROM runs
         |        WHERE cut_end - cut_start >= $MinCutSpanToks),
         |fp AS (SELECT r.doc_id, r.cut_start, r.cut_end,
         |         md5(array_to_string(
         |           t.tk[CAST(r.cut_start + 1 AS INT) : CAST(r.cut_end AS INT)],
         |           ' ')) span_fp
         |       FROM rng r JOIN t ON t.doc_id = r.doc_id),
         |kept AS (SELECT span_fp, doc_id kept_doc_id, cut_start kept_start
         |         FROM (SELECT *, row_number() OVER (PARTITION BY span_fp
         |                 ORDER BY doc_id, cut_start) rn FROM fp)
         |         WHERE rn = 1)
         |SELECT f.doc_id, f.cut_start, f.cut_end, f.span_fp,
         |       k.kept_doc_id, k.kept_start
         |FROM fp f JOIN kept k USING (span_fp)
         |WHERE f.doc_id <> k.kept_doc_id OR f.cut_start <> k.kept_start
         |ORDER BY f.doc_id, f.cut_start""".stripMargin,

    // d33: d28's chain with the keep key prepended by the kept copy's
    // SOURCE (the d25 provenance dimension) — lowest source wins each
    // span cluster, ties to (doc_id, cut_start).
    "d33_provenance_cut" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
         |s AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i
         |      FROM t WHERE len(tk) >= 3),
         |sh AS (SELECT doc_id, CAST(i - 1 AS BIGINT) pos,
         |         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] shingle
         |       FROM s),
         |c AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1),
         |dup AS (SELECT sh.doc_id, sh.pos FROM sh JOIN c USING (shingle)),
         |q AS (SELECT doc_id, pos,
         |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) isl
         |      FROM dup),
         |runs AS (SELECT doc_id, CAST(min(pos) AS BIGINT) cut_start,
         |           CAST(min(pos) + count(*) + 2 AS BIGINT) cut_end
         |         FROM q GROUP BY doc_id, isl),
         |rng AS (SELECT doc_id, cut_start, cut_end FROM runs
         |        WHERE cut_end - cut_start >= $MinCutSpanToks),
         |fp AS (SELECT r.doc_id, r.cut_start, r.cut_end, d.source,
         |         md5(array_to_string(
         |           t.tk[CAST(r.cut_start + 1 AS INT) : CAST(r.cut_end AS INT)],
         |           ' ')) span_fp
         |       FROM rng r JOIN t ON t.doc_id = r.doc_id
         |                  JOIN documents d ON d.doc_id = r.doc_id),
         |kept AS (SELECT span_fp, source kept_source, doc_id kept_doc_id,
         |                cut_start kept_start
         |         FROM (SELECT *, row_number() OVER (PARTITION BY span_fp
         |                 ORDER BY source, doc_id, cut_start) rn FROM fp)
         |         WHERE rn = 1)
         |SELECT f.doc_id, f.cut_start, f.cut_end, f.span_fp,
         |       k.kept_source, k.kept_doc_id, k.kept_start
         |FROM fp f JOIN kept k USING (span_fp)
         |WHERE f.doc_id <> k.kept_doc_id OR f.cut_start <> k.kept_start
         |ORDER BY f.doc_id, f.cut_start""".stripMargin,

    // d29 rebuilds the d28 cut list with the same CTE chain, then removes
    // tokens by POSITION MEMBERSHIP (NOT EXISTS over the doc's ranges —
    // overlapping adjacent runs compose correctly) and re-joins the
    // survivors in position order. string_agg over zero rows is NULL,
    // so the fully-cut doc coalesces to '' (the concat_ws contract).
    "d29_cut_apply" ->
      s"""WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
         |s AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) i
         |      FROM t WHERE len(tk) >= 3),
         |sh AS (SELECT doc_id, CAST(i - 1 AS BIGINT) pos,
         |         tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] shingle
         |       FROM s),
         |c AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 1),
         |dup AS (SELECT sh.doc_id, sh.pos FROM sh JOIN c USING (shingle)),
         |q AS (SELECT doc_id, pos,
         |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) isl
         |      FROM dup),
         |runs AS (SELECT doc_id, CAST(min(pos) AS BIGINT) cut_start,
         |           CAST(min(pos) + count(*) + 2 AS BIGINT) cut_end
         |         FROM q GROUP BY doc_id, isl),
         |rng AS (SELECT doc_id, cut_start, cut_end FROM runs
         |        WHERE cut_end - cut_start >= $MinCutSpanToks),
         |fp AS (SELECT r.doc_id, r.cut_start, r.cut_end,
         |         md5(array_to_string(
         |           t.tk[CAST(r.cut_start + 1 AS INT) : CAST(r.cut_end AS INT)],
         |           ' ')) span_fp
         |       FROM rng r JOIN t ON t.doc_id = r.doc_id),
         |kept AS (SELECT span_fp, doc_id kept_doc_id, cut_start kept_start
         |         FROM (SELECT *, row_number() OVER (PARTITION BY span_fp
         |                 ORDER BY doc_id, cut_start) rn FROM fp)
         |         WHERE rn = 1),
         |cuts AS (SELECT f.doc_id, f.cut_start, f.cut_end
         |         FROM fp f JOIN kept k USING (span_fp)
         |         WHERE f.doc_id <> k.kept_doc_id OR f.cut_start <> k.kept_start),
         |orig AS (SELECT doc_id, string_split(text, ' ') tk FROM documents),
         |pos AS (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) i
         |        FROM orig),
         |srv AS (SELECT p.doc_id, p.tk[p.i] tok, p.i FROM pos p
         |        WHERE NOT EXISTS (SELECT 1 FROM cuts c
         |          WHERE c.doc_id = p.doc_id
         |            AND p.i - 1 >= c.cut_start AND p.i - 1 < c.cut_end)),
         |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) n_kept,
         |          string_agg(tok, ' ' ORDER BY i) clean_text
         |        FROM srv GROUP BY 1)
         |SELECT o.doc_id, CAST(len(o.tk) AS BIGINT) AS n_toks,
         |       CAST(len(o.tk) - coalesce(a.n_kept, 0) AS BIGINT) AS n_cut,
         |       coalesce(a.clean_text, '') AS clean_text
         |FROM orig o LEFT JOIN agg a USING (doc_id)
         |ORDER BY o.doc_id""".stripMargin,

    "d14_triangles" ->
      s"""WITH $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM bands a JOIN bands b
         |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |${duckVerifiedCte("cand", "prs")},
         |tri AS (SELECT count(*) t
         |        FROM prs e1 JOIN prs e2 ON e1.doc_b = e2.doc_a
         |             JOIN prs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
         |deg AS (SELECT n, count(*) deg FROM (
         |          SELECT doc_a n FROM prs UNION ALL SELECT doc_b FROM prs)
         |        GROUP BY n),
         |w AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) n_wedges,
         |             count(*) n_nodes
         |      FROM deg),
         |em AS (SELECT count(*) n_edges FROM prs)
         |SELECT em.n_edges, w.n_nodes, w.n_wedges,
         |       CAST(tri.t AS BIGINT) AS n_triangles,
         |       CASE WHEN w.n_wedges > 0
         |            THEN round(tri.t * 3.0 / w.n_wedges, 6)
         |            ELSE 0.0 END AS clustering_coeff
         |FROM em, w, tri""".stripMargin,

    // Same component construction as d8; the representative pick is the
    // independent ROW_NUMBER formulation (vs Spark's max_by aggregate).
    "d13_cluster_reps" ->
      s"""WITH RECURSIVE $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM bands a JOIN bands b
         |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |${duckVerifiedCte("cand", "prs")},
         |undirected AS (
         |  SELECT doc_a a, doc_b b FROM prs
         |  UNION ALL SELECT doc_b a, doc_a b FROM prs),
         |reach AS (
         |  SELECT doc_id node, doc_id x FROM documents
         |  UNION
         |  SELECT r.node, u.b FROM reach r JOIN undirected u ON u.a = r.x),
         |cc AS (SELECT node doc_id, min(x) cluster_root FROM reach GROUP BY node),
         |t AS (SELECT doc_id, text, string_split(lower(text), ' ') toks FROM documents),
         |q AS (SELECT doc_id,
         |        round((least(len(toks), 100) / 100.0)
         |              * (1.0 - len(list_filter(toks, w -> w IN ('the','a','of')))
         |                       * 1.0 / len(toks))
         |              * (1.0 - len(regexp_extract_all(text, '[^a-z0-9 ]'))
         |                       * 1.0 / length(text)), 6) quality_score
         |      FROM t),
         |j AS (SELECT cc.cluster_root, cc.doc_id, q.quality_score,
         |        row_number() OVER (PARTITION BY cc.cluster_root
         |          ORDER BY q.quality_score DESC, cc.doc_id ASC) rn
         |      FROM cc JOIN q ON cc.doc_id = q.doc_id),
         |g AS (SELECT cluster_root, count(*) n_members FROM cc GROUP BY 1)
         |SELECT g.cluster_root, g.n_members,
         |       j.doc_id AS rep_doc_id, j.quality_score AS rep_quality
         |FROM g JOIN j ON g.cluster_root = j.cluster_root AND j.rn = 1
         |ORDER BY g.cluster_root""".stripMargin,

    "d12_pagerank" -> {
      // 5 damped-update iterations unrolled as chained CTEs (standard SQL
      // forbids aggregation inside a recursive term); identical integer
      // floor arithmetic to the Spark loop, so the trajectory replays
      // bit-for-bit.
      val iters = (1 to PagerankIters).map { i =>
        s"""r$i AS (
           |  SELECT d.doc_id,
           |         CAST(150000 + (85 * coalesce(s.c, 0)) // 100 AS BIGINT) pr
           |  FROM deg d LEFT JOIN (
           |    SELECT e.b doc_id, sum(r.pr // g.deg) c
           |    FROM edges e JOIN r${i - 1} r ON e.a = r.doc_id
           |                 JOIN deg g ON g.doc_id = e.a
           |    GROUP BY e.b) s ON d.doc_id = s.doc_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM bands a JOIN bands b
         |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |${duckVerifiedCte("cand", "prp")},
         |edges AS (
         |  SELECT doc_a a, doc_b b FROM prp
         |  UNION ALL SELECT doc_b a, doc_a b FROM prp),
         |deg AS (SELECT a doc_id, count(*) deg FROM edges GROUP BY a),
         |r0 AS (SELECT doc_id, CAST(1000000 AS BIGINT) pr FROM deg),
         |$iters
         |SELECT d.doc_id,
         |       CAST(coalesce(r.pr, 150000) AS BIGINT) AS rank_micro,
         |       CAST(coalesce(deg.deg, 0) AS BIGINT) AS degree
         |FROM documents d
         |LEFT JOIN r$PagerankIters r ON d.doc_id = r.doc_id
         |LEFT JOIN deg ON d.doc_id = deg.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    "d11_incremental_dedup" ->
      s"""WITH $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |cand AS (
         |  SELECT a.doc_id doc_new, b.doc_id doc_old
         |  FROM bands a JOIN bands b
         |    ON a.bid = b.bid AND a.bkey = b.bkey
         |   AND a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
         |  GROUP BY 1, 2),
         |v AS (
         |  SELECT doc_new, doc_old,
         |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
         |         len(x.sh) + len(y.sh) tot
         |  FROM cand JOIN shingled x ON cand.doc_new = x.doc_id
         |            JOIN shingled y ON cand.doc_old = y.doc_id),
         |m AS (SELECT doc_new, count(*) n_matches,
         |             max(round(i/(tot-i), 6)) best_jaccard
         |      FROM v WHERE i/(tot-i) >= $JaccardThreshold
         |      GROUP BY doc_new)
         |SELECT s.doc_id,
         |       CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches,
         |       coalesce(m.best_jaccard, 0.0) AS best_jaccard,
         |       m.n_matches IS NOT NULL AS is_dup
         |FROM shingled s LEFT JOIN m ON s.doc_id = m.doc_new
         |WHERE s.doc_id % 2 = 1
         |ORDER BY doc_id""".stripMargin,

    "d1_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "d22_bow_dedup" ->
      """WITH b AS (
        |  SELECT doc_id, text,
        |         md5(array_to_string(
        |           list_sort(list_distinct(string_split(lower(text), ' '))),
        |           ' ')) bow_sig
        |  FROM documents)
        |SELECT min(doc_id) AS keep_id, bow_sig, count(*) AS n_docs,
        |       CAST(count(DISTINCT text) AS BIGINT) AS n_texts
        |FROM b GROUP BY bow_sig ORDER BY keep_id""".stripMargin,

    "d2_minhash_signature" ->
      s"""WITH $duckShingled,
         |$duckMinhashed
         |SELECT doc_id,
         |       md5(${(0 until NumHashes).map("h" + _).mkString(" || '|' || ")}) AS sig
         |FROM minhashed ORDER BY doc_id""".stripMargin,

    "d3_lsh_pairs" ->
      s"""WITH $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM bands a JOIN bands b
         |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |$duckJaccardTail""".stripMargin,

    "d4_ngram_jaccard" ->
      s"""WITH $duckShingled,
         |ex AS (SELECT doc_id, unnest(sh) g FROM shingled),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |$duckJaccardTail""".stripMargin,

    "d20_threshold_sweep" -> {
      val pctList = SweepPcts.mkString("[", ", ", "]")
      s"""WITH $duckShingled,
         |ex AS (SELECT doc_id, unnest(sh) g FROM shingled),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |verified AS (
         |  SELECT doc_a, doc_b,
         |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
         |         len(x.sh) + len(y.sh) tot
         |  FROM cand JOIN shingled x ON cand.doc_a = x.doc_id
         |            JOIN shingled y ON cand.doc_b = y.doc_id),
         |p AS (SELECT doc_a, doc_b, round(i/(tot-i), 6) jaccard
         |      FROM verified WHERE i/(tot-i) >= $JaccardThreshold),
         |sp AS (SELECT unnest($pctList) pct),
         |hit AS (SELECT pct, doc_a, doc_b FROM p CROSS JOIN sp
         |        WHERE jaccard >= pct / 100.0),
         |np AS (SELECT pct, CAST(count(*) AS BIGINT) n_pairs FROM hit GROUP BY 1),
         |nd AS (SELECT pct, CAST(count(*) AS BIGINT) n_docs FROM (
         |         SELECT DISTINCT pct, d FROM (
         |           SELECT pct, doc_a d FROM hit
         |           UNION ALL SELECT pct, doc_b d FROM hit))
         |       GROUP BY 1)
         |SELECT CAST(sp.pct AS BIGINT) AS threshold_pct,
         |       coalesce(np.n_pairs, 0) AS n_pairs,
         |       coalesce(nd.n_docs, 0) AS n_docs
         |FROM sp LEFT JOIN np ON np.pct = sp.pct
         |        LEFT JOIN nd ON nd.pct = sp.pct
         |ORDER BY threshold_pct""".stripMargin
    },

    "d10_lsh_recall" ->
      s"""WITH $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |candl AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM bands a JOIN bands b
         |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |${duckVerifiedCte("candl", "lshp")},
         |exall AS (SELECT doc_id, unnest(sh) g FROM shingled),
         |cande AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM exall a JOIN exall b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |${duckVerifiedCte("cande", "exactp")},
         |j AS (
         |  SELECT coalesce(e.one, 0) in_exact, coalesce(l.one, 0) in_lsh
         |  FROM (SELECT doc_a, doc_b, 1 one FROM exactp) e
         |  FULL OUTER JOIN (SELECT doc_a, doc_b, 1 one FROM lshp) l
         |    USING (doc_a, doc_b))
         |SELECT CAST(sum(in_exact) AS BIGINT) AS n_exact,
         |       CAST(sum(in_lsh) AS BIGINT) AS n_lsh,
         |       CAST(sum(in_exact * in_lsh) AS BIGINT) AS n_common,
         |       round(CAST(sum(in_exact * in_lsh) AS DOUBLE) / sum(in_exact), 6)
         |         AS recall,
         |       round(CAST(sum(in_exact * in_lsh) AS DOUBLE) / sum(in_lsh), 6)
         |         AS prec
         |FROM j""".stripMargin,

    "d5_simhash" ->
      s"""WITH $duckSimhashCte
         |SELECT doc_id, h AS simhash16 FROM shh ORDER BY doc_id""".stripMargin,

    "d7_simhash_pairs" ->
      s"""WITH $duckSimhashCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.h, b.h)) AS BIGINT) AS hamming
         |FROM shh a JOIN shh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.h, b.h)) <= $MaxHamming
         |ORDER BY doc_a, doc_b""".stripMargin,

    "d17_bfs_hops" ->
      s"""WITH RECURSIVE $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM bands a JOIN bands b
         |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |verified AS (
         |  SELECT doc_a, doc_b,
         |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
         |         len(x.sh) + len(y.sh) tot
         |  FROM cand JOIN shingled x ON cand.doc_a = x.doc_id
         |            JOIN shingled y ON cand.doc_b = y.doc_id),
         |pairs AS (SELECT doc_a, doc_b FROM verified
         |          WHERE i/(tot-i) >= $JaccardThreshold),
         |undirected AS (
         |  SELECT doc_a a, doc_b b FROM pairs
         |  UNION ALL SELECT doc_b a, doc_a b FROM pairs),
         |walk AS (
         |  SELECT DISTINCT a AS node, 0 AS hops FROM undirected WHERE a % 10 = 0
         |  UNION
         |  SELECT u.b, w.hops + 1 FROM walk w JOIN undirected u ON u.a = w.node
         |  WHERE w.hops < 100)
         |SELECT node AS doc_id, CAST(min(hops) AS BIGINT) AS hops
         |FROM walk
         |GROUP BY node ORDER BY doc_id""".stripMargin,

    "d19_lpa" -> {
      // LpaRounds synchronous mode-vote rounds unrolled as chained CTEs
      // (the d12 discipline): per round, a node's new label is the most
      // frequent among its neighbors' previous labels plus its own
      // (ties to the min label via ORDER BY c DESC, label ASC).
      val rounds = (1 to LpaRounds).map { r =>
        s"""l$r AS (
           |  SELECT node, label FROM (
           |    SELECT v.node, v.label,
           |           row_number() OVER (PARTITION BY v.node
           |             ORDER BY v.c DESC, v.label ASC) rn
           |    FROM (SELECT node, label, count(*) c FROM (
           |            SELECT u.b node, l.label
           |            FROM undirected u JOIN l${r - 1} l ON l.node = u.a
           |            UNION ALL SELECT node, label FROM l${r - 1})
           |          GROUP BY node, label) v)
           |  WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM bands a JOIN bands b
         |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |verified AS (
         |  SELECT doc_a, doc_b,
         |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
         |         len(x.sh) + len(y.sh) tot
         |  FROM cand JOIN shingled x ON cand.doc_a = x.doc_id
         |            JOIN shingled y ON cand.doc_b = y.doc_id),
         |pairs AS (SELECT doc_a, doc_b FROM verified
         |          WHERE i/(tot-i) >= $JaccardThreshold),
         |undirected AS (
         |  SELECT doc_a a, doc_b b FROM pairs
         |  UNION ALL SELECT doc_b a, doc_a b FROM pairs),
         |l0 AS (SELECT a AS node, a AS label FROM (SELECT DISTINCT a FROM undirected)),
         |$rounds,
         |sizes AS (SELECT label, CAST(count(*) AS BIGINT) n_members
         |          FROM l$LpaRounds GROUP BY label)
         |SELECT d.doc_id,
         |       coalesce(l.label, d.doc_id) AS community,
         |       coalesce(s.n_members, 1) AS n_members
         |FROM documents d
         |LEFT JOIN l$LpaRounds l ON l.node = d.doc_id
         |LEFT JOIN sizes s ON s.label = coalesce(l.label, d.doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },

    "d21_dedup_funnel" ->
      s"""WITH RECURSIVE $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |$duckComponentsSql,
         |raw AS (SELECT CAST(count(*) AS BIGINT) n FROM documents),
         |st AS (
         |  SELECT 0 stage, 'raw' stage_name, n FROM raw
         |  UNION ALL
         |  SELECT 1, 'exact_dedup', CAST(count(DISTINCT text) AS BIGINT)
         |  FROM documents
         |  UNION ALL
         |  SELECT 2, 'near_dedup', CAST(count(DISTINCT cluster_root) AS BIGINT)
         |  FROM cc)
         |SELECT CAST(st.stage AS BIGINT) AS stage, st.stage_name,
         |       st.n AS n_docs,
         |       CAST((raw.n - st.n) * 1000000 // raw.n AS BIGINT) AS removed_ppm
         |FROM st, raw ORDER BY stage""".stripMargin,

    "d8_dedup_clusters" ->
      s"""WITH RECURSIVE $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |$duckComponentsSql
         |SELECT node AS doc_id, cluster_root FROM cc ORDER BY doc_id""".stripMargin,

    "d24_bbit_minhash" -> {
      val aFull = (0 until NumHashes)
        .map(i => s"CASE WHEN ma.h$i = mb.h$i THEN 1 ELSE 0 END")
        .mkString(" + ")
      val a1 = (0 until NumHashes)
        .map(i => s"CASE WHEN ma.h$i % 2 = mb.h$i % 2 THEN 1 ELSE 0 END")
        .mkString(" + ")
      s"""WITH $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM bands a JOIN bands b
         |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |verified AS (
         |  SELECT doc_a, doc_b,
         |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
         |         len(x.sh) + len(y.sh) tot
         |  FROM cand JOIN shingled x ON cand.doc_a = x.doc_id
         |            JOIN shingled y ON cand.doc_b = y.doc_id),
         |p AS (SELECT doc_a, doc_b, round(i/(tot-i), 6) jaccard
         |      FROM verified WHERE i/(tot-i) >= $JaccardThreshold),
         |ag AS (SELECT p.doc_a, p.doc_b, p.jaccard,
         |         CAST($aFull AS BIGINT) n_agree_full,
         |         CAST($a1 AS BIGINT) n_agree_1bit
         |       FROM p JOIN minhashed ma ON ma.doc_id = p.doc_a
         |              JOIN minhashed mb ON mb.doc_id = p.doc_b)
         |SELECT doc_a, doc_b, jaccard, n_agree_full, n_agree_1bit,
         |       CAST(n_agree_full * 1000000 // $NumHashes AS BIGINT)
         |         AS est_full_ppm,
         |       CAST(greatest(2 * n_agree_1bit - $NumHashes, 0) * 1000000
         |            // $NumHashes AS BIGINT) AS est_1bit_ppm
         |FROM ag ORDER BY doc_a, doc_b""".stripMargin
    },

    "d25_dup_provenance" ->
      s"""WITH $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |cand AS (
         |  SELECT a.doc_id doc_a, b.doc_id doc_b
         |  FROM bands a JOIN bands b
         |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |verified AS (
         |  SELECT doc_a, doc_b,
         |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
         |         len(x.sh) + len(y.sh) tot
         |  FROM cand JOIN shingled x ON cand.doc_a = x.doc_id
         |            JOIN shingled y ON cand.doc_b = y.doc_id),
         |p AS (SELECT doc_a, doc_b FROM verified
         |      WHERE i/(tot-i) >= $JaccardThreshold),
         |sp AS (SELECT least(da.source, db.source) source_lo,
         |         greatest(da.source, db.source) source_hi
         |       FROM p JOIN documents da ON da.doc_id = p.doc_a
         |              JOIN documents db ON db.doc_id = p.doc_b)
         |SELECT source_lo, source_hi, count(*) AS n_pairs,
         |       CAST(CASE WHEN source_lo = source_hi THEN 1 ELSE 0 END
         |            AS INTEGER) AS intra_source
         |FROM sp GROUP BY source_lo, source_hi
         |ORDER BY source_lo, source_hi""".stripMargin,

    "d23_soft_dedup" ->
      s"""WITH RECURSIVE $duckShingled,
         |$duckMinhashed,
         |bands AS MATERIALIZED (
         |$duckBands),
         |$duckComponentsSql,
         |cs AS (SELECT cluster_root, CAST(count(*) AS BIGINT) cluster_size
         |       FROM cc GROUP BY 1)
         |SELECT cc.node AS doc_id, cc.cluster_root, cs.cluster_size,
         |       CAST(CASE WHEN ('0x' || substr(md5('soft|' || cc.node::VARCHAR),
         |              1, 8))::BIGINT % 1000 * cs.cluster_size < 1000
         |            THEN 1 ELSE 0 END AS INTEGER) AS kept
         |FROM cc JOIN cs USING (cluster_root) ORDER BY doc_id""".stripMargin,

    "d9_embedding_dedup" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, label, embedding::DOUBLE[] v,
         |            sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) nrm
         |           FROM embeddings),
         |p AS (SELECT a.vec_id lo, b.vec_id hi
         |      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |      WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
         |              >= $EmbDupThreshold),
         |undirected AS (
         |  SELECT lo a, hi b FROM p
         |  UNION ALL SELECT hi a, lo b FROM p),
         |reach AS (
         |  SELECT vec_id node, vec_id x FROM e
         |  UNION
         |  SELECT r.node, u.b FROM reach r JOIN undirected u ON u.a = r.x)
         |SELECT node AS vec_id, min(x) AS canon_id,
         |       (min(x) = node) AS is_kept
         |FROM reach GROUP BY node ORDER BY node""".stripMargin,

    // d30 swaps d9's label-block candidate CTE for the scaled-band
    // bucket join (the same CTEs s30/s31/s32 replicate), then runs the
    // identical threshold + recursive reachability closure.
    "d30_ann_dedup" ->
      s"""WITH RECURSIVE ${SimilarityQueries.duckEmb},
         |${SimilarityQueries.duckScaledBands},
         |${SimilarityQueries.duckCappedIdx},
         |p AS (SELECT DISTINCT a.vec_id lo, b.vec_id hi
         |      FROM cidx a JOIN cidx b
         |        ON a.bid = b.bid AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
         |pe AS (SELECT lo, hi FROM p
         |       JOIN e x ON x.vec_id = p.lo JOIN e y ON y.vec_id = p.hi
         |       WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6)
         |               >= $EmbDupThreshold),
         |undirected AS (
         |  SELECT lo a, hi b FROM pe
         |  UNION ALL SELECT hi a, lo b FROM pe),
         |reach AS (
         |  SELECT vec_id node, vec_id x FROM e
         |  UNION
         |  SELECT r.node, u.b FROM reach r JOIN undirected u ON u.a = r.x)
         |SELECT node AS vec_id, min(x) AS canon_id,
         |       (min(x) = node) AS is_kept
         |FROM reach GROUP BY node ORDER BY node""".stripMargin,

    // d31: d30's closure over the MULTI-PROBE candidate pairs — the
    // shared probe-expansion CTEs (duckMpProbes, generated at the
    // production ProbeDepth) expand every vector's keys, lo/hi-
    // normalized DISTINCT pairs feed the identical threshold +
    // recursive reachability.
    "d31_ann_dedup_mp" ->
      s"""WITH RECURSIVE ${SimilarityQueries.duckEmb},
         |${SimilarityQueries.duckScaledBands},
         |${SimilarityQueries.duckCappedIdx},
         |${SimilarityQueries.duckMpProbes()},
         |${SimilarityQueries.duckMpComponents}
         |SELECT node AS vec_id, canon AS canon_id,
         |       (canon = node) AS is_kept
         |FROM cc ORDER BY node""".stripMargin,

    // d32: exact label-blocked dup pairs as the denominator, membership
    // joins against the single-bucket (d30) and multi-probe (d31)
    // candidate pair sets as the two numerators.
    "d32_mp_dedup_recall" ->
      s"""WITH ${SimilarityQueries.duckEmb},
         |${SimilarityQueries.duckScaledBands},
         |${SimilarityQueries.duckCappedIdx},
         |truth AS (SELECT a.vec_id lo, b.vec_id hi
         |          FROM e a JOIN e b
         |            ON a.label = b.label AND a.vec_id < b.vec_id
         |          WHERE a.vec_id < ${SimilarityQueries.RecallSampleCap}
         |            AND round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
         |                  >= $EmbDupThreshold),
         |p0 AS (SELECT DISTINCT a.vec_id lo, b.vec_id hi
         |       FROM cidx a JOIN cidx b
         |         ON a.bid = b.bid AND a.bkey = b.bkey
         |        AND a.vec_id < b.vec_id),
         |${SimilarityQueries.duckMpProbes()},
         |p1 AS (SELECT DISTINCT least(pq.qid, i.vec_id) lo,
         |        greatest(pq.qid, i.vec_id) hi
         |       FROM probes pq JOIN cidx i
         |         ON i.bid = pq.bid AND CAST(i.bkey AS BIGINT) = pq.pkey
         |        AND i.vec_id <> pq.qid),
         |f AS (SELECT 't0_single' probe_mode, CAST(count(*) AS BIGINT) n_found
         |      FROM truth JOIN p0 USING (lo, hi)
         |      UNION ALL
         |      SELECT '$multiLabel', CAST(count(*) AS BIGINT)
         |      FROM truth JOIN p1 USING (lo, hi)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) n_true_pairs FROM truth)
         |SELECT f.probe_mode, tot.n_true_pairs, f.n_found,
         |       tot.n_true_pairs - f.n_found AS n_missed,
         |       CAST(f.n_found * 1000000 // greatest(tot.n_true_pairs, 1)
         |            AS BIGINT) AS found_ppm
         |FROM f, tot ORDER BY f.probe_mode""".stripMargin,

    // d34: d32's truth/p0/p1 chain plus the s39 descent-graph CTEs
    // (suffix "d"), with the third candidate source as p0 UNION the
    // symmetrized G1 edge set.
    "d34_descent_dedup_recall" ->
      s"""WITH ${SimilarityQueries.duckEmb},
         |${SimilarityQueries.duckScaledBands},
         |${SimilarityQueries.duckCappedIdx},
         |truth AS (SELECT a.vec_id lo, b.vec_id hi
         |          FROM e a JOIN e b
         |            ON a.label = b.label AND a.vec_id < b.vec_id
         |          WHERE a.vec_id < ${SimilarityQueries.RecallSampleCap}
         |            AND round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6)
         |                  >= $EmbDupThreshold),
         |p0 AS (SELECT DISTINCT a.vec_id lo, b.vec_id hi
         |       FROM cidx a JOIN cidx b
         |         ON a.bid = b.bid AND a.bkey = b.bkey
         |        AND a.vec_id < b.vec_id),
         |${SimilarityQueries.duckMpProbes()},
         |p1 AS (SELECT DISTINCT least(pq.qid, i.vec_id) lo,
         |        greatest(pq.qid, i.vec_id) hi
         |       FROM probes pq JOIN cidx i
         |         ON i.bid = pq.bid AND CAST(i.bkey AS BIGINT) = pq.pkey
         |        AND i.vec_id <> pq.qid),
         |${SimilarityQueries.duckDescentCtes("d")},
         |p2 AS (SELECT lo, hi FROM p0
         |       UNION
         |       SELECT least(vec_id, nbr_id) lo, greatest(vec_id, nbr_id) hi
         |       FROM g1d),
         |f AS (SELECT 't0_single' probe_mode, CAST(count(*) AS BIGINT) n_found
         |      FROM truth JOIN p0 USING (lo, hi)
         |      UNION ALL
         |      SELECT '$multiLabel', CAST(count(*) AS BIGINT)
         |      FROM truth JOIN p1 USING (lo, hi)
         |      UNION ALL
         |      SELECT 't2_descent', CAST(count(*) AS BIGINT)
         |      FROM truth JOIN p2 USING (lo, hi)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) n_true_pairs FROM truth)
         |SELECT f.probe_mode, tot.n_true_pairs, f.n_found,
         |       tot.n_true_pairs - f.n_found AS n_missed,
         |       CAST(f.n_found * 1000000 // greatest(tot.n_true_pairs, 1)
         |            AS BIGINT) AS found_ppm
         |FROM f, tot ORDER BY f.probe_mode""".stripMargin,

    "d6_levenshtein" ->
      s"""SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
         |       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
         |FROM customer a JOIN customer b
         |  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
         |WHERE levenshtein(a.c_name, b.c_name) <= $MaxEditDistance
         |ORDER BY cust_a, cust_b""".stripMargin
  )
}
