package graft.ext

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>` column).
  *
  * All cosine math goes through the codegen'd [[graft.functions.CosineSimilarity]]
  * expression (double precision, element-wise widened floats — the same
  * arithmetic the DuckDB oracle performs on `embedding::DOUBLE[]`).
  *
  * Scale posture: `s1` top-k plans as TakeOrderedAndProject against a
  * broadcast single-row query vector (one scan, no shuffle, no global
  * sort). `s2`/`s3` bound pair generation by label blocking. `s4` is the
  * 100 TB path: random-hyperplane LSH buckets turn the all-pairs problem
  * into an equi-join on band keys; only in-bucket candidates pay the exact
  * cosine.
  */
object SimilarityQueries {

  val NearDupThreshold = 0.45  // synthetic corpus: max same-label cosine is
                               // ~0.47 at sf0.01 / ~0.51 at sf0.1, so 0.45
                               // keeps the result non-empty at every SF the
                               // driver checks (an empty result would make
                               // the oracle compare vacuous)
  val LabelPairThreshold = 0.3

  private def emb(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    // embeddings.parquet is a single row group → one input split; every
    // per-vector computation downstream (plane dots, centroid assignment,
    // brute-force scoring) would run on one core without an explicit
    // fan-out. Hash on vec_id so s5's per-vector window needs no second
    // shuffle. On a real multi-row-group corpus the scan parallelizes
    // itself and this becomes a no-op cost-wise.
    // EXPLICIT derived count: a bare repartition(col) is coalesced by AQE
    // down to total-bytes/minPartitionSize (~1 MB) partitions — for this
    // frame a handful — BEFORE localCheckpoint captures the partitioning,
    // so every band-index consumer inherited near-serial compute (s34's
    // probe-shell build: one 1.0 s task at sf0.1). Byte-based coalescing
    // is the wrong rule for compute-dense vector rows; the fan-out
    // derives from the row count (graft.ops.PlanHints.computeFanout) so
    // it scales with the corpus instead of the local core count.
    Tables.load(spark, dir, "embeddings")
      .repartition(graft.ops.PlanHints.computeFanout(corpusCount(spark, dir)),
        col("vec_id"))
  }

  /** ANN index frames, built + checkpointed once per (session, dir) like
    * the dedup shingle/signature indexes: s4's band table and s5's cell
    * assignment ARE the index artifacts an ANN deployment persists (build
    * once, probe per query) — s4/s5/s9 probe them repeatedly. */
  private val caches = new DirCaches
  private val bandsCache = caches.newCache()
  // One cache slot PER KEY WIDTH (r15 optimization): the scaled (width b),
  // standing (b0), rebuilt (b0+1) and replay-family projections are all
  // the same 8·w dot-product kernel at different widths, but each used to
  // live in its own cache — and the three replay oracles rebuilt + released
  // a private copy EVERY invocation (one plane projection + checkpoint +
  // release per call, ~1/3 of each replay's warm wall at sf0.1). Indexing
  // the cache by width lets every consumer of a width-w frame share one
  // checkpoint per (session, dir): the epoch replays land on the SAME
  // frame as [[rebuiltBandIndex]], and the evict replay rides
  // [[scaledBandIndex]]. Eviction discipline is unchanged (one hot dir
  // per session; released via DirCaches on dir switch / teardown).
  // lazy: LshKeyBitsMax is declared later in the object body; a strict val
  // here would read it before initialization (0 slots).
  private lazy val widthBandsCaches =
    IndexedSeq.fill(LshKeyBitsMax + 1)(caches.newCache())
  private val cellsCache = caches.newCache()
  private val pqCache = caches.newCache()
  private val codewordsCache = caches.newCache()
  private val ivfpqCache = caches.newCache()
  private val matryoshkaTopCache = caches.newCache()
  private val kmeansCache = caches.newCache()

  private def evictOtherDirs(spark: SparkSession, dir: String): Unit =
    caches.evictOtherDirs(spark, dir)

  /** Bench/Verify teardown hook (see [[graft.ext.DedupQueries.clearCaches]]). */
  def clearCaches(): Unit = caches.clear()

  /** s1 — brute-force cosine top-10 against a fixed query vector (vec_id 0),
    * the exactness baseline every ANN variant is judged against. */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.filter(col("vec_id") > 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(expr("cosine_sim(embedding, qv)"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(10)
  }

  /** s15 — Maximal Marginal Relevance: diversified top-k retrieval. Pure
    * relevance ranking returns near-duplicates of each other; MMR
    * iteratively picks argmax of `λ·rel − (1−λ)·max_sim(selected)` so
    * each pick is relevant AND far from everything already chosen — the
    * selection rule for dedup-aware training-data retrieval.
    *
    * Scale shape: MMR is inherently sequential in k but only ever runs
    * over a bounded SHORTLIST — the corpus-sized work is producing that
    * shortlist (here brute-force top-[[MmrShortlist]] by relevance; at
    * scale the s4/s5 ANN paths), after which each of the k rounds is a
    * distributed argmax over ≤ shortlist rows with the selected vectors
    * broadcast as literals. The driver sees one row per round. All
    * similarities go through the same round-6 cosine the s-family
    * oracles replicate, and the MMR combine is one fixed double
    * expression — engine-identical, no knife edges. */
  val MmrK = 5
  val MmrShortlist = 20
  val MmrLambda = 0.7
  // NOT computed as 1.0 - MmrLambda: that double is 0.30000000000000004,
  // while the oracle's literal 0.3 is not — the weights must be the same
  // parsed literal on both engines.
  val MmrLambdaBar = 0.3
  def mmrTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val shortlist = e.filter(col("vec_id") > 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("embedding"),
        round(expr("cosine_sim(embedding, qv)"), 6).as("rel"))
      .orderBy(col("rel").desc, col("vec_id").asc)
      .limit(MmrShortlist)
      .localCheckpoint()
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Float]]
    var rank = 1
    var exhausted = false
    while (rank <= MmrK && !exhausted) {
      val sims = pickedVecs.toSeq.map { v =>
        round(call_function("cosine_sim", col("embedding"),
          array(v.map(x => lit(x)): _*)), 6)
      }
      val maxSim = sims match {
        case Seq() => lit(0.0)
        case Seq(one) => one
        case many => greatest(many: _*)
      }
      val rows = shortlist
        .filter(if (picked.isEmpty) lit(true)
          else !col("vec_id").isin(picked.toSeq.map(_._2): _*))
        .withColumn("mmr", lit(MmrLambda) * col("rel") -
          lit(MmrLambdaBar) * maxSim)
        .orderBy(col("mmr").desc, col("vec_id").asc)
        .limit(1).collect()
      if (rows.isEmpty) exhausted = true
      else {
        val r = rows(0)
        picked += ((rank.toLong, r.getAs[Long]("vec_id"), r.getAs[Double]("mmr")))
        pickedVecs += r.getAs[scala.collection.Seq[Float]]("embedding").toSeq
        rank += 1
      }
    }
    graft.CheckpointUtil.release(shortlist)
    picked.toSeq.toDF("rank", "vec_id", "mmr").orderBy("rank")
  }

  /** s16 — k-center farthest-point traversal: greedy coreset selection.
    * Starting from vector 0, each round adds the vector FARTHEST from the
    * selected set (max over candidates of min cosine-distance = argmin of
    * max cosine) — the classic 2-approximation to the k-center cover and
    * the diversity-sampling rule for picking a small training subset that
    * spans the embedding space. The dual of s15: MMR trades relevance
    * against redundancy over a shortlist; k-center maximizes pure
    * coverage over the WHOLE corpus.
    *
    * Scale shape: each of the k rounds is one distributed argmin over
    * the full vector set with the ≤k selected vectors broadcast as
    * literals — a narrow scan + TakeOrdered(1), no shuffle, no pairwise
    * materialization; rounds are sequential by nature (greedy), driver
    * traffic is one row per round. Cosines go through the s-family's
    * round-6 parity grid. */
  val KCenterK = 5
  def kCenter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = emb(spark, dir).select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    val seed = e.filter(col("vec_id") === 0)
      .select(col("vec_id"), col("embedding")).collect()(0)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Float]]
    picked += ((1L, seed.getAs[Long]("vec_id"), 1.0))
    pickedVecs += seed.getAs[scala.collection.Seq[Float]]("embedding").toSeq
    (2 to KCenterK).foreach { rank =>
      val sims = pickedVecs.toSeq.map { v =>
        round(call_function("cosine_sim", col("embedding"),
          array(v.map(x => lit(x)): _*)), 6)
      }
      val maxSim = sims match {
        case Seq(one) => one
        case many => greatest(many: _*)
      }
      val r = e.filter(!col("vec_id").isin(picked.toSeq.map(_._2): _*))
        .withColumn("max_sim", maxSim)
        .orderBy(col("max_sim").asc, col("vec_id").asc)
        .limit(1).collect()(0)
      picked += ((rank.toLong, r.getAs[Long]("vec_id"), r.getAs[Double]("max_sim")))
      pickedVecs += r.getAs[scala.collection.Seq[Float]]("embedding").toSeq
    }
    graft.CheckpointUtil.release(e)
    picked.toSeq.toDF("rank", "vec_id", "max_sim_at_pick").orderBy("rank")
  }

  /** s2 — embedding-cosine near-duplicate pairs (the embedding flavor of
    * dedup). Pairs are generated label-blocked + upper-triangular; the
    * unblocked variant at scale is s4's LSH. */
  def cosinePairs(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id"), col("embedding"), col("label"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", round(expr("cosine_sim(a.embedding, b.embedding)"), 6))
      .filter(col("cosine") >= NearDupThreshold)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"), col("cosine"))
      .orderBy("vec_a", "vec_b")
  }

  /** s3 — per-label count of similar pairs (blocked all-pairs aggregate). */
  def labelPairCounts(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id"), col("embedding"), col("label"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .filter(round(expr("cosine_sim(a.embedding, b.embedding)"), 6) >= LabelPairThreshold)
      .groupBy(col("a.label").as("label"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("label")
  }

  /** Fixed pseudo-random ±1 hyperplanes for s4: sign(p, d) from the md5
    * digest of "p|d", computed once at plan-build time and embedded as
    * literal coefficients — so the plan is pure (codegen'd, constant)
    * arithmetic and the DuckDB oracle can embed the identical planes. */
  val LshPlanes = 16
  val LshDims = 64

  /** The ±1 sign table for a hyperplane family: md5("<seed><p>|<d>").
    * One generator for every family (s4's cosine planes, s13's augmented
    * MIPS planes) so the scheme can't drift between them. */
  private def hashSignsN(seed: String, planes: Int, dims: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      val h = md.digest(s"$seed$p|$d".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1 else -1
    }
  }
  private def hashSigns(seed: String, dims: Int): Array[Array[Int]] =
    hashSignsN(seed, LshPlanes, dims)
  private lazy val planeSigns: Array[Array[Int]] = hashSigns("", LshDims)
  /** The extended family for the multi-table scaled index: table t owns
    * planes [t·16, (t+1)·16) of the SAME "" seed, so table 0's planes
    * are exactly s4's. */
  private lazy val tablePlaneSigns: Array[Array[Int]] =
    hashSignsN("", AnnHubTables * LshPlanes, LshDims)

  /** Widened per-table key maximum — the plane-family continuation past
    * the [[LshPlanes]] clamp (the documented limit the 100x blow-up
    * reached exactly: n = 2^16·occ). Key bits r ≥ 16 draw from a
    * SEPARATE "ext"-seeded family so every key's low 16 bits are
    * byte-identical to the unwidened index — the s36 split property
    * extends across the clamp boundary and a standing index can re-key
    * from b=16 to b=17 without re-bucketing history (s37 checks the
    * contract differentially).
    *
    * This is the production clamp on the ADAPTIVE width
    * ([[scaledBandBits]]), not a kernel limit: the ext family is
    * generated on demand at RANK-MAJOR index `(r−16)·T + t`, so raising
    * this constant only APPENDS plane rows — every already-assigned
    * (table, rank) keeps its plane bit for bit, and standing state
    * never re-buckets on a family growth. (The r11 build indexed
    * table-major, `t·(Ext−16) + (r−16)`, which bakes the constant into
    * every index: growing 24 → 32 would have silently remapped bits
    * 16–23 of tables ≥ 1 to DIFFERENT planes — a full re-bucket of
    * live state disguised as a constant bump. The width sweep in
    * ExtSpec now pins the rank-major rule and runs the migration /
    * prefix-stability contracts out to bit 30.) The kernels accept any
    * width up to [[LshKeyBitsMax]]; the true redesign point is bit 31
    * (the Int key's sign bit — bkey would need LONG, at ~2^31·occ ≈
    * 17 B vectors per occ-8 unit). */
  val LshPlanesExt = 24
  /** Hard kernel ceiling on per-table key width: bkey is a positive
    * Int, so bits 0..30 are addressable; bit 31 is the sign bit. */
  val LshKeyBitsMax = 31
  /** PLANE-FAMILY FORMAT VERSION, stamped into every streaming-ANN
    * checkpoint ([[graft.streaming.StreamOps.stampPlaneFamily]]) and
    * verified before any drain/migration reads bucket state. Version 2
    * = rank-major ext-family indexing (`(r−16)·T + t`). The r11 build
    * indexed table-major, which assigns DIFFERENT sign planes to key
    * bits r ≥ 16 of tables ≥ 1 — state built at width b ≥ 17 under one
    * scheme is silently inconsistent with probes/migrations under the
    * other (wrong-bucket candidate generation, no error). Bump this on
    * ANY change to plane assignment; the stamp turns a silent
    * correctness hazard into a fail-fast re-index demand. */
  val PlaneFamilyVersion = 2
  private val extRowCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()
  /** Ext-family sign row at rank-major index `i = (r−16)·T + t`,
    * generated on demand (same digest rule as [[hashSignsN]] with seed
    * "ext") — the family has no materialized size, so no constant can
    * remap it. */
  private def extPlaneRow(i: Int): Array[Int] =
    extRowCache.computeIfAbsent(i, idx => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(LshDims) { d =>
        val h = md.digest(s"ext$idx|$d".getBytes("UTF-8"))
        if ((h(0) & 1) == 1) 1 else -1
      }
    })
  /** Sign row for key bit `r` of table `t` across the widened family. */
  private[graft] def tablePlaneSign(t: Int, r: Int): Array[Int] =
    if (r < LshPlanes) tablePlaneSigns(t * LshPlanes + r)
    else extPlaneRow((r - LshPlanes) * AnnHubTables + t)

  /** The 4×4 banding of 16 sign-bit columns `s0..s15` into
    * `struct(bid, bkey)` literals — shared by every LSH family. */
  private def bandStructCols: Seq[Column] = (0 until 4).map { b =>
    val e = (0 until 4)
      .map(r => s"(CASE WHEN s${4 * b + r} THEN ${1 << r} ELSE 0 END)").mkString(" + ")
    expr(s"struct(cast($b as int) as bid, cast($e as int) as bkey)")
  }

  /** DuckDB side of the same banding: 4 UNION ALL selects over a `bits`
    * relation carrying s0..s15. */
  private def duckBandUnion: String = (0 until 4).map { b =>
    val k = (0 until 4)
      .map(r => s"(CASE WHEN s${4 * b + r} THEN ${1 << r} ELSE 0 END)")
      .mkString(" + ")
    s"SELECT vec_id, $b bid, $k bkey FROM bits"
  }.mkString("\nUNION ALL\n")

  /** `embedding · plane_p` as an expression string; `idx` renders a
    * 1-based element access and `one` the unit literal for the dialect
    * (`1.0D` for Spark — ANSI parses bare `1.0` as DECIMAL — and `1.0`
    * for DuckDB). */
  private def planeDot(p: Int, idx: Int => String, one: String): String =
    (0 until LshDims)
      .map(d => s"${idx(d + 1)} * ${if (planeSigns(p)(d) > 0) one else s"-$one"}")
      .mkString(" + ")

  /** The s4 band table `(vec_id, embedding, bid, bkey)` — checkpointed
    * once per (session, dir). Codegen'd dot_product against the literal
    * coefficient array: the earlier aggregate(zip_with(...)) higher-order
    * form was CodegenFallback (per-row lambda interpretation + an
    * intermediate array per plane), and a 1024-term flattened literal sum
    * exceeds codegen limits. dot_product keeps the identical
    * left-to-right double accumulation (same sign, same oracle) inside
    * whole-stage codegen. */
  private def bandIndex(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    bandsCache.getOrElseUpdate((spark, dir), {
      val base = emb(spark, dir)
      val bits = (0 until LshPlanes).foldLeft(base) { (d, p) =>
        val coeffs = planeSigns(p)
          .map(s => if (s > 0) "1.0D" else "-1.0D").mkString(", ")
        d.withColumn(s"s$p", expr(
          s"dot_product(embedding, array($coeffs)) > 0D"))
      }
      bits.select(col("vec_id"), col("embedding"),
          explode(array(bandStructCols: _*)).as("u"))
        .select(col("vec_id"), col("embedding"),
          col("u.bid").as("bid"), col("u.bkey").as("bkey"))
        .localCheckpoint()
    })
  }

  /** s4 — random-hyperplane LSH ANN (the scale path). 16 sign bits from
    * the fixed ±1 hyperplanes above, banded 4×4; candidates = vectors
    * sharing any band with the query; exact cosine re-ranks the bucket. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val bands = bandIndex(spark, dir)
    val qBands = bands.filter(col("vec_id") === 0)
      .select(col("bid").as("qbid"), col("bkey").as("qbkey"), col("embedding").as("qv"))
    bands.filter(col("vec_id") > 0)
      .join(broadcast(qBands), col("bid") === col("qbid") && col("bkey") === col("qbkey"))
      .select(col("vec_id"), round(expr("cosine_sim(embedding, qv)"), 6).as("cosine"))
      .distinct()
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(10)
  }

  /** s13 — MIPS (maximum inner product search) via the norm-augmentation
    * reduction to cosine LSH: retrieval over UNNORMALIZED vectors (dot
    * product, not cosine — the recommender/re-ranker scoring function)
    * does not directly bucket under hyperplane LSH, but appending one
    * coordinate `sqrt(M² − ‖x‖²)` to every data vector (and 0 to the
    * query) puts all data on the radius-M sphere, where dot-product order
    * IS cosine order — so the s4 machinery applies unchanged
    * (Shrivastava & Li's asymmetric-LSH family, the simple XBOX variant).
    *
    * The fixture embeddings are unit-norm, which makes MIPS degenerate to
    * cosine; a deterministic per-vector weight `w = 1 + (vec_id % 7)/4`
    * (standing in for real unnormalized magnitudes) makes the rankings
    * genuinely differ. The scaled vector is NEVER materialized — scalars
    * factor out of every dot product (`dot(w·v, c) = w·dot(v, c)`), so
    * the plan stays one codegen'd projection per plane over the raw
    * column, same as s4.
    *
    * Determinism: both engines compute identical doubles (same
    * left-to-right accumulation, IEEE sqrt, exact ±1/w factors), so the
    * bucket sets match exactly; the final re-rank orders micro-unit
    * BIGINT dots. [[MipsM]] bounds the max scaled norm (2.5·1.0000002);
    * production derives M from a stats pass over the corpus. */
  val MipsM = 3.0
  private lazy val mipsSigns: Array[Array[Int]] = hashSigns("mips|", LshDims + 1)

  /** The s13 augmented band table `(vec_id, embedding, w, bid, bkey)` —
    * checkpointed once per (session, dir) like [[bandIndex]]: the data
    * and query sides both probe it, and rebuilding the 16-plane pipeline
    * per probe is exactly what an ANN index build amortizes away. */
  private val mipsBandsCache = caches.newCache()
  private def mipsBandIndex(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    mipsBandsCache.getOrElseUpdate((spark, dir), {
      val m2 = s"${MipsM * MipsM}D"
      val base = emb(spark, dir)
        .withColumn("w", expr(
          "if(vec_id = 0, 1.0D, 1.0D + cast(vec_id % 7 as double) / 4.0D)"))
        // query augments with 0 (q' = [q; 0]); data with sqrt(M² − ‖w·v‖²)
        .withColumn("aug", expr(
          s"if(vec_id = 0, 0.0D, sqrt($m2 - w * w * dot_product(embedding, embedding)))"))
      val bits = (0 until LshPlanes).foldLeft(base) { (d, p) =>
        val coeffs = (0 until LshDims)
          .map(i => if (mipsSigns(p)(i) > 0) "1.0D" else "-1.0D").mkString(", ")
        val s65 = if (mipsSigns(p)(LshDims) > 0) "1.0D" else "-1.0D"
        d.withColumn(s"s$p", expr(
          s"(w * dot_product(embedding, array($coeffs)) + aug * $s65) > 0D"))
      }
      bits
        .select(col("vec_id"), col("embedding"), col("w"),
          explode(array(bandStructCols: _*)).as("u"))
        .select(col("vec_id"), col("embedding"), col("w"),
          col("u.bid").as("bid"), col("u.bkey").as("bkey"))
        .localCheckpoint()
    })
  }

  def annMips(spark: SparkSession, dir: String): DataFrame = {
    val bands = mipsBandIndex(spark, dir)
    val qBands = bands.filter(col("vec_id") === 0)
      .select(col("bid").as("qbid"), col("bkey").as("qbkey"), col("embedding").as("qv"))
    bands.filter(col("vec_id") > 0)
      .join(broadcast(qBands), col("bid") === col("qbid") && col("bkey") === col("qbkey"))
      .select(col("vec_id"), expr(
        "cast(round(w * dot_product(embedding, qv) * 1000000.0D, 0) as bigint)")
        .as("dot_micro"))
      .distinct()
      .orderBy(col("dot_micro").desc, col("vec_id").asc)
      .limit(10)
  }

  /** s5 — IVF (inverted-file) ANN with a fixed coarse quantizer: vectors
    * 1..16 serve as deterministic centroids (no training step, so the
    * DuckDB oracle can replicate the index bit-for-bit — unlike s4's
    * rows-only check). Every vector is assigned to its nearest centroid
    * (cell); the query probes its [[IvfNProbe]] nearest cells and pays
    * exact cosine only inside them.
    *
    * Scale shape: assignment is a broadcast of the centroid table against
    * one vector scan (at 100 TB: k centroids ≪ corpus, still a broadcast);
    * the probe prunes the corpus to nprobe/k of its cells via an equi-join
    * on cell id — the IVF contract. All ranks are computed on
    * round(cosine, 6) with id tie-breaks so both engines order
    * identically. */
  val IvfCentroids = 16
  val IvfNProbe = 4

  /** The s5 cell-assignment table `(vec_id, cell, embedding)` — the IVF
    * inverted file itself, checkpointed once per (session, dir). */
  private def cellIndex(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    evictOtherDirs(spark, dir)
    cellsCache.getOrElseUpdate((spark, dir), {
      val e = emb(spark, dir)
      val cents = e.filter(col("vec_id").between(1, IvfCentroids))
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
      val wAsg = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cent_id").asc)
      e.filter(col("vec_id") > 0)
        .crossJoin(broadcast(cents))
        .withColumn("ccos", round(expr("cosine_sim(embedding, cv)"), 6))
        .withColumn("rk", row_number().over(wAsg))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("cent_id").as("cell"), col("embedding"))
        .localCheckpoint()
    })
  }

  /** The IVF probe set: the [[IvfNProbe]] centroids nearest the query —
    * ONE implementation shared by s5 and s11, because probing the same
    * cells is the semantic contract between the two ANN paths (and what
    * the s9 recall audit assumes). partitionBy(lit) keeps WindowExec
    * quiet about the global sort — the ranking is k=16 rows by
    * construction. */
  private def ivfProbe(spark: SparkSession, dir: String, q: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    emb(spark, dir).filter(col("vec_id").between(1, IvfCentroids))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
      .crossJoin(broadcast(q))
      .withColumn("qcos", round(expr("cosine_sim(cv, qv)"), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("qcos").desc, col("cent_id").asc)))
      .filter(col("rk") <= IvfNProbe)
      .select(col("cent_id").as("pcell"))
  }

  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val cells = cellIndex(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val qprobe = ivfProbe(spark, dir, q)
    cells.join(broadcast(qprobe), col("cell") === col("pcell"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("cell"),
        round(expr("cosine_sim(embedding, qv)"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(10)
  }

  /** s6 — per-label centroid (mean embedding), the training-pipeline
    * "class prototype" aggregate. posexplode turns the vector column into
    * (label, dim) cells so the mean is one hash aggregate over
    * (label, dim) — the shape that scales: no collect of vectors to a
    * driver, no per-group array building until the final (tiny) result.
    * Dims are emitted 1-based to match the oracle's list indexing.
    *
    * The mean is micro-unit BIGINT (`sum(round(x*1e6)) div n`), NOT
    * `avg()` over doubles: float accumulation order varies with
    * partition/merge order, and a group landing within an ulp of a
    * rounding boundary would flip the 6th decimal between runs —
    * integer sums replay bit-for-bit on any partitioning (the t10/s8/d12
    * discipline). */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("label"), (col("pos") + 1).cast("long").as("dim"),
        expr("cast(round(cast(x as double) * 1000000.0D, 0) as bigint)").as("xm"))
      .groupBy(col("label"), col("dim"))
      .agg(expr("cast(sum(xm) div count(1) as bigint)").as("centroid_micro"),
        count(lit(1)).as("n_vecs"))
      .orderBy("label", "dim")

  /** s7 — symmetric int8 quantization per vector (scale = max|x|/127),
    * with reconstruction-error audit: the storage path for embeddings at
    * corpus scale (4 bytes -> 1 byte per dim). Pure per-row math — narrow,
    * codegen'd, no shuffle before the harness sort. */
  def quantize(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("scale", expr(
        "aggregate(v, 0D, (acc, x) -> greatest(acc, abs(x))) / 127.0D"))
      // scale = 0 (an all-zero vector) would make x/scale NaN and the
      // ANSI cast-to-int throw; quantize the zero vector to zeros.
      .withColumn("q", expr(
        "transform(v, x -> cast(round(if(scale = 0D, 0D, x / scale), 0) as int))"))
      .select(
        col("vec_id"),
        round(col("scale"), 6).as("scale"),
        expr("aggregate(q, cast(0 as bigint), (acc, y) -> acc + y)").as("q_sum"),
        round(expr(
          "sqrt(aggregate(zip_with(v, q, (x, y) -> (x - y * scale) * (x - y * scale)), " +
            "0D, (acc, e) -> acc + e))"), 6).as("l2_err"))
      .orderBy("vec_id")

  /** s8 — product quantization (PQ): the codebook compression behind
    * billion-scale ANN indexes (IVF-PQ). The 64-dim vector splits into
    * [[PqSubspaces]] 8-dim subvectors; each is assigned to its nearest of
    * [[PqCodewords]] codewords by squared L2, so a vector stores as 8
    * small codes instead of 64 floats. Codewords are vectors 1..4's own
    * subvectors — a fixed, deterministic quantizer (no k-means state), so
    * the DuckDB oracle replicates the index bit-for-bit, same trick as
    * s5's IVF. Distances are ranked and summed as micro-unit BIGINTs
    * (round(d2*1e6)) — pure integer comparisons, zero float-ordering
    * parity risk.
    *
    * Scale shape: subvector explode is a narrow projection; the codebook
    * (k·m rows) broadcasts; the argmin is a bounded per-(vector, subspace)
    * window. Nothing shuffles the corpus except the (vec, sub, code)
    * triples — exactly how a PQ index build distributes. */
  val PqSubspaces = 8
  val PqSubDim = LshDims / PqSubspaces
  val PqCodewords = 4

  /** Subvector view `(vec_id, sub, sv)` of an embedding frame. */
  private def subvectors(e: DataFrame): DataFrame =
    e.withColumn("v", col("embedding").cast("array<double>"))
      .select(col("vec_id"), expr(
        s"explode(transform(sequence(0, ${PqSubspaces - 1}), " +
          s"s -> struct(s as sub, slice(v, s * $PqSubDim + 1, $PqSubDim) as sv)))").as("u"))
      .select(col("vec_id"), col("u.sub").as("sub"), col("u.sv").as("sv"))

  /** The PQ codebook: vectors 1..[[PqCodewords]]'s own subvectors —
    * [[PqSubspaces]]·[[PqCodewords]] = 32 rows, checkpointed once per
    * (session, dir) so probe-time consumers (the per-query ADC table)
    * don't re-scan the embeddings table to rebuild a 32-row frame. */
  private def codewords(spark: SparkSession, dir: String): DataFrame =
    codewordsCache.getOrElseUpdate((spark, dir),
      subvectors(emb(spark, dir).filter(col("vec_id").between(1, PqCodewords)))
        .select(col("sub"), col("vec_id").as("cid"), col("sv").as("cw"))
        .localCheckpoint())

  /** Micro-unit squared L2 between subvector `sv` and codeword `cw`. */
  private val d2mExpr =
    "cast(round(aggregate(zip_with(sv, cw, (x, y) -> (x - y) * (x - y)), " +
      "0D, (acc, t) -> acc + t) * 1000000.0D, 0) as bigint)"

  /** The PQ code table `(vec_id, sub, cid, d2m)` — the compressed-vector
    * index itself, checkpointed once per (session, dir); s8 publishes it
    * and s11's ADC probe scans it. */
  private def pqAssign(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    evictOtherDirs(spark, dir)
    pqCache.getOrElseUpdate((spark, dir), {
      subvectors(emb(spark, dir))
        .join(broadcast(codewords(spark, dir)), "sub")
        .withColumn("d2m", expr(d2mExpr))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("vec_id"), col("sub"))
            .orderBy(col("d2m").asc, col("cid").asc)))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("sub"), col("cid"), col("d2m"))
        .localCheckpoint()
    })
  }

  /** The packed IVF-PQ posting index `(vec_id, cell, sub, cid)` — the
    * cell-bucketed code table a deployed IVF-PQ actually persists (each
    * vector stored inside its coarse cell as 8 small codes). Pre-joining
    * [[cellIndex]] × [[pqAssign]] ONCE per (session, dir) moves the only
    * corpus-grain shuffle of the s11 probe to index-build time: the warm
    * probe is then a broadcast cell filter + a broadcast 32-row ADC join
    * over this checkpointed frame — no per-query shuffle at all, which is
    * exactly the deployment contract (build once, probe thousands of
    * times). This was also the s11 bench story in round 7: the per-probe
    * cellIndex⋈pqAssign join re-ran on every invocation (~16 sequential
    * small jobs warm); hoisting it here removes the per-probe shuffle. */
  private def ivfpqIndex(spark: SparkSession, dir: String): DataFrame =
    ivfpqCache.getOrElseUpdate((spark, dir),
      cellIndex(spark, dir).select(col("vec_id"), col("cell"))
        .join(pqAssign(spark, dir), "vec_id")
        .select(col("vec_id"), col("cell"), col("sub"), col("cid"))
        .localCheckpoint())

  def pqCodes(spark: SparkSession, dir: String): DataFrame =
    pqAssign(spark, dir)
      .groupBy(col("vec_id"))
      .agg(
        concat_ws(",", expr(
          "transform(array_sort(collect_list(struct(sub, cid))), x -> cast(x.cid as string))"))
          .as("pq_code"),
        sum(col("d2m")).as("err_micro"))
      .orderBy("vec_id")

  /** s11 — IVF-PQ, the billion-scale ANN architecture (coarse quantizer
    * prunes the corpus to nprobe cells; PQ codes + an asymmetric distance
    * table rank the survivors WITHOUT touching their full vectors; only
    * the short list pays an exact re-rank):
    *
    *  1. probe: the query's [[IvfNProbe]] nearest cells (s5's quantizer)
    *  2. ADC: distance(query_sub, codeword) for all 8×4 pairs — a 32-row
    *     broadcast table; a candidate's approximate distance is the SUM
    *     of its 8 codes' table entries (exact micro-unit BIGINTs, so the
    *     approximate ranking is bit-deterministic)
    *  3. shortlist: top-10 by ADC distance, then exact cosine re-rank
    *
    * At scale only step 3 reads full vectors (10 of them); the scan side
    * of step 2 is the [[pqAssign]] code table — 8 small ints per vector,
    * the whole point of PQ compression. */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val qprobe = ivfProbe(spark, dir, q)
    // the 32-row asymmetric distance table: query subvectors vs codebook
    val qd = subvectors(q.select(lit(0L).as("vec_id"), col("qv").as("embedding")))
      .join(broadcast(codewords(spark, dir)), "sub")
      .withColumn("qd2m", expr(d2mExpr))
      .select(col("sub"), col("cid"), col("qd2m"))
    val shortlist = ivfpqIndex(spark, dir)
      .join(broadcast(qprobe), col("cell") === col("pcell"))
      .join(broadcast(qd), Seq("sub", "cid"))
      .groupBy(col("vec_id"))
      .agg(sum(col("qd2m")).as("approx_d2_micro"))
      .orderBy(col("approx_d2_micro").asc, col("vec_id").asc)
      .limit(10)
    shortlist
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("approx_d2_micro"),
        round(expr("cosine_sim(embedding, qv)"), 6).as("cosine"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(0))
          .orderBy(col("cosine").desc, col("vec_id").asc)).cast("long"))
      .orderBy("rk")
  }

  /** s10 — k-NN graph join: top-[[KnnK]] cosine neighbors for EVERY
    * vector at once (not one query point) — the batch build step under
    * corpus clustering, kNN-classification, and graph-based ANN indexes
    * (HNSW seeds, NN-descent init).
    *
    * Candidates are label-blocked like s2 (swap in s4's LSH buckets or
    * s5's IVF cells for the unblocked 100 TB form — the downstream
    * rank-and-keep is identical). The per-vector top-k runs as
    * `row_number() <= k` over a (vec_id) window: Spark 4 rewrites that
    * filter into WindowGroupLimit, so each shuffle partition keeps a
    * bounded k-heap per key instead of sorting whole neighbor lists —
    * the property that keeps the graph build memory flat when a hot
    * bucket has millions of candidates. Ranking compares the ROUNDED
    * cosine (tie-broken by neighbor id) so both engines rank identical
    * doubles — the t5 discipline. */
  val KnnK = 3
  def knnJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir).select(col("vec_id"), col("embedding"), col("label"))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"),
        round(expr("cosine_sim(a.embedding, b.embedding)"), 6).as("cosine"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cosine").desc, col("nbr_id").asc)).cast("long"))
      .filter(col("rk") <= KnnK)
      .orderBy("vec_id", "rk")
  }

  /** s12 — linear-probe batch inference: score every embedding against a
    * fixed [[ProbeClasses]]-way linear classifier (the frozen read-out
    * layer of an embedding-quality probe) and report the confusion
    * grid against the stored labels. This is the "run the model over the
    * corpus" step of a curation pipeline, expressed as a columnar
    * operator: weights are literals in the plan, scoring is a narrow
    * per-row projection (codegen'd HOF over the vector, no shuffle), and
    * the only wide op is the tiny confusion-grid aggregate.
    *
    * All arithmetic is exact: embeddings quantize to micro-unit BIGINTs,
    * weights are small ints, and every dot product stays far below 2^53,
    * so Spark's integer fold and the oracle's double-typed
    * `list_dot_product` (exact on integer-valued doubles) agree
    * bit-for-bit; argmax ties resolve to the first (lowest) class in
    * both engines. */
  val ProbeClasses = 4
  val ProbeDim = 64
  /** Deterministic pseudo-random weights (Knuth multiplicative hash mod a
    * prime, recentered) — fixed "model parameters" both engines embed as
    * plan literals. */
  private val probeWeights: Seq[Seq[Long]] =
    (0 until ProbeClasses).map { c =>
      (0 until ProbeDim).map(i => (2654435761L * (c * ProbeDim + i + 1)) % 2003 - 1001)
    }

  def linearProbe(spark: SparkSession, dir: String): DataFrame = {
    val wLit = probeWeights
      .map(_.mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    emb(spark, dir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("em", expr(
        "transform(v, x -> cast(round(x * 1000000.0D, 0) as bigint))"))
      .withColumn("scores", expr(
        s"transform($wLit, ws -> aggregate(zip_with(ws, em, (w, e) -> w * e), " +
          "cast(0 as bigint), (acc, p) -> acc + p))"))
      .withColumn("pred", expr("array_position(scores, array_max(scores)) - 1"))
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n"),
        sum(expr("array_max(scores)")).as("sum_top_micro"))
      .orderBy("label", "pred")
  }

  /** s14 — one exact Lloyd k-means step (assignment + centroid update +
    * inertia) from deterministic seeds (vec_id 1..[[KmeansK]]), the
    * oracle-pinned round of [[graft.ops.KMeansOps]]'s BSP loop. All math
    * is micro-unit BIGINT (see KMeansOps scaladoc), so DuckDB replicates
    * the step bit-for-bit — including the argmin tie-break.
    *
    * Scale shape: broadcast k-row centroid table, bounded k-row window
    * argmin per vector, map-side-combined (cluster, dim) reduction —
    * no corpus shuffle. Inertia is emitted as BIGINT here (exact at
    * verify SFs); the loop in KMeansOps sums decimal(38,0) for the
    * 100 TB path where sum(d2m) can exceed 2^63. */
  val KmeansK = 10

  /** Seed-centroid (vec_id 1..K) nearest-centroid assignment
    * `(vec_id, vm, cluster, d2m)` in exact micro-unit integers,
    * checkpointed once per (session, dir) — s14's Lloyd step and d18's
    * SemDeDup both consume it (build-once index discipline, freed by
    * [[clearCaches]]). */
  def kmeansAssignment(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.KMeansOps
    evictOtherDirs(spark, dir)
    kmeansCache.getOrElseUpdate((spark, dir), {
      val e = KMeansOps.microVectors(emb(spark, dir))
      val cents = e.filter(col("vec_id").between(1, KmeansK))
        .select(col("vec_id").as("cent_id"), col("vm").as("cm"))
      KMeansOps.assign(e, cents).localCheckpoint()
    })
  }

  def kmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val asgn = kmeansAssignment(spark, dir)
    val stats = asgn.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("d2m")).as("inertia_micro2"))
    asgn.select(col("cluster"), posexplode(col("vm")).as(Seq("pos", "x")))
      .select(col("cluster"), (col("pos") + 1).cast("long").as("dim"), col("x"))
      .groupBy(col("cluster"), col("dim"))
      .agg(expr("cast(sum(x) div count(1) as bigint)").as("centroid_micro"))
      .join(broadcast(stats), "cluster")
      .select(col("cluster"), col("dim"), col("centroid_micro"),
        col("n_vecs"), col("inertia_micro2"))
      .orderBy("cluster", "dim")
  }

  /** d18 — SemDeDup (Abbas et al. 2023): semantic deduplication scoped
    * to k-means clusters. Pairwise cosine runs ONLY within a cluster;
    * in a similar pair (cos ≥ [[SemDedupEps]]) the member CLOSER to its
    * centroid is dropped — the paper's keep-farthest rule, which retains
    * cluster-edge diversity and sheds the redundant core. Ties on exact
    * integer centroid distance break to the lower vec_id, so the verdict
    * is deterministic per vector with no dropped→dropped chains (each
    * vector's fate depends only on its own neighbors, not on other
    * verdicts).
    *
    * Registered under the d-family: it is a dedup operator that happens
    * to live here to share [[kmeansAssignment]]'s checkpointed index.
    *
    * Scale shape: assignment is the shuffle-free literal-centroid argmin
    * (s14); candidate generation is an equi-join on cluster id — at
    * fixture k=10 that is a coarse key, but SemDeDup's production
    * setting scales k WITH the corpus (the paper uses k≈100k) so
    * per-cluster populations stay bounded and the join key stays
    * fine-grained; the precedence filter halves the cosine evaluations
    * before the codegen'd cosine_sim runs. */
  val SemDedupEps = 0.4
  def semDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val asgn = kmeansAssignment(spark, dir)
      .select(col("vec_id"), col("cluster"), col("d2m"))
    val withVec = asgn.join(e.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val a = withVec.select(col("vec_id").as("a_id"), col("cluster"),
      col("d2m").as("a_d2m"), col("embedding").as("a_emb"))
    val b = withVec.select(col("vec_id").as("b_id"), col("cluster"),
      col("d2m").as("b_d2m"), col("embedding").as("b_emb"))
    val droppedIds = a.join(b, "cluster")
      .filter(col("a_id") =!= col("b_id"))
      .filter(col("b_d2m") > col("a_d2m") ||
        (col("b_d2m") === col("a_d2m") && col("b_id") < col("a_id")))
      .filter(round(expr("cosine_sim(a_emb, b_emb)"), 6) >= SemDedupEps)
      .select(col("a_id").as("vec_id")).distinct()
    asgn.join(droppedIds.withColumn("dropped", lit(1)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"), col("d2m"),
        coalesce(col("dropped"), lit(0)).as("dropped"))
      .orderBy("vec_id")
  }

  /** s17 — retrieval-quality eval: label-aware recall@[[EvalK]] and
    * MRR@[[EvalK]] over a deterministic sampled query set (every
    * [[EvalSampleMod]]-th vector), reported per label — the
    * embedding-space health dashboard a training pipeline recomputes
    * per checkpoint (did today's encoder still retrieve same-class
    * neighbors?). "Relevant" = same label; a query with no relevant
    * hit in the top k scores MRR 0, the standard convention.
    *
    * Exact-integer emission: per-query recall and reciprocal rank are
    * ppm/micro integer divisions, and the per-label means are
    * `sum div n` — no float ever aggregated (the s6 discipline); only
    * the rounded cosine ranks, tie-broken by neighbor id (t5).
    *
    * Scale shape: the query set is bounded BY DESIGN (eval is always
    * sampled), so it broadcasts and the corpus side never shuffles for
    * scoring; the per-query top-k filter rewrites to WindowGroupLimit,
    * whose PARTIAL mode caps every map partition at k rows per query
    * BEFORE the q_id shuffle — the shuffle moves O(|Q|·k·partitions)
    * rows, not |corpus|·|Q|. At 100 TB the scoring pass rides the same
    * scan the s4/s5 ANN paths index. */
  val EvalK = 10
  val EvalSampleMod = 50
  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir).select(col("vec_id"), col("embedding"), col("label"))
    val q = e.filter(col("vec_id") % EvalSampleMod === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("label").as("q_label"))
    val top = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("q_label"), col("vec_id").as("nbr_id"),
        col("label").as("nbr_label"),
        round(expr("cosine_sim(embedding, q_emb)"), 6).as("cosine"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("nbr_id").asc)).cast("long"))
      .filter(col("rk") <= EvalK)
    val perQ = top.groupBy(col("q_id"), col("q_label"))
      .agg(
        sum(when(col("nbr_label") === col("q_label"), 1L).otherwise(0L)).as("hits"),
        min(when(col("nbr_label") === col("q_label"), col("rk"))).as("first_hit"))
      .select(col("q_label"),
        expr(s"hits * 1000000L div $EvalK").as("recall_ppm"),
        coalesce(expr("1000000L div first_hit"), lit(0L)).as("rr_micro"))
    perQ.groupBy(col("q_label"))
      .agg(count(lit(1)).as("n_queries"),
        expr("cast(sum(recall_ppm) div count(1) as bigint)").as("mean_recall_ppm"),
        expr("cast(sum(rr_micro) div count(1) as bigint)").as("mean_rr_micro"))
      .select(col("q_label").as("label"), col("n_queries"),
        col("mean_recall_ppm"), col("mean_rr_micro"))
      .orderBy("label")
  }

  /** s18 — embedding-space drift monitor: per-label centroid shift
    * between two ingest batches (even vs odd vec_id — the deterministic
    * stand-in for "yesterday's corpus vs today's delta"). Emits each
    * label's batch populations, the exact squared L2 centroid shift in
    * micro² integers, and the centroid cosine — the alarm a curation
    * pipeline wires to "did the new crawl/encoder shift this class's
    * distribution" (t17 is the token-level twin; this is the embedding
    * level).
    *
    * Exactness: centroids are micro-unit `sum div n` per (label, batch,
    * dim) — the s6 discipline — and every cross-term (dot, norms,
    * squared shift) is an exact BIGINT sum; only the final cosine is one
    * float expression over those integers, rounded to 6.
    *
    * Scale shape: one scan; the per-dim centroid reduction keys on
    * (label, batch, dim) so it map-side combines, and everything after
    * is |labels|·|dims|-sized. No joins touch the corpus. */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val base = emb(spark, dir).select(col("label"),
      (col("vec_id") % 2).as("batch"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000000.0D, 0) as bigint))")
        .as("vm"))
    val byDim = base
      .select(col("label"), col("batch"), posexplode(col("vm")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("batch"), col("pos"))
      .agg(expr("cast(sum(x) div count(1) as bigint)").as("c"))
    val paired = byDim.groupBy(col("label"), col("pos"))
      .agg(max(when(col("batch") === 0, col("c"))).as("c0"),
        max(when(col("batch") === 1, col("c"))).as("c1"))
    val counts = base.groupBy(col("label")).agg(
      sum(when(col("batch") === 0, 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("batch") === 1, 1L).otherwise(0L)).as("n_new"))
    paired.groupBy(col("label"))
      .agg(sum(expr("(c0 - c1) * (c0 - c1)")).as("shift2_micro2"),
        sum(expr("c0 * c1")).as("dot"),
        sum(expr("c0 * c0")).as("nn0"),
        sum(expr("c1 * c1")).as("nn1"))
      .join(broadcast(counts), Seq("label"))
      .select(col("label"), col("n_ref"), col("n_new"), col("shift2_micro2"),
        round(expr("dot / (sqrt(nn0) * sqrt(nn1))"), 6).as("centroid_cos"))
      .orderBy("label")
  }

  /** s19 — IVF nprobe tuning sweep: recall@10 and candidate volume at
    * each probe width in [[NprobeSweep]] against the exact top-10 — the
    * d20 analog for the ANN index: s9 audits the DEPLOYED setting, this
    * shows the whole recall-vs-cost curve so the nprobe knob is chosen
    * from data (more probed cells = more exact-cosine work = higher
    * recall; the curve says where it saturates).
    *
    * All rank comparisons use the rounded cosine with id tie-breaks
    * (the t5 discipline). One pass over the checkpointed cell index:
    * the (np, cell) probe table is |sweep|×|centroids| rows broadcast,
    * candidates amplify only by how many sweep settings probe their
    * cell, and each setting's top-10 rides a WindowGroupLimit. */
  val NprobeSweep = Seq(1, 2, 4, 8)
  def nprobeSweep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val arr = s"array(${NprobeSweep.mkString(", ")})"
    val e = emb(spark, dir)
    val cells = cellIndex(spark, dir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val cents = e.filter(col("vec_id").between(1, IvfCentroids))
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
    val ranked = cents.crossJoin(broadcast(q))
      .withColumn("qcos", round(expr("cosine_sim(cv, qv)"), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(0)).orderBy(col("qcos").desc, col("cent_id").asc)))
    val probeTab = ranked
      .select(col("cent_id"), col("rk"), explode(expr(arr)).as("np"))
      .filter(col("rk") <= col("np"))
      .select(col("np"), col("cent_id").as("pcell"))
    val cand = cells.join(broadcast(probeTab), col("cell") === col("pcell"))
      .crossJoin(broadcast(q))
      .select(col("np"), col("vec_id"),
        round(expr("cosine_sim(embedding, qv)"), 6).as("cosine"))
    val top = cand.withColumn("rrk", row_number().over(
        Window.partitionBy(col("np")).orderBy(col("cosine").desc, col("vec_id").asc)))
      .filter(col("rrk") <= 10)
    val exact = annTopK(spark, dir).select(col("vec_id"))
    val nCand = cand.groupBy(col("np")).agg(count(lit(1)).as("n_candidates"))
    val hits = top.join(exact, "vec_id").groupBy(col("np")).agg(count(lit(1)).as("hits"))
    spark.range(1).select(explode(expr(arr)).as("np"))
      .join(nCand, Seq("np"), "left").join(hits, Seq("np"), "left")
      .select(col("np").cast("long").as("nprobe"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr("coalesce(hits, 0L) * 1000000L div 10").as("recall_ppm"))
      .orderBy("nprobe")
  }

  /** s20 — centroid-silhouette clustering-quality audit: per label, the
    * mean simplified silhouette `s = (b − a) / max(a, b)` where `a` is a
    * vector's squared distance to its OWN label centroid and `b` the
    * minimum squared distance to any OTHER label centroid, in exact
    * micro²-unit integers (the "medoid-free" silhouette used to monitor
    * embedding-space class separation at corpus scale, where true
    * pairwise silhouette is O(n²) and never computed). `n_misfit` counts
    * vectors strictly closer to a foreign centroid — the cross-label
    * confusion a label-quality audit alerts on.
    *
    * Scale shape: centroids are a 10×64 model-state table (collected,
    * folded into a literal array); the corpus pass is one projection +
    * one 10-group aggregate — no shuffle larger than the group count,
    * no pairwise work. Signs are handled by branching before the
    * integral division so truncating and floor division coincide (both
    * engines divide non-negative operands only — the EWMA discipline). */
  def silhouette(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    val ml = emb(spark, dir).select(
      col("vec_id"), col("label").cast("long").as("label"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000000.0D, 0) as bigint))")
        .as("vm"))
    // label centroids: exact micro-integer per-dim means — model state
    // (10 labels x 64 dims), collected once and inlined as a literal.
    val cents = ml
      .select(col("label"), posexplode(col("vm")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(expr("cast(sum(x) div count(1) as bigint)").as("cm"))
      .groupBy(col("label"))
      .agg(expr("array_sort(collect_list(struct(pos, cm)))").as("pcs"))
      .select(col("label"), expr("transform(pcs, p -> p.cm)").as("cm"))
      .collect().sortBy(_.getLong(0))
    val centArr = array(cents.map { r =>
      struct(lit(r.getLong(0)).as("clabel"),
        array(r.getAs[scala.collection.Seq[Long]]("cm").toSeq.map(lit): _*).as("cm"))
    }.toIndexedSeq: _*)
    ml.withColumn("cents", centArr)
      .withColumn("ds", expr(
        "transform(cents, c -> struct(" +
          "aggregate(zip_with(vm, c.cm, (p, q) -> (p - q) * (p - q)), " +
          "cast(0 as bigint), (acc, x) -> acc + x) as d2, c.clabel as clabel))"))
      .withColumn("a2", expr("element_at(filter(ds, d -> d.clabel = label), 1).d2"))
      .withColumn("b2", expr("array_min(transform(filter(ds, d -> d.clabel != label), d -> d.d2))"))
      .withColumn("s_ppm", expr(
        "case when greatest(a2, b2) = 0 then cast(0 as bigint) " +
          "when b2 >= a2 then cast((cast(b2 - a2 as decimal(38,0)) * 1000000) div greatest(a2, b2) as bigint) " +
          "else -cast((cast(a2 - b2 as decimal(38,0)) * 1000000) div greatest(a2, b2) as bigint) end"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("case when sum(s_ppm) >= 0 then cast(sum(s_ppm) div count(1) as bigint) " +
          "else -cast((-sum(s_ppm)) div count(1) as bigint) end").as("mean_sil_ppm"),
        sum(when(col("s_ppm") < 0, 1L).otherwise(0L)).as("n_misfit"))
      .orderBy("label")
  }

  /** s21 — classifier calibration / reliability audit over the s12 probe:
    * per margin decile (top1 − top2 score, the confidence proxy), the
    * vector count, exact integer mean margin, and accuracy against the
    * deterministic target `label mod ProbeClasses` in exact ppm. A
    * monotone accuracy-vs-margin curve is what makes a quality
    * classifier's threshold MEANINGFUL — this is the readout that
    * decides where a curation pipeline cuts.
    *
    * Scale shape: scoring is the s12 literal-weight projection (no
    * shuffle); deciles come from [[graft.ops.RankOps]]' range-partition
    * global rank + the exact NTILE arithmetic — never a single-task
    * `ntile() OVER (ORDER BY margin)` window; the rollup is a 10-group
    * aggregate. Margins are exact integer micro-dots, so decile
    * boundaries are engine-identical. */
  def calibration(spark: SparkSession, dir: String): DataFrame = {
    val wLit = probeWeights
      .map(_.mkString("array(", ", ", ")"))
      .mkString("array(", ", ", ")")
    val par = spark.sparkContext.defaultParallelism
    val scored = emb(spark, dir)
      .withColumn("v", col("embedding").cast("array<double>"))
      .withColumn("em", expr(
        "transform(v, x -> cast(round(x * 1000000.0D, 0) as bigint))"))
      .withColumn("scores", expr(
        s"transform($wLit, ws -> aggregate(zip_with(ws, em, (w, e) -> w * e), " +
          "cast(0 as bigint), (acc, p) -> acc + p))"))
      .select(col("vec_id"),
        (col("label").cast("long") % ProbeClasses).as("target"),
        expr("array_position(scores, array_max(scores)) - 1").as("pred"),
        (expr("array_max(scores)") -
          expr(s"element_at(array_sort(scores), ${ProbeClasses - 1})"))
          .as("margin"))
    val (ranked, total) = graft.ops.RankOps.withGlobalRankAndTotal(
      scored, par, "rk", col("margin"), col("vec_id"))
    ranked
      .withColumn("n_total", lit(total))
      .withColumn("decile",
        graft.ops.RankOps.ntileFromRank("rk", "n_total", 10))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("pred") === col("target"), 1L).otherwise(0L)).as("n_correct"),
        expr("cast(sum(margin) div count(1) as bigint)").as("mean_margin"),
        expr("cast((cast(sum(case when pred = target then 1L else 0L end) " +
          "as decimal(38,0)) * 1000000) div count(1) as bigint)").as("acc_ppm"))
      .orderBy("decile")
  }

  /** s22 — index reassignment churn after one Lloyd step: how many
    * vectors would change IVF cell if the cells were re-trained on the
    * current corpus (seed assignment → one exact centroid update →
    * re-assignment), reported per original cell with exact ppm. This is
    * the index-staleness readout an ANN deployment watches to schedule
    * re-training: low churn = the index still fits the data; high churn
    * in a cell = its region drifted. Complements s18 (distribution
    * drift between batches) with the INDEX-side consequence.
    *
    * Cost: one centroid update (64·k-cell map-side reduction), one more
    * literal-centroid argmin pass over the checkpointed assignment, and
    * a k-row aggregate — the corpus never shuffles. */
  def reassignmentChurn(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.KMeansOps
    val asgn = kmeansAssignment(spark, dir)
    val seedCents = KMeansOps.microVectors(emb(spark, dir))
      .filter(col("vec_id").between(1, KmeansK))
      .select(col("vec_id").as("cent_id"), col("vm").as("cm"))
    val newCents = KMeansOps.updateCentroids(asgn, Some(seedCents))
    val re = KMeansOps.assign(
      asgn.select(col("vec_id"), col("vm")), newCents)
      .select(col("vec_id"), col("cluster").as("new_cluster"))
    asgn.select(col("vec_id"), col("cluster").as("old_cluster"))
      .join(re, "vec_id")
      .groupBy(col("old_cluster"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("new_cluster") =!= col("old_cluster"), 1L).otherwise(0L))
          .as("n_moved"))
      .withColumn("churn_ppm", expr("n_moved * 1000000L div n_vecs"))
      .orderBy("old_cluster")
  }

  /** s23 — embedding-space geometry audit: per dimension, the exact
    * integer mean and the variance share of total variance in ppm —
    * the anisotropy readout. Healthy embedding spaces spread variance
    * across dimensions; a handful of dominant "rogue" dimensions (a
    * known pathology of LM embeddings) wrecks cosine comparability and
    * is the standard cue for whitening or mean-centering before ANN
    * indexing. Dominance = max share vs the uniform 1/d baseline.
    *
    * All math in exact micro-integers off one map-side-combined
    * (dim → sum, sumsq) aggregate; variance numerators are
    * `n·Σx² − (Σx)²` in decimal(38,0) (non-negative by Cauchy-Schwarz,
    * so both engines floor identically). Output is d rows — metadata
    * scale. */
  def isotropyAudit(spark: SparkSession, dir: String): DataFrame = {
    // emb() is a pure projection+fan-out of the embeddings load, so its
    // row count IS the cached census — the per-invocation count job
    // bought nothing (r16)
    val n = corpusCount(spark, dir)
    val dims = emb(spark, dir)
      .select(posexplode(expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0D, 0) as bigint))"))
        .as(Seq("pos", "x")))
      .select((col("pos") + 1).cast("long").as("dim"), col("x"))
      .groupBy(col("dim"))
      .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sx2"))
      .withColumn("var_num", expr(
        s"cast($n as decimal(38,0)) * sx2 - cast(sx as decimal(38,0)) * sx"))
    val total = dims.agg(sum(col("var_num")).as("tot"))
    dims.crossJoin(broadcast(total))
      .select(col("dim"),
        expr(s"cast(sx div $n as bigint)").as("mean_micro"),
        expr("cast((var_num * 1000000) div tot as bigint)").as("var_share_ppm"))
      .orderBy("dim")
  }

  /** s24 — hybrid retrieval fusion (Reciprocal Rank Fusion): merge the
    * lexical ranking (t14's BM25 top-10) and the dense ranking (s1's
    * cosine top-10) by `Σ 1/(60 + rank)` — the standard hybrid-search
    * combiner in every RAG stack, robust to the two scorers'
    * incomparable scales because only RANKS cross the fusion boundary.
    * Scores are exact integer nano-units (`1e9 div (60+rank)`), so the
    * fused order is engine-identical with no float reciprocals. Doc and
    * vector ids align 1:1 in the fixture (vec i embeds doc i) — the
    * stand-in for a production id join.
    *
    * Cost: both inputs are k-row frames (driver scale) — the corpus
    * work lives in the upstream rankings; the rank windows here run
    * over ≤ k rows, not data. */
  val RrfK = 60
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bm = TextQueries.bm25(spark, dir)
      .select(col("doc_id"), col("score_micro"))
      .withColumn("r_bm", row_number().over(
        Window.orderBy(col("score_micro").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("r_bm"))
    val ann = annTopK(spark, dir)
      .select(col("vec_id").as("doc_id"), col("cosine"))
      .withColumn("r_ann", row_number().over(
        Window.orderBy(col("cosine").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("r_ann"))
    bm.join(ann, Seq("doc_id"), "full_outer")
      .withColumn("rrf_nano", expr(
        s"coalesce(1000000000 div ($RrfK + r_bm), 0L) + " +
          s"coalesce(1000000000 div ($RrfK + r_ann), 0L)"))
      .select(col("doc_id"), col("r_bm"), col("r_ann"), col("rrf_nano"))
      .orderBy(col("rrf_nano").desc, col("doc_id").asc)
  }

  /** s25 — coreset-quality audit: the k-center selection (s16) compared
    * against the naive first-k ids on pairwise-similarity diversity —
    * max and exact-integer mean pairwise cosine (micro) per method. The
    * quantified answer to "did farthest-point selection actually buy
    * diversity over just taking the head", which is the justification a
    * coreset step needs before spending its extra passes. Both methods'
    * pair sets are k·(k−1)/2 rows — driver-scale; the only corpus work
    * is s16's own selection, reused. */
  def coresetQuality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val kcIds = kCenter(spark, dir).select(col("vec_id")).collect()
      .map(_.getLong(0)).toSeq
    val sel = (kcIds.map(id => ("a_kcenter", id)) ++
      (0L until KCenterK.toLong).map(id => ("b_first_k", id)))
      .toDF("method", "vec_id")
    val withVec = sel.join(
      emb(spark, dir).select(col("vec_id"), col("embedding")), "vec_id")
    withVec.as("x")
      .join(withVec.as("y"),
        col("x.method") === col("y.method") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.method").as("method"), expr(
        "cast(round(round(cosine_sim(x.embedding, y.embedding), 6) " +
          "* 1000000.0D, 0) as bigint)").as("cm"))
      .groupBy(col("method"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("cm")).as("max_cos_micro"),
        expr("cast(sum(cm) div count(1) as bigint)").as("mean_cos_micro"))
      .orderBy("method")
  }

  /** s26 — kNN-graph hubness audit: the in-degree distribution of s10's
    * k-nearest-neighbor graph, zero-degree vectors (antihubs) included.
    * High-dimensional embedding spaces concentrate neighborhoods onto a
    * few "hub" vectors (Radovanović et al., JMLR 2010); a heavy right
    * tail here means retrieval over-returns hubs and dedup under-merges
    * antihubs — the standard embedding-health readout next to s23's
    * per-dim isotropy (hubness is CROSS-vector concentration, isotropy
    * is per-dim variance).
    *
    * Shape: rides the s10 kNN join (bounded WindowGroupLimit heap per
    * key), one count per target id, one left join against the id column
    * to surface 0-degree vectors, and a |distinct degrees|-row histogram
    * — nothing beyond s10's own cost. */
  def hubness(spark: SparkSession, dir: String): DataFrame = {
    val indeg = knnJoin(spark, dir)
      .groupBy(col("nbr_id").as("vec_id"))
      .agg(count(lit(1)).as("in_deg"))
    emb(spark, dir).select(col("vec_id"))
      .join(indeg, Seq("vec_id"), "left")
      .withColumn("in_deg", coalesce(col("in_deg"), lit(0L)))
      .groupBy(col("in_deg"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("in_deg")
  }

  /** Adaptive-resolution MULTI-TABLE band index for CORPUS-GRAIN
    * candidate generation (all-pairs-within-bucket, not single-query
    * probing): `(vec_id, embedding, bid, bkey)`, checkpointed once per
    * (session, dir).
    *
    * Two dials, decoupled — the classic (L, b) LSH design:
    *
    *  - **b, bits per table key** — OCCUPANCY. The s4 index keeps 4
    *    bands × 4 bits because a top-k PROBE joins one query's buckets;
    *    a corpus-grain self-join costs Σ n_k² per table, so FIXED key
    *    resolution is quadratic in the corpus (the round-9 10× blow-up
    *    measured it: 16.2 → 1450 MB shuffle). Here b is the smallest
    *    with 2^b ≥ ceil(n / [[AnnHubTargetOcc]]), clamped to
    *    [4, [[LshPlanesExt]]] — expected bucket occupancy stays ≈ the
    *    target and the candidate join stays linear in n. Bits r ≥
    *    [[LshPlanes]] come from the ext plane family ([[LshPlanesExt]]),
    *    so crossing the 16-bit boundary preserves every key's low 16
    *    bits (s37's checked contract) — the adaptive index keeps
    *    growing past n = 2^16·occ instead of silently freezing at the
    *    clamp (the cliff the 100× blow-up reached exactly). Both
    *    engines derive b with the same INTEGER formula (highest-set-bit
    *    of m−1; no float log2 knife edges).
    *  - **L = [[AnnHubTables]] hash tables** — RECALL. A single b-bit
    *    table's collision probability for a true neighbor at angle θ
    *    is (1−θ/π)^b, which collapses as b grows; L independent tables
    *    recover it to 1−(1−p^b)^L — the repetition dial a deployment
    *    raises until s31's measured recall clears its target. Table t
    *    uses planes [t·16, (t+1)·16) of the extended family and keys on
    *    the low b bits.
    *
    * Candidates per vector ≈ L · occupancy — corpus-size-independent.
    * Past n ≈ 2^[[LshPlanesExt]] · occ (≈ 134M vectors per occ-8 unit)
    * the width is clamped again — and since round 12 "a larger
    * [[LshPlanesExt]] is a constant, not a redesign" is a TESTED claim:
    * ext rows are generated on demand at rank-major index, so raising
    * the constant appends planes without remapping assigned bits, and
    * the ExtSpec width sweep runs the migration + prefix-stability
    * contracts out to bit 30. The genuine redesign point is
    * [[LshKeyBitsMax]] = 31 (Int-key sign bit → bkey LONG, at
    * ~2^31·occ ≈ 17 B vectors per occ-8 unit). */
  val AnnHubTargetOcc = 8
  val AnnHubTables = 8
  private[graft] def scaledBandBits(n: Long): Int = {
    val m = (n.max(1L) + AnnHubTargetOcc - 1) / AnnHubTargetOcc
    val need = if (m <= 1) 1 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    need.max(4).min(LshPlanesExt)
  }
  /** Band rows for EVERY vector at an explicit per-table key width `b`
    * — the kernel under [[scaledBandIndex]] (b from the full corpus) and
    * [[standingBandIndex]] (b frozen from the indexed half). */
  /** Band rows `(vec_id, embedding, bid, bkey)` over ANY
    * (vec_id, embedding) frame at key width `b` — pure per-row
    * projections (the literal plane family compiled into the plan), so
    * this composes with `readStream` sources exactly like the dedup
    * side's `bandedSignatures`: the streaming ANN admission operator
    * keys its state on these rows, and stream = batch is a theorem
    * because the kernel is literally shared. */
  private[graft] def bandRowsOf(vecs: DataFrame, b: Int,
      extra: Seq[String] = Nil): DataFrame = {
    require(b <= LshKeyBitsMax, s"key width $b exceeds the Int-key ceiling")
    GraftFunctions.register(vecs.sparkSession)
    // only the b planes each table actually keys on are evaluated —
    // 8·b dot products per vector, not the full widened family; bits
    // r >= LshPlanes come from the "ext" plane family (see
    // [[LshPlanesExt]]) so low bits match the unwidened index exactly.
    // `extra` carries pass-through columns (the streaming evicting
    // operator's event-time `ts`) — still pure per-row projections.
    val used = (0 until AnnHubTables).flatMap(t => (0 until b).map(r => (t, r)))
    // ONE select, not a withColumn fold: each withColumn wraps a fresh
    // Project and re-analyzes the whole growing plan — O((8·b)²)
    // analyzer work, and at b=16/17 (s37's two 128/136-column
    // invocations) that plan-compile latency WAS the bench tail. A
    // single wide Project analyzes once; the physical plan is identical.
    val signCols = used.map { case (t, r) =>
      val coeffs = tablePlaneSign(t, r)
        .map(s => if (s > 0) "1.0D" else "-1.0D").mkString(", ")
      expr(s"dot_product(embedding, array($coeffs)) > 0D").as(s"s${t}_$r")
    }
    val base = vecs.select(col("*") +: signCols: _*)
    val bandCols = (0 until AnnHubTables).map { t =>
      val code = (0 until b)
        .map(r => s"(CASE WHEN s${t}_$r THEN ${1 << r} ELSE 0 END)")
        .mkString(" + ")
      expr(s"struct(cast($t as int) as bid, cast(($code) as int) as bkey)")
    }
    val keep = (Seq("vec_id", "embedding") ++ extra).map(col)
    base.select(keep :+ explode(array(bandCols: _*)).as("u"): _*)
      .select(keep :+ col("u.bid").as("bid") :+ col("u.bkey").as("bkey"): _*)
  }

  private[graft] def bandIndexAtWidth(spark: SparkSession, dir: String, b: Int): DataFrame =
    bandRowsOf(emb(spark, dir), b).localCheckpoint()

  /** EPOCH MIGRATION of standing ANN bucket state: re-key resident-grain
    * rows (bid, bkey, vec_id, embedding) from width `b0` to `b0 + 1` by
    * computing ONLY the new bit — table `bid`'s plane `b0` sign from the
    * widened family, the same literal `dot_product > 0` kernel as
    * [[bandRowsOf]], so a migrated key is byte-equal to a fresh
    * width-(b0+1) rebuild of the same vector. This is the s36/s37 split
    * property as a STATE TRANSFORM: each bucket's residents re-key into
    * at most two child buckets (old key, old key + 2^b0), low bits
    * untouched, no re-scoring, no corpus access — the piece that lets a
    * deployed streaming admission query cross a doubling-epoch rebuild
    * mid-stream (drain → migrate → resume via
    * [[graft.streaming.StreamOps.streamingAnnPairsFrom]]). */
  def migrateAnnResidents(residents: DataFrame, b0: Int): DataFrame = {
    require(b0 + 1 <= LshKeyBitsMax,
      s"cannot widen past the Int-key ceiling: b0=$b0, max=$LshKeyBitsMax")
    GraftFunctions.register(residents.sparkSession)
    val signCase = (0 until AnnHubTables).map { t =>
      val coeffs = tablePlaneSign(t, b0)
        .map(s => if (s > 0) "1.0D" else "-1.0D").mkString(", ")
      s"WHEN bid = $t THEN (dot_product(embedding, array($coeffs)) > 0D)"
    }.mkString("CASE ", " ", " END")
    residents.withColumn("bkey",
      (col("bkey") + when(expr(signCase), lit(1 << b0)).otherwise(lit(0)))
        .cast("int"))
  }

  /** [[migrateAnnResidents]] for the EVICTING streaming twin: the
    * window-filter migration the r11 verdict asked to turn from prose
    * into an operator. Input is the evicting query's drained snapshot
    * at resident grain WITH the bucket's armed timeout
    * (`timeout_ts`, epoch ms — see
    * [[graft.streaming.StreamOps.annStateSnapshotEvicting]]); buckets
    * whose timeout is ≤ the watermark observed at drain time would
    * have evicted had the stream kept running (the fold re-arms at
    * `max(lastArrival, watermark+1)`, so `timeout_ts ≤ watermarkMs`
    * means the watermark has already passed the bucket's last
    * arrival), so they are DROPPED — equivalent to the timeouts that
    * would have fired — and only the in-window remainder is re-keyed
    * to width b0+1 by the same new-bit-only split transform.
    * `timeout_ts` is carried through: the resume path re-arms each
    * migrated bucket at exactly this timestamp via the touch batch
    * ([[graft.streaming.StreamOps.annTouchRows]]), so the composed
    * stream's eviction schedule is the one the unbroken stream would
    * have had. */
  def migrateAnnResidentsEvicting(residents: DataFrame, b0: Int,
      watermarkMs: Long): DataFrame =
    migrateAnnResidents(
      residents.filter(col("timeout_ts") > lit(watermarkMs)), b0)

  /** The evicting ANN stream's pair-emission rule as a BATCH computation
    * over band rows carrying arrival minutes — the core under
    * [[annEvictReplay]], factored so the spec can pin the rule against
    * the RUNNING operator on engineered fixtures.
    *
    * Semantics replayed (one micro-batch per minute, every minute
    * globally populated, buckets uncapped): a pair (a, b) with
    * arrival minutes t_a ≤ t_b emits iff they share a bucket in which
    * `a` is still resident when `b` arrives. Residency is a gap-chain:
    * the bucket's EventTimeTimeout re-arms at each arrival, the
    * watermark during batch m is (m−1) − W, and Spark fires the timeout
    * strictly-greater (`timeout < watermark`), with an arrival DURING
    * the would-evict batch processed before timeout handling (input
    * rescues the bucket). Net: the bucket survives between consecutive
    * distinct arrival minutes u → u' iff u' − u ≤ W + 1 = `gapLimit`,
    * so `a` is resident at t_b iff every consecutive gap in the
    * bucket's distinct arrival-minute sequence within (t_a, t_b] is
    * ≤ gapLimit. Same-minute pairs always emit (same micro-batch,
    * vec_id-ordered fold). The spec pins the ±1 boundary empirically:
    * a planted gap of exactly gapLimit pairs, gapLimit + 1 does not.
    *
    * Input grain: (vec_id, embedding, bid, bkey, minute); emits
    * (vec_a, vec_b, cosine) distinct, threshold-verified. */
  private[graft] def evictingPairsReplayOn(bands: DataFrame,
      gapLimit: Int, sharedMins: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(bands.sparkSession)
    // per-bucket consecutive distinct-arrival-minute gaps; keep only
    // the chain-breaking rows (gap mass is tiny — violations only).
    // `sharedMins`, when given, IS this frame's distinct (bid, bkey,
    // minute) set, checkpointed by the caller so the composed replay's
    // two kernels don't each re-derive it from the corpus-grain rows.
    val breaks = sharedMins
      .getOrElse(bands.select(col("bid"), col("bkey"), col("minute"))
        .distinct())
      .withColumn("gap", col("minute") - lag(col("minute"), 1).over(
        Window.partitionBy(col("bid"), col("bkey")).orderBy(col("minute"))))
      .filter(col("gap") > gapLimit)
      .select(col("bid"), col("bkey"), col("minute").as("break_minute"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.bid").as("bid"), col("a.bkey").as("bkey"),
        least(col("a.minute"), col("b.minute")).as("t_lo"),
        greatest(col("a.minute"), col("b.minute")).as("t_hi"),
        round(expr("cosine_sim(a.embedding, b.embedding)"), 6).as("cosine"))
      .filter(col("cosine") >= NearDupThreshold)
    cand.join(breaks,
        cand("bid") === breaks("bid") && cand("bkey") === breaks("bkey") &&
          col("break_minute") > col("t_lo") &&
          col("break_minute") <= col("t_hi"), "left")
      .groupBy(col("vec_a"), col("vec_b"), cand("bid"), cand("bkey"),
        col("cosine"))
      .agg(max(when(col("break_minute").isNotNull, 1).otherwise(0))
        .as("broken"))
      .filter(col("broken") === 0)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .distinct()
  }

  /** r_ann_evict_replay's fixed minute convention: one synthetic minute
    * per [[EvictReplayPerMin]] vec_ids, watermark [[EvictReplayWm]]
    * minutes — at sf0.01 (500 vectors, 25 minutes) buckets at the
    * adaptive width see natural chain breaks, so the rule's both
    * branches carry rows. */
  val EvictReplayPerMin = 20
  val EvictReplayWm = 2

  /** r_ann_evict_replay — the EVICTING streaming ANN operator's emitted
    * pair set as a batch replay with a DuckDB twin (the bounded-state
    * sibling of [[annEpochReplay]]): minute-fed corpus, gap-chain
    * residency at gapLimit = W + 1 (see [[evictingPairsReplayOn]] for
    * the exact stream-semantics derivation; the boundary is pinned
    * against the running operator by spec). */
  /** Materialize a BOUNDED replay result eagerly on the driver — the
    * common tail of the three replay oracles. The row sets here are
    * threshold-verified pair lists (≤ thousands at any fixture scale);
    * blow-up-scale replay THROUGHPUT is measured by StreamBench, never
    * through this driver crossing. Since r15 the shared band projection
    * each replay reads 3–7 times comes from the width-keyed
    * [[bandIndexAtWidthCached]] cache (one build per session/dir, not
    * one per invocation), so there is nothing to release here — and the
    * final order is established on the collected local frame, so the
    * distributed plan pays NO global sort exchange before the collect. */
  private def materializeBounded(out: DataFrame,
      sortCols: Seq[String]): DataFrame = {
    val spark = out.sparkSession
    val got = out.collect()
    spark.createDataFrame(
      spark.sparkContext.parallelize(got.toIndexedSeq, 1), out.schema)
      .orderBy(sortCols.map(col): _*)
  }

  def annEvictReplay(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    // ride the SHARED scaled-width checkpoint (built once per session/dir
    // — the same frame s30/s31/d30/d31 probe) instead of building and
    // releasing a private copy per invocation; the minute column is a
    // pure projection over the checkpoint reads.
    val bands = scaledBandIndex(spark, dir)
      .withColumn("minute", expr(s"vec_id div $EvictReplayPerMin"))
    materializeBounded(
      evictingPairsReplayOn(bands, EvictReplayWm + 1),
      Seq("vec_a", "vec_b"))
  }

  /** The COMPOSED evict+migrate stream's cross-epoch pair-emission rule
    * as a batch computation — the r12 verdict #3 oracle de-risking:
    * the same integer-minute gap-chain move [[evictingPairsReplayOn]]
    * made for the single-epoch rule, extended across the b0 → b0+1
    * crossing at minute `mc`.
    *
    * Protocol replayed (one run per minute, every minute populated,
    * buckets uncapped): phase 1 runs the evicting operator at width b0
    * for minutes < mc; at the crossing the state drains with its armed
    * timeouts, buckets with `timeout ≤ cut` (the drain watermark,
    * `mc − 1 − W`) are dropped by
    * [[migrateAnnResidentsEvicting]], the rest re-key to b0+1 (split
    * property: low bits preserved), and the evicting twin resumes with
    * [[graft.streaming.StreamOps.annTouchRows]] re-arming each migrated
    * bucket at its pre-drain timeout (= its last phase-1 arrival
    * minute, since the in-order minute feed never trips the wm+1
    * clamp). A cross-epoch pair (a, b) with t_a ≤ t_b, t_b ≥ mc
    * therefore emits iff, in some width-(b0+1) bucket both share:
    *
    *  - the MERGED residency chain is unbroken over (t_a, t_b]: chain
    *    minutes are the PARENT bucket's distinct phase-1 arrival
    *    minutes (any arrival to the b0 bucket kept the state alive
    *    pre-crossing, including siblings that migrate to the other
    *    child) followed by the CHILD bucket's distinct phase-2 arrival
    *    minutes (post-crossing only same-child arrivals re-arm), every
    *    consecutive gap ≤ gapLimit = W+1 — the touch re-arm makes the
    *    boundary gap exactly `first child minute − last parent minute`;
    *  - if t_a < mc, the migration cut kept the bucket:
    *    `last parent minute > cut`. This is the protocol's one genuine
    *    divergence from the unbroken gap rule: a bucket with
    *    `last parent minute = cut` would have survived one more minute
    *    under the running stream's strict `timeout < watermark`, but
    *    the drain filter (`timeout_ts > watermarkMs`) drops it — the
    *    spec pins this boundary against the running composed protocol.
    *
    * Input `bands2` is width-(b0+1) band rows carrying arrival
    * `minute`; emits distinct (vec_a, vec_b, cosine) with t_b ≥ mc. */
  private[graft] def evictEpochPairsOn(bands2: DataFrame, b0: Int,
      mc: Long, gapLimit: Int, cut: Long,
      sharedMins2: Option[DataFrame] = None,
      sharedPm: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(bands2.sparkSession)
    val mask = (1 << b0) - 1
    val split = 1 << b0
    // `sharedMins2` (distinct (bid, bkey, minute) of bands2) and
    // `sharedPm` (its minute < mc rows masked to b0 and re-distincted,
    // schema (bid, pk, minute)) let the composed replay derive child and
    // parent chains from ONE checkpointed census instead of three
    // corpus-grain distincts per invocation (epoch1's breaks reads the
    // same pm frame).
    val mins2 = sharedMins2.getOrElse(
      bands2.select(col("bid"), col("bkey"), col("minute")).distinct())
    val childMins = mins2.filter(col("minute") >= mc)
    val pm = sharedPm.getOrElse(mins2.filter(col("minute") < mc)
      .select(col("bid"), col("bkey").bitwiseAND(lit(mask)).as("pk"),
        col("minute"))
      .distinct())
    val parentMins = pm.select(col("bid"), col("pk").as("bkey"), col("minute"))
      .union(pm.select(col("bid"),
        (col("pk") + lit(split)).cast("int").as("bkey"), col("minute")))
    // union WITHOUT a distinct: the three branches are pairwise
    // duplicate-free by construction — childMins holds minutes ≥ mc,
    // both parent branches minutes < mc, and the two parent branches'
    // key ranges are disjoint ([0, 2^b0) vs [2^b0, 2^(b0+1))) — so the
    // old re-distinct was a pure extra exchange.
    val allMins = childMins.union(parentMins)
    val breaks = allMins
      .withColumn("gap", col("minute") - lag(col("minute"), 1).over(
        Window.partitionBy(col("bid"), col("bkey")).orderBy(col("minute"))))
      .filter(col("gap") > gapLimit)
      .select(col("bid"), col("bkey"), col("minute").as("break_minute"))
    val lastParent = parentMins
      .groupBy(col("bid"), col("bkey"))
      .agg(max(col("minute")).as("last_parent_min"))
    val cand = bands2.as("a").join(bands2.as("b"),
        col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey") &&
          col("a.vec_id") < col("b.vec_id"))
      .filter(greatest(col("a.minute"), col("b.minute")) >= mc)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.bid").as("bid"), col("a.bkey").as("bkey"),
        least(col("a.minute"), col("b.minute")).as("t_lo"),
        greatest(col("a.minute"), col("b.minute")).as("t_hi"),
        round(expr("cosine_sim(a.embedding, b.embedding)"), 6).as("cosine"))
      .filter(col("cosine") >= NearDupThreshold)
    cand.join(breaks,
        cand("bid") === breaks("bid") && cand("bkey") === breaks("bkey") &&
          col("break_minute") > col("t_lo") &&
          col("break_minute") <= col("t_hi"), "left")
      .groupBy(col("vec_a"), col("vec_b"), cand("bid"), cand("bkey"),
        col("cosine"), col("t_lo"))
      .agg(max(when(col("break_minute").isNotNull, 1).otherwise(0))
        .as("broken"))
      .filter(col("broken") === 0)
      .join(lastParent, Seq("bid", "bkey"), "left")
      .filter(col("t_lo") >= mc ||
        coalesce(col("last_parent_min"), lit(Long.MinValue)) > cut)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .distinct()
  }

  /** r_ann_evict_epoch_replay — the COMPOSED evict+migrate protocol's
    * emitted pair set as a batch replay with a DuckDB twin, closing the
    * r12 verdict's "spec-only" gap for residency windows spanning the
    * width crossing. Fixed conventions: minute = vec_id div
    * [[EvictReplayPerMin]], watermark [[EvictReplayWm]], crossing
    * minute mc = (n div PerMin) div 2 (integer arithmetic, both
    * engines), phase-1 width b0 from the phase-1 census
    * ([[scaledBandBits]]), phase 2 at b0+1. `epoch1` rows are the
    * single-epoch gap-chain rule ([[evictingPairsReplayOn]]) over the
    * phase-1 rows at b0; `epoch2` rows are the cross-epoch rule
    * ([[evictEpochPairsOn]]). The boundary (merged chain + migration
    * cut) is pinned against the RUNNING composed protocol by spec. */
  /** Phase-1 key width for the composed evict+migrate replay, derived
    * from the phase-1 census once per (session, dir) — the count is a
    * pure function of the corpus, so re-running it per invocation (2
    * bench passes × 1 job each) bought nothing. */
  private val evictEpochB0Cache = caches.newSideCache[Int]()

  /** The composed replay's (bid, bkey, minute) census and its b0-masked
    * parent re-distinct — pure functions of the corpus (fixed minute
    * convention, width from the cached census), so they are (session,
    * dir) caches like the band checkpoints they derive from, not
    * per-invocation frames: rebuilding + releasing them per call paid
    * two eager checkpoint jobs inside every timed invocation for frames
    * that never change (r16; the r15 sharing only deduplicated them
    * WITHIN one call). Bucket-grain × minutes — far below the band
    * checkpoint these distinct from. */
  private val evictEpochMins2Cache = caches.newCache()
  private val evictEpochPmCache = caches.newCache()

  def annEvictEpochReplay(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    val e = emb(spark, dir)
    val n = corpusCount(spark, dir)
    val mc = n / EvictReplayPerMin / 2
    val b0 = evictEpochB0Cache.getOrElseUpdate((spark, dir), scaledBandBits(
      e.filter(col("vec_id") < mc * EvictReplayPerMin).count()))
    val g = EvictReplayWm + 1
    val cut = mc - 1 - EvictReplayWm
    // ONE plane projection, checkpointed: the width-(b0+1) band rows
    // carry the b0 keys in their low bits (the split property — the
    // DuckDB twin likewise evaluates one codes CTE and masks at both
    // widths), and the epoch1/epoch2 kernels read the frame seven
    // times between them — without the checkpoint each branch re-ran
    // the 8·(b0+1) dot-product projection (this was the r13 bench's
    // tail leader at 4.1 s). Phase-2 width clamps at LshPlanesExt
    // exactly like the twin's delta'd-width CTE (r13 ADVICE: unclamped,
    // the two engines diverge at b0 = LshPlanesExt, ~67M vectors); at
    // the clamp both sides degrade identically — the parent "split"
    // keys (pk + 2^b0) exceed every real phase-2 key, so those chain
    // rows are inert on both engines and the merged chain reduces to
    // the single-width rule.
    val rows2 = bandIndexAtWidthCached(spark, dir,
        math.min(b0 + 1, LshPlanesExt))
      .withColumn("minute", expr(s"vec_id div $EvictReplayPerMin"))
    val rows1 = rows2
      .filter(col("vec_id") < mc * EvictReplayPerMin)
      .withColumn("bkey",
        col("bkey").bitwiseAND(lit((1 << b0) - 1)).cast("int"))
    // ONE (bid, bkey, minute) census serves both kernels (r16): epoch2's
    // child chain filters it, its parent chain and epoch1's gap-break
    // window both read the b0-masked re-distinct `pm` (rows1's distinct
    // minute set is definitionally the same frame: rows1 IS rows2 at
    // minute < mc with the masked key). Without the checkpoints each
    // branch re-derived its census from the corpus-grain band rows —
    // three distinct exchanges per invocation for one census.
    val mins2 = evictEpochMins2Cache.getOrElseUpdate((spark, dir),
      rows2.select(col("bid"), col("bkey"), col("minute"))
        .distinct().localCheckpoint())
    val pm = evictEpochPmCache.getOrElseUpdate((spark, dir),
      mins2.filter(col("minute") < mc)
        .select(col("bid"),
          col("bkey").bitwiseAND(lit((1 << b0) - 1)).as("pk"), col("minute"))
        .distinct().localCheckpoint())
    val p1 = evictingPairsReplayOn(rows1, g, sharedMins = Some(
        pm.select(col("bid"), col("pk").as("bkey"), col("minute"))))
      .withColumn("phase", lit("epoch1"))
    val p2 = evictEpochPairsOn(rows2, b0, mc, g, cut,
        sharedMins2 = Some(mins2), sharedPm = Some(pm))
      .withColumn("phase", lit("epoch2"))
    // mins2/pm are (session, dir) caches — released by DirCaches on dir
    // eviction / teardown, never by a consumer
    materializeBounded(
      p1.unionByName(p2)
        .select(col("phase"), col("vec_a"), col("vec_b"), col("cosine")),
      Seq("phase", "vec_a", "vec_b"))
  }

  /** r_ann_epoch_replay — the mid-stream doubling-epoch protocol's EDGE
    * SET as a batch replay with a DuckDB twin: the pair set the
    * two-phase streaming run must emit (StreamBench `ann-epoch` measures
    * the running operator against exactly this set; missed=0/extra=0 at
    * every recorded scale). Phase-1 enrollees are the standing (even)
    * half at its frozen width b0 ([[standingBandWidth]] — the same
    * convention s33/s36 freeze); phase 2 admits the odd half after the
    * b0 → b0+1 migration. Emitted across the crossing:
    *
    *  - `epoch1`: width-b0 co-bucket pairs within the even half
    *    (both enrolled pre-migration, verified cosine ≥ threshold);
    *  - `epoch2`: width-(b0+1) co-bucket pairs whose LATER arrival is
    *    odd — a post-migration arrival pairing against any resident,
    *    including pre-migration ones via their migrated child buckets
    *    (the no-missed-pairs contract). Both-even pairs never re-emit
    *    in phase 2 (they were state, not input), which the `later is
    *    odd` condition encodes: evens all precede odds in arrival
    *    order, so a pair with any odd member has an odd later arrival.
    *
    * The oracle evaluates the widened plane family ONCE (shared codes
    * CTE, the s36 discipline) and masks at both widths. Scale shape:
    * two bucket-grain self-joins at adaptive width — candidate mass
    * held linear by occupancy, the audited d3/s30 shape. */
  /** The LAZY plan, pre-materialization — the PlanAuditSpec inspects
    * this frame's join shape (the registered query materializes eagerly
    * so its own plan is an ExistingRDD). The band projection underneath
    * is the SHARED width-(b0+1) cache entry ([[rebuiltBandIndex]]'s
    * frame), so callers must NOT release it. */
  private[graft] def annEpochReplayLazy(spark: SparkSession,
      dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    val b0 = standingBandWidth(spark, dir)
    def pairsAt(bands: DataFrame, cond: Column): DataFrame =
      bands.as("a").join(bands.as("b"),
          col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey") &&
            col("a.vec_id") < col("b.vec_id"))
        .filter(cond)
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          round(expr("cosine_sim(a.embedding, b.embedding)"), 6).as("cosine"))
        .filter(col("cosine") >= NearDupThreshold)
        .distinct()
    // ONE width-(b0+1) projection — the SHARED [[rebuiltBandIndex]]
    // checkpoint (min(b0+1, LshPlanesExt) is exactly its width): phase
    // 1's width-b0 keys are its masked low bits (the split property, the
    // composed-replay discipline), and both phases self-join the frame —
    // unshared, the 8·(b0+1) plane projection ran four times; un-cached,
    // it was rebuilt per invocation. Bounded result set → eager collect;
    // the final order is applied post-collect, so no sort exchange here.
    val rows2 = rebuiltBandIndex(spark, dir)
    val rows1 = rows2.filter(col("vec_id") % 2 === 0)
      .withColumn("bkey",
        col("bkey").bitwiseAND(lit((1 << b0) - 1)).cast("int"))
    val p1 = pairsAt(rows1, lit(true))
      .withColumn("phase", lit("epoch1"))
    val p2 = pairsAt(rows2,
        col("a.vec_id") % 2 === 1 || col("b.vec_id") % 2 === 1)
      .withColumn("phase", lit("epoch2"))
    p1.unionByName(p2)
      .select(col("phase"), col("vec_a"), col("vec_b"), col("cosine"))
  }

  def annEpochReplay(spark: SparkSession, dir: String): DataFrame =
    materializeBounded(annEpochReplayLazy(spark, dir),
      Seq("phase", "vec_a", "vec_b"))

  /** The adaptive key width b, derived ONCE per (session, dir) from the
    * corpus count and cached beside the band index — s30/s31/s32/d30/d31
    * all need it, and re-counting per query is a free-but-pointless
    * columnless scan job. */
  private val scaledBandBitsCache = caches.newSideCache[Int]()
  private val standingBandBitsCache = caches.newSideCache[Int]()
  private val corpusCountCache = caches.newSideCache[Long]()
  /** Corpus cardinality, counted once per (session, dir): the adaptive
    * width AND the derived pair-partition count both need it. */
  private[graft] def corpusCount(spark: SparkSession, dir: String): Long = {
    evictOtherDirs(spark, dir)
    // count the RAW load, not emb(): emb's fan-out is derived FROM this
    // count (a columnless scan needs no fan-out anyway)
    corpusCountCache.getOrElseUpdate((spark, dir),
      Tables.load(spark, dir, "embeddings").count())
  }
  private[graft] def scaledBandWidth(spark: SparkSession, dir: String): Int = {
    evictOtherDirs(spark, dir)
    scaledBandBitsCache.getOrElseUpdate((spark, dir),
      scaledBandBits(corpusCount(spark, dir)))
  }
  /** The STANDING index's frozen width: derived from the indexed (even)
    * half only — the build-time parameter s33/s34/s36 freeze. */
  private[graft] def standingBandWidth(spark: SparkSession, dir: String): Int = {
    evictOtherDirs(spark, dir)
    standingBandBitsCache.getOrElseUpdate((spark, dir),
      scaledBandBits(emb(spark, dir).filter(col("vec_id") % 2 === 0).count()))
  }

  /** The checkpointed width-`b` band projection, shared by EVERY consumer
    * of that width (scaled/standing/rebuilt index, the three replay
    * oracles): one plane projection + one checkpoint per (session, dir,
    * width), where the replay family previously built and released its
    * own copy per invocation. */
  private[graft] def bandIndexAtWidthCached(spark: SparkSession, dir: String,
      b: Int): DataFrame = {
    evictOtherDirs(spark, dir)
    widthBandsCaches(b).getOrElseUpdate((spark, dir),
      bandIndexAtWidth(spark, dir, b))
  }

  private[graft] def scaledBandIndex(spark: SparkSession, dir: String): DataFrame =
    bandIndexAtWidthCached(spark, dir, scaledBandWidth(spark, dir))

  /** DEFAULT per-bucket occupancy cap for corpus-grain candidate
    * generation — the s40/s41 knee, wired in as the production
    * guardrail (r12 verdict #2). The adaptive width holds MEAN bucket
    * occupancy ≈ [[AnnHubTargetOcc]], but planted/natural clusters pile
    * into shared buckets and the candidate self-join pays Σ n_k² —
    * quadratic in cluster size, the term the clustered-100k corpus
    * measured at 16× wall for 5× data. The cap bounds it hard:
    * Σ min(n_k, cap)² ≤ cap·n·L. At 32 (vs 8) the s41 grid names the
    * knee on clustered-100k: cap_32 keeps 4× less join mass than
    * uncapped (5.0M vs 20.0M pairs) and multi-probe buys recall PAST
    * the uncapped single-bucket rule (979,166 ppm at depth 2 vs
    * 302,083 uncapped direct); cap_08 needs depth 2 just to match
    * cap_32's depth 1 at 2.4× the probe mass. On uniform-occupancy
    * corpora the cap binds rarely (sf0.01: capped ≡ uncapped exactly)
    * — free insurance. Consumers pass `capped = false` to opt out. */
  val DefaultBucketCap = 32

  /** Production multi-probe Hamming depth for the corpus-grain
    * candidate kernels ([[mpCandPairs]]/[[mpEdges]] → d31/d32/d34):
    * 1 = own bucket + the b one-bit flips (the s32-measured default);
    * 2 additionally probes the C(b,2) two-bit flips — the s41 grid's
    * recall dial (cap 32 × d2 on clustered-100k: 979,166 ppm vs
    * 897,916 at d1, for ~4.5× candidate mass; probe cost is linear in
    * the corpus either way, never the Σ n_k² skew term the cap bounds).
    * Env `SPARK_GRAFT_PROBE_DEPTH` flips the dial build-wide so the
    * whole d31/d32/d34 family — Spark side AND generated DuckDB oracle
    * twins — runs and verifies at the chosen depth. */
  val ProbeDepth: Int = {
    val raw = sys.env.get("SPARK_GRAFT_PROBE_DEPTH")
    val d = raw.map { s =>
      s.trim.toIntOption.getOrElse(
        throw new IllegalArgumentException(
          s"SPARK_GRAFT_PROBE_DEPTH '$s' is not an integer (expected 1 or 2)"))
    }.getOrElse(1)
    require(d >= 1 && d <= 2, s"SPARK_GRAFT_PROBE_DEPTH $d outside {1, 2}")
    d
  }

  /** The CAPPED production index: [[scaledBandIndex]] narrowed to
    * (vec_id, bid, bkey) with at most [[DefaultBucketCap]] residents
    * per (bid, bkey) — the cap lowest vec_ids, the deterministic
    * oracle-shared keep rule (streaming's analogue is first-arrival
    * admission under `maxBucket`). Checkpointed once per (session,
    * dir): this IS the index artifact the capped consumers probe. */
  /** The cap keep-rule over any narrow (vec_id, bid, bkey) frame: the
    * `cap` lowest vec_ids per bucket, planned as a bounded per-bucket
    * WindowGroupLimit heap (the PlanAuditSpec contract) — shared by the
    * production index, the s40/s41 sweeps, and the capped descent base. */
  private[graft] def cappedIndexOf(nb: DataFrame, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (cap == Int.MaxValue) nb
    else nb.withColumn("occ_rk", row_number().over(
        Window.partitionBy(col("bid"), col("bkey")).orderBy(col("vec_id"))))
      .filter(col("occ_rk") <= cap).drop("occ_rk")
  }

  private val cappedIdxCache = caches.newCache()
  private[ext] def cappedBandIndex(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    cappedIdxCache.getOrElseUpdate((spark, dir),
      cappedIndexOf(
        scaledBandIndex(spark, dir)
          .select(col("vec_id"), col("bid"), col("bkey")),
        DefaultBucketCap).localCheckpoint())
  }

  /** The STANDING index for incremental admission (s33): key width
    * frozen from the indexed half (even vec_ids) — the parameter a
    * deployed index fixes at build time — with band rows computed for
    * every vector so the new batch keys itself with the index's own
    * planes and width (a pure projection; admission needs no
    * corpus-wide state). */
  private[graft] def standingBandIndex(spark: SparkSession, dir: String): DataFrame =
    bandIndexAtWidthCached(spark, dir, standingBandWidth(spark, dir))

  /** s30 — ANN-candidate hubness: s26's in-degree health readout
    * computed over the LSH-bucket kNN graph instead of s10's
    * label-blocked exact join — the deployment-scale formulation the
    * round-9 empirical scale trend named (the exact join is quadratic
    * per block: 10× vectors = 100× scored pairs; the adaptive
    * [[scaledBandIndex]] holds bucket occupancy ≈ constant, so
    * candidate generation scales ~linearly with the corpus).
    * Per vector: the [[KnnK]] nearest among its band-mates by exact
    * cosine (ties to the lower neighbor id), deduped across bands;
    * in-degree histogram includes the 0-degree antihubs. A vector
    * sharing no band with anyone contributes an empty list — exactly
    * the retrieval behavior being audited. Rides the checkpointed
    * index (build once, probe per query) through the bounded
    * WindowGroupLimit heap — never a global or per-label sort. */
  /** Distinct candidate pairs from the scaled band index, NARROW-first:
    * the bucket self-join carries only (vec_id, bid, bkey) — shipping
    * the embedding through the index join would shuffle L copies of
    * every vector (measured 28× shuffle growth on the 10× blow-up);
    * pairs dedupe across tables BEFORE any scoring, then the two
    * id-equi-joins attach vectors (each embedding crosses the wire at
    * most twice, and the cosine runs once per distinct pair, not once
    * per colliding table). `leftFilter` restricts the query side (s31's
    * sample) without changing the shape. */
  private[ext] def scaledCandPairs(spark: SparkSession, dir: String,
      leftFilter: Column, capped: Boolean = true): DataFrame = {
    // capped by default (r12 verdict #2): the self-join's Σ n_k² skew
    // term is hard-bounded at cap·n·L; `capped = false` is the explicit
    // uncapped opt-out (the measurement queries that sweep the dial)
    val nb = if (capped) cappedBandIndex(spark, dir)
      else scaledBandIndex(spark, dir).select(col("vec_id"), col("bid"), col("bkey"))
    nb.as("a").join(nb.as("b"),
        col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .filter(leftFilter)
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"))
      .distinct()
  }

  private[graft] def scaledCandScores(spark: SparkSession, dir: String,
      leftFilter: Column, capped: Boolean = true): DataFrame =
    attachCosine(spark, dir, scaledCandPairs(spark, dir, leftFilter, capped))

  /** The FULL-corpus capped candidate-pair set (and its multi-probe
    * sibling at the production depth), checkpointed once per (session,
    * dir) — r15 optimization: s30/s39's base graph, d32 and d34 each
    * re-ran the bucket self-join (or probe join) + canonicalize-distinct
    * to produce exactly this frame; now they read one artifact. These
    * ARE the candidate sets a deployment materializes, bounded by the
    * same cap·n·L mass as any single consumer's join. */
  private val scaledPairsFullCache = caches.newCache()
  private[ext] def scaledCandPairsFull(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    scaledPairsFullCache.getOrElseUpdate((spark, dir),
      scaledCandPairs(spark, dir, lit(true)).localCheckpoint())
  }

  private val mpPairsFullCache = caches.newCache()
  private[ext] def mpCandPairsFull(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    mpPairsFullCache.getOrElseUpdate((spark, dir),
      mpCandPairs(spark, dir).localCheckpoint())
  }

  /** Exact-cosine attach for a narrow distinct candidate-pair frame —
    * the shared tail of every scaled-index consumer: two id-equi-joins
    * ship each embedding at most twice and the cosine runs once per
    * distinct pair, never once per colliding table/probe. */
  private[ext] def attachCosine(spark: SparkSession, dir: String,
      pairs: DataFrame): DataFrame = {
    val ev = emb(spark, dir).select(col("vec_id"), col("embedding"))
    // SHUFFLE_HASH on the vector side: the pair frame is the corpus-
    // quadratic one (hundreds of millions of rows at blow-up scale) and
    // an SMJ would SORT it twice — the 300× funnel's ann gate filled
    // this box's disk doing exactly that. Hashing the vector-grain side
    // (n rows, never the pair grain) streams the pairs unsorted; at
    // cluster scale the same asymmetry holds by construction.
    pairs
      .join(ev.select(col("vec_id"), col("embedding").as("xv"))
        .hint("SHUFFLE_HASH"), Seq("vec_id"))
      .join(ev.select(col("vec_id").as("nbr_id"), col("embedding").as("yv"))
        .hint("SHUFFLE_HASH"), Seq("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        round(expr("cosine_sim(xv, yv)"), 6).as("cosine"))
  }

  /** Multi-probe probe rows over a narrow band-index frame: each selected
    * index row expands to its own b-bit key (`pidx` 0 — pidx is the FLIP
    * COUNT), the b one-bit-flip neighbor keys (pidx 1), and at
    * `depth = 2` additionally the C(b,2) two-bit-flip keys (pidx 2) —
    * Lv et al.'s probing sequence by Hamming shell. Depth 2 multiplies
    * probe rows by ~b/2 over depth 1 (1+b → 1+b+b(b-1)/2) for the
    * recall tail the s32/s35 `t2` rows measure; the keys are pure XOR
    * arithmetic off the indexed bkey, so probing stays free of plane
    * dot products at any depth (the plan-audit contract). Yields
    * `(qid, bid, pidx, pkey)`. */
  private[ext] def probeRows(idx: DataFrame, b: Int, sel: Column,
      depth: Int = 1, extra: Seq[String] = Nil): DataFrame = {
    require(depth >= 1 && depth <= 2, s"probe depth $depth outside {1, 2}")
    val own = "array(named_struct('pidx', 0, 'pkey', bkey))"
    val d1 = s"transform(sequence(0, ${b - 1}), " +
      "r -> named_struct('pidx', 1, 'pkey', cast(bkey ^ shiftleft(1, r) as int)))"
    val d2 = s"flatten(transform(sequence(0, ${b - 2}), " +
      s"r -> transform(sequence(r + 1, ${b - 1}), " +
      "s -> named_struct('pidx', 2, " +
      "'pkey', cast(bkey ^ shiftleft(1, r) ^ shiftleft(1, s) as int)))))"
    val shells = if (depth == 1) Seq(own, d1) else Seq(own, d1, d2)
    idx.filter(sel)
      .selectExpr(Seq("vec_id AS qid") ++ extra ++ Seq("bid",
        s"inline(concat(${shells.mkString(", ")}))"): _*)
  }

  /** THRESHOLD-grade multi-probe edges at corpus grain, scored IN the
    * probe join — d31's production edge kernel. The narrow-pairs-then-
    * attach discipline ([[mpCandPairs]] → [[attachCosine]]) is right
    * when every candidate must be scored and returned (the recall
    * audits), but for an EDGE consumer it ships a (pair, embedding)
    * intermediate through the second attach exchange — P·(8+dim·4) B,
    * which at the 200×/300× blow-ups (0.4–0.9 B directed candidates)
    * is 130–250 GB and filled this box's disk twice. Here both join
    * sides carry their embeddings (probe side n·L·(1+b) rows — the
    * big one, ~25 GB at 300×; index side n·L capped rows), the cosine
    * evaluates in the join output, and the THRESHOLD filters BEFORE
    * the canonicalize-distinct — so the only pair-grain exchange
    * carries the near-dup-grade survivors. The extra cost is scoring
    * per colliding (probe, resident) row instead of once per distinct
    * pair — ~64 FMA per row, seconds of CPU at 300× — the right side
    * of that trade at any corpus size a cluster would run. Emits
    * canonical (vec_id < nbr_id) scored edges, distinct.
    *
    * Role since r15: the pair-grain REFERENCE kernel. Consumers that
    * need every surviving edge (scored readouts, the forest-equivalence
    * spec) use this; the component consumer (d31) uses
    * [[mpForestEdges]], whose star contraction is proven against this
    * kernel's components. */
  private[ext] def mpEdges(spark: SparkSession, dir: String,
      threshold: Double, depth: Int = ProbeDepth): DataFrame = {
    val fat = scaledBandIndex(spark, dir)
      .select(col("vec_id"), col("embedding"), col("bid"), col("bkey"))
    val idx = cappedIndexOf(fat, DefaultBucketCap)
    val probes = probeRows(fat, scaledBandWidth(spark, dir), lit(true),
      depth = depth, extra = Seq("embedding AS qv"))
    idx.as("i").join(probes.as("p"),
        col("i.bid") === col("p.bid") && col("i.bkey") === col("p.pkey") &&
          col("i.vec_id") =!= col("p.qid"))
      .select(least(col("p.qid"), col("i.vec_id")).as("vec_id"),
        greatest(col("p.qid"), col("i.vec_id")).as("nbr_id"),
        round(expr("cosine_sim(qv, i.embedding)"), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }

  /** The pair-grain exchanges' partition count, DERIVED from the
    * candidate-mass bound the kernel already knows instead of a manual
    * env knob (r14 verdict #3). Upper-bound scored-row mass = probe
    * rows × cap = n·L·(1+b[+C(b,2)])·cap — the join-side form of the
    * Σ min(n_k, cap)² hard bound; partitions = ceil(mass /
    * [[TargetPairRowsPerPartition]]) clamped to [session shuffle
    * partitions, [[MaxDerivedPartitions]]]. At fixture scale the floor
    * keeps the session default (no plan change); at blow-up scale it
    * sizes PER-TASK state — the r14 lesson was that the binding
    * constraint is per-task aggregate/union-find state, not total mass
    * (depth-2 clustered-100k and depth-1 zipf-500k both OOM'd at 32
    * partitions and needed SPARK_GRAFT_SHUFFLE=512 by hand; this
    * derives 544 for the same zipf-500k corpus). Explicit
    * `repartition(p, keys)` rather than a session-conf mutation:
    * per-query, race-free under concurrent queries, and already
    * right-sized from the mass bound so AQE coalescing has nothing to
    * claw back. */
  private[ext] val TargetPairRowsPerPartition = 4L * 1000 * 1000
  private[ext] val MaxDerivedPartitions = 4096
  private[ext] def derivedPairPartitions(spark: SparkSession, dir: String,
      depth: Int): Int =
    derivedPairPartitionsFor(corpusCount(spark, dir),
      scaledBandWidth(spark, dir), depth,
      spark.sessionState.conf.numShufflePartitions)
  /** The pure derivation, unit-testable without a corpus. */
  private[graft] def derivedPairPartitionsFor(n: Long, b: Int, depth: Int,
      sessionPartitions: Int): Int = {
    val shells = 1L + b + (if (depth >= 2) b.toLong * (b - 1) / 2 else 0L)
    val mass = n * AnnHubTables * shells * DefaultBucketCap
    val want = (mass + TargetPairRowsPerPartition - 1) / TargetPairRowsPerPartition
    math.max(sessionPartitions.toLong, math.min(MaxDerivedPartitions.toLong,
      want)).toInt
  }

  /** CONNECTIVITY-grade multi-probe edges — d31's scale path (r14
    * verdict #1). Same capped index, same probe shells, same in-join
    * scoring and threshold as [[mpEdges]], but the consumer is a
    * connected-components BSP that needs REACHABILITY, not every
    * surviving pair: on a dense duplicate cluster every colliding
    * in-cluster pair clears the threshold, so the survivor edge set is
    * quadratic in cluster size (zipf-500k's 105k-doc head made
    * [[mpEdges]]' distinct + the BSP over it a 27-minute wall), while
    * its connectivity information is worth at most |V|−1 edges.
    *
    * The reduction: a per-partition streaming UNION-FIND over the join
    * output, emitting min-root STAR edges (component-min, member) for
    * each partition-local component. Exactness: partitioning an edge
    * multiset arbitrarily and replacing each part by any structure with
    * the same within-part connectivity preserves the components of the
    * union — every path decomposes into in-part edges, each replaceable
    * by a walk through that part's stars. So the global BSP over the
    * union of stars yields components identical to the full survivor
    * set's (the ExtSpec forest-equivalence contract pins this against
    * [[mpEdges]], and the d31 oracle — full-pair reachability in DuckDB
    * — hash-checks it end to end).
    *
    * Scale shape: the survivor mass never crosses a second exchange at
    * all — [[mpEdges]] shuffles every surviving pair through its
    * distinct; here the union-find rides the probe join's own output
    * partitions and only the contracted stars (≤ one row per (partition,
    * vertex), Σ ≤ probe rows, in practice ~|V| per duplicate cluster
    * after the cross-band distinct) are exchanged again. Stars also
    * bound the BSP: within a part the contracted diameter is 2, so
    * min-labels cross a component in a handful of rounds instead of
    * propagating through a dense edge soup. Per-task memory is the
    * union-find map — O(distinct vertices in the partition) longs —
    * which [[derivedPairPartitions]] sizes from the same mass bound
    * that sizes the join itself. Determinism: stars depend on which
    * rows share a partition (fixed by the explicit hash repartition),
    * and the FINAL components are partition-invariant by the exactness
    * argument — the CPUS/partition sweeps check that invariance.
    *
    * mapPartitions (not an Expression/aggregate) is deliberate: a
    * sequential union-find over an iterator is whole-operator logic no
    * built-in expresses without re-shuffling the pair mass — this is
    * the documented last-resort case. Emits canonical `(vec_id <
    * nbr_id)` star edges, distinct across partitions and bands. */
  private[graft] def mpForestEdges(spark: SparkSession, dir: String,
      threshold: Double, depth: Int = ProbeDepth): DataFrame = {
    GraftFunctions.register(spark)
    val p = derivedPairPartitions(spark, dir, depth)
    val fat = scaledBandIndex(spark, dir)
      .select(col("vec_id"), col("embedding"), col("bid"), col("bkey"))
    val idx = cappedIndexOf(fat, DefaultBucketCap)
      .repartition(p, col("bid"), col("bkey"))
    val probes = probeRows(fat, scaledBandWidth(spark, dir), lit(true),
        depth = depth, extra = Seq("embedding AS qv"))
      .repartition(p, col("bid"), col("pkey"))
    val survivors = idx.as("i").join(probes.as("p"),
        col("i.bid") === col("p.bid") && col("i.bkey") === col("p.pkey") &&
          col("i.vec_id") =!= col("p.qid"))
      .filter(round(expr("cosine_sim(qv, i.embedding)"), 6) >= lit(threshold))
      .select(col("p.qid").as("_1"), col("i.vec_id").as("_2"))
    import spark.implicits._
    StarContraction.stars(survivors.as[(Long, Long)])
      .toDF("vec_id", "nbr_id")
      .repartition(p, col("vec_id"), col("nbr_id"))
      .distinct()
  }

  /** CORPUS-GRAIN multi-probe candidate pairs + exact cosine — the
    * production form of [[scaledCandScores]] with s32's measured recall
    * dial wired in (1-bit flips lifted candidate recall@3 from ~29% to
    * ~89% on the fixture for ~(b+1)× candidate mass): every vector
    * probes, per table, its own bucket and the b one-bit-flip buckets —
    * and at `depth = 2` ([[ProbeDepth]], the s41-informed opt-in) the
    * C(b,2) two-bit-flip buckets, the recall tail the cap×probe grid
    * priced (on clustered-100k: cap 32 × d2 = 979,166 ppm vs 897,916 at
    * d1, for ~b/2× probe mass). The probe side here is corpus-sized
    * (this is all-pairs candidate generation, not a bounded query
    * batch), so the bucket join is a SHUFFLED equi-join on (bid, key) —
    * output mass ≈ n·L·(1+b[+C(b,2)])·occ, still linear in the corpus
    * because the adaptive width holds occ constant. Pairs dedupe across
    * tables AND probes before the embedding attach.
    *
    * No query-side filter parameter: under the cap an asymmetric
    * restriction cannot commute with the symmetrization below (a row
    * admitted in one direction re-emerges reversed outside the filter
    * — the r13 ADVICE latent bug), and every consumer of this kernel
    * wants the full corpus-grain undirected list anyway; sampled-recall
    * readouts restrict AFTER the symmetric closure. */
  private[ext] def mpCandPairs(spark: SparkSession, dir: String,
      capped: Boolean = true, depth: Int = ProbeDepth): DataFrame = {
    val nb = scaledBandIndex(spark, dir).select(col("vec_id"), col("bid"), col("bkey"))
    // index side capped (the Σ n_k² guardrail); PROBE side stays the
    // full corpus — every vector is a query and always knows its own
    // keys, and probe mass is linear (n·L·(1+b+C(b,2))), no skew term
    val idx = if (capped) cappedBandIndex(spark, dir) else nb
    val probes = probeRows(nb, scaledBandWidth(spark, dir), lit(true),
      depth = depth)
    // under the cap the flip-symmetry argument no longer yields both
    // directions (an evicted vector is found only by probing, never BY
    // a probe), so the undirected contract the BSP/dedup consumers rely
    // on is restored explicitly — CANONICALIZE-FIRST: dedupe once on
    // the (lo, hi) normal form (collapsing probes, tables AND
    // directions in one distinct — half the sort mass of
    // symmetrize-then-distinct, which is what let the 300× funnel's
    // ann gate spill past this box's disk), then emit both directions
    // as a free disjoint union
    val canon = idx.as("i").join(probes.as("p"),
        col("i.bid") === col("p.bid") && col("i.bkey") === col("p.pkey") &&
          col("i.vec_id") =!= col("p.qid"))
      .select(least(col("p.qid"), col("i.vec_id")).as("vec_id"),
        greatest(col("p.qid"), col("i.vec_id")).as("nbr_id"))
      // the canonicalize-distinct is the pair-grain hash-agg whose
      // PER-TASK state OOM'd at session partitions on the blow-up
      // corpora (the r14 SPARK_GRAFT_SHUFFLE lesson) — size it from
      // the candidate-mass bound instead
      .repartition(derivedPairPartitions(spark, dir, depth),
        col("vec_id"), col("nbr_id"))
      .distinct()
    canon.union(canon.select(col("nbr_id").as("vec_id"),
      col("vec_id").as("nbr_id")))
  }

  private[ext] def mpCandScores(spark: SparkSession, dir: String,
      capped: Boolean = true, depth: Int = ProbeDepth): DataFrame =
    attachCosine(spark, dir, mpCandPairs(spark, dir, capped, depth))

  def annHubness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val indeg = attachCosine(spark, dir, scaledCandPairsFull(spark, dir))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cosine").desc, col("nbr_id").asc)).cast("long"))
      .filter(col("rk") <= KnnK)
      .groupBy(col("nbr_id").as("vec_id"))
      .agg(count(lit(1)).as("in_deg"))
    emb(spark, dir).select(col("vec_id"))
      .join(indeg, Seq("vec_id"), "left")
      .withColumn("in_deg", coalesce(col("in_deg"), lit(0L)))
      .groupBy(col("in_deg"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("in_deg")
  }

  /** s31 — adaptive-band candidate recall: recall@[[KnnK]] of the s30
    * candidate graph against the EXACT unblocked kNN graph on the
    * deterministic FIXED-COUNT query sample [[recallSampled]] — the
    * other half of the occupancy/recall tradeoff [[scaledBandIndex]]
    * tunes (fewer, wider bands hold occupancy but cost recall; this is
    * the dial readout). One summary row, exact integers to the final
    * ppm.
    *
    * The exact side broadcasts the SAMPLE against the corpus (the
    * s9/s28 recall-audit discipline: the sample is fixed-size at
    * deployment, so the scan is one corpus pass, never all-pairs); the
    * candidate side restricts the same band self-join s30 runs to
    * sampled left sides. */
  val RecallSampleMod = 20
  /** Sample membership: every [[RecallSampleMod]]-th vec_id, CAPPED at
    * [[RecallSampleN]] queries (`vec_id < Mod·N`) — so the exact
    * brute-force denominator is one corpus pass over a CONSTANT number
    * of broadcast queries at any corpus size. The round-9 mod-only form
    * grew the sample (and the audit's wall clock) linearly with the
    * corpus: at the 10× blow-up the two recall audits were the most
    * expensive queries in the suite, all denominator. Deterministic and
    * oracle-trivial; under ScaleBlowup the lowest ids are the original
    * fixture docs, so the sampled queries are identical at every
    * blow-up factor. */
  val RecallSampleN = 32
  val RecallSampleCap: Long = RecallSampleMod.toLong * RecallSampleN
  private[ext] def recallSampled(c: Column): Column =
    c % RecallSampleMod === 0 && c < RecallSampleCap
  private[ext] val duckRecallSampled =
    s"vec_id % $RecallSampleMod = 0 AND vec_id < $RecallSampleCap"
  /** Exact top-[[KnnK]] of every capped-sample query over the full
    * corpus — the shared recall denominator (s31, s36). One corpus pass
    * against the broadcast fixed sample; checkpointed under the module
    * caches because the consumers each read it several times (hits join
    * + denominator aggregate — the d28 multi-reference lesson). */
  private val exactKnnCache = caches.newCache()
  private def exactSampleKnn(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    exactKnnCache.getOrElseUpdate((spark, dir), {
      import org.apache.spark.sql.expressions.Window
      val topW = Window.partitionBy(col("vec_id"))
        .orderBy(col("cosine").desc, col("nbr_id").asc)
      val sample = emb(spark, dir)
        .filter(recallSampled(col("vec_id")))
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      emb(spark, dir).join(broadcast(sample),
          col("qid") =!= col("vec_id"))
        .select(col("qid").as("vec_id"), col("vec_id").as("nbr_id"),
          round(expr("cosine_sim(qv, embedding)"), 6).as("cosine"))
        .withColumn("rk", row_number().over(topW)).filter(col("rk") <= KnnK)
        .select(col("vec_id"), col("nbr_id"))
        .localCheckpoint()
    })
  }

  def scaledAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topW = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val exact = exactSampleKnn(spark, dir)
    val ann = scaledCandScores(spark, dir,
        recallSampled(col("a.vec_id")))
      .withColumn("rk", row_number().over(topW)).filter(col("rk") <= KnnK)
      .select(col("vec_id"), col("nbr_id"))
    val hits = exact.join(ann, Seq("vec_id", "nbr_id"))
      .agg(count(lit(1)).as("n_hits"))
    exact.agg(countDistinct(col("vec_id")).as("n_queries"),
        count(lit(1)).as("n_exact"))
      .crossJoin(hits)
      .select(col("n_queries"), col("n_exact"), col("n_hits"),
        expr("n_hits * 1000000L div n_exact").as("recall_ppm"))
  }

  /** s32 — multi-probe recall lift: the production dial that buys ANN
    * recall WITHOUT growing the table count (Lv et al., "Multi-Probe
    * LSH", VLDB'07 — memory is L× the corpus, so raising L is the
    * expensive dial; probing more buckets per table is nearly free).
    * Each sampled query probes, per table, its own b-bit key, the b
    * one-bit-flip neighbor keys, and the C(b,2) two-bit-flip keys — the
    * buckets a true neighbor most likely fell into when one or two
    * hyperplanes disagreed. Emits one row per probe mode (`t0_single` =
    * exact bucket only ≡ s31's candidate rule; `t1_multi1` = +1-bit
    * flips; `t2_multi2` = +2-bit flips) with the same exact-kNN
    * denominator, so the recall-per-candidate-mass frontier is read
    * directly off the result.
    *
    * Measured on the sf0.01 fixture (probe rows 1 → 1+b → 1+b+C(b,2)
    * per (query, table), b=7: 1/8/29): recall@3 293333 → 893333 →
    * 1000000 ppm — the second Hamming shell closes the last ~11% at
    * ~3.6× the depth-1 probe mass, the dial a deployment turns until
    * its recall target clears (Lv et al.'s result: probing depth is the
    * cheap axis, table count L the expensive one).
    *
    * Scale shape: rides the checkpointed [[scaledBandIndex]]; the probe
    * table (|sample|·L·(1+b+C(b,2)) rows, corpus-size-independent)
    * BROADCASTS against the index so the corpus-grain side never
    * shuffles; distinct (query, candidate) pairs score exactly once
    * (min flip-count kept to classify the mode), then three bounded
    * WindowGroupLimit top-k passes share the scored frame. */
  def multiprobeRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topW = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val e = emb(spark, dir)
    val sample = e.filter(recallSampled(col("vec_id")))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = e.join(broadcast(sample), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nbr_id"),
        round(expr("cosine_sim(qv, embedding)"), 6).as("cosine"))
      .withColumn("rk", row_number().over(topW)).filter(col("rk") <= KnnK)
      .select(col("qid"), col("nbr_id"))
    val idx = scaledBandIndex(spark, dir)
      .select(col("vec_id"), col("bid"), col("bkey"))
    val b = scaledBandWidth(spark, dir)
    val probes = probeRows(idx, b, recallSampled(col("vec_id")), depth = 2)
    val cand = idx.as("i").join(broadcast(probes.as("p")),
        col("i.bid") === col("p.bid") && col("i.bkey") === col("p.pkey") &&
          col("i.vec_id") =!= col("p.qid"))
      .groupBy(col("p.qid").as("qid"), col("i.vec_id").as("nbr_id"))
      .agg(min(col("p.pidx")).as("mp"))
    val scored = cand
      .join(e.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid")
      .join(e.select(col("vec_id").as("nbr_id"), col("embedding").as("yv")),
        "nbr_id")
      .select(col("qid"), col("nbr_id"), col("mp"),
        round(expr("cosine_sim(qv, yv)"), 6).as("cosine"))
    // one scored frame, three cumulative Hamming-shell cuts: mode tK
    // sees candidates whose minimum flip distance is <= K
    val tops = Seq(("t0_single", 0), ("t1_multi1", 1), ("t2_multi2", 2))
      .map { case (m, k) =>
        scored.filter(col("mp") <= k)
          .withColumn("rk", row_number().over(topW)).filter(col("rk") <= KnnK)
          .select(lit(m).as("probe_mode"), col("qid"), col("nbr_id"))
      }.reduce(_ unionAll _)
    val hits = exact.join(tops, Seq("qid", "nbr_id"))
      .groupBy(col("probe_mode")).agg(count(lit(1)).as("h"))
    val modes = spark.sql(
      "SELECT 't0_single' AS probe_mode UNION ALL SELECT 't1_multi1' " +
        "UNION ALL SELECT 't2_multi2'")
    modes.join(hits, Seq("probe_mode"), "left")
      .crossJoin(exact.agg(countDistinct(col("qid")).as("n_queries"),
        count(lit(1)).as("n_exact")))
      .select(col("probe_mode"), col("n_queries"), col("n_exact"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        expr("coalesce(h, 0L) * 1000000L div n_exact").as("recall_ppm"))
      .orderBy("probe_mode")
  }

  /** s33 — incremental ANN admission: screen a NEWLY ARRIVED embedding
    * batch against the STANDING index — d11's production ingest path for
    * vectors (the batch jobs rebuild candidate graphs; a pipeline
    * admitting embeddings continuously probes each new vector against
    * the standing LSH tables and reads its neighbors on admission). Odd
    * vec_ids stand in for the new batch, even ids for the indexed
    * corpus; emits each new vector's top-[[KnnK]] indexed neighbors by
    * exact cosine over the bucket candidates.
    *
    * The key production property: the new batch keys itself with the
    * index's OWN fixed parameters (the literal plane family and the key
    * width frozen at build time from the INDEXED corpus — [[standingBandIndex]])
    * — a pure per-row projection, so admission needs no corpus-wide
    * state and the probe shuffle is bounded by the batch, never the
    * corpus. Documented rebuild trigger: when the corpus outgrows the
    * frozen width's occupancy target (n_indexed ≈ 2^b · occ), the index
    * re-keys at b+1 — the doubling-epoch rebuild every LSH deployment
    * amortizes. */
  def incrementalAnn(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bands = standingBandIndex(spark, dir)
      .select(col("vec_id"), col("bid"), col("bkey"))
    val idx = bands.filter(col("vec_id") % 2 === 0)
    val probe = bands.filter(col("vec_id") % 2 === 1)
    val cand = probe.as("p").join(idx.as("i"),
        col("p.bid") === col("i.bid") && col("p.bkey") === col("i.bkey"))
      .select(col("p.vec_id").as("vec_id"), col("i.vec_id").as("nbr_id"))
      .distinct()
    val ev = emb(spark, dir).select(col("vec_id"), col("embedding"))
    cand
      .join(ev.select(col("vec_id"), col("embedding").as("xv")), Seq("vec_id"))
      .join(ev.select(col("vec_id").as("nbr_id"), col("embedding").as("yv")),
        Seq("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        round(expr("cosine_sim(xv, yv)"), 6).as("cosine"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cosine").desc, col("nbr_id").asc)).cast("long"))
      .filter(col("rk") <= KnnK)
      .select(col("vec_id"), col("nbr_id"), col("rk"), col("cosine"))
      .orderBy("vec_id", "rk")
  }

  /** s34 — MULTI-PROBE incremental admission: s33 with s32's measured
    * recall dial wired into the operator that ships decisions (the
    * round-9 gap: the dial was measured but the production consumers
    * still probed single buckets). Each new (odd) vector probes, per
    * standing table, its own frozen-width key plus the b one-bit-flip
    * neighbor keys; candidates dedupe across tables and probes before
    * the exact-cosine attach; output shape is exactly s33's
    * (vec_id, nbr_id, rk, cosine).
    *
    * Recall delta pinned on the sf0.01 fixture (s35's readout):
    * admission neighbor recall@3 vs the exact indexed-half kNN rises
    * 480000 ppm (t0_single) → 973333 ppm (t1_multi1) for (b+1)× probe
    * rows and zero extra index memory.
    *
    * Scale shape: the probe table is the NEW BATCH × L × (b+1) — it
    * scales with the batch, NOT the corpus, and this operator's
    * odd-ids-as-new-batch convention makes that batch HALF the corpus,
    * so no broadcast is forced here: the bucket join is a plain
    * equi-join on (bid, pkey) and AQE picks the strategy from the
    * probe side's RUNTIME size — broadcast for the deployed trickle
    * batch (the plan audit executes and reads the final adaptive
    * plan), shuffled hash join when a bulk admission genuinely exceeds
    * the broadcast tier (a corpus-fraction probe table force-broadcast
    * would ship tens of millions of rows to every executor at the
    * measured 100× blow-ups — the d31 rationale: corpus-grain probes
    * never broadcast). Admission still needs no corpus-wide state.
    * Contrast [[incrementalAnnRecall]], whose probe side is a FIXED
    * capped sample and may broadcast unconditionally. */
  def incrementalAnnMultiprobe(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // score IN the probe join (the mpEdges discipline, r15): the old
    // narrow-pairs-then-attach shape shipped a (pair, embedding)
    // intermediate through attachCosine's second equi-join — the fattest
    // exchange of the query (pair mass × the embedding payload). Both
    // join sides already carry their vectors here, the cosine evaluates
    // in the join output, and the pair-grain exchange carries only
    // (qid, nbr_id, cosine); the per-pair dedup becomes max(cosine)
    // (every colliding row of a pair scores identically, so the value
    // is unchanged). Extra cost is one cosine per colliding row instead
    // of per distinct pair — the audited right side of that trade.
    val bands = standingBandIndex(spark, dir)
    val idx = bands.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id"), col("embedding"), col("bid"), col("bkey"))
    val probes = probeRows(bands, standingBandWidth(spark, dir),
      col("vec_id") % 2 === 1, extra = Seq("embedding AS qv"))
    idx.as("i").join(probes.as("p"),
        col("i.bid") === col("p.bid") && col("i.bkey") === col("p.pkey"))
      .select(col("p.qid").as("vec_id"), col("i.vec_id").as("nbr_id"),
        round(expr("cosine_sim(qv, i.embedding)"), 6).as("cosine"))
      .groupBy(col("vec_id"), col("nbr_id"))
      .agg(max(col("cosine")).as("cosine"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("cosine").desc, col("nbr_id").asc)).cast("long"))
      .filter(col("rk") <= KnnK)
      .select(col("vec_id"), col("nbr_id"), col("rk"), col("cosine"))
      .orderBy("vec_id", "rk")
  }

  /** s35 — admission-recall readout, the s32 discipline applied to the
    * INCREMENTAL path: recall@[[KnnK]] of s33's single-bucket admission
    * neighbors vs s34's multi-probe neighbors, both against the exact
    * kNN of each sampled new vector over the INDEXED (even) half — the
    * before/after that justifies shipping s34 as the admission default.
    * One row per probe mode, shared exact denominator, integers to the
    * final ppm.
    *
    * Sample: the odd twin of [[recallSampled]] (`vec_id % Mod = 1`,
    * capped) — fixed-count, so the exact side is one indexed-half pass
    * against a constant broadcast sample at any corpus size.
    *
    * Measured on the sf0.01 fixture: admission recall@3 480000 (t0) →
    * 973333 (t1) → 1000000 ppm (t2_multi2, the second Hamming shell) —
    * the depth dial closes the admission path's last misses at
    * ~3.6× depth-1 probe mass and zero extra index memory. */
  def incrementalAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topW = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    def sampledOdd(c: Column): Column =
      c % RecallSampleMod === 1 && c < RecallSampleCap
    val e = emb(spark, dir)
    val sample = e.filter(sampledOdd(col("vec_id")))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val exact = e.filter(col("vec_id") % 2 === 0)
      .join(broadcast(sample), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nbr_id"),
        round(expr("cosine_sim(qv, embedding)"), 6).as("cosine"))
      .withColumn("rk", row_number().over(topW)).filter(col("rk") <= KnnK)
      .select(col("qid"), col("nbr_id"))
    val bands = standingBandIndex(spark, dir)
      .select(col("vec_id"), col("bid"), col("bkey"))
    val idx = bands.filter(col("vec_id") % 2 === 0)
    val probes = probeRows(bands, standingBandWidth(spark, dir),
      sampledOdd(col("vec_id")), depth = 2)
    val cand = idx.as("i").join(broadcast(probes.as("p")),
        col("i.bid") === col("p.bid") && col("i.bkey") === col("p.pkey"))
      .groupBy(col("p.qid").as("qid"), col("i.vec_id").as("nbr_id"))
      .agg(min(col("p.pidx")).as("mp"))
    val scored = cand
      .join(e.select(col("vec_id").as("qid"), col("embedding").as("qv")), "qid")
      .join(e.select(col("vec_id").as("nbr_id"), col("embedding").as("yv")),
        "nbr_id")
      .select(col("qid"), col("nbr_id"), col("mp"),
        round(expr("cosine_sim(qv, yv)"), 6).as("cosine"))
    // cumulative Hamming-shell cuts, exactly the s32 discipline
    val tops = Seq(("t0_single", 0), ("t1_multi1", 1), ("t2_multi2", 2))
      .map { case (m, k) =>
        scored.filter(col("mp") <= k)
          .withColumn("rk", row_number().over(topW)).filter(col("rk") <= KnnK)
          .select(lit(m).as("probe_mode"), col("qid"), col("nbr_id"))
      }.reduce(_ unionAll _)
    val hits = exact.join(tops, Seq("qid", "nbr_id"))
      .groupBy(col("probe_mode")).agg(count(lit(1)).as("h"))
    val modes = spark.sql(
      "SELECT 't0_single' AS probe_mode UNION ALL SELECT 't1_multi1' " +
        "UNION ALL SELECT 't2_multi2'")
    modes.join(hits, Seq("probe_mode"), "left")
      .crossJoin(exact.agg(countDistinct(col("qid")).as("n_queries"),
        count(lit(1)).as("n_exact")))
      .select(col("probe_mode"), col("n_queries"), col("n_exact"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        expr("coalesce(h, 0L) * 1000000L div n_exact").as("recall_ppm"))
      .orderBy("probe_mode")
  }

  /** s36 — DOUBLING-EPOCH index rebuild: the trigger s33's Scaladoc
    * documented, now an operator. A standing index freezes its key
    * width b0 at build time from the then-indexed corpus; once the full
    * corpus outgrows the frozen width's occupancy target
    * (n > 2^b0 · [[AnnHubTargetOcc]], detected here as the adaptive
    * width formula yielding bFull > b0 — both widths are cached
    * scalars, no extra scan), the index re-keys at b0+1 (clamped to
    * [[LshPlanesExt]] — the rebuild CROSSES the 16-bit clamp via the
    * widened plane family, s37's contract) — the halving-occupancy
    * rebuild every LSH deployment amortizes over each corpus doubling.
    *
    * The rebuild preserves the PLANE FAMILY: only the key mask widens,
    * so every width-b0 bucket splits into exactly two width-(b0+1)
    * buckets (new key's low b0 bits ARE the old key — the split
    * property, spec-pinned in ExtSpec) and the new candidate sets are
    * subsets of the old buckets' — re-keying can halve occupancy but
    * never surface a pair the old index had not already colocated.
    *
    * One row per epoch over the FULL corpus: the frozen width b0
    * (e0_frozen) vs the re-keyed b0+1 (e1_rebuilt) — bucket count,
    * max/mean occupancy (the rebuild's point: mean halves), the
    * capped-sample candidate recall@[[KnnK]] (its price: candidates
    * shrink, recall dips — the dial multi-probe then recovers, s32),
    * and the breach flag (1 on e0 = rebuild triggered; 0 on e1 = the
    * new width meets the target). Integers to the final ppm.
    *
    * Measured on the sf0.01 fixture (b0=5 frozen from the 250-vector
    * half, full corpus 500 breaches): rebuild at b=6 doubles buckets
    * 256 → 512, mean occupancy exactly halves 15.63 → 7.81, max 30 → 23,
    * sampled candidate recall dips 400000 → 293333 ppm — the dip
    * multi-probe recovers (s32: +1-bit flips tripled recall at the same
    * width), breach flag 1 → 0.
    *
    * Measured AT THE 16-BIT CLAMP CROSSING (the 300× blow-up, 600k
    * vectors — the first fixture to reach b=17 BY DATA): frozen b0=16
    * breaches at mean occupancy 9.69 (495,273 buckets, max 179); the
    * rebuild re-keys at b=17 through the ext plane family and restores
    * the occupancy target — 887,238 buckets, mean 5.41, max 127,
    * breach flag 1 → 0, 8.0 s warm on local[32]. The cliff the r10
    * verdict named (the index silently stopping at 2^16·occ) is now a
    * measured non-event. */
  private[graft] def rebuiltBandIndex(spark: SparkSession, dir: String): DataFrame =
    bandIndexAtWidthCached(spark, dir,
      math.min(LshPlanesExt, standingBandWidth(spark, dir) + 1))

  def epochRebuild(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b0 = standingBandWidth(spark, dir)
    val b1 = math.min(LshPlanesExt, b0 + 1)
    val bFull = scaledBandWidth(spark, dir)
    val exact = exactSampleKnn(spark, dir)
    def epochRow(bands: DataFrame, epoch: String, b: Int): DataFrame = {
      val nb = bands.select(col("vec_id"), col("bid"), col("bkey"))
      val occ = nb.groupBy(col("bid"), col("bkey"))
        .agg(count(lit(1)).as("occ"))
      val stats = occ.agg(count(lit(1)).as("n_buckets"),
        max(col("occ")).as("max_occ"), sum(col("occ")).as("n_rows"))
      val cand = nb.as("a").join(nb.as("b"),
          col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .filter(recallSampled(col("a.vec_id")))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"))
        .distinct()
      val topW = Window.partitionBy(col("vec_id"))
        .orderBy(col("cosine").desc, col("nbr_id").asc)
      val ann = attachCosine(spark, dir, cand)
        .withColumn("rk", row_number().over(topW)).filter(col("rk") <= KnnK)
        .select(col("vec_id"), col("nbr_id"))
      val hits = exact.join(ann, Seq("vec_id", "nbr_id"))
        .agg(count(lit(1)).as("n_hits"))
      stats.crossJoin(hits)
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .select(lit(epoch).as("epoch"), lit(b.toLong).as("b"),
          col("n_buckets"), col("max_occ"),
          expr("n_rows * 1000000L div n_buckets").as("mean_occ_micro"),
          col("n_exact"), col("n_hits"),
          expr("n_hits * 1000000L div n_exact").as("recall_ppm"),
          lit(if (bFull > b) 1 else 0).as("breached"))
    }
    epochRow(standingBandIndex(spark, dir), "e0_frozen", b0)
      .unionAll(epochRow(rebuiltBandIndex(spark, dir), "e1_rebuilt", b1))
      .orderBy("epoch")
  }

  /** s37 — PLANE-FAMILY WIDENING across the 16-bit clamp: the
    * continuation the adaptive index documents for n > 2^[[LshPlanes]]·occ
    * (the 100x blow-up reached that point exactly), now an operator with
    * a differentially-checked contract — and since round 11 the adaptive
    * width genuinely crosses it ([[scaledBandBits]] clamps at
    * [[LshPlanesExt]]; the 300× fixture reaches b=17 by data, s36's
    * measured crossing). Key bit 16 of each table comes from the
    * "ext"-seeded family ([[LshPlanesExt]]); at sf fixture scale the
    * widths here are FORCED (16 → 17) and the contract is what matters
    * at any scale:
    *
    *  - **low-bit compatibility** — every widened key's low 16 bits
    *    equal the unwidened key (n_lowbit_mismatch = 0): a standing
    *    index re-keys 16 → 17 by splitting buckets, exactly the s36
    *    split property carried across the clamp boundary, so history
    *    never re-buckets;
    *  - **candidate containment** — width-17 bucket pairs are a subset
    *    of width-16 pairs (n_containment_violations = 0): widening can
    *    only shed candidates, never surface new ones. Checked on the
    *    fixed s31 sample's ANCHORS (since round 12): the corpus-grain
    *    pair self-joins were the r11 suite's priciest entry, all
    *    diagnostic denominator, and any kernel drift that surfaces a
    *    new width-17 pair surfaces it for sampled anchors too — the
    *    same sampling argument as every recall audit;
    *  - occupancy stats per width (buckets grow, max occupancy falls).
    *
    * The engine computes both frames independently through the widened
    * [[bandIndexAtWidth]] kernel; the oracle recomputes the 16 standard
    * bits per table plus the ext bit and composes the widened key — any
    * drift in the widened kernel (wrong plane, wrong bit packing, low
    * bits disturbed) breaks the hash compare. */
  /** s38 — QUERY-DIRECTED multi-probe: Lv et al.'s actual probing
    * sequence, completing the dial family (s32's shells probe by flip
    * COUNT; this probes by MARGIN — the summed distance of the flipped
    * hyperplanes to the query, the model probability a true neighbor
    * fell just across them). Per (sampled query, table): the b
    * singleton flips score |d_r| and the C(b,2) pair flips score
    * |d_r|+|d_s|; the b CHEAPEST perturbation sets (ties by bit
    * pattern) probe alongside the exact bucket — SAME probe count as
    * shell-1 (1+b per table), but the budget buys the most probable
    * buckets instead of uniform 1-bit flips, reaching into shell 2
    * where two near-boundary planes are together more likely than one
    * far plane.
    *
    * One row per mode with the shared exact-kNN denominator AND the
    * distinct-candidate mass, so recall-per-candidate is read directly:
    * `t1_shell1` (uniform 1-bit flips) vs `q1_margin` (margin top-b).
    *
    * Measured, honestly: sf0.01 (b=7, 8 probes/(q,table)) — shell-1
    * 893333 ppm @ 7492 candidates vs margin 880000 @ 7425; the 300×
    * blow-up (b=17, 18 probes) — shell-1 166666 @ 39472 vs margin
    * 156250 @ 42196. A WASH at both widths ON THIS CORPUS: the
    * synthetic embeddings (rotations + sign masks of a sinusoid
    * family) give near-uniform hyperplane margins, so the margin rank
    * carries no signal the uniform shell lacks — exactly the readout a
    * deployment runs on ITS corpus before paying for the ordering
    * logic (Lv et al.'s gains come from concentrated natural-embedding
    * margin distributions). The operator's contract is the faithful
    * equal-budget comparison, and the pinned numbers are the
    * regression guard.
    *
    * Scale shape: margins are b dot products per (SAMPLE query, table)
    * — bounded by the fixed sample, never the corpus (the corpus-grain
    * index side stays key-arithmetic only, the s32 audit contract);
    * both probe tables broadcast; candidates dedupe before the one
    * exact-cosine attach; ranking the perturbation sets is a bounded
    * window over sample·L·(b+C(b,2)) rows. */
  def queryDirectedRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val exact = exactSampleKnn(spark, dir)
      .select(col("vec_id").as("qid"), col("nbr_id"))
    val idx = scaledBandIndex(spark, dir)
    val nb = idx.select(col("vec_id"), col("bid"), col("bkey"))
    val b = scaledBandWidth(spark, dir)
    // per-table margin array |embedding · plane_r| for r < b — the
    // literal widened plane family, query-side rows only
    val marr = (0 until AnnHubTables).map { t =>
      val entries = (0 until b).map { r =>
        val coeffs = tablePlaneSign(t, r)
          .map(s => if (s > 0) "1.0D" else "-1.0D").mkString(", ")
        s"abs(dot_product(embedding, array($coeffs)))"
      }.mkString(", ")
      s"WHEN bid = $t THEN array($entries)"
    }.mkString("CASE ", " ", " END")
    val singles = s"transform(sequence(1, $b), r -> named_struct(" +
      "'score', element_at(m, r), 'bits', shiftleft(1, r - 1)))"
    val pairs = s"flatten(transform(sequence(1, ${b - 1}), r -> " +
      s"transform(sequence(r + 1, $b), s -> named_struct(" +
      "'score', element_at(m, r) + element_at(m, s), " +
      "'bits', shiftleft(1, r - 1) + shiftleft(1, s - 1)))))"
    val perturbed = idx.filter(recallSampled(col("vec_id")))
      .withColumn("m", expr(marr))
      .selectExpr("vec_id AS qid", "bid", "bkey",
        s"inline(concat($singles, $pairs))")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"), col("bid"))
          .orderBy(col("score").asc, col("bits").asc)))
      .filter(col("rk") <= b)
      .selectExpr("qid", "bid", "cast(bkey ^ bits as int) AS pkey")
    val marginProbes = nb.filter(recallSampled(col("vec_id")))
      .selectExpr("vec_id AS qid", "bid", "bkey AS pkey")
      .unionAll(perturbed)
    val shellProbes = probeRows(nb, b, recallSampled(col("vec_id")))
      .select(col("qid"), col("bid"), col("pkey"))
    // ONE candidate join + cosine attach serves both modes (r15
    // de-looping, the grid-rewrite pattern): the two probe tables union
    // with a mode tag, candidates dedupe per (mode, pair), the ranking
    // partitions by (mode, qid) — per-mode values are identical to the
    // old two independent chains, and the plan pays one broadcast probe
    // join + one attach instead of two of each.
    import spark.implicits._
    val probes = shellProbes.withColumn("probe_mode", lit("t1_shell1"))
      .unionAll(marginProbes.withColumn("probe_mode", lit("q1_margin")))
    val cand = nb.as("i").join(broadcast(probes.as("p")),
        col("i.bid") === col("p.bid") && col("i.bkey") === col("p.pkey") &&
          col("i.vec_id") =!= col("p.qid"))
      .select(col("p.probe_mode").as("probe_mode"),
        col("p.qid").as("qid"), col("i.vec_id").as("nbr_id"))
      .distinct()
    val scored = cand
      .join(e.select(col("vec_id").as("qid"), col("embedding").as("qv"))
        .hint("SHUFFLE_HASH"), Seq("qid"))
      .join(e.select(col("vec_id").as("nbr_id"), col("embedding").as("yv"))
        .hint("SHUFFLE_HASH"), Seq("nbr_id"))
      .select(col("probe_mode"), col("qid"), col("nbr_id"),
        round(expr("cosine_sim(qv, yv)"), 6).as("cosine"))
    val modeW = Window.partitionBy(col("probe_mode"), col("qid"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val hits = scored
      .withColumn("rk", row_number().over(modeW)).filter(col("rk") <= KnnK)
      .select(col("probe_mode"), col("qid"), col("nbr_id"))
      .join(exact, Seq("qid", "nbr_id"))
      .groupBy(col("probe_mode")).agg(count(lit(1)).as("n_hits"))
    val nCand = cand.groupBy(col("probe_mode"))
      .agg(count(lit(1)).as("n_cand"))
    Seq("q1_margin", "t1_shell1").toDF("probe_mode")
      .join(nCand, Seq("probe_mode"), "left")
      .join(hits, Seq("probe_mode"), "left")
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .select(col("probe_mode"), col("n_exact"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("coalesce(n_hits, 0L) * 1000000L div n_exact").as("recall_ppm"))
      .orderBy("probe_mode")
  }

  /** s37's joined width-16/17 KEY frame, cached per (session, dir) since
    * r15. The r10 adjudication against caching here targeted the two
    * WIDE band frames (embedding payload ×2); the joined key frame that
    * replaced them (r12 verdict #8) carries no embeddings — n·L rows of
    * four ints — so holding it costs a rounding error of the resident
    * index footprint while saving the 8·(16+17) plane projection + join
    * + checkpoint per invocation (the whole cold half of s37's wall). */
  private val wideningKeysCache = caches.newCache()

  def familyWidening(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    // The two INDEPENDENT bandRowsOf invocations (the differential the
    // query exists for — plane assignment must not depend on the
    // requested width) are joined on (vec_id, bid) and checkpointed ONCE
    // as a narrow key frame: every readout branch reads the same
    // ExistingRDD (r12 verdict #8 — the sf0.1 wall was job latency,
    // not compute).
    val j = wideningKeysCache.getOrElseUpdate((spark, dir),
      bandRowsOf(emb(spark, dir), LshPlanes)
        .select(col("vec_id"), col("bid"), col("bkey"))
        .join(bandRowsOf(emb(spark, dir), LshPlanes + 1)
            .select(col("vec_id"), col("bid"), col("bkey").as("bkey_hi")),
          Seq("vec_id", "bid"))
        .localCheckpoint())
    val nlo = j.select(col("vec_id"), col("bid"), col("bkey"))
    val nhi = j.select(col("vec_id"), col("bid"), col("bkey_hi"))
    val rowsMism = j
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("bkey_hi").bitwiseAND(lit((1 << LshPlanes) - 1))
          =!= col("bkey"), 1L).otherwise(0L)).as("n_lowbit_mismatch"))
    // containment is checked on the FIXED SAMPLE's anchors (the s31
    // recall window): the corpus-grain pair self-joins were the r11
    // suite's most expensive entry, all diagnostic denominator — a
    // sampled differential keeps the guarantee (any kernel drift that
    // surfaces a new width-17 pair surfaces it for sampled anchors too,
    // the same argument as every recall audit) at probe-table cost. The
    // anchor side is query-bounded (≤ RecallSampleN·L rows), so it
    // broadcasts; the corpus frame never self-joins.
    // both pair sets are sample-bounded (≤ anchors × L × occupancy) —
    // collected raw and diffed on the driver: the distinct + anti-join
    // chain cost ~9 AQE stage jobs for a result the driver holds in a
    // Set (the job-latency half of the r12 verdict #8 fix)
    def pairsOf(nb: DataFrame, key: String): Set[(Long, Long)] =
      nb.as("b").join(
          broadcast(nb.filter(recallSampled(col("vec_id")))
            .select(col("vec_id").as("x"), col("bid").as("abid"),
              col(key).as("akey"))),
          col("abid") === col("b.bid") &&
            col("akey") === col(s"b.$key") &&
            col("x") =!= col("b.vec_id"))
        .select(col("x"), col("b.vec_id").as("y"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // EAGER driver-assembled readout (r12 verdict #8): the previous
    // one-mega-plan crossJoin materialized ~15 AQE stage jobs for a
    // 1-row result — at sf0.1 the wall was pure job latency. Three
    // bounded collects (mismatch agg, one stacked bucket-stats pass
    // covering BOTH widths, the sampled containment count) off the
    // shared key checkpoint, then a driver-built row.
    // the four readout actions are independent reads of one
    // checkpoint — run them CONCURRENTLY (the Spark scheduler
    // interleaves jobs); serialized they cost ~14 × ~300 ms of pure
    // stage latency at sf0.1, which was the whole r12 bench-tail nit.
    // j is a shared (session, dir) cache — DirCaches owns the blocks.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.DurationInt
    import scala.concurrent.ExecutionContext.Implicits.global
    val fMism = Future(rowsMism.collect()(0))
    val fBs = Future(j.selectExpr("'lo' AS w", "bid", "bkey AS k")
      .unionAll(j.selectExpr("'hi' AS w", "bid", "bkey_hi AS k"))
      .groupBy(col("w"), col("bid"), col("k"))
      .agg(count(lit(1)).as("occ"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_buckets"), max(col("occ")).as("max_occ"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap)
    val fHi = Future(pairsOf(nhi, "bkey_hi"))
    val fLo = Future(pairsOf(nlo, "bkey"))
    val mism = Await.result(fMism, 30.minutes)
    val bs = Await.result(fBs, 30.minutes)
    val nViol =
      (Await.result(fHi, 30.minutes) -- Await.result(fLo, 30.minutes))
        .size.toLong
    import spark.implicits._
    Seq((LshPlanes.toLong, (LshPlanes + 1).toLong, mism.getLong(0),
        bs("lo")._1, bs("lo")._2, bs("hi")._1, bs("hi")._2,
        mism.getLong(1), nViol))
      .toDF("b_lo", "b_hi", "n_rows", "n_buckets_lo", "max_occ_lo",
        "n_buckets_hi", "max_occ_hi", "n_lowbit_mismatch",
        "n_containment_violations")
      .orderBy("b_lo")
  }

  /** s27 — dominant principal direction via power iteration: three
    * matrix-free rounds of `v ← normalize(Σ_x (x·v)·x)` over the
    * micro-quantized embedding matrix, starting from the all-ones
    * vector — the top-eigenvector readout (which single direction
    * carries the anisotropy s23 detects per-dim) that decides whether a
    * corpus needs mean-removal/whitening before ANN indexing (the
    * "common discourse vector" of Arora et al.; dense retrieval quality
    * drops when one direction dominates every cosine).
    *
    * Exact integer arithmetic end-to-end: per-vector dots fold 64
    * micro×micro products in int64 (≤ 6.4e13), per-dim re-projections
    * sum in decimal(38,0), and each round renormalizes to micro units by
    * the max |component| with truncating division — so all three rounds
    * are bit-identical on both engines and the oracle unrolls the same
    * three rounds in SQL. Per round the cluster ships the driver exactly
    * [[PowerDim]] integers (the new v) — the s20 literal-centroid
    * discipline; the corpus is scanned once per round, no shuffle beyond
    * the 64-column aggregate. */
  val PowerDim = 64
  val PowerRounds = 3
  /** The once-per-query quantized matrix — materialized so every round
    * is a pure streaming aggregate over the checkpointed blocks instead
    * of a fresh scan + re-quantization per round. Exposed for the plan
    * audit. */
  /** The quantized matrix is a (session, dir) cache since r15: s27's
    * BSP rounds are inherently sequential 1-row jobs, but the
    * quantization pass + checkpoint was rebuilt and released per
    * invocation for no reason (the frame is a pure function of the
    * corpus). */
  private val powerQuantCache = caches.newCache()
  private[graft] def powerQuantized(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    powerQuantCache.getOrElseUpdate((spark, dir),
      emb(spark, dir).select(expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1000000.0D, 0) as bigint))")
        .as("xm"))
        .localCheckpoint())
  }

  /** One power-iteration round over the checkpointed matrix as a plain
    * primitive-loop partial aggregation (r16, the RankOps pattern): per
    * partition, accumulate the 64 re-projection sums as hi/mid/lo LONG
    * components split at 2^21 boundaries, ship P×3×64 longs to the
    * driver, and reconstruct the exact sums in BigInteger.
    *
    * Why not SQL: the 64-column decimal(38,0) aggregate serialized a
    * BigDecimal into the unsafe aggregation buffer per row per
    * dimension (~128 µs/row — the round's entire CPU), the dot product
    * via `aggregate(zip_with(...))` is CodegenFallback (an interpreted
    * lambda + a 64-slot array per row), splitting the sums into 3×64
    * LONG aggregate columns trips the 100-field whole-stage-codegen
    * limit into interpreted eval, and the per-round literal direction
    * vector made every generated source unique so nothing amortized
    * across the 303-query bench (all four measured this round: 1.6 s →
    * 2.6 s variants). A hand-written while-loop over the cached
    * UnsafeRow blocks does the same 64 multiplies + 192 adds per row
    * in ~1 µs with NO per-round analysis, optimization or codegen.
    *
    * Exactness: d = ⌊Σ x_k·v_k / 1e6⌋ in long (|Σ| ≤ 6.4e13, exact;
    * Java `/` truncates toward zero exactly like Spark `div` and DuckDB
    * `//`). p = d·x_k ≤ 6.4e13 is exact in long, and p =
    * (p/2^42)·2^42 + ((p/2^21)%2^21)·2^21 + (p%2^21) is the truncating
    * div/% identity (negative-safe: remainder carries the dividend's
    * sign). Components sum independently — |Σlo|,|Σmid| ≤ 2^21·rows and
    * |Σhi| ≤ 15·rows stay in long headroom to ~4.4e12 rows per
    * PARTITION — and reconstruction is linear, so the BigInteger
    * recombine is the same integer as a direct per-row sum at any
    * corpus size. */
  private[graft] def powerRoundExact(
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      v: IndexedSeq[java.math.BigInteger]): IndexedSeq[java.math.BigInteger] = {
    val dim = PowerDim
    val vArr = v.map(_.longValueExact()).toArray
    val parts = rdd.mapPartitions { it =>
      val hi = new Array[Long](dim)
      val mid = new Array[Long](dim)
      val lo = new Array[Long](dim)
      it.foreach { r =>
        if (!r.isNullAt(0)) {
          val x = r.getArray(0).toLongArray()
          if (x.length == dim) {
            var dAcc = 0L
            var k = 0
            while (k < dim) { dAcc += x(k) * vArr(k); k += 1 }
            val d = dAcc / 1000000L
            k = 0
            while (k < dim) {
              val p = d * x(k)
              hi(k) += p / 4398046511104L
              mid(k) += (p / 2097152L) % 2097152L
              lo(k) += p % 2097152L
              k += 1
            }
          }
        }
      }
      Iterator((hi, mid, lo))
    }.collect()
    (0 until dim).map { k =>
      parts.foldLeft(java.math.BigInteger.ZERO) { case (acc, (h, m, l)) =>
        acc.add(java.math.BigInteger.valueOf(h(k)).shiftLeft(42))
          .add(java.math.BigInteger.valueOf(m(k)).shiftLeft(21))
          .add(java.math.BigInteger.valueOf(l(k)))
      }
    }
  }

  def powerIteration(spark: SparkSession, dir: String): DataFrame = {
    val xm = powerQuantized(spark, dir)
    // ONE InternalRow handle on the checkpointed blocks serves all
    // rounds (each round is one collect job of P×192 longs — no SQL
    // plan, no shuffle; the blocks are already cached by the shared
    // (session, dir) checkpoint, which DirCaches releases on dir
    // eviction / teardown, never a consumer).
    val rdd = org.apache.spark.sql.GraftInternalRowShim.toInternalRdd(xm)
    var v: IndexedSeq[java.math.BigInteger] =
      IndexedSeq.fill(PowerDim)(java.math.BigInteger.valueOf(1000000L))
    for (_ <- 1 to PowerRounds) {
      val raw = powerRoundExact(rdd, v)
      val maxAbs = raw.map(_.abs).max.max(java.math.BigInteger.ONE)
      // BigInteger.divide truncates toward zero — the Spark `div` /
      // DuckDB `//` convention, so the oracle's renormalize matches.
      v = raw.map(_.multiply(java.math.BigInteger.valueOf(1000000L)).divide(maxAbs))
    }
    import spark.implicits._
    v.zipWithIndex
      .map { case (b, k) => ((k + 1).toLong, b.longValueExact()) }
      .toDF("dim", "v_micro")
      .orderBy("dim")
  }

  /** s28 — Matryoshka truncation audit: recall@[[MatryoshkaK]] of
    * nearest-neighbor search run on only the FIRST 8/16/32 embedding
    * dimensions, against the full-width ranking — the measurement that
    * decides whether a corpus can ship truncated vectors (Matryoshka
    * representation learning; 4× storage and bandwidth back if
    * recall@10 holds at d/4). Per budget: query count and mean recall
    * in exact ppm (overlap counts are integers; the mean is
    * `Σoverlap · 1e6 div (k · n_q)`).
    *
    * Brute-force by construction — the point is measuring the
    * truncation, not the index, so every budget scores the same
    * query × corpus frame (the s9 recall-audit discipline: the query
    * set broadcasts, candidates rank through the bounded
    * WindowGroupLimit heap, never a global sort). At deployment scale
    * two knobs change, neither the shape: the query set becomes a
    * FIXED-SIZE stratified sample (p1's machinery — the %97 filter is
    * deterministic for the fixture but grows with the corpus), and the
    * scored pairs come from the s4/s5 ANN candidates instead of the
    * full cross. */
  val MatryoshkaBudgets: Seq[Int] = Seq(8, 16, 32)
  val MatryoshkaK = 10
  def matryoshkaRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    caches.evictOtherDirs(spark, dir)
    val e = emb(spark, dir).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val budgets = (MatryoshkaBudgets :+ 64).map(b => s"$b").mkString("array(", ", ", ")")
    val scored = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), col("embedding"), col("qv"),
        explode(expr(budgets)).as("budget"))
      .withColumn("cos", round(expr(
        "cosine_sim(slice(embedding, 1, budget), slice(qv, 1, budget))"), 6))
    // the final plan reads this frame TWICE (the budget-64 baseline and
    // the truncated-budget overlap probe) — without the checkpoint the
    // 4×corpus×queries scoring cross and its windows plan in duplicate;
    // the materialized frame is queries × budgets × k rows, cached under
    // the module's eviction/teardown discipline (the s29 lesson)
    val top = matryoshkaTopCache.getOrElseUpdate((spark, dir), scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"), col("budget"))
          .orderBy(col("cos").desc, col("vec_id").asc)))
      .filter(col("rk") <= MatryoshkaK)
      .select(col("qid"), col("vec_id"), col("budget"))
      .localCheckpoint())
    val full = top.filter(col("budget") === 64)
      .select(col("qid"), col("vec_id"))
    // denominator = ALL sampled queries, counted from the QUERY frame
    // itself — not from the top-k frame, which only sees queries with
    // ≥1 candidate and would diverge from the oracle's `count(*) FROM q`
    // on a degenerate corpus (e.g. a 1-vector fixture where the sole
    // query has no neighbors). One cheap filtered scan, lazy via the
    // 1-row cross join.
    val nqF = q.agg(count(lit(1)).as("n_queries"))
    val overlap = top.filter(col("budget") =!= 64)
      .join(full, Seq("qid", "vec_id"), "left_semi")
      .groupBy(col("budget"))
      .agg(count(lit(1)).as("n_overlap"))
    import spark.implicits._
    MatryoshkaBudgets.toDF("budget")
      .join(overlap, Seq("budget"), "left")
      .crossJoin(broadcast(nqF))
      .select(col("budget").cast("long").as("dim_budget"),
        col("n_queries"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      // greatest(·, 1): an empty query sample divides 0 by 1 and reports
      // zero recall instead of throwing ANSI DIVIDE_BY_ZERO (the s29
      // guard, expression-side)
      .withColumn("recall_ppm", expr(
        s"n_overlap * 1000000L div greatest(n_queries * $MatryoshkaK, 1L)"))
      .orderBy("dim_budget")
  }

  /** s29 — binary (sign-bit) embedding compression audit: pack each
    * 64-dim vector into ONE BIGINT of sign bits, rank neighbors by
    * Hamming distance (`bit_count(xor)` — one codegen'd instruction per
    * comparison vs 64 multiply-adds), and report recall@[[MatryoshkaK]]
    * against the exact-cosine ranking plus the mean Hamming distance of
    * the true top-k. The 64×-compression end of the quantization
    * spectrum (s7 int8 → s8 PQ → s28 truncation → here 1 bit/dim), and
    * the sign-random-projection theory says E[hamming] ∝ angle — so
    * this is also the cheapest possible first-pass filter before exact
    * re-scoring.
    *
    * Bit packing uses OR of shifted bits (never `+` — bit 63 is
    * Long.MinValue and an additive pack would overflow ANSI arithmetic);
    * ties rank by vec_id. Same brute-force audit shape — and the same
    * two scale knobs — as s28: fixed-size sampled queries + ANN
    * candidates at deployment scale; broadcast queries + bounded
    * per-key heaps either way. */
  def binaryHamming(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val packed = emb(spark, dir).select(col("vec_id"), col("embedding"),
      expr("aggregate(sequence(0, 63), 0L, (acc, k) -> " +
        "acc | IF(embedding[k] > cast(0.0 as float), shiftleft(1L, k), 0L))").as("bits"))
    val q = packed.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bits").as("qbits"))
    // scored once, read by both rankings (and the final aggregate is the
    // ONLY action over them — three separate count()/head() actions each
    // re-ran the join + windows, 21 jobs -> 6)
    val joined = packed.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        expr("bit_count(bits ^ qbits)").cast("long").as("hamming"),
        round(expr("cosine_sim(embedding, qv)"), 6).as("cos"))
      .localCheckpoint()
    def topk(order: Seq[org.apache.spark.sql.Column]) = joined
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(order: _*)))
      .filter(col("rk") <= MatryoshkaK)
      .select(col("qid"), col("vec_id"), col("hamming"))
    val ham = topk(Seq(col("hamming").asc, col("vec_id").asc))
    val exact = topk(Seq(col("cos").desc, col("vec_id").asc))
    val row = exact
      .join(ham.select(col("qid"), col("vec_id"), lit(1L).as("in_ham")),
        Seq("qid", "vec_id"), "left")
      .agg(countDistinct(col("qid")).as("nq"),
        sum(coalesce(col("in_ham"), lit(0L))).as("ov"),
        expr("sum(hamming * 1000000L) div count(1)").as("mh"))
      .head()
    graft.CheckpointUtil.release(joined)
    // empty query sample (no vec_id % 97 hit, or a 1-vector corpus):
    // degrade to the zero row instead of a null-unbox/div-by-zero crash
    val nq = if (row.isNullAt(0)) 0L else row.getLong(0)
    val (overlap, meanHamMicro) =
      if (nq == 0L) (0L, 0L)
      else (row.getLong(1), if (row.isNullAt(2)) 0L else row.getLong(2))
    import spark.implicits._
    Seq((nq, overlap,
        if (nq == 0L) 0L else overlap * 1000000L / (nq * MatryoshkaK),
        meanHamMicro))
      .toDF("n_queries", "n_overlap", "recall_ppm", "true_topk_mean_hamming_micro")
  }

  /** s39 — ONE NN-DESCENT refinement round over the s30 LSH kNN graph
    * (Dong, Charikar & Li, "Efficient k-nearest neighbor graph
    * construction for generic similarity measures", WWW'11): a kNN
    * graph improves itself by scoring each vertex's
    * neighbors-of-neighbors — no index, no extra probes, just the
    * graph's own local closure. G0 = the adaptive-band candidate graph
    * (s30's top-[[KnnK]] per vector, ties (cosine@6dp desc, id asc));
    * the pivot neighborhood B(v) is G0's out-edges unioned with
    * in-edges CAPPED at [[KnnK]] per vertex (the paper's reverse
    * sample ρ·K — without the cap a hub's in-degree makes its pivot
    * join quadratic in its popularity); candidates are all (u, w)
    * co-members of any B(v), u ≠ w, unioned with G0's own edges so
    * re-selection runs over a SUPERSET of the old candidate set —
    * with the same total order shared by selection and truth, recall
    * is monotone (G1 ≥ G0, the ExtSpec invariant). One row per stage
    * against the s31 fixed-sample exact denominator: the measured
    * claim is the recall LIFT one descent round buys at candidate
    * mass Σ_v |B(v)|² ≤ 4·K²·n — LINEAR in the corpus for constant K,
    * the property that makes NN-descent the standard index-free
    * kNN-graph builder at corpus scale.
    *
    * Scale shape: every join is a hash equi-join on vec ids over
    * NARROW id-pair frames (embeddings attach only at the two scoring
    * points through [[attachCosine]]'s twice-per-pair discipline); the
    * n·K-row G0 is localCheckpointed once and read three times; the
    * exact denominator rides the fixed 32-query broadcast sample,
    * never all-pairs. */
  /** The (G0, G1) graph pair under s39 — factored so the PlanAuditSpec
    * can audit the join shapes without the readout's 1-row crossJoins
    * (which legitimately plan as nested-loop over singleton frames). */
  private def descentTopW = {
    import org.apache.spark.sql.expressions.Window
    Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
  }

  /** One NN-descent round as a pure graph transform: input and output
    * are (vec_id, nbr_id, cosine) top-[[KnnK]] frames. Factored so the
    * convergence loop ([[nnDescentConverged]]) iterates the SAME kernel
    * the s39 oracle query checks once. */
  private def descentRound(spark: SparkSession, dir: String,
      g: DataFrame): DataFrame = {
    val revCapped = g
      .select(col("nbr_id").as("vec_id"), col("vec_id").as("nbr_id"),
        col("cosine"))
      .withColumn("rk", row_number().over(descentTopW))
      .filter(col("rk") <= KnnK)
      .select(col("vec_id"), col("nbr_id"))
    val b = g.select(col("vec_id"), col("nbr_id")).union(revCapped).distinct()
    val cand = b.as("x").join(b.as("y"),
        col("x.vec_id") === col("y.vec_id") &&
          col("x.nbr_id") =!= col("y.nbr_id"))
      .select(col("x.nbr_id").as("vec_id"), col("y.nbr_id").as("nbr_id"))
      .union(g.select(col("vec_id"), col("nbr_id")))
      .distinct()
    attachCosine(spark, dir, cand)
      .withColumn("rk", row_number().over(descentTopW))
      .filter(col("rk") <= KnnK)
      .select(col("vec_id"), col("nbr_id"), col("cosine"))
  }

  /** The s39 base graph: the s30 adaptive-band candidate top-K, with
    * cosine carried for the reverse-cap ranking. */
  private def descentBase(spark: SparkSession, dir: String): DataFrame =
    attachCosine(spark, dir, scaledCandPairsFull(spark, dir))
      .withColumn("rk", row_number().over(descentTopW))
      .filter(col("rk") <= KnnK)
      .select(col("vec_id"), col("nbr_id"), col("cosine"))

  /** The s39 base graph, checkpointed under the module caches (s39 and
    * d34 both consume it; routing through [[DirCaches]] means the
    * blocks are released on dir eviction / teardown instead of leaking
    * for the life of the sweep — the r12 ADVICE fix). */
  private val descentBaseCache = caches.newCache()
  private def descentBaseCached(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    descentBaseCache.getOrElseUpdate((spark, dir),
      descentBase(spark, dir).localCheckpoint())
  }

  /** One descent round over the cached base graph, itself checkpointed
    * per (session, dir) — s39's g1 row and d34's t2 candidate tier both
    * consume exactly this frame (r15: each used to re-run the 2-hop
    * closure + top-K re-selection per invocation). */
  private val descentRoundCache = caches.newCache()
  /** The round's LAZY plan over the cached base — the plan audit
    * inspects this (the cached frame itself is an ExistingRDD). */
  private[graft] def descentRoundLazy(spark: SparkSession, dir: String): DataFrame =
    descentRound(spark, dir, descentBaseCached(spark, dir))

  private def descentRoundCached(spark: SparkSession, dir: String): DataFrame = {
    evictOtherDirs(spark, dir)
    descentRoundCache.getOrElseUpdate((spark, dir),
      descentRoundLazy(spark, dir).localCheckpoint())
  }

  private[graft] def nnDescentGraphs(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val g0 = descentBaseCached(spark, dir)
    (g0.select(col("vec_id"), col("nbr_id")),
      descentRoundCached(spark, dir).select(col("vec_id"), col("nbr_id")))
  }

  /** NN-DESCENT TO ITS FIXED POINT — the production form of s39 (Dong
    * et al. §3 terminate when updates fall below δ·K·n; δ = 0 here, the
    * exact fixed point): iterate [[descentRound]] until a round changes
    * no edge, emitting one row per round with the edge delta and the
    * fixed-sample recall. Termination is guaranteed, not hoped: each
    * vertex's top-K list only ever improves under the shared total
    * order (re-selection is over a superset that includes the current
    * list), the order is total and the corpus finite, so list states
    * form a finite lattice with no cycles — every round either strictly
    * improves some list or changes nothing and the loop stops.
    *
    * BSP discipline: graph state stays an n·K-row localCheckpointed
    * frame (the previous round's checkpoint released as soon as its
    * successor materializes); per round exactly TWO scalars cross the
    * driver (the except() delta and the recall hit count). Not
    * registered as an oracle query by the convergence-dependent-rounds
    * convention (the same call the r12 evict-replay note documents):
    * the round COUNT is a fixed point of float-free integer selection
    * and would be stable, but a DuckDB twin would need the loop
    * unrolled to an unknown depth — s39 pins one round exactly, the
    * ExtSpec pins the loop's contracts (monotone recall, vanishing
    * delta, fixed point reached). */
  def nnDescentConverged(spark: SparkSession, dir: String,
      maxRounds: Int = 8, baseCap: Option[Int] = None): DataFrame = {
    val exact = exactSampleKnn(spark, dir)
    var g = baseCap.map(descentBaseCapped(spark, dir, _))
      .getOrElse(descentBase(spark, dir)).localCheckpoint()
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    var round = 0
    var changed = -1L
    while (round <= maxRounds && changed != 0L) {
      val ids = g.select(col("vec_id"), col("nbr_id"))
      val hits = exact.join(ids, Seq("vec_id", "nbr_id")).count()
      val next = if (round == maxRounds) null
        else descentRound(spark, dir, g).localCheckpoint()
      // n_new_edges = -1 marks "round cap reached, delta not measured" —
      // distinct from a true fixed point's 0 (the capped-base loop at
      // 100k clustered hit the cap still converging; a 0 there would
      // have read as convergence)
      changed = if (next == null) -1L
        else next.select(col("vec_id"), col("nbr_id")).except(ids).count()
      rows += ((round, g.count(), hits, changed))
      if (next != null) { graft.CheckpointUtil.release(g); g = next }
      round += 1
      if (changed < 0L) changed = 0L
    }
    graft.CheckpointUtil.release(g)
    import spark.implicits._
    val ex = exact.count()
    // empty recall sample → ppm denominator degrades to the d32
    // greatest(n, 1) discipline instead of ArithmeticException (the
    // registered queries' SQL `div` already degrades gracefully)
    val exDen = math.max(ex, 1L)
    rows.toSeq.map { case (r, e, h, c) =>
      (r.toLong, e, ex, h, h * 1000000L / exDen, c) }
      .toDF("round", "n_edges", "n_exact", "n_hits", "recall_ppm",
        "n_new_edges")
      .orderBy("round")
  }

  def nnDescent(spark: SparkSession, dir: String): DataFrame = {
    // g0 and g1 both ride module caches now (descentRoundCached); the
    // readout is ONE action (r15 de-looping): both stages' edge counts,
    // hit counts and the shared denominator ride one union plan instead
    // of five sequential driver jobs.
    val (g0, g1) = nnDescentGraphs(spark, dir)
    val exact = exactSampleKnn(spark, dir)
    def stageRow(name: String, g: DataFrame) =
      g.agg(count(lit(1)).as("n_edges"))
        .crossJoin(exact.join(g, Seq("vec_id", "nbr_id"))
          .agg(count(lit(1)).as("n_hits")))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .select(lit(name).as("stage"), col("n_edges"), col("n_exact"),
          col("n_hits"),
          expr("n_hits * 1000000L div greatest(n_exact, 1L)")
            .as("recall_ppm"))
    materializeBounded(
      stageRow("g0_lsh", g0).unionAll(stageRow("g1_descent", g1)),
      Seq("stage"))
  }

  /** The s40 cap settings: the streaming operators' default-scale cap,
    * a generous tier, and the uncapped baseline. */
  val BucketCapSweep = Seq(8, 32)

  /** s40 — OCCUPANCY-CAPPED candidate generation: the batch form of the
    * streaming ANN operators' `maxBucket` dial, measured. The 100k
    * planted-cluster corpus showed the cost term the mean-occupancy
    * dial cannot touch: cluster members agree on most hyperplanes, pile
    * into the same buckets, and the candidate self-join's Σ n_k² grows
    * with cluster size² (5× corpus → ~16× wall for s39's base graph).
    * The standard LSH answer is a per-bucket cap — keep a bounded
    * resident set per (table, key), trade recall for a HARD bound
    * Σ min(n_k, cap)² ≤ cap · Σ n_k = cap · n·L on join mass. Kept
    * residents are the cap LOWEST vec_ids per bucket (deterministic,
    * shared with the oracle; in the streaming twin the analogous rule
    * is first-arrival admission). One row per cap ∈ {8, 32, ∞}: index
    * rows, corpus-wide distinct undirected candidate-pair mass (the
    * quantity skew blows up), and recall@[[KnnK]] on the fixed exact
    * sample — the skew-vs-recall frontier a deployment reads before
    * turning the cap on its own corpus. */
  def bucketCapSweep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val nb = scaledBandIndex(spark, dir)
      .select(col("vec_id"), col("bid"), col("bkey"))
    val exact = exactSampleKnn(spark, dir)
    val sweep = BucketCapSweep.map(c => (f"cap_$c%02d", c.toLong)) :+
      ("uncapped", Long.MaxValue)
    // ONE occupancy-rank-tagged self-join serves every cap (r15
    // optimization; the same nested-index argument as
    // [[rankTaggedScored]]): a pair belongs to cap c iff SOME shared
    // bucket holds both members at rank ≤ c, i.e. its qualifier
    // q = min over buckets of max(rank_a, rank_b) is ≤ c. The old form
    // ran the bucket self-join once per cap (the UNCAPPED Σ n_k² join
    // plus two capped ones) with a checkpoint + eager 1-row collect
    // each — this runs the uncapped join ONCE and derives all three
    // rows from the tagged pair set in one lazy plan.
    val idx = nb.withColumn("occ_rk", row_number().over(
      Window.partitionBy(col("bid"), col("bkey")).orderBy(col("vec_id"))))
    val und = idx.as("a").join(idx.as("b"),
        col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"),
        greatest(col("a.occ_rk"), col("b.occ_rk")).cast("long").as("qr"))
      .groupBy(col("vec_id"), col("nbr_id"))
      .agg(min(col("qr")).as("q"))
    // pair mass + index rows per cap, each from one aggregate pass
    def capAgg(c: Column, name: String) =
      sweep.map { case (label, cap) =>
        sum(when(c <= cap, 1L).otherwise(0L)).as(s"${name}_$label") }
    val pairCols = capAgg(col("q"), "pairs")
    val massRow = und.agg(pairCols.head, pairCols.tail: _*)
    val rowCols = capAgg(col("occ_rk").cast("long"), "rows")
    val idxRow = idx.agg(rowCols.head, rowCols.tail: _*)
    // recall branch: score each directed sampled pair once, then explode
    // it into the caps whose qualifier admits it and rank per (cap, query)
    val dirPairs = und.select(col("vec_id"), col("nbr_id"), col("q"))
      .union(und.select(col("nbr_id").as("vec_id"),
        col("vec_id").as("nbr_id"), col("q")))
      .filter(recallSampled(col("vec_id")))
    val ev = emb(spark, dir).select(col("vec_id"), col("embedding"))
    val capEntries = sweep.map { case (label, cap) =>
      s"CASE WHEN q <= ${cap}L THEN '$label' END" }.mkString(", ")
    val scored = dirPairs
      .join(ev.select(col("vec_id"), col("embedding").as("xv"))
        .hint("SHUFFLE_HASH"), Seq("vec_id"))
      .join(ev.select(col("vec_id").as("nbr_id"), col("embedding").as("yv"))
        .hint("SHUFFLE_HASH"), Seq("nbr_id"))
      .select(col("vec_id"), col("nbr_id"),
        round(expr("cosine_sim(xv, yv)"), 6).as("cosine"),
        explode(expr(s"filter(array($capEntries), x -> x IS NOT NULL)"))
          .as("cap"))
    val capW = Window.partitionBy(col("cap"), col("vec_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val hits = scored
      .withColumn("rk", row_number().over(capW)).filter(col("rk") <= KnnK)
      .select(col("cap"), col("vec_id"), col("nbr_id"))
      .join(exact, Seq("vec_id", "nbr_id"))
      .groupBy(col("cap")).agg(count(lit(1)).as("n_hits"))
    val spine = sweep.map(_._1).toDF("cap")
    val capCase = (name: String) => expr(
      sweep.map { case (label, _) =>
        s"WHEN cap = '$label' THEN ${name}_$label" }
        .mkString("CASE ", " ", " END"))
    spine
      .crossJoin(idxRow)
      .crossJoin(massRow.select(sweep.map { case (l, _) =>
        col(s"pairs_$l") }: _*))
      .join(hits, Seq("cap"), "left")
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .select(col("cap"),
        capCase("rows").as("n_index_rows"),
        capCase("pairs").as("n_cand_pairs"),
        col("n_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        // recall_ppm degraded to 0 on an empty corpus, like the old
        // driver-side isNullAt guard
        coalesce(expr("n_hits * 1000000L div n_exact"), lit(0L))
          .as("recall_ppm"))
      .orderBy("cap")
  }

  /** s41 — the CAP × PROBE-DEPTH operating grid: the composition s40's
    * own Scaladoc prescribes ("a cap for the worst-case mass bound plus
    * multi-probe to buy recall back"), measured as one table. Per cell
    * (cap ∈ [[BucketCapSweep]] × Hamming probe depth ∈ {0, 1, 2}): the
    * sampled queries probe the CAPPED index through [[probeRows]]'s
    * XOR shells — the query's own keys come from its full band rows
    * (an arriving query always knows its own keys; the cap governs only
    * which residents the INDEX retained) — and the readout is candidate
    * mass + recall@[[KnnK]] against the fixed exact sample. This is the
    * operating-point table a deployment reads to pick (cap, depth): the
    * cap's hard Σ min(n_k,cap)² join-mass bound is bought back recall-
    * wise by probing neighboring buckets, whose cost is probe-side
    * (linear in queries), not index-side (the skew term). The knee on
    * each corpus: the smallest cell whose recall clears target.
    *
    * Scale shape: probe table is |sample|·L·(1+b+C(b,2)) rows —
    * corpus-size-independent — BROADCAST against the capped index
    * (which only ever shrinks under the cap); per-cap scored frames
    * are checkpointed once, read by all three depth cuts, and released
    * after the 1-row-per-cell readout lands on the driver. */
  /** Per-cap cell-membership columns over the rank-tagged probe join —
    * the shared kernel under s41/s42 (r15 optimization). The capped
    * indexes of a sweep are NESTED (cap lowest vec_ids per bucket:
    * rank ≤ 8 ⊂ rank ≤ 32), so ONE probe join against the max-cap index
    * carrying the occupancy rank yields every cell: a (query, resident)
    * collision belongs to cap c iff the resident's rank in that bucket
    * is ≤ c, and the cell's probe shell is min(pidx) over the qualifying
    * collisions — `mp_c = min(pidx) FILTER (occ_rk ≤ c)` per cap, one
    * aggregation. The old form re-joined the corpus once per cap and
    * counted each cell in its own driver action (6 actions + 2
    * checkpoints per grid; at 100 TB, |caps| full probe joins instead
    * of one). Yields one row per (qid, nbr_id) with a `cells` array of
    * (cap, mp) — null-mp caps filtered out. */
  private def rankTaggedScored(spark: SparkSession, dir: String,
      probes: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = emb(spark, dir)
    val nb = scaledBandIndex(spark, dir)
      .select(col("vec_id"), col("bid"), col("bkey"))
    val maxCap = BucketCapSweep.max
    val idx = nb.withColumn("occ_rk", row_number().over(
        Window.partitionBy(col("bid"), col("bkey")).orderBy(col("vec_id"))))
      .filter(col("occ_rk") <= maxCap)
    val mpCols = BucketCapSweep.map(c =>
      min(when(col("occ_rk") <= c, col("p.pidx"))).as(f"mp_$c%02d"))
    val cellEntries = BucketCapSweep.map(c =>
      f"named_struct('cap', 'cap_$c%02d', 'mp', mp_$c%02d)").mkString(", ")
    idx.as("i").join(broadcast(probes.as("p")),
        col("i.bid") === col("p.bid") && col("i.bkey") === col("p.pkey") &&
          col("i.vec_id") =!= col("p.qid"))
      .groupBy(col("p.qid").as("qid"), col("i.vec_id").as("nbr_id"))
      .agg(mpCols.head, mpCols.tail: _*)
      .join(e.select(col("vec_id").as("qid"), col("embedding").as("qv")),
        "qid")
      .join(e.select(col("vec_id").as("nbr_id"), col("embedding").as("yv")),
        "nbr_id")
      .select(col("qid"), col("nbr_id"),
        round(expr("cosine_sim(qv, yv)"), 6).as("cosine"),
        expr(s"filter(array($cellEntries), x -> x.mp IS NOT NULL)")
          .as("cells"))
  }

  /** The complete (cap × depth) cell spine — grid rows must exist even
    * for empty cells, exactly like the old per-cell driver loop. */
  private def gridSpine(spark: SparkSession): DataFrame = {
    import spark.implicits._
    BucketCapSweep.flatMap(c => (0 to 2).map(d => (f"cap_$c%02d", s"d$d")))
      .toDF("cap", "probe_depth")
  }

  def capProbeGrid(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val exact = exactSampleKnn(spark, dir).withColumnRenamed("vec_id", "qid")
    val nb = scaledBandIndex(spark, dir)
      .select(col("vec_id"), col("bid"), col("bkey"))
    val b = scaledBandWidth(spark, dir)
    val probes = probeRows(nb, b, recallSampled(col("vec_id")), depth = 2)
    // one row per (cap, depth, qid, nbr_id): a pair enters every cell
    // whose cap admits it at a shell ≤ the cell's depth
    val cells = rankTaggedScored(spark, dir, probes)
      .select(col("qid"), col("nbr_id"), col("cosine"),
        explode(col("cells")).as("c"))
      .select(col("qid"), col("nbr_id"), col("cosine"),
        col("c.cap").as("cap"),
        explode(expr("sequence(c.mp, 2)")).as("d"))
      .withColumn("probe_depth", concat(lit("d"), col("d")))
    val nCand = cells.groupBy(col("cap"), col("probe_depth"))
      .agg(count(lit(1)).as("n_cand"))
    val topW = Window.partitionBy(col("cap"), col("probe_depth"), col("qid"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    val hits = cells
      .withColumn("rk", row_number().over(topW)).filter(col("rk") <= KnnK)
      .select(col("cap"), col("probe_depth"), col("qid"), col("nbr_id"))
      .join(exact, Seq("qid", "nbr_id"))
      .groupBy(col("cap"), col("probe_depth"))
      .agg(count(lit(1)).as("n_hits"))
    gridSpine(spark)
      .join(nCand, Seq("cap", "probe_depth"), "left")
      .join(hits, Seq("cap", "probe_depth"), "left")
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .select(col("cap"), col("probe_depth"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"), col("n_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("coalesce(n_hits, 0L) * 1000000L div greatest(n_exact, 1L)")
          .as("recall_ppm"))
      .orderBy("cap", "probe_depth")
  }

  /** s42 — DUPLICATE-COLLAPSED retrieval recall grid (r14 verdict #2):
    * s41's cap × probe-depth cells re-scored through the lens the
    * retrieval consumers (s1/s10/s17/s24) actually need on power-law
    * corpora. The s41 readout collapses under skew (zipf-500k: 552,083
    * ppm at the production cell) because exact-kNN truth among 105k
    * near-identical siblings measures "did you fetch these three
    * PARTICULAR copies", not "did you find the content" — when a
    * duplicate cluster is bigger than k, any correct retrieval of the
    * cluster's content scores arbitrarily against one member triple.
    *
    * The fix: collapse the corpus to d31's duplicate components first
    * (the PRODUCTION dedup lens — the collapse can never drift from
    * the operator that ships keep/drop decisions, and the shared
    * [[duckMpComponents]] oracle chain pins that). Truth per sampled
    * query = the top-[[KnnK]] COMPONENTS ranked by best-member cosine
    * (rounded, ties → min component), the query's OWN component
    * excluded — its members are the query's duplicates, and "did you
    * retrieve yourself" is not the retrieval question. A cell's found
    * set is the same collapse + ranking over its candidate set; recall
    * = component overlap. A duplicate cluster of any size is ONE
    * ranked unit, so the metric no longer decays with head size —
    * the skew-honest number the s41 grid cannot produce.
    *
    * Scale shape: rides s41's machinery exactly — the probe table is
    * |sample|·L·(1+b+C(b,2)) rows (corpus-size-independent, broadcast
    * against the capped index), the component frame is one row per
    * vector (the d31 labels, checkpointed once and released), and the
    * collapse is a (qid, comp) partial-aggregable max — no new
    * corpus-grain exchange beyond what s41 and d31 already pay. */
  def collapsedCapProbeGrid(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(spark)
    val e = emb(spark, dir)
    val nb = scaledBandIndex(spark, dir)
      .select(col("vec_id"), col("bid"), col("bkey"))
    val b = scaledBandWidth(spark, dir)
    // the collapse lens: production dedup components (d31 labels) —
    // already a CACHED checkpoint inside DedupQueries, so the truth side
    // and the cells read the same materialized frame without a private
    // re-checkpoint per invocation (the r15 de-looping)
    val comp = graft.ext.DedupQueries.annDedupMultiprobe(spark, dir)
      .select(col("vec_id").as("nbr_id"), col("canon_id").as("comp"))
    // query-side components: SAMPLE-sized (never broadcast a
    // corpus-grain frame — 32 rows at any corpus size)
    val qcomp = comp.select(col("nbr_id").as("qid"), col("comp").as("qcomp"))
      .filter(recallSampled(col("qid")))
    val qs = e.filter(recallSampled(col("vec_id")))
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val topW = Window.partitionBy(col("qid"))
      .orderBy(col("best").desc, col("comp").asc)
    // truth: one corpus pass against the broadcast sample, collapsed to
    // per-component best cosine, own component excluded
    val exact = e.join(broadcast(qs), col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id").as("nbr_id"),
        round(expr("cosine_sim(qv, embedding)"), 6).as("cosine"))
      .join(comp, "nbr_id")
      .join(broadcast(qcomp), "qid")
      .filter(col("comp") =!= col("qcomp"))
      .groupBy(col("qid"), col("comp")).agg(max(col("cosine")).as("best"))
      .withColumn("rk", row_number().over(topW)).filter(col("rk") <= KnnK)
      .select(col("qid"), col("comp"))
    val probes = probeRows(nb, b, recallSampled(col("vec_id")), depth = 2)
    // ONE rank-tagged probe join for every (cap × depth) cell (see
    // [[rankTaggedScored]]), then the duplicate-collapse per cell over
    // the exploded membership — one lazy plan, no per-cell actions
    val cells = rankTaggedScored(spark, dir, probes)
      .join(comp, "nbr_id")
      .join(broadcast(qcomp), "qid")
      .filter(col("comp") =!= col("qcomp"))
      .select(col("qid"), col("comp"), col("cosine"),
        explode(col("cells")).as("c"))
      .select(col("qid"), col("comp"), col("cosine"),
        col("c.cap").as("cap"),
        explode(expr("sequence(c.mp, 2)")).as("d"))
      .withColumn("probe_depth", concat(lit("d"), col("d")))
    val cellW = Window.partitionBy(col("cap"), col("probe_depth"), col("qid"))
      .orderBy(col("best").desc, col("comp").asc)
    val hits = cells
      .groupBy(col("cap"), col("probe_depth"), col("qid"), col("comp"))
      .agg(max(col("cosine")).as("best"))
      .withColumn("rk", row_number().over(cellW)).filter(col("rk") <= KnnK)
      .select(col("cap"), col("probe_depth"), col("qid"), col("comp"))
      .join(exact, Seq("qid", "comp"))
      .groupBy(col("cap"), col("probe_depth"))
      .agg(count(lit(1)).as("n_hits"))
    gridSpine(spark)
      .join(hits, Seq("cap", "probe_depth"), "left")
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .select(col("cap"), col("probe_depth"), col("n_exact"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr("coalesce(n_hits, 0L) * 1000000L div greatest(n_exact, 1L)")
          .as("recall_ppm"))
      .orderBy("cap", "probe_depth")
  }

  /** CAP + DESCEND — the composed dial s40's Scaladoc prescribes,
    * measurable via `BenchDebug x_descent_capped`: build the base graph
    * over the cap-[[BucketCapSweep]].head index (hard mass bound) and
    * run one NN-descent round over it — the 2-hop closure reaches
    * in-cluster neighbors the cap evicted from shared buckets, at n·K
    * extra pairs instead of uncapped collision mass. Diagnostic
    * composition of two oracle-checked kernels (s40's capped index,
    * s39's round); rows mirror the s39 readout. */
  /** Top-K base graph over the cap-`cap` s40 index — the hard-mass-
    * bound starting point for capped descent. */
  private def descentBaseCapped(spark: SparkSession, dir: String,
      cap: Int): DataFrame = {
    val nb = scaledBandIndex(spark, dir)
      .select(col("vec_id"), col("bid"), col("bkey"))
    val idx = cappedIndexOf(nb, cap)
    val und = idx.as("a").join(idx.as("b"),
        col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nbr_id"))
      .distinct()
    attachCosine(spark, dir,
        und.union(und.select(col("nbr_id").as("vec_id"),
          col("vec_id").as("nbr_id"))))
      .withColumn("rk", row_number().over(descentTopW))
      .filter(col("rk") <= KnnK)
      .select(col("vec_id"), col("nbr_id"), col("cosine"))
  }

  private[graft] def descentOverCappedBase(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val cap = BucketCapSweep.head
    val g0 = descentBaseCapped(spark, dir, cap).localCheckpoint()
    val g1 = descentRound(spark, dir, g0).localCheckpoint()
    val exact = exactSampleKnn(spark, dir)
    val ex = exact.count()
    def stage(name: String, g: DataFrame) = {
      val e = g.count()
      val h = exact.join(g.select(col("vec_id"), col("nbr_id")),
        Seq("vec_id", "nbr_id")).count()
      (name, e, ex, h, h * 1000000L / math.max(ex, 1L))
    }
    val rows = Seq(stage(f"g0_cap$cap%02d", g0),
      stage(f"g1_cap$cap%02d_descent", g1))
    graft.CheckpointUtil.release(g0)
    graft.CheckpointUtil.release(g1)
    rows.toDF("stage", "n_edges", "n_exact", "n_hits", "recall_ppm")
      .orderBy("stage")
  }

  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s42_collapsed_recall" -> ((s, d) => collapsedCapProbeGrid(s, d)),
    "s41_cap_probe_grid" -> ((s, d) => capProbeGrid(s, d)),
    "s40_bucket_cap" -> ((s, d) => bucketCapSweep(s, d)),
    "s39_nn_descent" -> ((s, d) => nnDescent(s, d)),
    "s29_binary_hamming" -> ((s, d) => binaryHamming(s, d)),
    "s28_matryoshka" -> ((s, d) => matryoshkaRecall(s, d)),
    "s27_power_iteration" -> ((s, d) => powerIteration(s, d)),
    "s26_hubness" -> ((s, d) => hubness(s, d)),
    "s30_ann_hubness" -> ((s, d) => annHubness(s, d)),
    "s31_scaled_ann_recall" -> ((s, d) => scaledAnnRecall(s, d)),
    "s32_multiprobe_recall" -> ((s, d) => multiprobeRecall(s, d)),
    "s33_incremental_ann" -> ((s, d) => incrementalAnn(s, d)),
    "s34_incremental_ann_mp" -> ((s, d) => incrementalAnnMultiprobe(s, d)),
    "s35_admission_recall" -> ((s, d) => incrementalAnnRecall(s, d)),
    "s36_epoch_rebuild" -> ((s, d) => epochRebuild(s, d)),
    "s37_family_widening" -> ((s, d) => familyWidening(s, d)),
    "s38_query_directed" -> ((s, d) => queryDirectedRecall(s, d)),
    "r_ann_epoch_replay" -> ((s, d) => annEpochReplay(s, d)),
    "r_ann_evict_replay" -> ((s, d) => annEvictReplay(s, d)),
    "r_ann_evict_epoch_replay" -> ((s, d) => annEvictEpochReplay(s, d)),
    "s25_coreset_quality" -> ((s, d) => coresetQuality(s, d)),
    "s24_rrf_fusion" -> ((s, d) => rrfFusion(s, d)),
    "s23_isotropy" -> ((s, d) => isotropyAudit(s, d)),
    "s22_reassignment_churn" -> ((s, d) => reassignmentChurn(s, d)),
    "s21_calibration" -> ((s, d) => calibration(s, d)),
    "s20_silhouette" -> ((s, d) => silhouette(s, d)),
    "s19_nprobe_sweep" -> ((s, d) => nprobeSweep(s, d)),
    "s18_embedding_drift" -> ((s, d) => embeddingDrift(s, d)),
    "s17_retrieval_eval" -> ((s, d) => retrievalEval(s, d)),
    "d18_semdedup" -> ((s, d) => semDedup(s, d)),
    "s14_kmeans_step" -> ((s, d) => kmeansStep(s, d)),
    "s12_linear_probe" -> ((s, d) => linearProbe(s, d)),
    "s11_ivfpq" -> ((s, d) => annIvfPq(s, d)),
    "s10_knn_join" -> ((s, d) => knnJoin(s, d)),
    "s1_ann_topk" -> ((s, d) => annTopK(s, d)),
    "s15_mmr" -> ((s, d) => mmrTopK(s, d)),
    "s16_kcenter" -> ((s, d) => kCenter(s, d)),
    "s8_pq" -> ((s, d) => pqCodes(s, d)),
    "s2_cosine_pairs" -> ((s, d) => cosinePairs(s, d)),
    "s3_label_paircounts" -> ((s, d) => labelPairCounts(s, d)),
    "s4_ann_lsh" -> ((s, d) => annLsh(s, d)),
    "s13_mips" -> ((s, d) => annMips(s, d)),
    "s5_ann_ivf" -> ((s, d) => annIvf(s, d)),
    "s6_label_centroids" -> ((s, d) => labelCentroids(s, d)),
    "s7_quantize" -> ((s, d) => quantize(s, d)),
    "s9_ann_recall" -> ((s, d) => annRecall(s, d))
  )

  /** s9 — ANN index recall audit: both approximate paths (hyperplane LSH
    * s4, IVF s5) measured against the exact top-10 (s1) in one row — the
    * index-quality dashboard number an ANN deployment tracks per build,
    * the embedding twin of d10. The three top-k frames are k rows each,
    * so the audit costs three probes of the (already-planned) queries
    * plus joins over 10-row sets. */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = annTopK(spark, dir).select(col("vec_id"))
    val lshHits = exact.join(annLsh(spark, dir).select(col("vec_id")), "vec_id")
    val ivfHits = exact.join(annIvf(spark, dir).select(col("vec_id")), "vec_id")
    exact.agg(count(lit(1)).as("n_exact"))
      .crossJoin(lshHits.agg(count(lit(1)).as("lsh_hits")))
      .crossJoin(ivfHits.agg(count(lit(1)).as("ivf_hits")))
      .select(
        col("n_exact"), col("lsh_hits"), col("ivf_hits"),
        round(col("lsh_hits").cast("double") / col("n_exact"), 6).as("lsh_recall"),
        round(col("ivf_hits").cast("double") / col("n_exact"), 6).as("ivf_recall"))
  }

  private[ext] val duckEmb =
    """e AS MATERIALIZED (SELECT vec_id, label, embedding::DOUBLE[] v,
      |       sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) nrm
      |       FROM embeddings)""".stripMargin

  /** DuckDB twin of [[scaledBandIndex]] — per-table [[LshPlanesExt]]-bit
    * codes from the full widened plane family, with the data-dependent
    * key width (the engine's integer highest-set-bit formula) applied as
    * a mask on each table's low bits. The static text carries all
    * 8·[[LshPlanesExt]] plane exprs; masking reproduces the engine's
    * only-evaluate-b-planes shortcut exactly. Expects the `e` CTE in
    * scope; yields `bands (vec_id, bid, bkey)`. Shared by the s30/s31
    * oracles. */
  /** [[duckScaledBands]] with the key width derived from the row subset
    * matching `countWhere` — `TRUE` = the full-corpus adaptive width
    * (s30/s31/s32/d30); `vec_id % 2 = 0` = the standing index's frozen
    * width (s33). Band rows are always emitted for EVERY vector. */
  /** Just the adaptive-width `params` CTE (named): the engine's integer
    * highest-set-bit formula over the `countWhere` row subset, plus an
    * optional `delta` (the doubling-epoch re-key at b+1). Both the base
    * width and the delta'd width clamp at [[LshPlanesExt]] exactly like
    * the engine ([[scaledBandBits]] and the s36 rebuild both stop at
    * the widened-family limit, never at [[LshPlanes]]). */
  private def duckWidthParams(countWhere: String, name: String,
      delta: Int): String =
    s"""$name AS (SELECT LEAST($LshPlanesExt, GREATEST(4, LEAST($LshPlanesExt,
       |             CASE WHEN m <= 1 THEN 1 ELSE length(bin(m - 1)) END))
       |             + $delta) b
       |           FROM (SELECT (count(*) + ${AnnHubTargetOcc - 1})
       |                        // $AnnHubTargetOcc m
       |                 FROM embeddings WHERE $countWhere))""".stripMargin

  /** Band rows from an existing `codes<codesSfx>` CTE masked by an
    * existing width CTE — the width-only half of the band pipeline, so
    * a multi-epoch statement (s36) shares one plane/codes evaluation. */
  private def duckBandsFromCodes(codesSfx: String, paramsName: String,
      bandsName: String): String = {
    val tables = (0 until AnnHubTables).map(t =>
      s"SELECT vec_id, $t bid, (code$t & ((1 << pr.b) - 1)) bkey " +
        s"FROM codes$codesSfx, $paramsName pr").mkString("\nUNION ALL\n")
    s"""$bandsName AS MATERIALIZED (
       |$tables)""".stripMargin
  }

  private[ext] def duckScaledBandsNamed(countWhere: String, delta: Int,
      sfx: String): String = {
    // codes carry the FULL widened family (all LshPlanesExt bits per
    // table, ext bits r >= LshPlanes from the "ext" seed exactly like
    // the engine's tablePlaneSign) so the width mask below is valid at
    // ANY b <= LshPlanesExt — including the s36 rebuild's b0+1 when b0
    // has already reached 16 (the clamp crossing the widened family
    // exists for). Masking reproduces the engine's
    // only-evaluate-b-planes shortcut exactly.
    //
    // list_dot_product with a literal ±1 array instead of a 64-term sum
    // expression: ~15x faster to plan+eval in DuckDB (the 8·24-expr
    // block was the sweep's dominant oracle cost) and sign-identical —
    // both are sequential double sums, and the closest measured |dot|
    // to the sign boundary on the sf0.1 fixture is 3e-4, nine orders
    // above ulp-scale reordering noise.
    def tblDot(t: Int, r: Int): String =
      s"list_dot_product(v, [${tablePlaneSign(t, r)
        .map(s => if (s > 0) "1.0" else "-1.0").mkString(",")}])"
    val ss = (for (t <- 0 until AnnHubTables; r <- 0 until LshPlanesExt)
      yield s"((${tblDot(t, r)}) > 0) s${t}_$r")
      .mkString(",\n       ")
    val codes = (0 until AnnHubTables).map { t =>
      val c = (0 until LshPlanesExt)
        .map(r => s"(CASE WHEN s${t}_$r THEN ${1 << r} ELSE 0 END)")
        .mkString(" + ")
      s"($c) code$t"
    }.mkString(",\n       ")
    s"""bits$sfx AS (SELECT vec_id, v, nrm,
       |       $ss
       |  FROM e),
       |codes$sfx AS MATERIALIZED (SELECT vec_id,
       |       $codes
       |  FROM bits$sfx),
       |${duckWidthParams(countWhere, s"params$sfx", delta)},
       |${duckBandsFromCodes(sfx, s"params$sfx", s"bands$sfx")}""".stripMargin
  }

  private def duckScaledBandsFrom(countWhere: String): String =
    duckScaledBandsNamed(countWhere, 0, "")

  private[ext] lazy val duckScaledBands: String = duckScaledBandsFrom("TRUE")

  /** The capped production index as a DuckDB CTE (`cidx`, requires
    * `bands` in scope) — [[cappedBandIndex]]'s keep rule verbatim: the
    * [[DefaultBucketCap]] lowest vec_ids per (bid, bkey). Every oracle
    * whose Spark side generates candidates through the capped-by-default
    * kernels joins `cidx` on the index side. */
  private[ext] def duckCappedIdxSfx(sfx: String): String =
    s"""cidx$sfx AS MATERIALIZED (SELECT vec_id, bid, bkey FROM (
       |  SELECT vec_id, bid, bkey,
       |    row_number() OVER (PARTITION BY bid, bkey
       |      ORDER BY vec_id) occ_rk FROM bands$sfx)
       |  WHERE occ_rk <= $DefaultBucketCap)""".stripMargin

  private[ext] lazy val duckCappedIdx: String = duckCappedIdxSfx("")

  /** The d31 component chain as DuckDB CTEs (requires `e`, `cidx` and
    * `probes` in scope): multi-probe candidate pairs → threshold →
    * recursive reachability → `cc (node, canon)`, canon = component
    * min. Shared by the d31 oracle and the s42 duplicate-collapsed
    * recall oracle so the collapse lens can never drift from the
    * dedup operator it is defined by. */
  private[ext] lazy val duckMpComponents: String =
    s"""p AS (SELECT DISTINCT least(pq.qid, i.vec_id) lo,
       |        greatest(pq.qid, i.vec_id) hi
       |      FROM probes pq JOIN cidx i
       |        ON i.bid = pq.bid AND CAST(i.bkey AS BIGINT) = pq.pkey
       |       AND i.vec_id <> pq.qid),
       |pe AS (SELECT lo, hi FROM p
       |       JOIN e x ON x.vec_id = p.lo JOIN e y ON y.vec_id = p.hi
       |       WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6)
       |               >= $NearDupThreshold),
       |undirected AS (
       |  SELECT lo a, hi b FROM pe
       |  UNION ALL SELECT hi a, lo b FROM pe),
       |reach AS (
       |  SELECT vec_id node, vec_id x FROM e
       |  UNION
       |  SELECT r.node, u.b FROM reach r JOIN undirected u ON u.a = r.x),
       |cc AS MATERIALIZED (SELECT node, min(x) canon FROM reach
       |                    GROUP BY node)""".stripMargin

  /** The corpus-grain multi-probe key expansion as DuckDB CTEs
    * (`flips`[, `flips2`], `probes`; requires `bands` + `params` in
    * scope) — [[probeRows]]'s XOR shells verbatim at the build's
    * [[ProbeDepth]]: every vector's own keys, the b one-bit flips, and
    * at depth 2 the C(b,2) two-bit flips (chained unnest: flips2
    * re-expands each one-bit row over s ∈ (r, b)). Shared by the
    * d31/d32/d34 oracles so the generated twins track the production
    * dial exactly. */
  private[ext] def duckMpProbes(depth: Int = ProbeDepth,
      sfx: String = ""): String = {
    val flips =
      s"""flips$sfx AS (SELECT vec_id qid, bid, CAST(bkey AS BIGINT) bkey0,
         |            unnest(range(0, pr.b)) r
         |          FROM bands$sfx, params$sfx pr)""".stripMargin
    val flips2 =
      s"""flips2$sfx AS (SELECT qid, bid, bkey0, r,
         |             unnest(range(r + 1, pr.b)) s
         |           FROM flips$sfx, params$sfx pr)""".stripMargin
    val d2probe =
      s"  SELECT qid, bid, xor(xor(bkey0, CAST(1 AS BIGINT) << r), " +
        s"CAST(1 AS BIGINT) << s) FROM flips2$sfx"
    val probes =
      s"""probes$sfx AS (
         |  SELECT vec_id qid, bid, CAST(bkey AS BIGINT) pkey FROM bands$sfx
         |  UNION ALL
         |  SELECT qid, bid, xor(bkey0, CAST(1 AS BIGINT) << r) FROM flips$sfx${
           if (depth >= 2) "\n  UNION ALL\n" + d2probe else ""})""".stripMargin
    if (depth >= 2) s"$flips,\n$flips2,\n$probes" else s"$flips,\n$probes"
  }

  /** The s39 NN-descent graph as a DuckDB CTE chain (requires `e` from
    * [[duckEmb]] and `bands` from [[duckScaledBands]] in scope): the
    * corpus-wide band-candidate top-K graph `g0<sfx>`, capped reverse
    * edges, the pivot-neighborhood self-join, and the superset
    * re-selection `g1<sfx>`. Shared by the s39 oracle (sfx = "") and
    * d34's dedup-recall oracle (sfx = "d"). UNION (not UNION ALL) is
    * the dedup in the b/cand CTEs. */
  private[ext] def duckDescentCtes(sfx: String): String =
    s"""cp$sfx AS (SELECT DISTINCT a.vec_id vec_id, b.vec_id nbr_id
       |       FROM cidx a JOIN cidx b
       |         ON a.bid = b.bid AND a.bkey = b.bkey
       |        AND a.vec_id <> b.vec_id),
       |g0$sfx AS MATERIALIZED (SELECT vec_id, nbr_id, c FROM (
       |        SELECT p.vec_id, p.nbr_id,
       |          round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) c,
       |          row_number() OVER (PARTITION BY p.vec_id ORDER BY
       |            round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) DESC,
       |            p.nbr_id ASC) rk
       |        FROM cp$sfx p JOIN e x ON x.vec_id = p.vec_id
       |                  JOIN e y ON y.vec_id = p.nbr_id)
       |       WHERE rk <= $KnnK),
       |rc$sfx AS (SELECT vec_id, nbr_id FROM (
       |        SELECT g.nbr_id vec_id, g.vec_id nbr_id,
       |          row_number() OVER (PARTITION BY g.nbr_id ORDER BY
       |            g.c DESC, g.vec_id ASC) rk FROM g0$sfx g)
       |       WHERE rk <= $KnnK),
       |b$sfx AS MATERIALIZED (SELECT vec_id, nbr_id FROM g0$sfx
       |      UNION SELECT vec_id, nbr_id FROM rc$sfx),
       |cand$sfx AS (SELECT x.nbr_id vec_id, y.nbr_id nbr_id
       |         FROM b$sfx x JOIN b$sfx y
       |           ON x.vec_id = y.vec_id AND x.nbr_id <> y.nbr_id
       |         UNION SELECT vec_id, nbr_id FROM g0$sfx),
       |g1$sfx AS (SELECT vec_id, nbr_id FROM (
       |        SELECT c.vec_id, c.nbr_id,
       |          row_number() OVER (PARTITION BY c.vec_id ORDER BY
       |            round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) DESC,
       |            c.nbr_id ASC) rk
       |        FROM cand$sfx c JOIN e x ON x.vec_id = c.vec_id
       |                    JOIN e y ON y.vec_id = c.nbr_id)
       |       WHERE rk <= $KnnK)""".stripMargin

  private lazy val duckLsh: String = {
    val ss = (0 until LshPlanes)
      .map(p => s"((${planeDot(p, i => s"v[$i]", "1.0")}) > 0) s$p")
      .mkString(",\n       ")
    val bands = duckBandUnion
    s"""bits AS (SELECT vec_id, v, nrm,
       |       $ss
       |  FROM e),
       |bands AS MATERIALIZED (
       |$bands),
       |cand AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM bands q JOIN bands b ON q.bid = b.bid AND q.bkey = b.bkey
       |  WHERE q.vec_id = 0 AND b.vec_id > 0),
       |q AS (SELECT v qv, nrm qnrm FROM e WHERE vec_id = 0)""".stripMargin
  }

  /** The s16 k-center selection as a full standalone statement — its own
    * oracle entry, and nested by s25's coreset-quality comparison. */
  private lazy val duckS16Sql: String = {
    def pick(i: Int): String = {
      val selPrev = s"sel${i - 1}"
      s""",
         |$selPrev AS (${(1 until i).map(j =>
           s"SELECT vec_id, v, nrm FROM p$j").mkString(" UNION ALL ")}),
         |c$i AS (
         |  SELECT e.vec_id, e.v, e.nrm,
         |         (SELECT max(round(list_dot_product(e.v, s.v)
         |                           / (e.nrm * s.nrm), 6))
         |          FROM $selPrev s) AS max_sim
         |  FROM e WHERE e.vec_id NOT IN (SELECT vec_id FROM $selPrev)),
         |p$i AS (SELECT * FROM c$i ORDER BY max_sim ASC, vec_id ASC LIMIT 1)""".stripMargin
    }
    s"""WITH $duckEmb,
       |p1 AS (SELECT vec_id, v, nrm, CAST(1.0 AS DOUBLE) AS max_sim
       |       FROM e WHERE vec_id = 0)
       |${(2 to KCenterK).map(pick).mkString("\n")}
       |${(1 to KCenterK).map(i =>
         s"SELECT CAST($i AS BIGINT) AS rank, vec_id, max_sim AS max_sim_at_pick FROM p$i")
         .mkString("\nUNION ALL\n")}
       |ORDER BY rank""".stripMargin
  }

  /** The s1 exact-cosine top-10 as a full standalone statement — its own
    * oracle entry, and nested by s24's fusion. */
  private lazy val duckS1Sql: String =
    s"""WITH $duckEmb,
       |q AS (SELECT v, nrm FROM e WHERE vec_id = 0)
       |SELECT e.vec_id, round(list_dot_product(e.v, q.v) / (e.nrm * q.nrm), 6) AS cosine
       |FROM e, q WHERE e.vec_id > 0
       |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin

  // lazy: oracle SQL bodies cross-reference sibling modules (t27→Dedup,
  // s24→Text…); eager Maps would make object-init order a correctness
  // hazard (NPE on whichever module clinit runs first).
  lazy val oracles: Map[String, String] = Map(
    // DuckDB's `^` is exponentiation — Hamming must use xor(); and its
    // `<<` overflow-checks 1<<63, so bit 63 packs via the Long.MinValue
    // literal instead of a shift.
    "s29_binary_hamming" ->
      s"""WITH $duckEmb,
         |u AS (SELECT vec_id, CAST(i AS INT) dim, v[CAST(i AS INT)] val
         |      FROM e, unnest(range(1, 65)) t(i)),
         |pk AS (SELECT vec_id, bit_or(
         |         CASE WHEN val > 0 THEN
         |           CASE WHEN dim = 64 THEN (-9223372036854775807 - 1)
         |                ELSE (1::BIGINT << (dim - 1)) END
         |         ELSE 0 END) bits
         |       FROM u GROUP BY vec_id),
         |q AS (SELECT e.vec_id qid, e.v qv, e.nrm qnrm, pk.bits qbits
         |      FROM e JOIN pk USING (vec_id) WHERE e.vec_id % 97 = 0),
         |j AS (SELECT q.qid, e.vec_id,
         |        CAST(bit_count(xor(pk.bits, q.qbits)) AS BIGINT) hamming,
         |        round(list_dot_product(e.v, q.qv) / (e.nrm * q.qnrm), 6) cos
         |      FROM e JOIN pk USING (vec_id), q WHERE e.vec_id <> q.qid),
         |th AS (SELECT qid, vec_id, hamming FROM (
         |         SELECT qid, vec_id, hamming, row_number() OVER (
         |           PARTITION BY qid ORDER BY hamming ASC, vec_id ASC) rk FROM j)
         |       WHERE rk <= $MatryoshkaK),
         |tc AS (SELECT qid, vec_id, hamming FROM (
         |         SELECT qid, vec_id, hamming, row_number() OVER (
         |           PARTITION BY qid ORDER BY cos DESC, vec_id ASC) rk FROM j)
         |       WHERE rk <= $MatryoshkaK),
         |ov AS (SELECT CAST(count(*) AS BIGINT) n FROM th
         |       SEMI JOIN tc ON th.qid = tc.qid AND th.vec_id = tc.vec_id),
         |nq AS (SELECT CAST(count(*) AS BIGINT) n FROM q),
         |mh AS (SELECT CAST(sum(hamming * 1000000) // count(*) AS BIGINT) m FROM tc)
         |SELECT nq.n AS n_queries, ov.n AS n_overlap,
         |       CAST(CAST(ov.n AS HUGEINT) * 1000000
         |         // (nq.n * $MatryoshkaK) AS BIGINT) AS recall_ppm,
         |       mh.m AS true_topk_mean_hamming_micro
         |FROM nq, ov, mh""".stripMargin,

    "s28_matryoshka" -> {
      val budgetsVals = (MatryoshkaBudgets :+ 64)
        .map(b => s"($b)").mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |q AS (SELECT vec_id qid, v qv FROM e WHERE vec_id % 97 = 0),
         |bg(budget) AS (VALUES $budgetsVals),
         |sc AS (SELECT q.qid, e.vec_id, bg.budget,
         |         round(list_dot_product(e.v[1:bg.budget], q.qv[1:bg.budget])
         |           / (sqrt(list_dot_product(e.v[1:bg.budget], e.v[1:bg.budget]))
         |            * sqrt(list_dot_product(q.qv[1:bg.budget], q.qv[1:bg.budget]))),
         |           6) cos
         |       FROM e, q, bg WHERE e.vec_id <> q.qid),
         |tp AS (SELECT qid, vec_id, budget FROM (
         |         SELECT qid, vec_id, budget, row_number() OVER (
         |           PARTITION BY qid, budget ORDER BY cos DESC, vec_id ASC) rk
         |         FROM sc) WHERE rk <= $MatryoshkaK),
         |fl AS (SELECT qid, vec_id FROM tp WHERE budget = 64),
         |ov AS (SELECT t.budget, CAST(count(*) AS BIGINT) n_overlap
         |       FROM tp t SEMI JOIN fl
         |         ON t.qid = fl.qid AND t.vec_id = fl.vec_id
         |       WHERE t.budget <> 64 GROUP BY t.budget),
         |nq AS (SELECT count(*) n FROM q)
         |SELECT CAST(bg.budget AS BIGINT) dim_budget,
         |       CAST(nq.n AS BIGINT) n_queries,
         |       CAST(coalesce(ov.n_overlap, 0) AS BIGINT) n_overlap,
         |       CAST(CAST(coalesce(ov.n_overlap, 0) AS HUGEINT) * 1000000
         |         // (nq.n * $MatryoshkaK) AS BIGINT) AS recall_ppm
         |FROM bg LEFT JOIN ov ON ov.budget = bg.budget, nq
         |WHERE bg.budget <> 64
         |ORDER BY dim_budget""".stripMargin
    },

    "s26_hubness" ->
      s"""WITH $duckEmb,
         |c AS (SELECT a.vec_id vec_id, b.vec_id nbr_id,
         |        round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) cosine
         |      FROM e a JOIN e b
         |        ON a.label = b.label AND a.vec_id <> b.vec_id),
         |r AS (SELECT nbr_id,
         |        CAST(row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cosine DESC, nbr_id ASC) AS BIGINT) rk
         |      FROM c),
         |ind AS (SELECT nbr_id, CAST(count(*) AS BIGINT) n
         |        FROM r WHERE rk <= $KnnK GROUP BY 1),
         |d AS (SELECT e.vec_id, coalesce(ind.n, 0) in_deg
         |      FROM e LEFT JOIN ind ON ind.nbr_id = e.vec_id)
         |SELECT in_deg, CAST(count(*) AS BIGINT) AS n_vecs
         |FROM d GROUP BY in_deg ORDER BY in_deg""".stripMargin,

    // s26's histogram over the adaptive-resolution band-bucket candidate
    // graph: the bit pipeline reproduces the engine's hyperplane signs
    // exactly (same planeDot literals as s4/duckLsh), the bits-per-band
    // choice replays the engine's integer highest-set-bit formula
    // (length(bin(m-1)) = 64 - numberOfLeadingZeros(m-1)), pairs dedupe
    // across bands, and the same k/tie-break/coalesce chain follows.
    "s30_ann_hubness" ->
      s"""WITH $duckEmb,
         |$duckScaledBands,
         |$duckCappedIdx,
         |p AS (SELECT DISTINCT a.vec_id vec_id, b.vec_id nbr_id
         |      FROM cidx a JOIN cidx b
         |        ON a.bid = b.bid AND a.bkey = b.bkey AND a.vec_id <> b.vec_id),
         |c AS (SELECT p.vec_id, p.nbr_id,
         |        round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) cosine
         |      FROM p JOIN e x ON x.vec_id = p.vec_id
         |             JOIN e y ON y.vec_id = p.nbr_id),
         |r AS (SELECT nbr_id,
         |        CAST(row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cosine DESC, nbr_id ASC) AS BIGINT) rk
         |      FROM c),
         |ind AS (SELECT nbr_id, CAST(count(*) AS BIGINT) n
         |        FROM r WHERE rk <= $KnnK GROUP BY 1),
         |d AS (SELECT e.vec_id, coalesce(ind.n, 0) in_deg
         |      FROM e LEFT JOIN ind ON ind.nbr_id = e.vec_id)
         |SELECT in_deg, CAST(count(*) AS BIGINT) AS n_vecs
         |FROM d GROUP BY in_deg ORDER BY in_deg""".stripMargin,

    // the same scaled-band CTEs; exact side is the unblocked top-k over
    // the broadcast sample, hit counting is an inner join on the two
    // (query, neighbor) sets, all integers to the final ppm.
    "s31_scaled_ann_recall" ->
      s"""WITH $duckEmb,
         |$duckScaledBands,
         |$duckCappedIdx,
         |qs AS (SELECT * FROM e WHERE $duckRecallSampled),
         |ex AS (SELECT vec_id, nbr_id FROM (
         |        SELECT q.vec_id, x.vec_id nbr_id,
         |          row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |            round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6) DESC,
         |            x.vec_id ASC) rk
         |        FROM qs q JOIN e x ON q.vec_id <> x.vec_id)
         |       WHERE rk <= $KnnK),
         |cand AS (SELECT DISTINCT a.vec_id vec_id, b.vec_id nbr_id
         |         FROM cidx a JOIN cidx b
         |           ON a.bid = b.bid AND a.bkey = b.bkey
         |          AND a.vec_id <> b.vec_id
         |         WHERE a.vec_id % $RecallSampleMod = 0
         |           AND a.vec_id < $RecallSampleCap),
         |ann AS (SELECT vec_id, nbr_id FROM (
         |        SELECT c.vec_id, c.nbr_id,
         |          row_number() OVER (PARTITION BY c.vec_id ORDER BY
         |            round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) DESC,
         |            c.nbr_id ASC) rk
         |        FROM cand c JOIN e x ON x.vec_id = c.vec_id
         |                    JOIN e y ON y.vec_id = c.nbr_id)
         |       WHERE rk <= $KnnK),
         |h AS (SELECT CAST(count(*) AS BIGINT) n_hits
         |      FROM ex JOIN ann USING (vec_id, nbr_id)),
         |tot AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) n_queries,
         |               CAST(count(*) AS BIGINT) n_exact FROM ex)
         |SELECT tot.n_queries, tot.n_exact, h.n_hits,
         |       CAST(h.n_hits * 1000000 // tot.n_exact AS BIGINT) AS recall_ppm
         |FROM tot, h""".stripMargin,

    // s40: per cap, the bucket-capped index (row_number per (bid,bkey)
    // ordered by vec_id — the deterministic keep rule shared with the
    // engine), corpus-wide distinct undirected pair mass, and the s31
    // sampled recall, one UNION ALL row per cap setting.
    "s40_bucket_cap" -> {
      val settings = BucketCapSweep.map(c => (f"cap_$c%02d", Some(c))) :+
        ("uncapped", None)
      val blocks = settings.map { case (label, capOpt) =>
        val sfx = label.replace("cap_", "c")
        val idx = capOpt match {
          case Some(c) =>
            s"""i$sfx AS (SELECT vec_id, bid, bkey FROM (
               |  SELECT vec_id, bid, bkey,
               |    row_number() OVER (PARTITION BY bid, bkey
               |      ORDER BY vec_id) occ_rk FROM bands)
               |  WHERE occ_rk <= $c)""".stripMargin
          case None =>
            s"i$sfx AS (SELECT vec_id, bid, bkey FROM bands)"
        }
        val body =
          s"""u$sfx AS (SELECT DISTINCT a.vec_id vec_id, b.vec_id nbr_id
             |  FROM i$sfx a JOIN i$sfx b
             |    ON a.bid = b.bid AND a.bkey = b.bkey
             |   AND a.vec_id < b.vec_id),
             |a$sfx AS (SELECT vec_id, nbr_id FROM (
             |  SELECT c.vec_id, c.nbr_id,
             |    row_number() OVER (PARTITION BY c.vec_id ORDER BY
             |      round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) DESC,
             |      c.nbr_id ASC) rk
             |  FROM (SELECT vec_id, nbr_id FROM u$sfx
             |        UNION ALL
             |        SELECT nbr_id, vec_id FROM u$sfx) c
             |  JOIN e x ON x.vec_id = c.vec_id
             |  JOIN e y ON y.vec_id = c.nbr_id
             |  WHERE c.vec_id % $RecallSampleMod = 0
             |    AND c.vec_id < $RecallSampleCap)
             |  WHERE rk <= $KnnK)""".stripMargin
        val row =
          s"""SELECT '$label' cap,
             |  (SELECT CAST(count(*) AS BIGINT) FROM i$sfx) n_index_rows,
             |  (SELECT CAST(count(*) AS BIGINT) FROM u$sfx) n_cand_pairs,
             |  tot.n_exact,
             |  (SELECT CAST(count(*) AS BIGINT)
             |     FROM ex JOIN a$sfx USING (vec_id, nbr_id)) n_hits
             |FROM tot""".stripMargin
        (s"$idx,\n$body", row)
      }
      s"""WITH $duckEmb,
         |$duckScaledBands,
         |qs AS (SELECT * FROM e WHERE $duckRecallSampled),
         |ex AS (SELECT vec_id, nbr_id FROM (
         |        SELECT q.vec_id, x.vec_id nbr_id,
         |          row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |            round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6) DESC,
         |            x.vec_id ASC) rk
         |        FROM qs q JOIN e x ON q.vec_id <> x.vec_id)
         |       WHERE rk <= $KnnK),
         |tot AS (SELECT CAST(count(*) AS BIGINT) n_exact FROM ex),
         |${blocks.map(_._1).mkString(",\n")}
         |SELECT f.cap, f.n_index_rows, f.n_cand_pairs, f.n_exact, f.n_hits,
         |       CAST(f.n_hits * 1000000 // f.n_exact AS BIGINT) AS recall_ppm
         |FROM (
         |${blocks.map(_._2).mkString("\nUNION ALL\n")}) f
         |ORDER BY f.cap""".stripMargin
    },

    // s41: the s40 capped-index CTE composed with the s32 probe-shell
    // CTEs — per (cap, depth) cell, candidate mass (min flip count <=
    // depth) and the sampled recall, one UNION ALL row per cell.
    "s41_cap_probe_grid" -> {
      val blocks = BucketCapSweep.map { c =>
        val s = f"c$c%02d"
        val label = f"cap_$c%02d"
        val cte =
          s"""i$s AS (SELECT vec_id, bid, bkey FROM (
             |  SELECT vec_id, bid, bkey,
             |    row_number() OVER (PARTITION BY bid, bkey
             |      ORDER BY vec_id) occ_rk FROM bands)
             |  WHERE occ_rk <= $c),
             |n$s AS (SELECT p.qid, i.vec_id nbr_id, min(p.pidx) mp
             |        FROM probes p JOIN i$s i
             |          ON i.bid = p.bid AND CAST(i.bkey AS BIGINT) = p.pkey
             |         AND i.vec_id <> p.qid
             |        GROUP BY 1, 2),
             |s$s AS (SELECT n.qid, n.nbr_id, n.mp,
             |          round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6)
             |            cosine
             |        FROM n$s n JOIN e x ON x.vec_id = n.qid
             |                   JOIN e y ON y.vec_id = n.nbr_id)""".stripMargin
        val rows = (0 to 2).map { d =>
          s"""SELECT '$label' cap, 'd$d' probe_depth,
             |  (SELECT CAST(count(*) AS BIGINT) FROM s$s WHERE mp <= $d)
             |    n_cand,
             |  tot.n_exact,
             |  (SELECT CAST(count(*) AS BIGINT) FROM ex JOIN
             |     (SELECT qid, nbr_id FROM (
             |        SELECT qid, nbr_id, row_number() OVER (PARTITION BY qid
             |          ORDER BY cosine DESC, nbr_id ASC) rk
             |        FROM s$s WHERE mp <= $d) WHERE rk <= $KnnK) t
             |     ON ex.qid = t.qid AND ex.nbr_id = t.nbr_id) n_hits
             |FROM tot""".stripMargin
        }
        (cte, rows)
      }
      s"""WITH $duckEmb,
         |$duckScaledBands,
         |qs AS (SELECT * FROM e WHERE $duckRecallSampled),
         |ex AS (SELECT qid, nbr_id FROM (
         |        SELECT q.vec_id qid, x.vec_id nbr_id,
         |          row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |            round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6) DESC,
         |            x.vec_id ASC) rk
         |        FROM qs q JOIN e x ON q.vec_id <> x.vec_id)
         |       WHERE rk <= $KnnK),
         |tot AS (SELECT CAST(count(*) AS BIGINT) n_exact FROM ex),
         |flips AS (SELECT vec_id qid, bid, CAST(bkey AS BIGINT) bkey0,
         |            unnest(range(0, pr.b)) r
         |          FROM bands, params pr WHERE $duckRecallSampled),
         |flipp AS (SELECT qid, bid, bkey0, r, unnest(range(r + 1, pr.b)) s
         |          FROM flips, params pr),
         |probes AS (
         |  SELECT vec_id qid, bid, CAST(bkey AS BIGINT) pkey, 0 pidx
         |  FROM bands WHERE $duckRecallSampled
         |  UNION ALL
         |  SELECT qid, bid, xor(bkey0, CAST(1 AS BIGINT) << r), 1 FROM flips
         |  UNION ALL
         |  SELECT qid, bid,
         |    xor(xor(bkey0, CAST(1 AS BIGINT) << r), CAST(1 AS BIGINT) << s), 2
         |  FROM flipp),
         |${blocks.map(_._1).mkString(",\n")}
         |SELECT f.cap, f.probe_depth, f.n_cand, f.n_exact, f.n_hits,
         |       CAST(f.n_hits * 1000000 // f.n_exact AS BIGINT) AS recall_ppm
         |FROM (
         |${blocks.flatMap(_._2).mkString("\nUNION ALL\n")}) f
         |ORDER BY f.cap, f.probe_depth""".stripMargin
    },

    // s42: the collapsed-recall grid recomputed independently — the
    // d31 component chain (shared duckMpComponents text, so the
    // collapse lens is the dedup oracle's own), the exact side
    // collapsed to per-component best cosine with the query's own
    // component excluded, and s41's per-cap probe blocks re-ranked at
    // component grain.
    "s42_collapsed_recall" -> {
      val blocks = BucketCapSweep.map { c =>
        val s = f"c$c%02d"
        val label = f"cap_$c%02d"
        val cte =
          s"""i$s AS (SELECT vec_id, bid, bkey FROM (
             |  SELECT vec_id, bid, bkey,
             |    row_number() OVER (PARTITION BY bid, bkey
             |      ORDER BY vec_id) occ_rk FROM bands)
             |  WHERE occ_rk <= $c),
             |n$s AS (SELECT p.qid, i.vec_id nbr_id, min(p.pidx) mp
             |        FROM qprobes p JOIN i$s i
             |          ON i.bid = p.bid AND CAST(i.bkey AS BIGINT) = p.pkey
             |         AND i.vec_id <> p.qid
             |        GROUP BY 1, 2),
             |s$s AS MATERIALIZED (
             |  SELECT n.qid, cc.canon comp, n.mp,
             |         round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6)
             |           cosine
             |  FROM n$s n JOIN e x ON x.vec_id = n.qid
             |             JOIN e y ON y.vec_id = n.nbr_id
             |             JOIN cc ON cc.node = n.nbr_id
             |             JOIN qc ON qc.qid = n.qid
             |  WHERE cc.canon <> qc.qcomp)""".stripMargin
        val rows = (0 to 2).map { d =>
          s"""SELECT '$label' cap, 'd$d' probe_depth, tot.n_exact,
             |  (SELECT CAST(count(*) AS BIGINT) FROM ex JOIN
             |     (SELECT qid, comp FROM (
             |        SELECT qid, comp, row_number() OVER (PARTITION BY qid
             |          ORDER BY best DESC, comp ASC) rk
             |        FROM (SELECT qid, comp, max(cosine) best FROM s$s
             |              WHERE mp <= $d GROUP BY qid, comp))
             |      WHERE rk <= $KnnK) f
             |     ON ex.qid = f.qid AND ex.comp = f.comp) n_hits
             |FROM tot""".stripMargin
        }
        (cte, rows)
      }
      s"""WITH RECURSIVE $duckEmb,
         |$duckScaledBands,
         |$duckCappedIdx,
         |${duckMpProbes()},
         |$duckMpComponents,
         |qs AS (SELECT * FROM e WHERE $duckRecallSampled),
         |qc AS (SELECT node qid, canon qcomp FROM cc
         |       WHERE node % $RecallSampleMod = 0
         |         AND node < $RecallSampleCap),
         |exs AS (SELECT q.vec_id qid, cc.canon comp,
         |          max(round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6))
         |            best
         |        FROM qs q JOIN e x ON q.vec_id <> x.vec_id
         |        JOIN cc ON cc.node = x.vec_id
         |        JOIN qc ON qc.qid = q.vec_id
         |        WHERE cc.canon <> qc.qcomp
         |        GROUP BY 1, 2),
         |ex AS MATERIALIZED (SELECT qid, comp FROM (
         |       SELECT qid, comp, row_number() OVER (PARTITION BY qid
         |         ORDER BY best DESC, comp ASC) rk FROM exs)
         |      WHERE rk <= $KnnK),
         |tot AS (SELECT CAST(count(*) AS BIGINT) n_exact FROM ex),
         |qflips AS (SELECT vec_id qid, bid, CAST(bkey AS BIGINT) bkey0,
         |             unnest(range(0, pr.b)) r
         |           FROM bands, params pr WHERE $duckRecallSampled),
         |qflipp AS (SELECT qid, bid, bkey0, r, unnest(range(r + 1, pr.b)) s
         |           FROM qflips, params pr),
         |qprobes AS (
         |  SELECT vec_id qid, bid, CAST(bkey AS BIGINT) pkey, 0 pidx
         |  FROM bands WHERE $duckRecallSampled
         |  UNION ALL
         |  SELECT qid, bid, xor(bkey0, CAST(1 AS BIGINT) << r), 1 FROM qflips
         |  UNION ALL
         |  SELECT qid, bid,
         |    xor(xor(bkey0, CAST(1 AS BIGINT) << r), CAST(1 AS BIGINT) << s), 2
         |  FROM qflipp),
         |${blocks.map(_._1).mkString(",\n")}
         |SELECT f.cap, f.probe_depth, f.n_exact, f.n_hits,
         |       CAST(f.n_hits * 1000000 // greatest(f.n_exact, 1)
         |            AS BIGINT) AS recall_ppm
         |FROM (
         |${blocks.flatMap(_._2).mkString("\nUNION ALL\n")}) f
         |ORDER BY f.cap, f.probe_depth""".stripMargin
    },

    // s39: the full NN-descent round recomputed independently — the
    // corpus-wide band-candidate top-K graph, the capped reverse edges,
    // the pivot-neighborhood self-join, the superset re-selection, and
    // both recall readouts against the s31 exact sample. The graph CTE
    // chain is shared with d34's dedup-recall oracle via
    // [[duckDescentCtes]].
    "s39_nn_descent" ->
      s"""WITH $duckEmb,
         |$duckScaledBands,
         |$duckCappedIdx,
         |${duckDescentCtes("")},
         |qs AS (SELECT * FROM e WHERE $duckRecallSampled),
         |ex AS (SELECT vec_id, nbr_id FROM (
         |        SELECT q.vec_id, x.vec_id nbr_id,
         |          row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |            round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6) DESC,
         |            x.vec_id ASC) rk
         |        FROM qs q JOIN e x ON q.vec_id <> x.vec_id)
         |       WHERE rk <= $KnnK),
         |st AS (SELECT 'g0_lsh' stage,
         |         (SELECT CAST(count(*) AS BIGINT) FROM g0) n_edges,
         |         (SELECT CAST(count(*) AS BIGINT)
         |            FROM ex JOIN g0 USING (vec_id, nbr_id)) n_hits
         |       UNION ALL
         |       SELECT 'g1_descent',
         |         (SELECT CAST(count(*) AS BIGINT) FROM g1),
         |         (SELECT CAST(count(*) AS BIGINT)
         |            FROM ex JOIN g1 USING (vec_id, nbr_id))),
         |tot AS (SELECT CAST(count(*) AS BIGINT) n_exact FROM ex)
         |SELECT st.stage, st.n_edges, tot.n_exact, st.n_hits,
         |       CAST(st.n_hits * 1000000 // tot.n_exact AS BIGINT)
         |         AS recall_ppm
         |FROM st, tot ORDER BY st.stage""".stripMargin,

    // s32: the s31 CTEs plus 1-bit-flip probe keys; min probe rank per
    // candidate pair classifies the mode, two top-k passes share the
    // scored pairs, and the exact-kNN denominator is common to both rows.
    "s32_multiprobe_recall" ->
      s"""WITH $duckEmb,
         |$duckScaledBands,
         |qs AS (SELECT * FROM e WHERE $duckRecallSampled),
         |ex AS (SELECT vec_id, nbr_id FROM (
         |        SELECT q.vec_id, x.vec_id nbr_id,
         |          row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |            round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6) DESC,
         |            x.vec_id ASC) rk
         |        FROM qs q JOIN e x ON q.vec_id <> x.vec_id)
         |       WHERE rk <= $KnnK),
         |flips AS (SELECT vec_id qid, bid, CAST(bkey AS BIGINT) bkey0,
         |            unnest(range(0, pr.b)) r
         |          FROM bands, params pr WHERE $duckRecallSampled),
         |flipp AS (SELECT qid, bid, bkey0, r, unnest(range(r + 1, pr.b)) s
         |          FROM flips, params pr),
         |probes AS (
         |  SELECT vec_id qid, bid, CAST(bkey AS BIGINT) pkey, 0 pidx
         |  FROM bands WHERE $duckRecallSampled
         |  UNION ALL
         |  SELECT qid, bid, xor(bkey0, CAST(1 AS BIGINT) << r), 1 FROM flips
         |  UNION ALL
         |  SELECT qid, bid,
         |    xor(xor(bkey0, CAST(1 AS BIGINT) << r), CAST(1 AS BIGINT) << s), 2
         |  FROM flipp),
         |cand AS (SELECT p.qid, i.vec_id nbr_id, min(p.pidx) mp
         |         FROM probes p JOIN bands i
         |           ON i.bid = p.bid AND CAST(i.bkey AS BIGINT) = p.pkey
         |          AND i.vec_id <> p.qid
         |         GROUP BY 1, 2),
         |sc AS (SELECT c.qid, c.nbr_id, c.mp,
         |         round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) cosine
         |       FROM cand c JOIN e x ON x.vec_id = c.qid
         |                   JOIN e y ON y.vec_id = c.nbr_id),
         |tops AS (
         |  SELECT 't0_single' probe_mode, qid, nbr_id FROM (
         |    SELECT qid, nbr_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, nbr_id ASC) rk
         |    FROM sc WHERE mp = 0) WHERE rk <= $KnnK
         |  UNION ALL
         |  SELECT 't1_multi1', qid, nbr_id FROM (
         |    SELECT qid, nbr_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, nbr_id ASC) rk
         |    FROM sc WHERE mp <= 1) WHERE rk <= $KnnK
         |  UNION ALL
         |  SELECT 't2_multi2', qid, nbr_id FROM (
         |    SELECT qid, nbr_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, nbr_id ASC) rk
         |    FROM sc) WHERE rk <= $KnnK),
         |h AS (SELECT probe_mode, CAST(count(*) AS BIGINT) n_hits
         |      FROM tops t JOIN ex ON ex.vec_id = t.qid AND ex.nbr_id = t.nbr_id
         |      GROUP BY 1),
         |tot AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) n_queries,
         |               CAST(count(*) AS BIGINT) n_exact FROM ex),
         |modes AS (SELECT 't0_single' probe_mode UNION ALL SELECT 't1_multi1'
         |          UNION ALL SELECT 't2_multi2')
         |SELECT m.probe_mode, tot.n_queries, tot.n_exact,
         |       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       CAST(coalesce(h.n_hits, 0) * 1000000 // tot.n_exact AS BIGINT)
         |         AS recall_ppm
         |FROM modes m LEFT JOIN h USING (probe_mode), tot
         |ORDER BY m.probe_mode""".stripMargin,

    // s33: the scaled-band CTEs with the key width frozen from the
    // indexed (even) half; probe side = odd ids, index side = even ids,
    // exact-cosine top-k per new vector over the bucket candidates.
    "s33_incremental_ann" ->
      s"""WITH $duckEmb,
         |${duckScaledBandsFrom("vec_id % 2 = 0")},
         |cand AS (SELECT DISTINCT p.vec_id, i.vec_id nbr_id
         |         FROM bands p JOIN bands i
         |           ON p.bid = i.bid AND p.bkey = i.bkey
         |          AND p.vec_id % 2 = 1 AND i.vec_id % 2 = 0),
         |sc AS (SELECT c.vec_id, c.nbr_id,
         |         round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) cosine
         |       FROM cand c JOIN e x ON x.vec_id = c.vec_id
         |                   JOIN e y ON y.vec_id = c.nbr_id)
         |SELECT vec_id, nbr_id, CAST(rk AS BIGINT) AS rk, cosine FROM (
         |  SELECT vec_id, nbr_id, cosine,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cosine DESC, nbr_id ASC) rk
         |  FROM sc)
         |WHERE rk <= $KnnK
         |ORDER BY vec_id, rk""".stripMargin,

    // s34: s33's frozen-width CTEs plus the s32 1-bit-flip probe keys on
    // the NEW (odd) side only; candidates dedupe across tables and
    // probes, then the identical exact-cosine top-k.
    "s34_incremental_ann_mp" ->
      s"""WITH $duckEmb,
         |${duckScaledBandsFrom("vec_id % 2 = 0")},
         |flips AS (SELECT vec_id qid, bid, CAST(bkey AS BIGINT) bkey0,
         |            unnest(range(0, pr.b)) r
         |          FROM bands, params pr WHERE vec_id % 2 = 1),
         |probes AS (
         |  SELECT vec_id qid, bid, CAST(bkey AS BIGINT) pkey
         |  FROM bands WHERE vec_id % 2 = 1
         |  UNION ALL
         |  SELECT qid, bid, xor(bkey0, CAST(1 AS BIGINT) << r) FROM flips),
         |cand AS (SELECT DISTINCT p.qid vec_id, i.vec_id nbr_id
         |         FROM probes p JOIN bands i
         |           ON i.bid = p.bid AND CAST(i.bkey AS BIGINT) = p.pkey
         |          AND i.vec_id % 2 = 0),
         |sc AS (SELECT c.vec_id, c.nbr_id,
         |         round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) cosine
         |       FROM cand c JOIN e x ON x.vec_id = c.vec_id
         |                   JOIN e y ON y.vec_id = c.nbr_id)
         |SELECT vec_id, nbr_id, CAST(rk AS BIGINT) AS rk, cosine FROM (
         |  SELECT vec_id, nbr_id, cosine,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY cosine DESC, nbr_id ASC) rk
         |  FROM sc)
         |WHERE rk <= $KnnK
         |ORDER BY vec_id, rk""".stripMargin,

    // s35: the s32 readout shape over the ADMISSION path — odd capped
    // sample, frozen-width standing bands, even-half exact denominator.
    "s35_admission_recall" ->
      s"""WITH $duckEmb,
         |${duckScaledBandsFrom("vec_id % 2 = 0")},
         |qs AS (SELECT * FROM e
         |       WHERE vec_id % $RecallSampleMod = 1
         |         AND vec_id < $RecallSampleCap),
         |ex AS (SELECT qid, nbr_id FROM (
         |        SELECT q.vec_id qid, x.vec_id nbr_id,
         |          row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |            round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6) DESC,
         |            x.vec_id ASC) rk
         |        FROM qs q JOIN e x ON x.vec_id % 2 = 0 AND q.vec_id <> x.vec_id)
         |       WHERE rk <= $KnnK),
         |flips AS (SELECT vec_id qid, bid, CAST(bkey AS BIGINT) bkey0,
         |            unnest(range(0, pr.b)) r
         |          FROM bands, params pr
         |          WHERE vec_id % $RecallSampleMod = 1
         |            AND vec_id < $RecallSampleCap),
         |flipp AS (SELECT qid, bid, bkey0, r, unnest(range(r + 1, pr.b)) s
         |          FROM flips, params pr),
         |probes AS (
         |  SELECT vec_id qid, bid, CAST(bkey AS BIGINT) pkey, 0 pidx
         |  FROM bands WHERE vec_id % $RecallSampleMod = 1
         |    AND vec_id < $RecallSampleCap
         |  UNION ALL
         |  SELECT qid, bid, xor(bkey0, CAST(1 AS BIGINT) << r), 1 FROM flips
         |  UNION ALL
         |  SELECT qid, bid,
         |    xor(xor(bkey0, CAST(1 AS BIGINT) << r), CAST(1 AS BIGINT) << s), 2
         |  FROM flipp),
         |cand AS (SELECT p.qid, i.vec_id nbr_id, min(p.pidx) mp
         |         FROM probes p JOIN bands i
         |           ON i.bid = p.bid AND CAST(i.bkey AS BIGINT) = p.pkey
         |          AND i.vec_id % 2 = 0
         |         GROUP BY 1, 2),
         |sc AS (SELECT c.qid, c.nbr_id, c.mp,
         |         round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) cosine
         |       FROM cand c JOIN e x ON x.vec_id = c.qid
         |                   JOIN e y ON y.vec_id = c.nbr_id),
         |tops AS (
         |  SELECT 't0_single' probe_mode, qid, nbr_id FROM (
         |    SELECT qid, nbr_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, nbr_id ASC) rk
         |    FROM sc WHERE mp = 0) WHERE rk <= $KnnK
         |  UNION ALL
         |  SELECT 't1_multi1', qid, nbr_id FROM (
         |    SELECT qid, nbr_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, nbr_id ASC) rk
         |    FROM sc WHERE mp <= 1) WHERE rk <= $KnnK
         |  UNION ALL
         |  SELECT 't2_multi2', qid, nbr_id FROM (
         |    SELECT qid, nbr_id, row_number() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, nbr_id ASC) rk
         |    FROM sc) WHERE rk <= $KnnK),
         |h AS (SELECT probe_mode, CAST(count(*) AS BIGINT) n_hits
         |      FROM tops t JOIN ex ON ex.qid = t.qid AND ex.nbr_id = t.nbr_id
         |      GROUP BY 1),
         |tot AS (SELECT CAST(count(DISTINCT qid) AS BIGINT) n_queries,
         |               CAST(count(*) AS BIGINT) n_exact FROM ex),
         |modes AS (SELECT 't0_single' probe_mode UNION ALL SELECT 't1_multi1'
         |          UNION ALL SELECT 't2_multi2')
         |SELECT m.probe_mode, tot.n_queries, tot.n_exact,
         |       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       CAST(coalesce(h.n_hits, 0) * 1000000 // tot.n_exact AS BIGINT)
         |         AS recall_ppm
         |FROM modes m LEFT JOIN h USING (probe_mode), tot
         |ORDER BY m.probe_mode""".stripMargin,

    // s36: one plane/codes evaluation shared by both epochs — bands0
    // masks at the frozen (even-half) width, bands1 at that width + 1;
    // per-epoch occupancy stats + sampled candidate recall against the
    // shared exact denominator; paramsF (full corpus) drives the breach
    // flag exactly like the engine's cached width compare.
    "s36_epoch_rebuild" -> {
      def epochSql(sfx: String) =
        s"""occ$sfx AS (SELECT bid, bkey, count(*) occ
           |           FROM bands$sfx GROUP BY 1, 2),
           |st$sfx AS (SELECT CAST(count(*) AS BIGINT) n_buckets,
           |               CAST(max(occ) AS BIGINT) max_occ,
           |               CAST(sum(occ) AS BIGINT) n_rows FROM occ$sfx),
           |cand$sfx AS (SELECT DISTINCT a.vec_id, b.vec_id nbr_id
           |          FROM bands$sfx a JOIN bands$sfx b
           |            ON a.bid = b.bid AND a.bkey = b.bkey
           |           AND a.vec_id <> b.vec_id
           |          WHERE a.vec_id % $RecallSampleMod = 0
           |            AND a.vec_id < $RecallSampleCap),
           |ann$sfx AS (SELECT vec_id, nbr_id FROM (
           |         SELECT c.vec_id, c.nbr_id,
           |           row_number() OVER (PARTITION BY c.vec_id ORDER BY
           |             round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) DESC,
           |             c.nbr_id ASC) rk
           |         FROM cand$sfx c JOIN e x ON x.vec_id = c.vec_id
           |                      JOIN e y ON y.vec_id = c.nbr_id)
           |        WHERE rk <= $KnnK),
           |h$sfx AS (SELECT CAST(count(*) AS BIGINT) n_hits
           |       FROM ex JOIN ann$sfx USING (vec_id, nbr_id))""".stripMargin
      def epochSelect(sfx: String, epoch: String, params: String) =
        s"""SELECT '$epoch' AS epoch, CAST(p.b AS BIGINT) AS b,
           |       st$sfx.n_buckets, st$sfx.max_occ,
           |       CAST(st$sfx.n_rows * 1000000 // st$sfx.n_buckets AS BIGINT)
           |         AS mean_occ_micro,
           |       tot.n_exact, h$sfx.n_hits,
           |       CAST(h$sfx.n_hits * 1000000 // tot.n_exact AS BIGINT)
           |         AS recall_ppm,
           |       CAST(CASE WHEN pf.b > p.b THEN 1 ELSE 0 END AS INTEGER)
           |         AS breached
           |FROM $params p, paramsF pf, st$sfx, h$sfx, tot""".stripMargin
      s"""WITH $duckEmb,
         |${duckScaledBandsNamed("vec_id % 2 = 0", 0, "0")},
         |${duckWidthParams("vec_id % 2 = 0", "params1", 1)},
         |${duckBandsFromCodes("0", "params1", "bands1")},
         |${duckWidthParams("TRUE", "paramsF", 0)},
         |qs AS (SELECT * FROM e WHERE $duckRecallSampled),
         |ex AS (SELECT vec_id, nbr_id FROM (
         |        SELECT q.vec_id, x.vec_id nbr_id,
         |          row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |            round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6) DESC,
         |            x.vec_id ASC) rk
         |        FROM qs q JOIN e x ON q.vec_id <> x.vec_id)
         |       WHERE rk <= $KnnK),
         |tot AS (SELECT CAST(count(*) AS BIGINT) n_exact FROM ex),
         |${epochSql("0")},
         |${epochSql("1")}
         |${epochSelect("0", "e0_frozen", "params0")}
         |UNION ALL
         |${epochSelect("1", "e1_rebuilt", "params1")}
         |ORDER BY epoch""".stripMargin
    },

    // s38: margins as a full-width per-table DOUBLE[] (the list_dot_product
    // literal planes — bit-equal to the engine's dot_product), singleton +
    // pair perturbation sets ranked per (query, table) by (score, bits),
    // top pr.b probe beside the exact bucket; both modes share the exact
    // denominator and report distinct-candidate mass.
    "s38_query_directed" -> {
      def mlist(t: Int): String = (0 until LshPlanesExt).map { r =>
        s"abs(list_dot_product(v, [${tablePlaneSign(t, r)
          .map(s => if (s > 0) "1.0" else "-1.0").mkString(",")}]))"
      }.mkString("[", ",\n       ", "]")
      val mcase = (0 until AnnHubTables)
        .map(t => s"WHEN bid = $t THEN ${mlist(t)}")
        .mkString("CASE ", "\n       ", " END")
      s"""WITH $duckEmb,
         |$duckScaledBands,
         |qs AS (SELECT * FROM e WHERE $duckRecallSampled),
         |ex AS (SELECT vec_id qid, nbr_id FROM (
         |        SELECT q.vec_id, x.vec_id nbr_id,
         |          row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |            round(list_dot_product(q.v, x.v) / (q.nrm * x.nrm), 6) DESC,
         |            x.vec_id ASC) rk
         |        FROM qs q JOIN e x ON q.vec_id <> x.vec_id)
         |       WHERE rk <= $KnnK),
         |mg AS (SELECT b.vec_id qid, b.bid, b.bkey,
         |         $mcase m
         |       FROM bands b JOIN e ON e.vec_id = b.vec_id
         |       WHERE b.vec_id % $RecallSampleMod = 0
         |         AND b.vec_id < $RecallSampleCap),
         |sg AS (SELECT qid, bid, bkey, m, unnest(range(1, pr.b + 1)) r
         |       FROM mg, params pr),
         |pr2 AS (SELECT qid, bid, bkey, m, r, unnest(range(r + 1, pr.b + 1)) s
         |        FROM sg, params pr),
         |perturb AS (
         |  SELECT qid, bid, bkey, m[CAST(r AS INT)] score,
         |         (1 << (r - 1)) bits FROM sg
         |  UNION ALL
         |  SELECT qid, bid, bkey, m[CAST(r AS INT)] + m[CAST(s AS INT)],
         |         (1 << (r - 1)) + (1 << (s - 1)) FROM pr2),
         |ranked AS (SELECT qid, bid, CAST(xor(bkey, bits) AS BIGINT) pkey
         |           FROM (SELECT *, row_number() OVER (PARTITION BY qid, bid
         |                   ORDER BY score ASC, bits ASC) rk FROM perturb),
         |                params pr
         |           WHERE rk <= pr.b),
         |probesM AS (
         |  SELECT vec_id qid, bid, CAST(bkey AS BIGINT) pkey
         |  FROM bands WHERE $duckRecallSampled
         |  UNION ALL SELECT qid, bid, pkey FROM ranked),
         |flips AS (SELECT vec_id qid, bid, CAST(bkey AS BIGINT) bkey0,
         |            unnest(range(0, pr.b)) r
         |          FROM bands, params pr WHERE $duckRecallSampled),
         |probesS AS (
         |  SELECT vec_id qid, bid, CAST(bkey AS BIGINT) pkey
         |  FROM bands WHERE $duckRecallSampled
         |  UNION ALL
         |  SELECT qid, bid, xor(bkey0, CAST(1 AS BIGINT) << r) FROM flips),
         |candM AS (SELECT DISTINCT p.qid, i.vec_id nbr_id
         |          FROM probesM p JOIN bands i
         |            ON i.bid = p.bid AND CAST(i.bkey AS BIGINT) = p.pkey
         |           AND i.vec_id <> p.qid),
         |candS AS (SELECT DISTINCT p.qid, i.vec_id nbr_id
         |          FROM probesS p JOIN bands i
         |            ON i.bid = p.bid AND CAST(i.bkey AS BIGINT) = p.pkey
         |           AND i.vec_id <> p.qid),
         |tot AS (SELECT CAST(count(*) AS BIGINT) n_exact FROM ex),
         |modes AS (
         |  SELECT 't1_shell1' probe_mode, qid, nbr_id FROM candS
         |  UNION ALL SELECT 'q1_margin', qid, nbr_id FROM candM),
         |sc AS (SELECT mo.probe_mode, mo.qid, mo.nbr_id,
         |         round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) cosine
         |       FROM modes mo JOIN e x ON x.vec_id = mo.qid
         |                     JOIN e y ON y.vec_id = mo.nbr_id),
         |tops AS (SELECT probe_mode, qid, nbr_id FROM (
         |          SELECT probe_mode, qid, nbr_id,
         |            row_number() OVER (PARTITION BY probe_mode, qid
         |              ORDER BY cosine DESC, nbr_id ASC) rk
         |          FROM sc) WHERE rk <= $KnnK),
         |h AS (SELECT probe_mode, CAST(count(*) AS BIGINT) n_hits
         |      FROM tops t JOIN ex ON ex.qid = t.qid AND ex.nbr_id = t.nbr_id
         |      GROUP BY 1),
         |nc AS (SELECT probe_mode, CAST(count(*) AS BIGINT) n_cand
         |       FROM modes GROUP BY 1)
         |SELECT nc.probe_mode, tot.n_exact, nc.n_cand,
         |       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
         |       CAST(coalesce(h.n_hits, 0) * 1000000 // tot.n_exact AS BIGINT)
         |         AS recall_ppm
         |FROM nc LEFT JOIN h USING (probe_mode), tot
         |ORDER BY nc.probe_mode""".stripMargin
    },

    // s37: the 16 standard bits per table plus the per-table "ext" bit;
    // the widened key is composed as code + ext·2^16, so the oracle
    // independently re-derives what the engine's widened kernel computes
    // bit-by-bit; containment via ANTI JOIN of the two pair sets.
    "s37_family_widening" -> {
      // same list_dot_product literal-array form as duckScaledBandsNamed
      // (sign-identical, ~15x cheaper than the 64-term sum exprs)
      def dot(t: Int, r: Int): String =
        s"list_dot_product(v, [${tablePlaneSign(t, r)
          .map(s => if (s > 0) "1.0" else "-1.0").mkString(",")}])"
      val ss = ((for (t <- 0 until AnnHubTables; r <- 0 until LshPlanes)
        yield s"((${dot(t, r)}) > 0) s${t}_$r") ++
        (0 until AnnHubTables).map(t =>
          s"((${dot(t, LshPlanes)}) > 0) x$t"))
        .mkString(",\n       ")
      val codes = (0 until AnnHubTables).map { t =>
        val c = (0 until LshPlanes)
          .map(r => s"(CASE WHEN s${t}_$r THEN ${1 << r} ELSE 0 END)")
          .mkString(" + ")
        s"($c) code$t, x$t"
      }.mkString(",\n       ")
      def tables(key: Int => String) = (0 until AnnHubTables).map(t =>
        s"SELECT vec_id, $t bid, ${key(t)} bkey FROM codes").mkString("\nUNION ALL\n")
      s"""WITH $duckEmb,
         |bits AS (SELECT vec_id, v,
         |       $ss
         |  FROM e),
         |codes AS MATERIALIZED (SELECT vec_id,
         |       $codes
         |  FROM bits),
         |lo AS MATERIALIZED (
         |${tables(t => s"code$t")}),
         |hi AS MATERIALIZED (
         |${tables(t => s"code$t + (CASE WHEN x$t THEN ${1 << LshPlanes} ELSE 0 END)")}),
         |rm AS (SELECT CAST(count(*) AS BIGINT) n_rows,
         |         CAST(coalesce(sum(CASE WHEN (hi.bkey & ${(1 << LshPlanes) - 1})
         |             <> lo.bkey THEN 1 ELSE 0 END), 0) AS BIGINT) n_lowbit_mismatch
         |       FROM lo JOIN hi USING (vec_id, bid)),
         |oc0 AS (SELECT bid, bkey, count(*) occ FROM lo GROUP BY 1, 2),
         |st0 AS (SELECT CAST(count(*) AS BIGINT) n_buckets_lo,
         |               CAST(max(occ) AS BIGINT) max_occ_lo FROM oc0),
         |oc1 AS (SELECT bid, bkey, count(*) occ FROM hi GROUP BY 1, 2),
         |st1 AS (SELECT CAST(count(*) AS BIGINT) n_buckets_hi,
         |               CAST(max(occ) AS BIGINT) max_occ_hi FROM oc1),
         |p0 AS (SELECT DISTINCT a.vec_id x, b.vec_id y FROM lo a JOIN lo b
         |       ON a.bid = b.bid AND a.bkey = b.bkey AND a.vec_id <> b.vec_id
         |       WHERE a.vec_id % $RecallSampleMod = 0 AND a.vec_id < $RecallSampleCap),
         |p1 AS (SELECT DISTINCT a.vec_id x, b.vec_id y FROM hi a JOIN hi b
         |       ON a.bid = b.bid AND a.bkey = b.bkey AND a.vec_id <> b.vec_id
         |       WHERE a.vec_id % $RecallSampleMod = 0 AND a.vec_id < $RecallSampleCap),
         |vl AS (SELECT CAST(count(*) AS BIGINT) n_containment_violations
         |       FROM p1 ANTI JOIN p0 ON p1.x = p0.x AND p1.y = p0.y)
         |SELECT CAST($LshPlanes AS BIGINT) AS b_lo,
         |       CAST(${LshPlanes + 1} AS BIGINT) AS b_hi,
         |       rm.n_rows, st0.n_buckets_lo, st0.max_occ_lo,
         |       st1.n_buckets_hi, st1.max_occ_hi,
         |       rm.n_lowbit_mismatch, vl.n_containment_violations
         |FROM rm, st0, st1, vl""".stripMargin
    },

    // r_ann_epoch_replay: the two-phase epoch-crossing edge set — one
    // shared widened-codes evaluation masked at b0 (standing/even width)
    // and b0+1 (the migrated width), pair sets split by the
    // later-arrival-parity rule.
    "r_ann_epoch_replay" -> {
      def pairCte(name: String, bands: String, where: String) =
        s"""$name AS (SELECT DISTINCT a.vec_id va, b.vec_id vb,
           |    round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) c
           |  FROM $bands a JOIN $bands b
           |    ON a.bid = b.bid AND a.bkey = b.bkey AND a.vec_id < b.vec_id
           |  JOIN e ea ON ea.vec_id = a.vec_id
           |  JOIN e eb ON eb.vec_id = b.vec_id
           |  WHERE $where
           |    AND round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6)
           |        >= $NearDupThreshold)""".stripMargin
      s"""WITH $duckEmb,
         |${duckScaledBandsNamed("vec_id % 2 = 0", 0, "ep0")},
         |${duckWidthParams("vec_id % 2 = 0", "paramsep1", 1)},
         |${duckBandsFromCodes("ep0", "paramsep1", "bandsep1")},
         |${pairCte("p1", "bandsep0",
            "a.vec_id % 2 = 0 AND b.vec_id % 2 = 0")},
         |${pairCte("p2", "bandsep1",
            "(a.vec_id % 2 = 1 OR b.vec_id % 2 = 1)")}
         |SELECT 'epoch1' AS phase, va AS vec_a, vb AS vec_b, c AS cosine FROM p1
         |UNION ALL
         |SELECT 'epoch2', va, vb, c FROM p2
         |ORDER BY phase, vec_a, vec_b""".stripMargin
    },

    // r_ann_evict_replay: the gap-chain residency rule over the
    // minute-fed corpus — bands at the adaptive width, per-bucket
    // distinct-arrival-minute gaps via lag(), chain-break rows joined
    // into the candidate range, EXISTS-unbroken-bucket via the
    // per-(pair, bucket) aggregate.
    "r_ann_evict_replay" -> {
      val g = EvictReplayWm + 1
      s"""WITH $duckEmb,
         |$duckScaledBands,
         |bm AS (SELECT vec_id, bid, bkey, vec_id // $EvictReplayPerMin am
         |       FROM bands),
         |mins AS (SELECT DISTINCT bid, bkey, am FROM bm),
         |brk AS (SELECT bid, bkey, break_minute FROM (
         |    SELECT bid, bkey, am break_minute,
         |           am - lag(am) OVER (PARTITION BY bid, bkey
         |             ORDER BY am) gap
         |    FROM mins) WHERE gap > $g),
         |cand AS (SELECT a.vec_id va, b.vec_id vb, a.bid bid, a.bkey bkey,
         |           least(a.am, b.am) t_lo,
         |           greatest(a.am, b.am) t_hi,
         |           round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) c
         |         FROM bm a JOIN bm b
         |           ON a.bid = b.bid AND a.bkey = b.bkey AND a.vec_id < b.vec_id
         |         JOIN e ea ON ea.vec_id = a.vec_id
         |         JOIN e eb ON eb.vec_id = b.vec_id
         |         WHERE round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6)
         |               >= $NearDupThreshold),
         |ok AS (SELECT va, vb, c
         |       FROM cand LEFT JOIN brk
         |         ON cand.bid = brk.bid AND cand.bkey = brk.bkey
         |        AND brk.break_minute > cand.t_lo
         |        AND brk.break_minute <= cand.t_hi
         |       GROUP BY va, vb, cand.bid, cand.bkey, c
         |       HAVING max(CASE WHEN brk.break_minute IS NOT NULL
         |                  THEN 1 ELSE 0 END) = 0)
         |SELECT DISTINCT va AS vec_a, vb AS vec_b, c AS cosine FROM ok
         |ORDER BY vec_a, vec_b""".stripMargin
    },

    // r_ann_evict_epoch_replay: the composed evict+migrate rule — mcx
    // derives the crossing by integer arithmetic, the shared widened
    // codes CTE masks at b0 (phase-1 census width) and b0+1, epoch1 is
    // the single-epoch gap-chain over phase-1 rows, epoch2 the merged
    // parent/child chain + migration-cut rule of evictEpochPairsOn.
    "r_ann_evict_epoch_replay" -> {
      val g = EvictReplayWm + 1
      val pmWhere = s"vec_id < (SELECT mcv FROM mcx) * $EvictReplayPerMin"
      s"""WITH $duckEmb,
         |mcx AS (SELECT count(*) // $EvictReplayPerMin // 2 mcv
         |        FROM embeddings),
         |${duckScaledBandsNamed(pmWhere, 0, "ee")},
         |${duckWidthParams(pmWhere, "paramsee1", 1)},
         |${duckBandsFromCodes("ee", "paramsee1", "bandsee1")},
         |bm1 AS (SELECT vec_id, bid, bkey, vec_id // $EvictReplayPerMin am
         |        FROM bandsee WHERE $pmWhere),
         |mins1 AS (SELECT DISTINCT bid, bkey, am FROM bm1),
         |brk1 AS (SELECT bid, bkey, break_minute FROM (
         |    SELECT bid, bkey, am break_minute,
         |           am - lag(am) OVER (PARTITION BY bid, bkey
         |             ORDER BY am) gap
         |    FROM mins1) WHERE gap > $g),
         |cand1 AS (SELECT a.vec_id va, b.vec_id vb, a.bid bid, a.bkey bkey,
         |           least(a.am, b.am) t_lo,
         |           greatest(a.am, b.am) t_hi,
         |           round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) c
         |         FROM bm1 a JOIN bm1 b
         |           ON a.bid = b.bid AND a.bkey = b.bkey AND a.vec_id < b.vec_id
         |         JOIN e ea ON ea.vec_id = a.vec_id
         |         JOIN e eb ON eb.vec_id = b.vec_id
         |         WHERE round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6)
         |               >= $NearDupThreshold),
         |ok1 AS (SELECT va, vb, c
         |       FROM cand1 LEFT JOIN brk1
         |         ON cand1.bid = brk1.bid AND cand1.bkey = brk1.bkey
         |        AND brk1.break_minute > cand1.t_lo
         |        AND brk1.break_minute <= cand1.t_hi
         |       GROUP BY va, vb, cand1.bid, cand1.bkey, c
         |       HAVING max(CASE WHEN brk1.break_minute IS NOT NULL
         |                  THEN 1 ELSE 0 END) = 0),
         |bm2 AS (SELECT vec_id, bid, bkey, vec_id // $EvictReplayPerMin am
         |        FROM bandsee1),
         |cmins AS (SELECT DISTINCT bid, bkey, am FROM bm2
         |          WHERE am >= (SELECT mcv FROM mcx)),
         |pmins0 AS (SELECT DISTINCT bid, bkey & ((1 << pr.b) - 1) pk, am
         |           FROM bm2, paramsee pr
         |           WHERE am < (SELECT mcv FROM mcx)),
         |pmins AS (SELECT bid, pk bkey, am FROM pmins0
         |          UNION
         |          SELECT bid, pk + (1 << pr.b) bkey, am
         |          FROM pmins0, paramsee pr),
         |amins AS (SELECT DISTINCT bid, bkey, am FROM (
         |          SELECT bid, bkey, am FROM cmins
         |          UNION ALL SELECT bid, bkey, am FROM pmins)),
         |brk2 AS (SELECT bid, bkey, break_minute FROM (
         |    SELECT bid, bkey, am break_minute,
         |           am - lag(am) OVER (PARTITION BY bid, bkey
         |             ORDER BY am) gap
         |    FROM amins) WHERE gap > $g),
         |lastp AS (SELECT bid, bkey, max(am) lpm FROM amins
         |          WHERE am < (SELECT mcv FROM mcx) GROUP BY bid, bkey),
         |cand2 AS (SELECT a.vec_id va, b.vec_id vb, a.bid bid, a.bkey bkey,
         |           least(a.am, b.am) t_lo,
         |           greatest(a.am, b.am) t_hi,
         |           round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6) c
         |         FROM bm2 a JOIN bm2 b
         |           ON a.bid = b.bid AND a.bkey = b.bkey AND a.vec_id < b.vec_id
         |         JOIN e ea ON ea.vec_id = a.vec_id
         |         JOIN e eb ON eb.vec_id = b.vec_id
         |         WHERE greatest(a.am, b.am) >= (SELECT mcv FROM mcx)
         |           AND round(list_dot_product(ea.v, eb.v) / (ea.nrm * eb.nrm), 6)
         |               >= $NearDupThreshold),
         |grp2 AS (SELECT cand2.va, cand2.vb, cand2.bid, cand2.bkey,
         |           cand2.c, cand2.t_lo,
         |           max(CASE WHEN brk2.break_minute IS NOT NULL
         |               THEN 1 ELSE 0 END) broken
         |         FROM cand2 LEFT JOIN brk2
         |           ON cand2.bid = brk2.bid AND cand2.bkey = brk2.bkey
         |          AND brk2.break_minute > cand2.t_lo
         |          AND brk2.break_minute <= cand2.t_hi
         |         GROUP BY 1, 2, 3, 4, 5, 6),
         |ok2 AS (SELECT DISTINCT g2.va, g2.vb, g2.c
         |        FROM grp2 g2 LEFT JOIN lastp
         |          ON g2.bid = lastp.bid AND g2.bkey = lastp.bkey, mcx
         |        WHERE g2.broken = 0
         |          AND (g2.t_lo >= mcx.mcv OR
         |               coalesce(lastp.lpm, -9223372036854775807)
         |                 > mcx.mcv - 1 - $EvictReplayWm))
         |SELECT 'epoch1' AS phase, va AS vec_a, vb AS vec_b, c AS cosine
         |FROM (SELECT DISTINCT va, vb, c FROM ok1)
         |UNION ALL
         |SELECT 'epoch2', va, vb, c FROM ok2
         |ORDER BY phase, vec_a, vec_b""".stripMargin
    },

    // The three power-iteration rounds unrolled; HUGEINT sums and //
    // renormalization mirror the engine's decimal(38,0) + truncating
    // division exactly.
    "s27_power_iteration" -> {
      def round(prev: String, out: String) =
        s"""d$out AS (SELECT vec_id,
           |        SUM(CAST(val AS HUGEINT) * v) // 1000000 AS d
           |      FROM u JOIN $prev USING (dim) GROUP BY vec_id),
           |n$out AS (SELECT dim, SUM(CAST(d AS HUGEINT) * val) s
           |      FROM u JOIN d$out USING (vec_id) GROUP BY dim),
           |m$out AS (SELECT greatest(MAX(ABS(s)), 1) m FROM n$out),
           |$out AS (SELECT dim, CAST(s * 1000000 // m AS HUGEINT) v
           |      FROM n$out, m$out)""".stripMargin
      s"""WITH x AS (SELECT vec_id,
         |        list_transform(embedding::DOUBLE[],
         |          e -> CAST(round(e * 1000000.0, 0) AS BIGINT)) xm
         |      FROM embeddings),
         |u AS (SELECT vec_id, CAST(i AS BIGINT) dim, xm[CAST(i AS INT)] val
         |      FROM x, unnest(range(1, $PowerDim + 1)) t(i)),
         |v0 AS (SELECT CAST(i AS BIGINT) dim, CAST(1000000 AS HUGEINT) v
         |      FROM unnest(range(1, $PowerDim + 1)) t(i)),
         |${round("v0", "v1")},
         |${round("v1", "v2")},
         |${round("v2", "v3")}
         |SELECT dim, CAST(v AS BIGINT) AS v_micro
         |FROM v3 ORDER BY dim""".stripMargin
    },

    // the nested s16 statement re-declares `e` in its own scope; DuckDB
    // 1.0 cannot mix MATERIALIZED with cross-scope alias shadowing
    // (bind error, or an internal recursive-CTE-scan fault) — this one
    // statement stays fully inlined, its r13 shape
    "s25_coreset_quality" ->
      s"""WITH kc AS (${duckS16Sql.replace(" AS MATERIALIZED (", " AS (")}),
         |${duckEmb.replace(" AS MATERIALIZED (", " AS (")},
         |sel AS (SELECT 'a_kcenter' AS method, vec_id FROM kc
         |        UNION ALL
         |        SELECT 'b_first_k', unnest(range(0, $KCenterK))),
         |wv AS (SELECT sel.method, sel.vec_id, e.v, e.nrm
         |       FROM sel JOIN e USING (vec_id)),
         |pr AS (SELECT x.method,
         |         CAST(round(round(list_dot_product(x.v, y.v)
         |              / (x.nrm * y.nrm), 6) * 1000000.0, 0) AS BIGINT) cm
         |       FROM wv x JOIN wv y
         |         ON x.method = y.method AND x.vec_id < y.vec_id)
         |SELECT method, count(*) AS n_pairs,
         |       CAST(max(cm) AS BIGINT) AS max_cos_micro,
         |       CAST(sum(cm) // count(*) AS BIGINT) AS mean_cos_micro
         |FROM pr GROUP BY method ORDER BY method""".stripMargin,

    "s23_isotropy" ->
      s"""WITH e AS (SELECT vec_id,
         |       list_transform(embedding::DOUBLE[],
         |         x -> CAST(round(x * 1000000.0, 0) AS BIGINT)) vm
         |     FROM embeddings),
         |nn AS (SELECT count(*) n FROM e),
         |dd AS (SELECT unnest(range(1, ${LshDims + 1})) dim),
         |g AS (SELECT dim, CAST(sum(vm[dim]) AS BIGINT) sx,
         |        CAST(sum(vm[dim] * vm[dim]) AS BIGINT) sx2
         |      FROM e CROSS JOIN dd GROUP BY dim),
         |v AS (SELECT dim, sx, nn.n,
         |        CAST(nn.n AS HUGEINT) * sx2 - CAST(sx AS HUGEINT) * sx var_num
         |      FROM g, nn),
         |t AS (SELECT sum(var_num) tot FROM v)
         |SELECT CAST(dim AS BIGINT) AS dim,
         |       CAST(sx // n AS BIGINT) AS mean_micro,
         |       CAST(var_num * 1000000 // t.tot AS BIGINT) AS var_share_ppm
         |FROM v, t ORDER BY dim""".stripMargin,

    // Independent formulation: both assignment passes as cross join +
    // row_number argmin (vs the engine's literal-centroid projections).
    "s22_reassignment_churn" ->
      s"""WITH e AS (SELECT vec_id,
         |       list_transform(embedding::DOUBLE[],
         |         x -> CAST(round(x * 1000000.0, 0) AS BIGINT)) vm
         |     FROM embeddings),
         |c AS (SELECT vec_id cent_id, vm cm FROM e
         |      WHERE vec_id BETWEEN 1 AND $KmeansK),
         |d AS (SELECT e.vec_id, c.cent_id, e.vm,
         |        CAST(list_aggregate(list_transform(range(1, ${LshDims + 1}),
         |          i -> (e.vm[i] - c.cm[i]) * (e.vm[i] - c.cm[i])), 'sum') AS BIGINT) d2m
         |      FROM e CROSS JOIN c),
         |a AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |        ORDER BY d2m ASC, cent_id ASC) rk FROM d),
         |asgn AS (SELECT vec_id, cent_id AS cluster, vm FROM a WHERE rk = 1),
         |dd AS (SELECT unnest(range(1, ${LshDims + 1})) dim),
         |nx AS (SELECT cluster, dim,
         |         CAST(sum(vm[dim]) // count(*) AS BIGINT) cmv
         |       FROM asgn CROSS JOIN dd GROUP BY 1, 2),
         |nc0 AS (SELECT cluster cent_id, list(cmv ORDER BY dim) cm
         |        FROM nx GROUP BY 1),
         |nc AS (SELECT c.cent_id, coalesce(nc0.cm, c.cm) cm
         |       FROM c LEFT JOIN nc0 USING (cent_id)),
         |d2 AS (SELECT asgn.vec_id, asgn.cluster old_cluster, nc.cent_id,
         |         CAST(list_aggregate(list_transform(range(1, ${LshDims + 1}),
         |           i -> (asgn.vm[i] - nc.cm[i]) * (asgn.vm[i] - nc.cm[i])),
         |           'sum') AS BIGINT) d2m
         |       FROM asgn CROSS JOIN nc),
         |r2 AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |         ORDER BY d2m ASC, cent_id ASC) rk FROM d2),
         |fin AS (SELECT vec_id, old_cluster, cent_id new_cluster
         |        FROM r2 WHERE rk = 1)
         |SELECT old_cluster, count(*) AS n_vecs,
         |       CAST(sum(CASE WHEN new_cluster <> old_cluster THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_moved,
         |       CAST(sum(CASE WHEN new_cluster <> old_cluster THEN 1 ELSE 0 END)
         |            * 1000000 // count(*) AS BIGINT) AS churn_ppm
         |FROM fin GROUP BY old_cluster ORDER BY old_cluster""".stripMargin,

    // Independent formulation: a plain ntile() window over the margins
    // differentially checks the RankOps rank + exact-NTILE arithmetic.
    "s21_calibration" -> {
      val wDuck = probeWeights
        .map(_.mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |         list_transform(embedding::DOUBLE[],
         |           x -> CAST(round(x * 1000000.0, 0) AS BIGINT)) em
         |  FROM embeddings),
         |s AS (
         |  SELECT vec_id, CAST(label AS BIGINT) % $ProbeClasses AS target,
         |         list_transform($wDuck,
         |           ws -> CAST(list_dot_product(ws::DOUBLE[], em::DOUBLE[]) AS BIGINT))
         |           AS scores
         |  FROM e),
         |m AS (
         |  SELECT vec_id, target,
         |         CAST(list_position(scores, list_aggregate(scores, 'max')) - 1
         |              AS BIGINT) pred,
         |         CAST(list_aggregate(scores, 'max')
         |              - list_sort(scores)[${ProbeClasses - 1}] AS BIGINT) margin
         |  FROM s),
         |t AS (SELECT *, CAST(ntile(10) OVER (ORDER BY margin, vec_id) AS BIGINT)
         |        decile FROM m)
         |SELECT decile, count(*) AS n_vecs,
         |       CAST(sum(CASE WHEN pred = target THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_correct,
         |       CAST(sum(margin) // count(*) AS BIGINT) AS mean_margin,
         |       CAST(sum(CASE WHEN pred = target THEN 1 ELSE 0 END) * 1000000
         |            // count(*) AS BIGINT) AS acc_ppm
         |FROM t GROUP BY decile ORDER BY decile""".stripMargin
    },
    // Independent formulation: centroid distances via a corpus x centroid
    // cross join + conditional aggregation (vs the literal-array
    // projection the engine plans). Sign-branched floor division matches
    // the engine's non-negative-operand discipline.
    "s20_silhouette" ->
      s"""WITH e AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
         |       list_transform(embedding::DOUBLE[],
         |         x -> CAST(round(x * 1000000.0, 0) AS BIGINT)) vm
         |     FROM embeddings),
         |dd AS (SELECT unnest(range(1, ${LshDims + 1})) dim),
         |cx AS (SELECT label, dim, CAST(sum(vm[dim]) // count(*) AS BIGINT) cm
         |       FROM e CROSS JOIN dd GROUP BY 1, 2),
         |c AS (SELECT label clabel, list(cm ORDER BY dim) cm FROM cx GROUP BY 1),
         |d AS (SELECT e.vec_id, e.label, c.clabel,
         |        CAST(list_aggregate(list_transform(range(1, ${LshDims + 1}),
         |          i -> (e.vm[i] - c.cm[i]) * (e.vm[i] - c.cm[i])), 'sum') AS BIGINT) d2
         |      FROM e CROSS JOIN c),
         |ab AS (SELECT vec_id, label,
         |         max(CASE WHEN clabel = label THEN d2 END) a2,
         |         min(CASE WHEN clabel <> label THEN d2 END) b2
         |       FROM d GROUP BY 1, 2),
         |s AS (SELECT label,
         |        CASE WHEN greatest(a2, b2) = 0 THEN 0
         |             WHEN b2 >= a2
         |               THEN CAST(CAST(b2 - a2 AS HUGEINT) * 1000000
         |                         // greatest(a2, b2) AS BIGINT)
         |             ELSE -CAST(CAST(a2 - b2 AS HUGEINT) * 1000000
         |                        // greatest(a2, b2) AS BIGINT)
         |        END s_ppm
         |      FROM ab)
         |SELECT label, count(*) AS n_vecs,
         |       CASE WHEN sum(s_ppm) >= 0
         |            THEN CAST(sum(s_ppm) // count(*) AS BIGINT)
         |            ELSE -CAST((-sum(s_ppm)) // count(*) AS BIGINT) END AS mean_sil_ppm,
         |       CAST(sum(CASE WHEN s_ppm < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_misfit
         |FROM s GROUP BY label ORDER BY label""".stripMargin,
    "s19_nprobe_sweep" -> {
      val spList = NprobeSweep.mkString("[", ", ", "]")
      s"""WITH $duckEmb,
         |cents AS (SELECT vec_id cent_id, v cv, nrm cnrm FROM e
         |          WHERE vec_id BETWEEN 1 AND $IvfCentroids),
         |asgn AS (
         |  SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
         |           ORDER BY round(list_dot_product(v, cv) / (nrm * cnrm), 6) DESC,
         |                    cent_id ASC) rk
         |  FROM e CROSS JOIN cents WHERE vec_id > 0),
         |cells AS (SELECT vec_id, cent_id FROM asgn WHERE rk = 1),
         |q AS (SELECT v qv, nrm qnrm FROM e WHERE vec_id = 0),
         |qprobe AS (
         |  SELECT cent_id, row_number() OVER (
         |           ORDER BY round(list_dot_product(qv, cv) / (qnrm * cnrm), 6) DESC,
         |                    cent_id ASC) rk
         |  FROM q CROSS JOIN cents),
         |sp AS (SELECT unnest($spList) np),
         |probed AS (SELECT sp.np, qprobe.cent_id
         |           FROM qprobe CROSS JOIN sp WHERE qprobe.rk <= sp.np),
         |cand AS (SELECT p.np, c.vec_id,
         |           round(list_dot_product(e.v, q.qv) / (e.nrm * q.qnrm), 6) cosine
         |         FROM cells c JOIN probed p ON c.cent_id = p.cent_id
         |         JOIN e ON e.vec_id = c.vec_id, q),
         |top AS (SELECT np, vec_id FROM (
         |          SELECT np, vec_id, row_number() OVER (PARTITION BY np
         |            ORDER BY cosine DESC, vec_id ASC) rrk FROM cand)
         |        WHERE rrk <= 10),
         |ex AS (SELECT vec_id FROM (
         |         SELECT e.vec_id,
         |                round(list_dot_product(e.v, q.qv) / (e.nrm * q.qnrm), 6) cosine
         |         FROM e, q WHERE e.vec_id > 0
         |         ORDER BY cosine DESC, vec_id ASC LIMIT 10)),
         |nc AS (SELECT np, CAST(count(*) AS BIGINT) n_candidates FROM cand GROUP BY 1),
         |ht AS (SELECT np, CAST(count(*) AS BIGINT) hits
         |       FROM top JOIN ex USING (vec_id) GROUP BY 1)
         |SELECT CAST(sp.np AS BIGINT) AS nprobe,
         |       coalesce(nc.n_candidates, 0) AS n_candidates,
         |       coalesce(ht.hits, 0) AS hits,
         |       CAST(coalesce(ht.hits, 0) * 1000000 // 10 AS BIGINT) AS recall_ppm
         |FROM sp LEFT JOIN nc ON nc.np = sp.np LEFT JOIN ht ON ht.np = sp.np
         |ORDER BY nprobe""".stripMargin
    },

    "s18_embedding_drift" ->
      s"""WITH e AS (SELECT vec_id, label, vec_id % 2 AS batch,
         |        list_transform(embedding::DOUBLE[],
         |          x -> CAST(round(x * 1000000.0, 0) AS BIGINT)) vm
         |      FROM embeddings),
         |d AS (SELECT unnest(range(1, ${LshDims + 1})) dim),
         |cd AS (SELECT label, batch, dim,
         |         CAST(sum(vm[dim]) // count(*) AS BIGINT) c
         |       FROM e CROSS JOIN d GROUP BY 1, 2, 3),
         |pr AS (SELECT label, dim,
         |         max(CASE WHEN batch = 0 THEN c END) c0,
         |         max(CASE WHEN batch = 1 THEN c END) c1
         |       FROM cd GROUP BY 1, 2),
         |ag AS (SELECT label,
         |         CAST(sum((c0 - c1) * (c0 - c1)) AS BIGINT) shift2_micro2,
         |         CAST(sum(c0 * c1) AS BIGINT) dot,
         |         CAST(sum(c0 * c0) AS BIGINT) nn0,
         |         CAST(sum(c1 * c1) AS BIGINT) nn1
         |       FROM pr GROUP BY 1),
         |ct AS (SELECT label,
         |         CAST(SUM(CASE WHEN batch = 0 THEN 1 ELSE 0 END) AS BIGINT) n_ref,
         |         CAST(SUM(CASE WHEN batch = 1 THEN 1 ELSE 0 END) AS BIGINT) n_new
         |       FROM e GROUP BY 1)
         |SELECT ag.label, n_ref, n_new, shift2_micro2,
         |       round(dot / (sqrt(nn0) * sqrt(nn1)), 6) AS centroid_cos
         |FROM ag JOIN ct USING (label) ORDER BY label""".stripMargin,

    "s17_retrieval_eval" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] v,
         |        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) nrm
         |      FROM embeddings),
         |q AS (SELECT vec_id q_id, label q_label, v qv, nrm qn
         |      FROM e WHERE vec_id % $EvalSampleMod = 0),
         |r AS (SELECT q.q_id, q.q_label, e.vec_id nbr_id, e.label nbr_label,
         |        round(list_dot_product(e.v, q.qv) / (e.nrm * q.qn), 6) cosine
         |      FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
         |rnk AS (SELECT *, row_number() OVER (PARTITION BY q_id
         |          ORDER BY cosine DESC, nbr_id ASC) rk FROM r),
         |top AS (SELECT * FROM rnk WHERE rk <= $EvalK),
         |pq AS (SELECT q_id, q_label,
         |         SUM(CASE WHEN nbr_label = q_label THEN 1 ELSE 0 END) hits,
         |         MIN(CASE WHEN nbr_label = q_label THEN rk END) first_hit
         |       FROM top GROUP BY 1, 2)
         |SELECT q_label AS label, CAST(count(*) AS BIGINT) AS n_queries,
         |       CAST(SUM(hits * 1000000 // $EvalK) // count(*) AS BIGINT)
         |         AS mean_recall_ppm,
         |       CAST(SUM(coalesce(1000000 // first_hit, 0)) // count(*) AS BIGINT)
         |         AS mean_rr_micro
         |FROM pq GROUP BY q_label ORDER BY label""".stripMargin,

    "d18_semdedup" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v,
         |        list_transform(embedding::DOUBLE[],
         |          x -> CAST(round(x * 1000000.0, 0) AS BIGINT)) vm,
         |        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) nrm
         |      FROM embeddings),
         |c AS (SELECT vec_id cent_id, vm cm FROM e WHERE vec_id BETWEEN 1 AND $KmeansK),
         |d AS (SELECT e.vec_id, c.cent_id,
         |        CAST(list_aggregate(list_transform(range(1, ${LshDims + 1}),
         |          i -> (e.vm[i] - c.cm[i]) * (e.vm[i] - c.cm[i])), 'sum') AS BIGINT) d2m
         |      FROM e CROSS JOIN c),
         |aa AS (SELECT vec_id, cent_id, d2m, row_number() OVER (PARTITION BY vec_id
         |         ORDER BY d2m ASC, cent_id ASC) rk FROM d),
         |asgn AS (SELECT vec_id, cent_id AS cluster, d2m FROM aa WHERE rk = 1),
         |pr AS (SELECT x.vec_id,
         |         max(CASE WHEN round(list_dot_product(ex.v, ey.v)
         |                     / (ex.nrm * ey.nrm), 6) >= $SemDedupEps
         |                   AND (y.d2m > x.d2m
         |                        OR (y.d2m = x.d2m AND y.vec_id < x.vec_id))
         |              THEN 1 ELSE 0 END) dropped
         |       FROM asgn x JOIN asgn y
         |         ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
         |       JOIN e ex ON ex.vec_id = x.vec_id
         |       JOIN e ey ON ey.vec_id = y.vec_id
         |       GROUP BY x.vec_id)
         |SELECT asgn.vec_id, asgn.cluster, asgn.d2m,
         |       CAST(coalesce(pr.dropped, 0) AS INTEGER) AS dropped
         |FROM asgn LEFT JOIN pr ON asgn.vec_id = pr.vec_id
         |ORDER BY asgn.vec_id""".stripMargin,

    "s14_kmeans_step" ->
      s"""WITH e AS (SELECT vec_id,
         |       list_transform(embedding::DOUBLE[],
         |         x -> CAST(round(x * 1000000.0, 0) AS BIGINT)) vm
         |     FROM embeddings),
         |c AS (SELECT vec_id cent_id, vm cm FROM e WHERE vec_id BETWEEN 1 AND $KmeansK),
         |d AS (SELECT e.vec_id, c.cent_id, e.vm,
         |        CAST(list_aggregate(list_transform(range(1, ${LshDims + 1}),
         |          i -> (e.vm[i] - c.cm[i]) * (e.vm[i] - c.cm[i])), 'sum') AS BIGINT) d2m
         |      FROM e CROSS JOIN c),
         |a AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |        ORDER BY d2m ASC, cent_id ASC) rk FROM d),
         |asgn AS (SELECT vec_id, cent_id AS cluster, vm, d2m FROM a WHERE rk = 1),
         |st AS (SELECT cluster, CAST(count(*) AS BIGINT) n_vecs,
         |         CAST(sum(d2m) AS BIGINT) inertia_micro2 FROM asgn GROUP BY 1),
         |dd AS (SELECT unnest(range(1, ${LshDims + 1})) dim),
         |nx AS (SELECT cluster, CAST(dim AS BIGINT) AS dim,
         |         CAST(sum(vm[dim]) // count(*) AS BIGINT) centroid_micro
         |       FROM asgn CROSS JOIN dd GROUP BY 1, 2)
         |SELECT nx.cluster, nx.dim, centroid_micro, n_vecs, inertia_micro2
         |FROM nx JOIN st USING (cluster) ORDER BY cluster, dim""".stripMargin,

    "s12_linear_probe" -> {
      val wDuck = probeWeights
        .map(_.mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |         list_transform(embedding::DOUBLE[],
         |           x -> CAST(round(x * 1000000.0, 0) AS BIGINT)) em
         |  FROM embeddings),
         |s AS (
         |  SELECT label,
         |         list_transform($wDuck,
         |           ws -> CAST(list_dot_product(ws::DOUBLE[], em::DOUBLE[]) AS BIGINT))
         |           AS scores
         |  FROM e),
         |p AS (
         |  SELECT label,
         |         CAST(list_position(scores, list_aggregate(scores, 'max')) - 1
         |              AS BIGINT) pred,
         |         list_aggregate(scores, 'max') top
         |  FROM s)
         |SELECT label, pred, count(*) AS n, CAST(sum(top) AS BIGINT) AS sum_top_micro
         |FROM p GROUP BY 1, 2 ORDER BY label, pred""".stripMargin
    },

    "s11_ivfpq" ->
      s"""WITH $duckEmb,
         |cents AS (SELECT vec_id cent_id, v cv, nrm cnrm FROM e
         |          WHERE vec_id BETWEEN 1 AND $IvfCentroids),
         |asgn AS (
         |  SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
         |           ORDER BY round(list_dot_product(v, cv) / (nrm * cnrm), 6) DESC,
         |                    cent_id ASC) rk
         |  FROM e CROSS JOIN cents WHERE vec_id > 0),
         |cells AS (SELECT vec_id, cent_id FROM asgn WHERE rk = 1),
         |q AS (SELECT v qv, nrm qnrm FROM e WHERE vec_id = 0),
         |qprobe AS (
         |  SELECT cent_id, row_number() OVER (
         |           ORDER BY round(list_dot_product(qv, cv) / (qnrm * cnrm), 6) DESC,
         |                    cent_id ASC) rk
         |  FROM q CROSS JOIN cents),
         |probed AS (SELECT cent_id FROM qprobe WHERE rk <= $IvfNProbe),
         |sp AS (SELECT unnest(range(0, $PqSubspaces)) sub),
         |subs AS (SELECT vec_id, sub,
         |           list_slice(v, sub * $PqSubDim + 1, sub * $PqSubDim + $PqSubDim) sv
         |         FROM e CROSS JOIN sp),
         |cw AS (SELECT sub, vec_id cid, sv cw FROM subs
         |       WHERE vec_id BETWEEN 1 AND $PqCodewords),
         |d AS (SELECT s.vec_id, s.sub, c.cid,
         |        CAST(round(list_aggregate(list_transform(range(1, ${PqSubDim + 1}),
         |          i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i])), 'sum')
         |          * 1000000.0, 0) AS BIGINT) d2m
         |      FROM subs s JOIN cw c ON s.sub = c.sub),
         |codes AS (SELECT vec_id, sub, cid FROM (
         |            SELECT vec_id, sub, cid, row_number() OVER (
         |              PARTITION BY vec_id, sub ORDER BY d2m, cid) rk FROM d)
         |          WHERE rk = 1),
         |qsubs AS (SELECT sub,
         |            list_slice(qv, sub * $PqSubDim + 1, sub * $PqSubDim + $PqSubDim) sv
         |          FROM q CROSS JOIN sp),
         |qd AS (SELECT s.sub, c.cid,
         |         CAST(round(list_aggregate(list_transform(range(1, ${PqSubDim + 1}),
         |           i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i])), 'sum')
         |           * 1000000.0, 0) AS BIGINT) qd2m
         |       FROM qsubs s JOIN cw c ON s.sub = c.sub),
         |short AS (
         |  SELECT cells.vec_id, CAST(sum(qd.qd2m) AS BIGINT) approx_d2_micro
         |  FROM cells JOIN probed p ON cells.cent_id = p.cent_id
         |             JOIN codes ON codes.vec_id = cells.vec_id
         |             JOIN qd ON qd.sub = codes.sub AND qd.cid = codes.cid
         |  GROUP BY cells.vec_id
         |  ORDER BY approx_d2_micro ASC, cells.vec_id ASC LIMIT 10),
         |rr AS (
         |  SELECT s.vec_id, s.approx_d2_micro,
         |         round(list_dot_product(e.v, q.qv) / (e.nrm * q.qnrm), 6) cosine
         |  FROM short s JOIN e ON e.vec_id = s.vec_id, q)
         |SELECT vec_id, approx_d2_micro, cosine,
         |       CAST(row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS BIGINT) rk
         |FROM rr ORDER BY rk""".stripMargin,

    "s10_knn_join" ->
      s"""WITH $duckEmb,
         |c AS (SELECT a.vec_id vec_id, b.vec_id nbr_id,
         |        round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) cosine
         |      FROM e a JOIN e b
         |        ON a.label = b.label AND a.vec_id <> b.vec_id),
         |r AS (SELECT vec_id, nbr_id, cosine,
         |        CAST(row_number() OVER (PARTITION BY vec_id
         |          ORDER BY cosine DESC, nbr_id ASC) AS BIGINT) rk
         |      FROM c)
         |SELECT vec_id, nbr_id, cosine, rk
         |FROM r WHERE rk <= $KnnK ORDER BY vec_id, rk""".stripMargin,

    "s9_ann_recall" ->
      s"""WITH $duckEmb,
         |q0 AS (SELECT v qv0, nrm qnrm0 FROM e WHERE vec_id = 0),
         |ex10 AS (SELECT e.vec_id FROM e, q0 WHERE e.vec_id > 0
         |         ORDER BY round(list_dot_product(e.v, q0.qv0) / (e.nrm * q0.qnrm0), 6)
         |           DESC, e.vec_id ASC LIMIT 10),
         |$duckLsh,
         |lsh10 AS (SELECT e.vec_id FROM cand JOIN e ON e.vec_id = cand.vec_id, q
         |          ORDER BY round(list_dot_product(e.v, q.qv) / (e.nrm * q.qnrm), 6)
         |            DESC, e.vec_id ASC LIMIT 10),
         |cents AS (SELECT vec_id cent_id, v cv, nrm cnrm FROM e
         |          WHERE vec_id BETWEEN 1 AND $IvfCentroids),
         |iasgn AS (
         |  SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
         |           ORDER BY round(list_dot_product(v, cv) / (nrm * cnrm), 6) DESC,
         |                    cent_id ASC) rk
         |  FROM e CROSS JOIN cents WHERE vec_id > 0),
         |icells AS (SELECT vec_id, cent_id FROM iasgn WHERE rk = 1),
         |iqprobe AS (
         |  SELECT cent_id, row_number() OVER (
         |           ORDER BY round(list_dot_product(qv0, cv) / (qnrm0 * cnrm), 6) DESC,
         |                    cent_id ASC) rk
         |  FROM q0 CROSS JOIN cents),
         |iprobed AS (SELECT cent_id FROM iqprobe WHERE rk <= $IvfNProbe),
         |ivf10 AS (SELECT c.vec_id
         |          FROM icells c JOIN iprobed p ON c.cent_id = p.cent_id
         |          JOIN e ON e.vec_id = c.vec_id, q0
         |          ORDER BY round(list_dot_product(e.v, q0.qv0) / (e.nrm * q0.qnrm0), 6)
         |            DESC, c.vec_id ASC LIMIT 10)
         |SELECT CAST((SELECT count(*) FROM ex10) AS BIGINT) AS n_exact,
         |       CAST((SELECT count(*) FROM ex10 JOIN lsh10 USING (vec_id)) AS BIGINT)
         |         AS lsh_hits,
         |       CAST((SELECT count(*) FROM ex10 JOIN ivf10 USING (vec_id)) AS BIGINT)
         |         AS ivf_hits,
         |       round(CAST((SELECT count(*) FROM ex10 JOIN lsh10 USING (vec_id)) AS DOUBLE)
         |         / (SELECT count(*) FROM ex10), 6) AS lsh_recall,
         |       round(CAST((SELECT count(*) FROM ex10 JOIN ivf10 USING (vec_id)) AS DOUBLE)
         |         / (SELECT count(*) FROM ex10), 6) AS ivf_recall""".stripMargin,

    "s8_pq" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |sp AS (SELECT unnest(range(0, $PqSubspaces)) sub),
         |subs AS (SELECT vec_id, sub,
         |           list_slice(v, sub * $PqSubDim + 1, sub * $PqSubDim + $PqSubDim) sv
         |         FROM e CROSS JOIN sp),
         |cw AS (SELECT sub, vec_id cid, sv cw FROM subs
         |       WHERE vec_id BETWEEN 1 AND $PqCodewords),
         |d AS (SELECT s.vec_id, s.sub, c.cid,
         |        CAST(round(list_aggregate(list_transform(range(1, ${PqSubDim + 1}),
         |          i -> (s.sv[i] - c.cw[i]) * (s.sv[i] - c.cw[i])), 'sum')
         |          * 1000000.0, 0) AS BIGINT) d2m
         |      FROM subs s JOIN cw c ON s.sub = c.sub),
         |asg AS (SELECT vec_id, sub, cid, d2m,
         |          row_number() OVER (PARTITION BY vec_id, sub
         |                             ORDER BY d2m, cid) rk
         |        FROM d)
         |SELECT vec_id,
         |       string_agg(cid::VARCHAR, ',' ORDER BY sub) AS pq_code,
         |       CAST(sum(d2m) AS BIGINT) AS err_micro
         |FROM asg WHERE rk = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "s4_ann_lsh" ->
      s"""WITH $duckEmb,
         |$duckLsh
         |SELECT e.vec_id, round(list_dot_product(e.v, q.qv) / (e.nrm * q.qnrm), 6) AS cosine
         |FROM cand JOIN e ON e.vec_id = cand.vec_id, q
         |ORDER BY cosine DESC, e.vec_id ASC LIMIT 10""".stripMargin,

    "s13_mips" -> {
      val m2 = MipsM * MipsM
      val ss = (0 until LshPlanes).map { p =>
        val terms = (0 until LshDims)
          .map(i => s"v[${i + 1}] * ${if (mipsSigns(p)(i) > 0) "1.0" else "-1.0"}")
          .mkString(" + ")
        val s65 = if (mipsSigns(p)(LshDims) > 0) "1.0" else "-1.0"
        s"(w * ($terms) + aug * $s65) > 0 s$p"
      }.mkString(",\n       ")
      val bands = duckBandUnion
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |a1 AS (SELECT vec_id, v,
         |         CASE WHEN vec_id = 0 THEN 1.0
         |              ELSE 1.0 + CAST(vec_id % 7 AS DOUBLE) / 4.0 END w
         |       FROM e),
         |a2 AS (SELECT vec_id, v, w,
         |         CASE WHEN vec_id = 0 THEN 0.0
         |              ELSE sqrt($m2 - w * w * list_dot_product(v, v)) END aug
         |       FROM a1),
         |bits AS (SELECT vec_id, v, w, aug,
         |       $ss
         |  FROM a2),
         |bands AS MATERIALIZED (
         |$bands),
         |cand AS (
         |  SELECT DISTINCT b.vec_id
         |  FROM bands q JOIN bands b ON q.bid = b.bid AND q.bkey = b.bkey
         |  WHERE q.vec_id = 0 AND b.vec_id > 0),
         |q AS (SELECT v qv FROM e WHERE vec_id = 0)
         |SELECT a.vec_id,
         |       CAST(round(a.w * list_dot_product(a.v, q.qv) * 1000000.0, 0)
         |            AS BIGINT) AS dot_micro
         |FROM cand c JOIN a2 a ON a.vec_id = c.vec_id, q
         |ORDER BY dot_micro DESC, a.vec_id ASC LIMIT 10""".stripMargin
    },
    "s1_ann_topk" -> duckS1Sql,

    // RRF over the two nested full ranking statements (a CTE body may
    // carry its own ORDER BY + LIMIT).
    "s24_rrf_fusion" ->
      s"""WITH bm AS (${TextQueries.oracles("t14_bm25")}),
         |ann AS ($duckS1Sql),
         |bmr AS (SELECT doc_id, CAST(row_number() OVER (
         |          ORDER BY score_micro DESC, doc_id ASC) AS BIGINT) r_bm
         |        FROM bm),
         |annr AS (SELECT vec_id doc_id, CAST(row_number() OVER (
         |           ORDER BY cosine DESC, vec_id ASC) AS BIGINT) r_ann
         |         FROM ann)
         |SELECT coalesce(bmr.doc_id, annr.doc_id) AS doc_id,
         |       bmr.r_bm AS r_bm, annr.r_ann AS r_ann,
         |       coalesce(1000000000 // ($RrfK + r_bm), 0)
         |         + coalesce(1000000000 // ($RrfK + r_ann), 0) AS rrf_nano
         |FROM bmr FULL OUTER JOIN annr ON bmr.doc_id = annr.doc_id
         |ORDER BY rrf_nano DESC, doc_id""".stripMargin,

    // k-center unrolled: seed = vec 0, then 4 sequential argmins of the
    // max cosine to everything already selected (farthest-point rule).
    "s16_kcenter" -> duckS16Sql,

    // MMR unrolled: pick k = 5 sequential argmaxes over the top-20
    // relevance shortlist; sel_i carries the chosen vectors forward so
    // each step's penalty is max cosine to everything already picked.
    "s15_mmr" -> {
      val lam = s"CAST($MmrLambda AS DOUBLE)"
      val bar = s"CAST($MmrLambdaBar AS DOUBLE)"
      def pick(i: Int): String = {
        val sel = if (i == 1) "" else
          s""", sel${i - 1} AS (${(1 until i).map(j =>
            s"SELECT vec_id, v, nrm FROM p$j").mkString(" UNION ALL ")}),
             |c$i AS (
             |  SELECT sl.vec_id, sl.v, sl.nrm, sl.rel,
             |         $lam * sl.rel - $bar * (
             |           SELECT max(round(list_dot_product(sl.v, s.v)
             |                            / (sl.nrm * s.nrm), 6))
             |           FROM sel${i - 1} s) AS mmr
             |  FROM sl WHERE sl.vec_id NOT IN (SELECT vec_id FROM sel${i - 1}))""".stripMargin
        val src = if (i == 1)
          s"(SELECT vec_id, v, nrm, rel, $lam * rel - $bar * CAST(0.0 AS DOUBLE) AS mmr FROM sl)"
        else s"c$i"
        s"""$sel,
           |p$i AS (SELECT * FROM $src ORDER BY mmr DESC, vec_id ASC LIMIT 1)""".stripMargin
      }
      s"""WITH $duckEmb,
         |q AS (SELECT v, nrm FROM e WHERE vec_id = 0),
         |sl AS (
         |  SELECT e.vec_id, e.v, e.nrm,
         |         round(list_dot_product(e.v, q.v) / (e.nrm * q.nrm), 6) AS rel
         |  FROM e, q WHERE e.vec_id > 0
         |  ORDER BY rel DESC, vec_id ASC LIMIT $MmrShortlist)
         |${(1 to MmrK).map(pick).mkString("\n")}
         |${(1 to MmrK).map(i =>
           s"SELECT CAST($i AS BIGINT) AS rank, vec_id, mmr FROM p$i")
           .mkString("\nUNION ALL\n")}
         |ORDER BY rank""".stripMargin
    },

    "s2_cosine_pairs" ->
      s"""WITH $duckEmb
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= ${NearDupThreshold}
         |ORDER BY vec_a, vec_b""".stripMargin,

    "s3_label_paircounts" ->
      s"""WITH $duckEmb
         |SELECT a.label AS label, count(*) AS n_pairs
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= ${LabelPairThreshold}
         |GROUP BY a.label ORDER BY label""".stripMargin,

    "s5_ann_ivf" ->
      s"""WITH $duckEmb,
         |cents AS (SELECT vec_id cent_id, v cv, nrm cnrm FROM e
         |          WHERE vec_id BETWEEN 1 AND $IvfCentroids),
         |asgn AS (
         |  SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
         |           ORDER BY round(list_dot_product(v, cv) / (nrm * cnrm), 6) DESC,
         |                    cent_id ASC) rk
         |  FROM e CROSS JOIN cents WHERE vec_id > 0),
         |cells AS (SELECT vec_id, cent_id FROM asgn WHERE rk = 1),
         |q AS (SELECT v qv, nrm qnrm FROM e WHERE vec_id = 0),
         |qprobe AS (
         |  SELECT cent_id, row_number() OVER (
         |           ORDER BY round(list_dot_product(qv, cv) / (qnrm * cnrm), 6) DESC,
         |                    cent_id ASC) rk
         |  FROM q CROSS JOIN cents),
         |probed AS (SELECT cent_id FROM qprobe WHERE rk <= $IvfNProbe)
         |SELECT c.vec_id, c.cent_id AS cell,
         |       round(list_dot_product(e.v, q.qv) / (e.nrm * q.qnrm), 6) AS cosine
         |FROM cells c JOIN probed p ON c.cent_id = p.cent_id
         |JOIN e ON e.vec_id = c.vec_id, q
         |ORDER BY cosine DESC, c.vec_id ASC LIMIT 10""".stripMargin,

    "s6_label_centroids" ->
      s"""WITH e AS (SELECT label, embedding::DOUBLE[] v FROM embeddings),
         |d AS (SELECT unnest(range(1, $LshDims + 1)) dim)
         |SELECT label, CAST(dim AS BIGINT) AS dim,
         |       CAST(sum(CAST(round(v[dim] * 1000000.0, 0) AS BIGINT)) // count(*)
         |            AS BIGINT) AS centroid_micro,
         |       count(*) AS n_vecs
         |FROM e CROSS JOIN d
         |GROUP BY label, dim ORDER BY label, dim""".stripMargin,

    "s7_quantize" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         |s AS (SELECT vec_id, v,
         |        list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127.0 scale
         |      FROM e),
         |q AS (SELECT vec_id, v, scale,
         |        list_transform(v, x -> CAST(round(
         |          CASE WHEN scale = 0 THEN 0 ELSE x / scale END, 0) AS INT)) qv
         |      FROM s)
         |SELECT vec_id, round(scale, 6) AS scale,
         |       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
         |       round(sqrt(list_aggregate(list_transform(range(1, len(v) + 1),
         |         i -> (v[i] - qv[i] * scale) * (v[i] - qv[i] * scale)), 'sum')), 6) AS l2_err
         |FROM q ORDER BY vec_id""".stripMargin
  )
}
