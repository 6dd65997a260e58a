package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Harness-side PLANTED-CLUSTER embedding fixture (not part of the
  * driver contract, like [[ScaleBlowup]]): writes an `embeddings.parquet`
  * whose vectors are a deterministic mixture-of-Gaussians — K cluster
  * centers with per-vector Gaussian noise — so the ANN dial family
  * (s31/s32/s35/s38) can be measured on a corpus with real neighborhood
  * structure.
  *
  * Why this exists (r11 verdict #2): the synthetic sinusoid embeddings
  * span a 2-D plane with near-uniform hyperplane margins, which makes
  * margin-ordered probing (s38) a wash BY CONSTRUCTION and depresses
  * every recall@k readout — the fixture family cannot distinguish
  * probe-ordering strategies at all. Planted clusters give queries true
  * top-k neighbors (their cluster siblings) and give planes real margin
  * structure (a vector near its center shares the center's confident
  * signs and disagrees only on small-margin planes), so the dials carry
  * deployable numbers.
  *
  * Fully deterministic (same reason ScaleBlowup is): centers are
  * hash-uniforms on [-1,1]^dim keyed by (cluster, dim); noise is
  * Box-Muller over two xxhash64-derived uniforms keyed by (vec_id, dim).
  * Clusters assign by xxhash64(vec_id) so the s31 sample window
  * (vec_id % 20 = 0, < 640) spreads across clusters instead of aliasing
  * one. Schema matches the driver fixture exactly
  * (vec_id LONG, embedding ARRAY<FLOAT>, label INT = cluster id).
  *
  * Usage: runMain graft.ClusteredFixture <outDir> [n] [k] [sigma] [zipf]
  * then SPARK_GRAFT_SF_DIR=<outDir> runMain graft.BenchDebug s31_... .
  * sigma scales per-dim noise; with centers uniform on [-1,1]
  * (E||c||^2 = dim/3), expected within-cluster cosine is roughly
  * (dim/3) / (dim/3 + dim*sigma^2) — sigma 0.33 plants ~0.75.
  *
  * `zipf` (r13 verdict #2): 0 = equal-size clusters (the adversarial
  * pole the r12/r13 cap program measured); z > 0 draws cluster SIZES
  * from a Zipf(z) law — cluster c gets weight 1/(c+1)^z — the shape
  * real crawl duplicates actually have (a few enormous boilerplate
  * clusters plus a long tail; Broder's classic crawl studies and every
  * CommonCrawl dedup report show power-law duplicate-cluster sizes).
  * At z=1, k=64 the head cluster holds ~21% of the corpus — the
  * mixed regime where the cap's recall price (head clusters get
  * truncated hardest) and the probe dial's recovery compete for real.
  * Assignment is inverse-CDF over the same per-vector hash uniform, so
  * it stays fully deterministic and sample-window-friendly. */
object ClusteredFixture {
  val Dim = 64

  // hash → uniform in (0,1]: xxhash64 spans the full signed-64 range;
  // shift to [0, 2^64) semantics via the unsigned reinterpretation
  // (x/2^64 + 0.5 for negative), then clamp off exact 0 for the log
  private def u(seed: String): String =
    s"(pmod(cast(xxhash64($seed) as double) / 18446744073709551616.0D + 1.0D, 1.0D) + 5e-20D)"

  /** Cluster assignment for row id column `idCol`: uniform residue at
    * zipf=0 (bit-identical to the pre-zipf fixture — every recorded
    * clustered-100k row stays reproducible), inverse-CDF over a hash
    * uniform otherwise. Shared by [[generate]] and [[generateDocs]] so
    * doc_id d and vec_id d always land in the SAME cluster. */
  private def assignment(k: Int, zipf: Double, idCol: String) =
    if (zipf == 0.0)
      pmod(xxhash64(lit("asg"), col(idCol)), lit(k)).cast("int")
    else {
      val w = (0 until k).map(c => 1.0 / math.pow(c + 1, zipf))
      val total = w.sum
      val cum = w.scanLeft(0.0)(_ + _).drop(1).map(_ / total)
      // cluster c ⟺ cum(c−1) < u ≤ cum(c): count strictly-smaller cum
      // entries (the final entry is exactly 1.0 ≥ every u, so _cl < k)
      val cumArr = cum.map(x => s"${x}D").mkString("array(", ", ", ")")
      expr(s"size(filter($cumArr, x -> x < ${u(s"'asg', $idCol")}))")
    }

  /** Write the planted corpus under `out/embeddings.parquet`. */
  def generate(spark: SparkSession, out: String, n: Long, k: Int,
      sigma: Double, zipf: Double = 0.0): Unit = {
    val centerU = u("'ctr', _cl, d")
    val u1 = u("'bm1', vec_id, d")
    val u2 = u("'bm2', vec_id, d")
    val asgCol = assignment(k, zipf, "vec_id")
    spark.range(n).toDF("vec_id")
      .withColumn("_cl", asgCol.cast("int"))
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${Dim - 1}), d ->
           |  cast(($centerU * 2.0D - 1.0D)
           |   + $sigma * sqrt(-2.0D * ln($u1)) * cos(6.283185307179586D * $u2)
           |  as float))""".stripMargin))
      .withColumn("label", col("_cl"))
      .select("vec_id", "embedding", "label")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** Write the DOCUMENTS twin of the planted corpus (r14 verdict #4 —
    * the streaming two-tier path had only ever seen uniform text
    * corpora): `out/documents.parquet` in the driver-fixture schema
    * (doc_id, text, lang, source, n_chars), cluster-assigned by the
    * SAME law as [[generate]] (doc_id ≡ vec_id), so the text-side
    * duplicate structure and the embedding-side cluster structure
    * describe the same power-law corpus.
    *
    * Text law, all hash-deterministic:
    *  - each cluster has a base token sequence (45 + hash%30 tokens,
    *    'w<hash%50000>' words — lowercase alphanumeric, so the t2
    *    quality gate's stopword and punctuation terms are zero and
    *    every doc clears QualityThreshold; ~50k vocab over ≤75 tokens
    *    keeps repeated trigrams rare, clearing RepetitionMax);
    *  - a deterministic QUARTER of each cluster (xxhash64('exact',
    *    doc_id) % 4 = 0) carries the base text VERBATIM — exact-dup
    *    groups at power-law multiplicity, the fingerprint-dedup state
    *    the ingest tier has never faced skewed;
    *  - the rest mutate ~10% of positions to doc-keyed 'u…' tokens —
    *    NEAR-duplicates sharing most 3-gram shingles with the base,
    *    the minhash-LSH consolidation stage's skewed regime. */
  def generateDocs(spark: SparkSession, out: String, n: Long, k: Int,
      zipf: Double = 0.0): Unit = {
    val asgCol = assignment(k, zipf, "doc_id")
    spark.range(n).toDF("doc_id")
      .withColumn("_cl", asgCol.cast("int"))
      .withColumn("_exact",
        pmod(xxhash64(lit("exact"), col("doc_id")), lit(4)) === 0)
      .withColumn("text", expr(
        s"""array_join(transform(
           |  sequence(0, cast(44 + pmod(xxhash64('len', _cl), 30) as int)),
           |  j -> CASE WHEN NOT _exact
           |             AND pmod(xxhash64('mut', doc_id, j), 10) = 0
           |       THEN concat('u', pmod(xxhash64('mt', doc_id, j), 50000))
           |       ELSE concat('w', pmod(xxhash64('tok', _cl, j), 50000))
           |       END), ' ')""".stripMargin))
      .withColumn("lang", expr(
        "element_at(array('en','de','fr','es','zh'), " +
          "cast(pmod(xxhash64('lang', doc_id), 5) as int) + 1)"))
      .withColumn("source",
        concat(lit("src"), pmod(xxhash64(lit("src"), col("doc_id")), lit(20))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "/tmp/clustered"
    val n = if (args.length > 1) args(1).toLong else 20000L
    val k = if (args.length > 2) args(2).toInt else 64
    val sigma = if (args.length > 3) args(3).toDouble else 0.33
    val zipf = if (args.length > 4) args(4).toDouble else 0.0
    val withDocs = args.length > 5 && args(5) == "docs"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, out, n, k, sigma, zipf)
    if (withDocs) generateDocs(spark, out, n, k, zipf)
    println(s"[clustered] n=$n k=$k sigma=$sigma zipf=$zipf dim=$Dim" +
      (if (withDocs) " +docs" else "") + s" -> $out")
    spark.stop()
  }
}
