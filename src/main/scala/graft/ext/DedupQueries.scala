package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  val NumBands  = 4          // 4 bands x 4 rows
  val JaccardThreshold = 0.5 // planted near-dups sit at >=0.8, noise <0.2

  /** doc_id + distinct word-3-gram shingle set (docs with >=3 tokens). */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .withColumn("toks", split(lower(col("text")), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", expr(
        "array_distinct(transform(sequence(0, size(toks)-3), " +
          "i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))"))
      .select(col("doc_id"), col("sh"))

  private val duckShingled =
    """toks AS (SELECT doc_id, string_split(lower(text), ' ') t FROM documents),
      |shingled AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(generate_series(1, len(t)-2),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) sh
      |  FROM toks WHERE len(t) >= 3)""".stripMargin

  /** Adds minhash columns h0..h15: min over shingles of md5("<i>|"+s). */
  private def withMinhashes(df: DataFrame): DataFrame =
    (0 until NumHashes).foldLeft(df) { (d, i) =>
      d.withColumn(s"h$i", expr(s"array_min(transform(sh, s -> md5(concat('$i|', s))))"))
    }

  private val duckMinhashed: String = {
    val hs = (0 until NumHashes)
      .map(i => s"list_aggregate(list_transform(sh, x -> md5('$i|' || x)), 'min') h$i")
      .mkString(",\n         ")
    s"""minhashed AS (
       |  SELECT doc_id, sh,
       |         $hs
       |  FROM shingled)""".stripMargin
  }

  /** d1 — exact dedup: canonical (minimum) doc_id per identical text. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), col("text"))
      .orderBy("keep_id")

  /** d2 — MinHash signatures: one md5 digest over the 16 minhashes. */
  def minhashSignature(spark: SparkSession, dir: String): DataFrame =
    withMinhashes(shingled(spark, dir))
      .select(col("doc_id"),
        md5(concat_ws("|", (0 until NumHashes).map(i => col(s"h$i")): _*)).as("sig"))
      .orderBy("doc_id")

  /** d3 — MinHash LSH near-dup pairs: band-bucket equi-join for candidates,
    * exact Jaccard verification, threshold filter. */
  def lshPairs(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingled(spark, dir)
    val h = withMinhashes(sets)
    val bandStructs = (0 until NumBands).map { b =>
      val ks = (0 until NumHashes / NumBands).map(r => s"h${b * (NumHashes / NumBands) + r}")
      s"struct(cast($b as int) as bid, md5(concat(${ks.mkString(",")})) as bkey)"
    }.mkString(",")
    val bands = h.select(col("doc_id"),
        expr(s"explode(array($bandStructs))").as("u"))
      .select(col("doc_id"), col("u.bid").as("bid"), col("u.bkey").as("bkey"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.bid") === col("b.bid") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    jaccardVerify(cand, sets)
  }

  /** d4 — exact n-gram Jaccard pairs via inverted-index join (pairs sharing
    * at least one shingle; never a cross join). */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val sets = shingled(spark, dir)
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("g"))
    val cand = ex.as("a")
      .join(ex.as("b"), col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    jaccardVerify(cand, sets)
  }

  /** Join candidate pairs back to shingle sets, compute exact Jaccard,
    * filter at the threshold. */
  private def jaccardVerify(cand: DataFrame, sets: DataFrame): DataFrame =
    cand
      .join(sets.as("x"), col("doc_a") === col("x.doc_id"))
      .join(sets.as("y"), col("doc_b") === col("y.doc_id"))
      .withColumn("i", size(array_intersect(col("x.sh"), col("y.sh"))).cast("double"))
      .withColumn("jac", col("i") / (size(col("x.sh")) + size(col("y.sh")) - col("i")))
      .filter(round(col("jac"), 6) >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), round(col("jac"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")

  private val duckJaccardTail =
    s"""verified AS (
       |  SELECT doc_a, doc_b,
       |         len(list_filter(x.sh, e -> list_contains(y.sh, e)))::DOUBLE i,
       |         len(x.sh) + len(y.sh) tot
       |  FROM cand JOIN shingled x ON cand.doc_a = x.doc_id
       |            JOIN shingled y ON cand.doc_b = y.doc_id)
       |SELECT doc_a, doc_b, round(i/(tot-i), 6) AS jaccard
       |FROM verified WHERE round(i/(tot-i), 6) >= $JaccardThreshold
       |ORDER BY doc_a, doc_b""".stripMargin

  /** d5 — 16-bit SimHash over distinct tokens, bits drawn from md5 hex
    * digits (identical arithmetic on both engines). */
  val SimhashBits = 16
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .withColumn("dt", array_distinct(split(lower(col("text")), " ")))
    val withSums = (0 until SimhashBits).foldLeft(base) { (d, b) =>
      val digit = b / 4 + 1 // 1-based hex digit index in the md5 string
      val pow = 1 << (b % 4)
      d.withColumn(s"s$b", expr(
        s"aggregate(dt, 0, (acc, w) -> acc + " +
          s"CASE WHEN ((instr('0123456789abcdef', substr(md5(w), $digit, 1)) - 1) div $pow) % 2 = 1 " +
          s"THEN 1 ELSE -1 END)"))
    }
    val hashExpr = (0 until SimhashBits)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b}L ELSE 0L END)")
      .mkString(" + ")
    withSums.select(col("doc_id"), expr(hashExpr).cast("long").as("simhash16"))
      .orderBy("doc_id")
  }

  // ---- DuckDB oracles --------------------------------------------------

  private val duckSimhash: String = {
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
    s"""WITH base AS (
       |  SELECT doc_id, list_distinct(string_split(lower(text), ' ')) dt FROM documents),
       |sums AS (
       |  SELECT doc_id,
       |       $sums
       |  FROM base)
       |SELECT doc_id, CAST($hashExpr AS BIGINT) AS simhash16 FROM sums ORDER BY doc_id""".stripMargin
  }

  private val duckBands: String = {
    val rows = NumHashes / NumBands
    (0 until NumBands).map { b =>
      val ks = (0 until rows).map(r => s"h${b * rows + r}").mkString(" || ")
      s"SELECT doc_id, $b bid, md5($ks) bkey FROM minhashed"
    }.mkString("\nUNION ALL\n")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_dedup_exact" -> ((s, d) => dedupExact(s, d)),
    "d2_minhash_signature" -> ((s, d) => minhashSignature(s, d)),
    "d3_lsh_pairs" -> ((s, d) => lshPairs(s, d)),
    "d4_ngram_jaccard" -> ((s, d) => ngramJaccardPairs(s, d)),
    "d5_simhash" -> ((s, d) => simhash(s, d))
  )

  val oracles: Map[String, String] = Map(
    "d1_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, text
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,

    "d2_minhash_signature" ->
      s"""WITH $duckShingled,
         |$duckMinhashed
         |SELECT doc_id,
         |       md5(${(0 until NumHashes).map("h" + _).mkString(" || '|' || ")}) AS sig
         |FROM minhashed ORDER BY doc_id""".stripMargin,

    "d3_lsh_pairs" ->
      s"""WITH $duckShingled,
         |$duckMinhashed,
         |bands AS (
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

    "d5_simhash" -> duckSimhash
  )
}
