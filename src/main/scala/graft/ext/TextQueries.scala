package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** t2 — quality scoring: token stats + stopword/punctuation ratios folded
    * into a bounded [0,1] score. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .withColumn("tok_chars", expr("aggregate(toks, 0, (acc, w) -> acc + length(w))").cast("long"))
      .withColumn("n_stop", expr(s"size(filter(toks, w -> w IN $EnMarkers))").cast("long"))
      .withColumn("n_punct", expr("size(regexp_extract_all(text, '[^a-z0-9 ]', 0))").cast("long"))
      // 1.0D / 100.0D: Spark 4's ANSI parser reads bare decimal literals as
      // DECIMAL, which would silently turn these ratios into DECIMAL(29,6)
      // and break schema parity with the oracle's DOUBLE.
      .withColumn("stop_ratio_raw", expr("n_stop * 1.0D / n_toks"))
      .withColumn("punct_ratio_raw", expr("n_punct * 1.0D / length(text)"))
      .select(
        col("doc_id"), col("n_toks"),
        round(expr("tok_chars * 1.0D / n_toks"), 6).as("avg_token_len"),
        round(col("stop_ratio_raw"), 6).as("stop_ratio"),
        round(col("punct_ratio_raw"), 6).as("punct_ratio"),
        round(expr(
          "(least(n_toks, 100) / 100.0D) * (1.0D - stop_ratio_raw) * (1.0D - punct_ratio_raw)"), 6)
          .as("quality_score"))
      .orderBy("doc_id")

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t1_langid" -> ((s, d) => langId(s, d)),
    "t2_quality" -> ((s, d) => quality(s, d)),
    "t3_tokencount" -> ((s, d) => tokenCount(s, d)),
    "t4_fingerprint" -> ((s, d) => fingerprint(s, d))
  )

  private val duckTokenVal: String = (1 to 4)
    .map(k => s"(strpos('0123456789abcdef', substr(md5(w), $k, 1)) - 1)")
    .reduce((a, b) => s"(($a) * 16 + $b)")

  val oracles: Map[String, String] = Map(
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
         |FROM t ORDER BY doc_id""".stripMargin
  )
}
