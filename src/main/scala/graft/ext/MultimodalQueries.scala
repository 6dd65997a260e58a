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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_multimodal_meta" -> ((s, d) => multimodalMeta(s, d)),
    "m2_multimodal_decode" -> ((s, d) => multimodalDecode(s, d))
  )

  val oracles: Map[String, String] = Map(
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
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
