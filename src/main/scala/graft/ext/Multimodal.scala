package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata structs alongside.
  *
  * The Spark-side plumbing (schema, typed Dataset, per-partition batch
  * decode, partition sizing) is real and tested; the actual codec call is
  * a STUB — this container has no image/audio libraries, so `decodeStub`
  * derives deterministic fake dimensions from the payload header bytes.
  * On a real cluster the body of `decodeStub` is the only thing to swap
  * for a JNI/javacpp codec; everything around it (distribution, batching,
  * schema) stays.
  *
  * Scale posture: decode runs via `mapPartitions` — one codec context per
  * partition, not per row; payloads never pass through a shuffle (decode
  * before any wide op, project metadata only).
  */
object Multimodal {

  /** A media row: opaque payload + caller-supplied id. */
  case class MediaRecord(doc_id: Long, payload: Array[Byte])

  /** Extracted metadata (what a real decoder would emit). */
  case class MediaMeta(doc_id: Long, width: Int, height: Int, channels: Int, n_bytes: Long)

  /** STUB decode: deterministic fake "header parse" — width/height from the
    * first two payload bytes, constant channel count. Replace the body with
    * a real codec (e.g. libjpeg via JNI) in production. */
  def decodeStub(r: MediaRecord): MediaMeta = {
    val b0 = if (r.payload.length > 0) r.payload(0) & 0xff else 0
    val b1 = if (r.payload.length > 1) r.payload(1) & 0xff else 0
    MediaMeta(r.doc_id, b0 % 64 + 1, b1 % 48 + 1, 3, r.payload.length.toLong)
  }

  /** Batch decode over a binary-payload frame: (doc_id, payload: binary) →
    * (doc_id, width, height, channels, n_bytes). One decoder context per
    * partition via mapPartitions. */
  def decodeMeta(spark: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[MediaRecord]
      .mapPartitions { it =>
        // real impl: open codec once here, close after the iterator drains
        it.map(decodeStub)
      }
  }

  /** Extracted feature vector (fixed 8-dim; a real extractor emits the
    * model's embedding width). Flattened fields, not an array, so the
    * oracle compares scalars. */
  case class MediaFeatures(doc_id: Long, f0: Double, f1: Double, f2: Double,
      f3: Double, f4: Double, f5: Double, f6: Double, f7: Double)

  /** STUB feature extraction: mean byte value per 8-way stride — a
    * deterministic stand-in for "run the encoder on the payload". The
    * output feeds the same `Array[Float]`/vector path the similarity
    * operators consume. */
  def featureStub(r: MediaRecord): MediaFeatures = {
    val sums = new Array[Double](8)
    var i = 0
    while (i < r.payload.length) { sums(i % 8) += (r.payload(i) & 0xff); i += 1 }
    val n = math.max(r.payload.length, 1).toDouble
    MediaFeatures(r.doc_id, sums(0) / n, sums(1) / n, sums(2) / n, sums(3) / n,
      sums(4) / n, sums(5) / n, sums(6) / n, sums(7) / n)
  }

  /** Batch feature extraction, same per-partition batching contract as
    * [[decodeMeta]]. */
  def extractFeatures(spark: SparkSession, df: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col("doc_id"), col("payload"))
      .as[MediaRecord]
      .mapPartitions(it => it.map(featureStub))
  }
}
