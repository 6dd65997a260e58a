package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Batch file-format I/O: the sources/sinks a user migrating from the
  * reference (Kafka + console only) additionally gets from this engine.
  * Thin, opinionated wrappers over the DataFrameReader/Writer API so the
  * scale knobs live in one place.
  *
  * Scale posture: parquet is the default interchange format (columnar,
  * predicate/projection pushdown — verified in ExplainAudit);
  * `partitionBy` turns equality filters on the partition column into
  * partition pruning (directories never listed, let alone read).
  */
object BatchIO {

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** CSV is schemaless — read back with an explicit schema (inference is a
    * full extra pass and guesses types; never at 100 TB). */
  def readCsv(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.option("header", "true").schema(ddl).csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJsonLines(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read.schema(ddl).json(path)

  /** ORC — the other columnar interchange format (same pushdown story as
    * parquet: min/max stripe statistics + projection pruning). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw text lines — one string column `value` per line, the ingest shape
    * of an unstructured corpus dump before any parsing. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** binaryFile source — `(path, modificationTime, length, content)` per
    * file, the multimodal ingest path: image/audio/video payloads land as
    * the same opaque `binary` column the `ext.Multimodal` operators
    * consume. `pathGlobFilter` prunes by extension at listing time (files
    * never opened); at 100 TB pair with `spark.sql.files.maxPartitionBytes`
    * and a manifest-driven file list rather than a recursive listing. */
  def readBinaryFiles(spark: SparkSession, path: String,
      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
}
