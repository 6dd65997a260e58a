package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Every batch query takes the scale-factor directory as a parameter so the
  * same plan runs unchanged at sf0.001 (smoke), sf0.01 (oracle) and sf0.1
  * (bench) — and, by extension, on a real cluster path at any scale. Reads
  * go through `spark.read.parquet`, so Catalyst pushes filters and prunes
  * columns into the scan automatically.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved relation per (session, dir, table): `spark.read.parquet`
    * re-reads the footer for schema inference on every call, and a bench
    * pass issues a few hundred loads — a fixed driver-side tax on every
    * query. The relation itself is an immutable logical plan, so handing
    * back the same one is free and safe (NOT a data cache: scans still
    * read parquet).
    *
    * Entries for STOPPED sessions are swept on each cache miss: a
    * long-lived JVM cycling through many sessions (test harnesses, a
    * service) would otherwise pin every dead session and its plans here
    * forever. A weak-keyed map can't do this — the cached DataFrame
    * strongly references its SparkSession, so the value would pin the
    * key. The sweep runs only on the miss path (hot lookups stay
    * lock-free) and the map is tens of entries, so it's O(noise). */
  private val relCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  private def sweepStopped(): Unit = {
    relCache.keysIterator.foreach { k =>
      if (k._1.sparkContext.isStopped) relCache.remove(k)
    }
    registeredDir.keysIterator.foreach { s =>
      if (s.sparkContext.isStopped) registeredDir.remove(s)
    }
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    relCache.getOrElse((spark, dir, name), {
      sweepStopped()
      relCache.getOrElseUpdate((spark, dir, name), {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      // Fixture timestamps are parquet TIMESTAMP_MICROS with
      // isAdjustedToUTC=false, which Spark 4 surfaces as TIMESTAMP_NTZ.
      // The engine's time algebra (unix_micros, window(), watermarks) wants
      // TIMESTAMP; the session timezone is pinned UTC everywhere
      // (build.sbt / Verify / Bench), so the NTZ->LTZ cast is a pure
      // re-tag — identical micros value, no wall-clock shift.
      val ntzCols = df.schema.fields.collect {
        case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
      }
      ntzCols.foldLeft(df) { (d, c) =>
        d.withColumn(c, d(c).cast(org.apache.spark.sql.types.TimestampType))
      }
      })
    })

  /** Last directory registered per session: registering is idempotent for
    * a fixed dir, and re-running `spark.read.parquet` for all 10 tables
    * costs a footer/listing round-trip each — measurable when several
    * SQL-surface queries call in per bench pass. */
  private val registeredDir =
    scala.collection.concurrent.TrieMap.empty[SparkSession, String]

  /** Register every fixture table as a temp view (SURVEY §2.6 Q1 surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (!registeredDir.get(spark).contains(dir)) {
      names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registeredDir(spark) = dir
    }
}
