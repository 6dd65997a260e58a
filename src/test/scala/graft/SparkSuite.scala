package graft

import org.apache.spark.sql.SparkSession

/** One shared local session across suites (getOrCreate). */
trait SparkSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // Spark 4.1's checkpoint file-checksum verification flaked ONCE in
    // ~1350 green runs of the streaming suites (r12: a state snapshot
    // read failed CHECKPOINT_FILE_CHECKSUM_VERIFICATION_FAILED under
    // parallel-suite churn, then passed in isolation). Root cause: the
    // session-wide state-store MAINTENANCE thread (default 60 s cadence)
    // uploads snapshots for still-registered providers concurrently
    // with a suite's post-stop statestore-format read. r12 de-flaked by
    // disabling the checksum layer; r13 re-enables it (verification on,
    // like production) and removes the race instead: test queries live
    // milliseconds-to-seconds, so a 1-hour maintenance cadence means
    // the uploader never runs mid-suite. Tests never rely on snapshot
    // compaction (they read delta state directly).
    .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
    .getOrCreate()

  /** Per-suite checkpoint/scratch root: unique dirs namespaced by the
    * suite class under target/test-ckpt — parallel suites never churn
    * one another's tree (the r12-flake hygiene fix). */
  def ckptDir(prefix: String): String = {
    val root = java.nio.file.Paths.get("target", "test-ckpt",
      getClass.getSimpleName)
    java.nio.file.Files.createDirectories(root)
    java.nio.file.Files.createTempDirectory(root, prefix).toString
  }
}
