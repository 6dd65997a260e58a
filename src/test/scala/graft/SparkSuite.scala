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
    // parallel-suite /tmp churn, then passed in isolation — the
    // maintenance-thread snapshot upload racing a read). The tests
    // assert state CONTENT equality against batch replays themselves,
    // so the extra verification adds flake risk without adding
    // coverage here; production paths keep the default.
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    .getOrCreate()
}
