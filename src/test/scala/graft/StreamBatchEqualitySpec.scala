package graft

import graft.queries.StreamReplayQueries
import graft.streaming.{EwmaPoint, RiskEvent, StreamOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frame-level stream-vs-batch equality for every `r_stream_*_replay`
  * twin: the SAME StreamOps operator runs once through a real MemoryStream
  * micro-batch execution and once as the batch replay the driver
  * hash-checks against DuckDB, and the two result FRAMES must match
  * row-for-row under the twin's own projection and total order.
  *
  * The streaming leg feeds all sf0.001 fixture rows in ONE micro-batch, so
  * update-mode emissions are each group's final value and the unified
  * model's promise — a batch pass IS one giant micro-batch — is checked
  * exactly. StreamingSpec/StreamOpsSpec assert pointwise behavior over
  * hand-built events; this spec pins the whole relation over the same
  * fixture the DuckDB oracle hashes, closing the loop
  * stream = batch twin = oracle. */
class StreamBatchEqualitySpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val dir = "/root/testdata/sf0.001"

  private lazy val riskRows: Seq[RiskEvent] =
    StreamReplayQueries.riskFrame(spark, dir).as[RiskEvent].collect().toSeq

  /** Run `op` over all fixture risk rows in one micro-batch; returns the
    * memory-sink table. */
  private def streamed(name: String, mode: String)(
      op: DataFrame => DataFrame): DataFrame = {
    val input = MemoryStream[RiskEvent]
    val q = op(input.toDF()).writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try {
      input.addData(riskRows)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  private def assertFramesEqual(stream: DataFrame, batch: DataFrame): Unit = {
    val s = stream.collect().map(_.toSeq).toSeq
    val b = batch.collect().map(_.toSeq).toSeq
    assert(s.length == b.length, s"stream ${s.length} rows vs batch ${b.length}")
    s.zip(b).zipWithIndex.foreach { case ((x, y), i) =>
      assert(x == y, s"row $i differs: stream=$x batch=$y")
    }
    assert(s.nonEmpty, "empty frames prove nothing")
  }

  test("windowed aggregation: stream frame equals the oracle-checked batch twin") {
    val t = streamed("eq_win", "update")(StreamOps.windowedRiskStats(_))
    val stream = t.select(
      date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
      col("customer"), col("n_events"), col("sum_score_micro"), col("max_score"))
      .orderBy("window_start", "customer")
    assertFramesEqual(stream, StreamReplayQueries.windowReplay(spark, dir))
  }

  test("sliding windows: stream frame equals the batch twin") {
    val t = streamed("eq_slide", "update")(StreamOps.slidingRiskStats(_))
    val stream = t.select(
      date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
      col("customer"), col("n_events"), col("sum_score_micro"))
      .orderBy("window_start", "customer")
    assertFramesEqual(stream, StreamReplayQueries.slidingReplay(spark, dir))
  }

  test("session windows: stream frame equals the batch twin") {
    // Session-window aggregation supports only append mode on streams, and
    // append emits a session once the watermark passes it: feed all real
    // rows in batch 1, then a single far-future sentinel whose event time
    // drags the watermark past every real session (the engine's no-data
    // batch then flushes them). The sentinel's own (still-open) session is
    // excluded from the comparison.
    val input = MemoryStream[RiskEvent]
    val q = StreamOps.sessionRiskStats(input.toDF())
      .writeStream.format("memory").queryName("eq_sess")
      .outputMode("append").start()
    try {
      input.addData(riskRows)
      q.processAllAvailable()
      input.addData(RiskEvent("zzz@sentinel", 0.0, "2030-01-01 00:00:00.000000"))
      q.processAllAvailable()
    } finally q.stop()
    val t = spark.table("eq_sess").filter(col("customer") =!= "zzz@sentinel")
    val stream = t.select(
      date_format(col("sess_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_start"),
      date_format(col("sess_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("sess_end"),
      col("customer"), col("n_events"), col("total_score_micro"))
      .orderBy("customer", "sess_start")
    assertFramesEqual(stream, StreamReplayQueries.sessionReplay(spark, dir))
  }

  test("watermarked dedup: stream frame equals the batch twin") {
    val t = streamed("eq_dedup", "append")(StreamOps.dedupRiskEvents(_))
    val stream = t.select(col("customer"), col("score"), col("riskDate"))
      .orderBy("customer", "riskDate")
    assertFramesEqual(stream, StreamReplayQueries.dedupReplay(spark, dir))
  }

  test("spike alerts: stream frame equals the batch twin") {
    val t = streamed("eq_spike", "update")(
      df => StreamOps.riskSpikeAlerts(spark, df).toDF())
    val stream = t.select(col("customer"), col("score"), col("prior_mean_micro"))
      .orderBy("customer", "score", "prior_mean_micro")
    assertFramesEqual(stream, StreamReplayQueries.spikeReplay(spark, dir))
  }

  test("running totals: stream frame equals the batch twin") {
    val t = streamed("eq_running", "update")(
      df => StreamOps.runningRiskTotals(spark, df).toDF())
    val stream = t.select(col("customer"), col("n_events"), col("total_score_micro"))
      .orderBy("customer")
    assertFramesEqual(stream, StreamReplayQueries.runningReplay(spark, dir))
  }

  test("ewma: stream frame equals the batch twin") {
    val pts = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "ts", "event_id",
        "cast(round(value * 1000000.0D, 0) as bigint) as vm")
      .as[EwmaPoint].collect().toSeq
    val input = MemoryStream[EwmaPoint]
    val q = StreamOps.ewmaStream(spark, input.toDS()).toDF()
      .writeStream.format("memory").queryName("eq_ewma")
      .outputMode("update").start()
    try {
      input.addData(pts)
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("eq_ewma").orderBy("user_id")
    assertFramesEqual(stream, StreamReplayQueries.ewmaReplay(spark, dir))
  }

  test("pattern matches: stream frame equals the batch twin") {
    val ev = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) as us", "event_id", "event_type")
      .as[graft.streaming.TypedEvent].collect().toSeq
    val input = MemoryStream[graft.streaming.TypedEvent]
    val q = StreamOps.patternMatches(spark, input.toDS()).toDF()
      .writeStream.format("memory").queryName("eq_pattern")
      .outputMode("append").start()
    try {
      // split across TWO micro-batches at a user-timeline-safe point (by
      // event time) to also exercise the cross-batch carried view state
      val (b1, b2) = ev.sortBy(e => (e.us, e.event_id)).splitAt(ev.size / 2)
      input.addData(b1)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("eq_pattern")
      .orderBy("user_id", "b_us", "b_event_id")
    assertFramesEqual(stream, StreamReplayQueries.patternReplay(spark, dir))
  }

  test("gopher gate: stream projection equals the oracle-checked batch query") {
    // The gate is a stateless projection, so its streaming form needs no
    // watermark and emits in append mode; the batch t22 query IS the twin
    // the driver hash-checks, closing stream = batch = oracle for it.
    val docRows = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = ext.TextQueries.gopherRulesOf(
        input.toDF().toDF("doc_id", "text")
          .withColumn("toks", split(lower(col("text")), " ")))
      .select(col("doc_id"), col("n_toks"), col("r_len"), col("r_meanlen"),
        col("r_ttr"), col("r_top"), col("r_stop"), col("pass"))
      .writeStream.format("memory").queryName("eq_gopher")
      .outputMode("append").start()
    try {
      input.addData(docRows)
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table("eq_gopher").orderBy("doc_id")
    assertFramesEqual(stream, ext.TextQueries.gopherGate(spark, dir))
  }

  test("streaming near-dup pairs equal the batch d3 pair set across micro-batches") {
    // The signature/banding kernel is the LITERAL batch code path
    // (DedupQueries.bandedSignatures), so with no cap or TTL binding, the
    // streaming pair set must equal d3's — including pairs whose two docs
    // arrive in DIFFERENT micro-batches (found via bucket state). The
    // stream emits per colliding bucket; dropDuplicates collapses
    // cross-band repeats exactly as the operator's contract prescribes.
    val docRows = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingNearDupPairs(spark,
        input.toDF().toDF("doc_id", "text")).toDF()
      .writeStream.format("memory").queryName("eq_neardup")
      .outputMode("update").start()
    try {
      // three micro-batches, split by doc_id so near-dup partners (ids
      // planted far apart by the fixture generator) straddle batches
      docRows.sortBy(_._1).grouped((docRows.size + 2) / 3).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val stream = spark.table("eq_neardup").dropDuplicates("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = ext.DedupQueries.lshPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "fixtures plant near-duplicates")
    assert(stream == batch,
      s"missing=${(batch -- stream).take(5)} extra=${(stream -- batch).take(5)}")
  }

  test("streaming ANN pairs equal the batch single-bucket edge set at the same width") {
    // The banding kernel is the LITERAL batch code path
    // (SimilarityQueries.bandRowsOf at the corpus's adaptive width) and
    // the state-side cosine replicates CosineSimilarity's fused
    // accumulation, so with no cap binding the streaming pair set must
    // equal the batch corpus-grain edge set — including pairs whose two
    // vectors arrive in different micro-batches (found via bucket state).
    val b = ext.SimilarityQueries.scaledBandWidth(spark, dir)
    val vecs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamOps.streamingAnnPairs(spark,
        input.toDF().toDF("vec_id", "embedding"), b).toDF()
      .writeStream.format("memory").queryName("eq_annpairs")
      .outputMode("update").start()
    try {
      vecs.sortBy(_._1).grouped((vecs.size + 2) / 3).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()
    val stream = spark.table("eq_annpairs").dropDuplicates("vec_a", "vec_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = ext.SimilarityQueries.scaledCandScores(spark, dir, lit(true))
      .filter(col("cosine") >= ext.SimilarityQueries.NearDupThreshold)
      .filter(col("vec_id") < col("nbr_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch.nonEmpty, "fixtures plant embedding near-duplicates")
    assert(stream == batch,
      s"missing=${(batch -- stream).take(5)} extra=${(stream -- batch).take(5)}")
  }
}
