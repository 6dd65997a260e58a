package graft

import graft.ops.StediOps
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Stateful streaming operator semantics over MemoryStream. */
class StreamOpsSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def mkRisk(email: String, score: Double, ts: String): String =
    s"""{"customer":"$email","score":$score,"riskDate":"$ts"}"""

  private def parsed(input: MemoryStream[String]) =
    StediOps.parseRiskEvent(input.toDF().select(col("value")))

  test("windowed aggregation emits closed windows once the watermark passes") {
    val input = MemoryStream[String]
    val q = StreamOps.windowedRiskStats(parsed(input), "10 minutes", "10 minutes")
      .writeStream.format("memory").queryName("win_stats").outputMode("append").start()
    try {
      input.addData(
        mkRisk("a@test.com", 2.0, "2020-09-14T07:02:00.000Z"),
        mkRisk("a@test.com", 4.0, "2020-09-14T07:04:00.000Z"),
        mkRisk("b@test.com", 8.0, "2020-09-14T07:05:00.000Z"))
      q.processAllAvailable()
      // watermark hasn't passed 07:10 yet — nothing emitted in append mode
      assert(spark.table("win_stats").count() == 0)
      // an event far in the future advances the watermark past the window
      input.addData(mkRisk("c@test.com", 1.0, "2020-09-14T09:00:00.000Z"))
      q.processAllAvailable()
      input.addData(mkRisk("c@test.com", 1.0, "2020-09-14T09:30:00.000Z"))
      q.processAllAvailable()
      val rows = spark.table("win_stats")
        .collect().map(r => (r.getAs[String]("customer"),
          r.getAs[Long]("n_events"), r.getAs[Double]("avg_score"))).toSet
      assert(rows.contains(("a@test.com", 2L, 3.0)))
      assert(rows.contains(("b@test.com", 1L, 8.0)))
    } finally q.stop()
  }

  test("streaming corpus ingest scrubs, gates and dedups redelivered documents") {
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = graft.pipelines.StreamingCorpusPipeline.ingest(docs, "10 minutes")
      .writeStream.format("memory").queryName("corpus_ingest")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      val good = "the quick brown fox jumps over the lazy dog near the river bank today"
      input.addData(
        (1L, s"$good mail me at a@b.com", ts("2024-01-01 10:00:00")),
        (1L, s"$good mail me at a@b.com", ts("2024-01-01 10:01:00")), // redelivery
        (2L, "!!!???!!!", ts("2024-01-01 10:02:00")))                 // fails gate
      q.processAllAvailable()
      input.addData((3L, s"$good again", ts("2024-01-01 12:00:00")))  // advance wm
      q.processAllAvailable()
      val rows = spark.table("corpus_ingest").collect()
      val byId = rows.groupBy(_.getAs[Long]("doc_id"))
      assert(byId.getOrElse(1L, Array()).length == 1, "redelivery must collapse")
      assert(!byId.contains(2L), "low-quality doc must be gated out")
      assert(byId(1L).head.getAs[String]("text").contains("<EMAIL>"),
        "scrub must run before landing")
      assert(!byId(1L).head.getAs[String]("text").contains("a@b.com"))
    } finally q.stop()
  }

  test("streaming corpus ingest over 3 restarted micro-batches lands frame-equal to the batch pipeline") {
    // The two-tier equivalence contract: the continuous ingest tier,
    // run as THREE separate queries resuming from one checkpoint (two
    // mid-stream stop/restarts), must land exactly the frame the batch
    // formulation produces over the same input rows — gate on raw text,
    // keep the FIRST arrival per text fingerprint (min-by ts, the batch
    // twin of dropDuplicatesWithinWatermark under in-order landing),
    // scrub last.
    import graft.pipelines.StreamingCorpusPipeline
    val in = ckptDir("corpus_in")
    val out = ckptDir("corpus_out")
    val ckpt = ckptDir("corpus_ckpt")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    def land(rows: (Long, String, java.sql.Timestamp)*): Unit =
      rows.toSeq.toDF("doc_id", "text", "ts").write.mode("append").parquet(in)
    def runOnce(): Long = {
      val q = StreamingCorpusPipeline.ingest(
          spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
            .parquet(in), "10 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(out).count()
    }
    val good = "the quick brown fox jumps over the lazy dog near the river bank today"
    // query 1: two keepers + one gated doc
    land((1L, s"$good one a@b.com", ts("2024-01-01 10:00:00")),
      (2L, "!!!???!!!", ts("2024-01-01 10:00:30")),
      (3L, s"$good three", ts("2024-01-01 10:01:00")))
    val n1 = runOnce()
    // query 2 (restart): same-id redelivery of doc 1 at a later ts + a new doc
    land((1L, s"$good one a@b.com", ts("2024-01-01 10:02:00")),
      (4L, s"$good four", ts("2024-01-01 10:03:00")))
    val n2 = runOnce()
    // query 3 (restart): doc 3's text under a NEW id (must collapse against
    // state recovered across TWO restarts) + a keeper + a gated doc
    land((5L, s"$good three", ts("2024-01-01 10:04:00")),
      (6L, s"$good six", ts("2024-01-01 10:05:00")),
      (7L, "?? !! ..", ts("2024-01-01 10:05:30")))
    val n3 = runOnce()
    assert(n1 > 0 && n2 > n1 && n3 > n2,
      s"every restarted run must land new rows: $n1, $n2, $n3")
    assert(new java.io.File(s"$ckpt/commits").list().count(!_.endsWith(".tmp")) >= 3,
      "the checkpoint must record at least 3 committed micro-batches")
    // batch formulation over ALL landed input rows, same stage order
    val all = spark.read.parquet(in)
    val gated = graft.ext.TextQueries.qualityOf(
        all.withColumn("toks", org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.lower(col("text")), " ")))
      .filter(col("quality_score") >= StreamingCorpusPipeline.QualityThreshold)
      .withColumn("fp", org.apache.spark.sql.functions.md5(col("text")))
    val first = gated.groupBy(col("fp"))
      .agg(org.apache.spark.sql.functions.min_by(
        org.apache.spark.sql.functions.struct(col("doc_id"), col("ts"),
          col("text"), col("quality_score")), col("ts")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.ts").as("ts"),
        col("r.text").as("text"), col("r.quality_score").as("quality_score"),
        col("fp"))
    val batchRef = graft.ext.TextQueries.scrubbed(first)
      .select("doc_id", "ts", "text", "quality_score", "fp")
    def frame(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        r.getDouble(3), r.getString(4))).toSet
    val streamed = frame(spark.read.parquet(out)
      .select("doc_id", "ts", "text", "quality_score", "fp"))
    assert(streamed == frame(batchRef),
      s"streamed and batch frames diverge:\n stream: $streamed")
    assert(streamed.map(_._1) == Set(1L, 3L, 4L, 6L))
  }

  test("two-tier end-to-end: batch consolidation over the streaming-landed corpus equals the pure-batch pipeline") {
    // The full two-tier architecture on the real fixture: land sf0.001
    // through the streaming ingest tier in two micro-batched runs (with
    // planted at-least-once redeliveries and a cross-id re-fetch the
    // transport layer would produce), rebuild a documents table from the
    // landed rows, run the ENTIRE batch TrainingDataPipeline over it,
    // and assert the survivor set equals the pure-batch run over the
    // original corpus. Why equality holds — each bullet is a contract a
    // regression would break:
    //  - ingest gates are the batch front stages on RAW text in batch
    //    order (quality, d1 fingerprint dedup, scrub LAST);
    //  - first-arrival-per-fingerprint = min-doc_id-per-text, batch
    //    d1's canonical pick, BY CONSTRUCTION of the feed: rows land in
    //    occurrence-rank WAVES (wave k = each fingerprint's k-th lowest
    //    doc_id), one file per wave consumed one per micro-batch
    //    (maxFilesPerTrigger=1) — so no micro-batch ever carries two
    //    rows of one fingerprint, and dropDuplicatesWithinWatermark's
    //    arbitrary intra-batch pick never gets a choice (the r12 ADVICE
    //    determinism fix; the cross-id re-fetch arrives in run 2 and
    //    must lose to run 1's state across the checkpoint);
    //  - the fixture carries no PII patterns, so scrub is the identity
    //    here (asserted below — gating/fingerprinting on raw text is
    //    what keeps the tiers aligned when it is NOT);
    //  - downstream corpus-global gates commute with the front-gate cut
    //    on this corpus: ANN dedup is embeddings-only (table shared
    //    verbatim), LSH roots are min-id per cluster, and the mixture/
    //    split/decontamination hashes are per-doc.
    import graft.pipelines.{StreamingCorpusPipeline, TrainingDataPipeline}
    import org.apache.spark.sql.functions.{expr, length, lit}
    val src = "/root/testdata/sf0.001"
    val in = ckptDir("tier2_in")
    val landedOut = ckptDir("tier2_out")
    val ckpt = ckptDir("tier2_ckpt")
    val landedDir = ckptDir("tier2_dir")
    val docs = Tables.load(spark, src, "documents")
    val withTs = docs.select(col("doc_id"), col("text"))
      .withColumn("ts", expr(
        "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)"))
    def runOnce(): Unit = {
      val q = StreamingCorpusPipeline.ingest(
          spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
            .option("maxFilesPerTrigger", 1)
            .parquet(in), "1 hour")
        .writeStream.format("parquet")
        .option("path", landedOut).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // land in occurrence-rank waves: one coalesced file per wave, so
    // each micro-batch sees at most one row per text fingerprint
    def landWaves(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.{md5, row_number, max}
      val waved = df.withColumn("wave", row_number().over(
        Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))))
      val n = waved.agg(max("wave")).collect()(0).getInt(0)
      (1 to n).foreach { w =>
        waved.filter(col("wave") === w).drop("wave").coalesce(1)
          .write.mode("append").parquet(in)
      }
    }
    // run 1: first half of the corpus
    landWaves(withTs.filter(col("doc_id") < 250))
    runOnce()
    // run 2: second half + the transport artifacts — a redelivery of doc
    // 42 (same id, same text, later ts), a re-fetch of doc 42's text
    // under a NEW id (must lose to run 1's fingerprint state recovered
    // from the checkpoint), and a junk doc the quality gate must drop
    val text42 = docs.filter(col("doc_id") === 42).select("text")
      .collect().head.getString(0)
    val extras = Seq(
      (42L, text42, java.sql.Timestamp.valueOf("2024-01-01 00:20:00")),
      (1000L, text42, java.sql.Timestamp.valueOf("2024-01-01 00:20:01")),
      (1001L, "!! ?? !! ??", java.sql.Timestamp.valueOf("2024-01-01 00:20:02")))
    landWaves(withTs.filter(col("doc_id") >= 250)
      .union(extras.toDF("doc_id", "text", "ts")))
    runOnce()
    // rebuild a documents table from the landed rows (lang/source join
    // back by id — ids are preserved through the ingest tier)
    val landed = spark.read.parquet(landedOut)
    val landedIds = landed.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!landedIds.contains(1000L), "cross-id re-fetch must lose to checkpointed state")
    assert(!landedIds.contains(1001L), "junk doc must be quality-gated")
    assert(landed.filter(col("doc_id") === 42).count() == 1, "redelivery must collapse")
    landed.select(col("doc_id"), col("text"))
      .join(docs.select(col("doc_id"), col("text").as("raw"),
        col("lang"), col("source")), Seq("doc_id"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars", "raw")
      .createOrReplaceTempView("landed_check")
    assert(spark.table("landed_check").filter(col("text") =!= col("raw")).count() == 0,
      "scrub must be the identity on this PII-free corpus")
    spark.table("landed_check").drop("raw")
      .coalesce(1).write.parquet(s"$landedDir/documents.parquet")
    // the embeddings table is shared verbatim between the tiers
    val embSrc = new java.io.File(s"$src/embeddings.parquet")
    val embDst = new java.io.File(s"$landedDir/embeddings.parquet")
    if (embSrc.isDirectory) {
      embDst.mkdirs()
      embSrc.listFiles().foreach(f => java.nio.file.Files.copy(f.toPath,
        new java.io.File(embDst, f.getName).toPath))
    } else java.nio.file.Files.copy(embSrc.toPath, embDst.toPath)
    def survivorSet(d: String) = TrainingDataPipeline.survivors(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val pure = survivorSet(src)
    val tiered = survivorSet(landedDir)
    assert(tiered == pure,
      s"two-tier survivors diverge from pure batch: only-tiered=${
        (tiered -- pure).map(_._1).toSeq.sorted}, only-pure=${
        (pure -- tiered).map(_._1).toSeq.sorted}")
    assert(pure.nonEmpty)
  }

  test("watermarked dedup collapses at-least-once redeliveries") {
    val input = MemoryStream[String]
    val q = StreamOps.dedupRiskEvents(parsed(input))
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      val e = mkRisk("a@test.com", 5.0, "2020-09-14T07:02:00.000Z")
      input.addData(e, e)
      q.processAllAvailable()
      input.addData(e, mkRisk("a@test.com", 6.0, "2020-09-14T07:03:00.000Z"))
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
    } finally q.stop()
  }

  test("sliding windows count each event in every covering window") {
    val input = MemoryStream[String]
    val q = StreamOps.slidingRiskStats(parsed(input), "10 minutes", "5 minutes", "5 minutes")
      .writeStream.format("memory").queryName("slide_stats").outputMode("append").start()
    try {
      input.addData(mkRisk("a@test.com", 6.0, "2020-09-14T07:07:00.000Z"))
      q.processAllAvailable()
      input.addData(mkRisk("z@test.com", 1.0, "2020-09-14T09:00:00.000Z")) // advance watermark
      q.processAllAvailable()
      input.addData(mkRisk("z@test.com", 1.0, "2020-09-14T09:40:00.000Z"))
      q.processAllAvailable()
      val starts = spark.table("slide_stats").collect()
        .filter(_.getAs[String]("customer") == "a@test.com")
        .map(_.getAs[java.sql.Timestamp]("window_start").toString).sorted
      // 07:07 falls in [07:00,07:10) and [07:05,07:15)
      assert(starts.toSeq == Seq("2020-09-14 07:00:00.0", "2020-09-14 07:05:00.0"))
    } finally q.stop()
  }

  test("session windows merge gap-adjacent events and close at the watermark") {
    val input = MemoryStream[String]
    val q = StreamOps.sessionRiskStats(parsed(input), "5 minutes", "5 minutes")
      .writeStream.format("memory").queryName("sess_stats").outputMode("append").start()
    try {
      input.addData(
        mkRisk("a@test.com", 1.0, "2020-09-14T07:00:00.000Z"),
        mkRisk("a@test.com", 2.0, "2020-09-14T07:04:00.000Z"), // within gap → same session
        mkRisk("a@test.com", 4.0, "2020-09-14T07:20:00.000Z")) // new session
      q.processAllAvailable()
      input.addData(mkRisk("z@test.com", 1.0, "2020-09-14T09:00:00.000Z")) // advance watermark
      q.processAllAvailable()
      input.addData(mkRisk("z@test.com", 1.0, "2020-09-14T09:40:00.000Z"))
      q.processAllAvailable()
      val a = spark.table("sess_stats").collect()
        .filter(_.getAs[String]("customer") == "a@test.com")
        .map(r => (r.getAs[Long]("n_events"), r.getAs[Double]("total_score"))).toSet
      assert(a == Set((2L, 3.0), (1L, 4.0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits alerts only on spikes above 2x the prior mean") {
    val input = MemoryStream[String]
    val q = StreamOps.riskSpikeAlerts(spark, parsed(input))
      .writeStream.format("memory").queryName("alerts").outputMode("update").start()
    try {
      input.addData(mkRisk("a@test.com", 1.0, "t"), mkRisk("a@test.com", 1.0, "t"))
      q.processAllAvailable()
      assert(spark.table("alerts").count() == 0) // building the baseline
      input.addData(mkRisk("a@test.com", 10.0, "t")) // mean=1 → spike
      q.processAllAvailable()
      input.addData(mkRisk("a@test.com", 1.0, "t")) // mean=4 → not a spike
      q.processAllAvailable()
      val rows = spark.table("alerts").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("a@test.com", 10.0, 1.0)))
    } finally q.stop()
  }

  test("spike alerts depend on the batch's event set, not shuffle arrival order") {
    val input = MemoryStream[String]
    val q = StreamOps.riskSpikeAlerts(spark, parsed(input))
      .writeStream.format("memory").queryName("alerts_order").outputMode("update").start()
    try {
      // The spike is LAST by riskDate but FIRST by arrival: an unsorted
      // fold would see it before its baseline exists (n < 2) and stay
      // silent; the (riskDate, score) sort must fire it with prior_mean 1.
      input.addData(
        mkRisk("a@test.com", 10.0, "2020-09-14T07:02:00.000Z"),
        mkRisk("a@test.com", 1.0, "2020-09-14T07:00:00.000Z"),
        mkRisk("a@test.com", 1.0, "2020-09-14T07:01:00.000Z"))
      q.processAllAvailable()
      val rows = spark.table("alerts_order").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      assert(rows.toSeq == Seq(("a@test.com", 10.0, 1.0)))
    } finally q.stop()
  }

  test("stream-static broadcast join enriches the stream without streaming state") {
    val input = MemoryStream[String]
    val dim = Seq(("a@test.com", "1981"), ("b@test.com", "1990"))
      .toDF("email", "birthYear")
    val q = StreamOps.enrichWithStaticCustomers(parsed(input), dim)
      .writeStream.format("memory").queryName("enriched").outputMode("append").start()
    try {
      input.addData(
        mkRisk("a@test.com", 5.0, "t"),
        mkRisk("nobody@test.com", 9.0, "t")) // no dimension row → dropped
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
      assert(rows.toSeq == Seq(("a@test.com", 5.0, "1981")))
    } finally q.stop()
  }

  test("foreachBatch lands each micro-batch in parquet exactly once") {
    val input = MemoryStream[String]
    val out = ckptDir("febatch")
    val q = parsed(input).writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.write.mode("append").parquet(s"$out/risk")
      }
      .start()
    try {
      input.addData(mkRisk("a@test.com", 1.0, "t"), mkRisk("b@test.com", 2.0, "t"))
      q.processAllAvailable()
      input.addData(mkRisk("c@test.com", 3.0, "t"))
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/risk").count() == 3)
    } finally q.stop()
  }

  test("parquet file-stream source discovers newly landed files incrementally") {
    // The batch-landing-zone pattern: an upstream job drops parquet files
    // into a directory, the streaming side treats the directory as an
    // unbounded table (each discovered file = one micro-batch of input).
    val dir = ckptDir("fstream")
    Seq(("a@test.com", 1.0), ("b@test.com", 2.0)).toDF("customer", "score")
      .write.mode("append").parquet(dir)
    val stream = spark.readStream
      .schema("customer STRING, score DOUBLE")
      .parquet(dir)
      .groupBy(col("customer"))
      .count()
    val q = stream.writeStream.format("memory").queryName("fstream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("fstream").count() == 2)
      // a new file landing in the directory is picked up without restart
      Seq(("a@test.com", 3.0)).toDF("customer", "score")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val counts = spark.table("fstream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts == Map("a@test.com" -> 2L, "b@test.com" -> 1L))
    } finally q.stop()
  }

  test("stateful dedup survives a stop/restart: checkpointed state resumes exactly-once") {
    // The fault-tolerance contract the reference never tests: kill a
    // stateful query, restart it from its checkpoint, and the recovered
    // StateStore must still recognize a redelivery from BEFORE the
    // restart. File source + file sink + AvailableNow = the recoverable
    // end-to-end shape (memory sink does not recover).
    val in = ckptDir("ckpt_in")
    val out = ckptDir("ckpt_out")
    val ckpt = ckptDir("ckpt_state")
    def land(rows: (String, Double, String)*): Unit =
      rows.toSeq.toDF("customer", "score", "riskDate")
        .write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = StreamOps.dedupRiskEvents(
        spark.readStream
          .schema("customer STRING, score DOUBLE, riskDate STRING")
          .parquet(in))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val e1 = ("a@test.com", 5.0, "2020-09-14T07:02:00.000Z")
    land(e1, e1, ("b@test.com", 1.0, "2020-09-14T07:03:00.000Z"))
    runOnce()
    // run 2: e1 redelivered AFTER the restart + one genuinely new event
    land(e1, ("a@test.com", 6.0, "2020-09-14T07:04:00.000Z"))
    runOnce()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("customer"), r.getAs[Double]("score")))
    assert(rows.length == 3, rows.mkString(","))
    assert(rows.count(_ == ("a@test.com", 5.0)) == 1,
      "cross-restart redelivery must collapse against recovered state")
    assert(rows.contains(("a@test.com", 6.0)) && rows.contains(("b@test.com", 1.0)))
  }

  test("streaming near-dup bucket cap: arrivals past the cap verify but never enroll") {
    // maxBucket=1 with three mutual near-dups: doc 1 enrolls; docs 2 and
    // 3 each pair against the single resident but are NOT enrolled, so
    // (2,3) is never emitted — the exact degradation contract the cap
    // documents (a capped bucket keeps flagging against its residents,
    // it stops growing). Short docs (<3 tokens) carry no shingle and
    // must pass through the band view without crashing the fold.
    val base = (1 to 30).map(i => s"cap$i").mkString(" ")
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.streamingNearDupPairs(spark,
        input.toDF().toDF("doc_id", "text"), maxBucket = 1).toDF()
      .writeStream.format("memory").queryName("nd_cap")
      .outputMode("update").start()
    try {
      input.addData(Seq((1L, base), (4L, "too short")))
      q.processAllAvailable()
      input.addData(Seq((2L, base + " x"), (3L, base + " y")))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.table("nd_cap").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct.toSet
    assert(pairs == Set((1L, 2L), (1L, 3L)), pairs)
  }

  test("streaming near-dup state survives a stop/restart: cross-restart pair still found") {
    // The bucket-state analog of the dedup recovery test: doc 2 (a
    // near-dup of doc 1) arrives only AFTER the query is killed and
    // restarted from its checkpoint, so the pair can only be found if
    // doc 1's (doc_id, shh) bucket residency was recovered from the
    // StateStore. FMGWS emits in update mode, which no file sink
    // accepts — foreachBatch appends each micro-batch's emissions.
    val in = ckptDir("nd_in")
    val out = ckptDir("nd_out")
    val ckpt = ckptDir("nd_state")
    def land(rows: (Long, String)*): Unit =
      rows.toSeq.toDF("doc_id", "text").write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = StreamOps.streamingNearDupPairs(spark,
          spark.readStream.schema("doc_id LONG, text STRING").parquet(in))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.NearDupPair], _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    land((1L, base), (100L, (1 to 40).map(i => s"other$i").mkString(" ")))
    runOnce()
    land((2L, base + " extra")) // near-dup of doc 1, lands after the restart
    runOnce()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(p => (p._1, p._2)).distinct.toSeq == Seq((1L, 2L)), rows.mkString(","))
    assert(rows.forall(_._3 >= graft.ext.DedupQueries.JaccardThreshold))
  }

  test("streaming ANN pair state survives a stop/restart: cross-restart pair still found") {
    // the embedding twin of the near-dup recovery case: vector 2 (a
    // planted cosine-neighbor of vector 1) arrives only AFTER the query
    // restarts from its checkpoint, so the pair can only be found if
    // vector 1's (vec_id, embedding) bucket residency was recovered.
    val in = ckptDir("ann_in")
    val out = ckptDir("ann_out")
    val ckpt = ckptDir("ann_state")
    def vec(seed: Int, jitter: Float): Array[Float] =
      Array.tabulate(64)(d => (math.sin(seed + d * 0.7).toFloat + (if (d == 0) jitter else 0f)))
    def land(rows: (Long, Array[Float])*): Unit =
      rows.toSeq.toDF("vec_id", "embedding").write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = StreamOps.streamingAnnPairs(spark,
          spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
            .parquet(in), b = 6)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.AnnPair], _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land((1L, vec(3, 0f)), (100L, vec(77, 0f))) // 100: unrelated direction
    runOnce()
    land((2L, vec(3, 0.01f))) // near-identical to vec 1, lands post-restart
    runOnce()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(p => (p._1, p._2)).distinct.toSeq == Seq((1L, 2L)), rows.mkString(","))
    assert(rows.forall(_._3 >= graft.ext.SimilarityQueries.NearDupThreshold))
  }

  test("epoch migration: drained ANN state re-keys to b+1 exactly; pre-migration residents pair post-migration") {
    // The mid-stream doubling-epoch protocol end-to-end: (1) an
    // admission query runs at width b and drains; (2) its bucket state
    // is read off the checkpoint (state data source) and re-keyed to
    // b+1 by computing ONLY the new plane bit — the split property as a
    // state transform: the migrated state must equal a FRESH width-(b+1)
    // banding of the same vectors, bit for bit, with low bits untouched;
    // (3) a new query resumes at b+1 with the migrated residents as
    // initialState, and a post-migration arrival still pairs with its
    // pre-migration neighbor — no missed pairs across the epoch.
    import graft.ext.SimilarityQueries
    val in1 = ckptDir("mig_in1")
    val in2 = ckptDir("mig_in2")
    val out = ckptDir("mig_out")
    val ck1 = ckptDir("mig_ck1")
    val ck2 = ckptDir("mig_ck2")
    StreamOps.stampPlaneFamily(spark, ck1)
    StreamOps.stampPlaneFamily(spark, ck2)
    def vec(seed: Int, jitter: Float): Array[Float] =
      Array.tabulate(64)(d => (math.sin(seed + d * 0.7).toFloat + (if (d == 0) jitter else 0f)))
    val a = Seq((1L, vec(3, 0f)), (50L, vec(41, 0f)), (100L, vec(77, 0f)))
    val bNew = Seq((2L, vec(3, 0.01f)))
    val b0 = 6
    // phase 1: enroll A at width b0, drain
    a.toDF("vec_id", "embedding").write.mode("append").parquet(in1)
    val q1 = StreamOps.streamingAnnPairs(spark,
        spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .parquet(in1), b = b0)
      .writeStream.format("noop")
      .option("checkpointLocation", ck1)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q1.awaitTermination()
    // drain: one resident row per (vector, table)
    val snap = StreamOps.annStateSnapshot(spark, ck1)
    assert(snap.count() == a.size * SimilarityQueries.AnnHubTables, snap.count())
    // migrate: must equal a fresh width-(b0+1) banding, low bits intact
    val mig = SimilarityQueries.migrateAnnResidents(snap, b0)
    def keySet(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "bid", "bkey").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val fresh = SimilarityQueries.bandRowsOf(
      a.toDF("vec_id", "embedding"), b0 + 1)
    assert(keySet(mig) == keySet(fresh),
      "migrated state must equal a fresh width-(b+1) rebuild")
    val lowMask = (1 << b0) - 1
    val oldKeys = snap.collect()
      .map(r => (r.getLong(2), r.getInt(0)) -> r.getInt(1)).toMap
    mig.collect().foreach { r =>
      assert((r.getInt(1) & lowMask) == oldKeys((r.getLong(2), r.getInt(0))),
        "low bits disturbed by migration")
    }
    // phase 2: resume at b0+1 from the migrated state; the new arrival
    // pairs with its pre-migration neighbor
    bNew.toDF("vec_id", "embedding").write.mode("append").parquet(in2)
    val q2 = StreamOps.streamingAnnPairsFrom(spark,
        spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>")
          .parquet(in2), b = b0 + 1, initialResidents = mig)
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.AnnPair], _: Long) =>
        df.write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ck2)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val pairs = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the no-missed-pairs contract, against the BATCH reference: the
    // emitted set must equal the width-(b0+1) bucket-collision edge set
    // between the new arrival and the pre-migration residents (exact
    // cosine at the threshold, either side)
    import org.apache.spark.sql.functions.{col, expr, round => sqlRound}
    graft.functions.GraftFunctions.register(spark)
    val allBands = SimilarityQueries.bandRowsOf(
      (a ++ bNew).toDF("vec_id", "embedding"), b0 + 1)
      .select(col("vec_id"), col("embedding"), col("bid"), col("bkey"))
    val newIds = bNew.map(_._1).toSet
    val expectedPairs = allBands.as("x").join(allBands.as("y"),
        col("x.bid") === col("y.bid") && col("x.bkey") === col("y.bkey") &&
          col("x.vec_id") < col("y.vec_id"))
      .filter(col("y.vec_id").isin(newIds.toSeq: _*) ||
        col("x.vec_id").isin(newIds.toSeq: _*))
      .select(col("x.vec_id"), col("y.vec_id"),
        sqlRound(expr("cosine_sim(x.embedding, y.embedding)"), 6).as("c"))
      .filter(col("c") >= SimilarityQueries.NearDupThreshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expectedPairs.contains((1L, 2L)),
      "fixture must plant a cross-epoch pair")
    assert(pairs.map(p => (p._1, p._2)).toSet == expectedPairs,
      s"cross-epoch pairs must equal the batch width-(b+1) edge set: " +
        s"${pairs.mkString(",")} vs $expectedPairs")
    assert(pairs.forall(_._3 >= SimilarityQueries.NearDupThreshold))
    // the resumed checkpoint's state is the full width-(b0+1) banding of
    // A ∪ B — initial state landed AND the new arrival enrolled at the
    // new width
    val snap2 = StreamOps.annStateSnapshot(spark, ck2)
    val freshAll = SimilarityQueries.bandRowsOf(
      (a ++ bNew).toDF("vec_id", "embedding"), b0 + 1)
    assert(keySet(snap2) == keySet(freshAll),
      "resumed state must equal the fresh width-(b+1) banding of A ∪ B")
  }

  test("evicting ANN: pre-eviction pair found across restart, post-eviction pair not") {
    // the embedding twin of the near-dup eviction case, same
    // choreography: (1) a cosine-neighbor arriving while the bucket is
    // live pairs against RECOVERED state (restart between arrivals);
    // (2) unrelated traffic drags the watermark past the bucket's last
    // arrival, a further run fires the EventTimeTimeout and drops the
    // residents; (3) an identical-direction vector arriving after
    // eviction finds nothing — admission-against-recent-history.
    val in = ckptDir("anne_in")
    val out = ckptDir("anne_out")
    val ckpt = ckptDir("anne_state")
    val baseMs = java.sql.Timestamp.valueOf("2020-09-14 07:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(baseMs + min * 60000L)
    def vec(seed: Int, jitter: Float): Array[Float] =
      Array.tabulate(64)(d => (math.sin(seed + d * 0.7).toFloat + (if (d == 0) jitter else 0f)))
    def land(rows: (Long, Array[Float], java.sql.Timestamp)*): Unit =
      rows.toSeq.toDF("vec_id", "embedding", "ts").write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = StreamOps.streamingAnnPairsEvicting(spark,
          spark.readStream
            .schema("vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP")
            .parquet(in), b = 6, watermark = "10 minutes")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.AnnPair], _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land((1L, vec(3, 0f), ts(0)))
    runOnce()
    // restart: neighbor inside the window — found via RECOVERED state
    land((2L, vec(3, 0.01f), ts(5)))
    runOnce()
    // unrelated directions drag the watermark past the bucket's last
    // arrival; the following run's batch fires the timeout callback
    land((100L, vec(77, 0f), ts(120)))
    runOnce()
    land((101L, vec(55, 0f), ts(121)))
    runOnce()
    // same direction AFTER eviction: enrolls fresh, pairs with nothing
    land((3L, vec(3, 0.02f), ts(125)))
    runOnce()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(p => (p._1, p._2)).distinct.toSeq == Seq((1L, 2L)),
      s"expected only the pre-eviction pair: ${rows.mkString(",")}")
    assert(rows.forall(_._3 >= graft.ext.SimilarityQueries.NearDupThreshold))
  }

  test("evicting epoch migration: in-window residents pair at b+1, stale buckets dropped, untouched buckets still evict") {
    // The COMPOSITION of eviction and epoch migration (r11 verdict #1):
    // (1) an evicting admission query runs at width b0 and drains with a
    // known watermark; (2) the snapshot is read WITH each bucket's armed
    // timeout, window-filtered at the drain watermark (stale buckets
    // dropped — the timeouts that would have fired), and re-keyed to
    // b0+1; (3) the evicting twin resumes from the filtered initialState
    // with the touch batch as its first micro-batch. Pinned here:
    //   (a) an in-window pre-migration resident pairs with its
    //       post-migration neighbor at the new width;
    //   (b) an out-of-window resident is NOT resurrected — its
    //       post-migration neighbor finds nothing;
    //   (c) the leak the prose path had is actually closed: a migrated
    //       bucket the new epoch never touches EVICTS once the
    //       watermark passes its re-armed timeout, so the final state
    //       is exactly the live window's banding — no immortal buckets.
    import graft.ext.SimilarityQueries
    val in1 = ckptDir("eme_in1")
    val in2 = ckptDir("eme_in2")
    val out = ckptDir("eme_out")
    val ck1 = ckptDir("eme_ck1")
    val ck2 = ckptDir("eme_ck2")
    StreamOps.stampPlaneFamily(spark, ck1)
    StreamOps.stampPlaneFamily(spark, ck2)
    val baseMs = java.sql.Timestamp.valueOf("2020-09-14 07:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(baseMs + min * 60000L)
    def vec(seed: Int, jitter: Float): Array[Float] =
      Array.tabulate(64)(d => (math.sin(seed + d * 0.7).toFloat + (if (d == 0) jitter else 0f)))
    val b0 = 6
    // phase 1 at b0: A (in-window), S (stale at MIGRATION time — its
    // buckets' timeout ts(28) is past the checkpoint's own watermark
    // ts(25), so Spark has NOT physically evicted it, but the
    // deployment declares the migration cut at ts(28), where it would
    // have fired — the exact case the window filter exists for), W
    // (in-window but never touched by phase-2 traffic — the leak probe)
    val a = (1L, vec(3, 0f));  val s = (50L, vec(23, 0f)); val w = (100L, vec(77, 0f))
    Seq((s._1, s._2, ts(28)), (a._1, a._2, ts(30)), (w._1, w._2, ts(35)))
      .toDF("vec_id", "embedding", "ts").write.mode("append").parquet(in1)
    val q1 = StreamOps.streamingAnnPairsEvicting(spark,
        spark.readStream.schema("vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP")
          .parquet(in1), b = b0, watermark = "10 minutes")
      .writeStream.format("noop")
      .option("checkpointLocation", ck1)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q1.awaitTermination()
    // the declared migration cut: later than the checkpoint's internal
    // watermark (ts(25) = max event ts(35) − 10 min), at S's timeout
    val drainWmMs = ts(28).getTime
    val snap = StreamOps.annStateSnapshotEvicting(spark, ck1)
    assert(snap.count() == 3 * SimilarityQueries.AnnHubTables, snap.count())
    assert(snap.filter($"vec_id" === s._1).count() ==
      SimilarityQueries.AnnHubTables.toLong,
      "fixture: S must still be physically resident at drain — the filter, not Spark, drops it")
    // window-filter + re-key: S's buckets (timeout ts(28) ≤ cut) drop;
    // the survivors must equal a fresh width-(b0+1) banding of {A, W}
    val mig = SimilarityQueries.migrateAnnResidentsEvicting(snap, b0, drainWmMs)
      .localCheckpoint()
    def keySet(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "bid", "bkey").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val freshSurvivors = SimilarityQueries.bandRowsOf(
      Seq(a, w).toDF("vec_id", "embedding"), b0 + 1)
    assert(keySet(mig) == keySet(freshSurvivors),
      "window-filtered migration must equal a fresh width-(b+1) banding of the in-window residents")
    val touches = StreamOps.annTouchRows(mig)
    assert(touches.count() ==
      mig.select("bid", "bkey").distinct().count(), "one touch per bucket")
    // phase 2 at b0+1, fresh checkpoint, resumed from the migrated state
    def land2(rows: (Long, Array[Float], java.sql.Timestamp)*): Unit =
      rows.toSeq.toDF("vec_id", "embedding", "ts")
        .withColumn("touch_bid", org.apache.spark.sql.functions.lit(-1))
        .withColumn("touch_bkey", org.apache.spark.sql.functions.lit(-1))
        .write.mode("append").parquet(in2)
    def runOnce2(): Unit = {
      val q = StreamOps.streamingAnnPairsEvictingFrom(spark,
          spark.readStream.schema(
            "vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP, touch_bid INT, touch_bkey INT")
            .parquet(in2), b = b0 + 1, initialResidents = mig,
          watermark = "10 minutes")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.AnnPair], _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ck2)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // first micro-batch: the touch re-registration rows
    touches.write.mode("append").parquet(in2)
    runOnce2()
    // (a) A's neighbor pairs against migrated state at b0+1;
    // (b) S's neighbor finds nothing — S was dropped at migration
    land2((2L, vec(3, 0.01f), ts(36)), (51L, vec(23, 0.01f), ts(36)))
    runOnce2()
    // unrelated traffic advances the watermark past every re-armed
    // timeout (ts(35) for W, ts(36) for the A/S' buckets); the next
    // run's batch fires the timeouts
    land2((101L, vec(12, 0f), ts(60)))
    runOnce2()
    // out-of-plane direction (the sine family spans a 2-D plane, so
    // in-family "unrelated" seeds can still share buckets or clear the
    // 0.45 threshold): alternating ±1 is orthogonal to the whole family
    val altVec: Array[Float] = Array.tabulate(64)(d => if (d % 2 == 0) 1f else -1f)
    land2((102L, altVec, ts(61)))
    runOnce2()
    val pairs = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).distinct.toSeq == Seq((1L, 2L)),
      s"expected exactly the in-window cross-epoch pair: ${pairs.mkString(",")}")
    assert(pairs.forall(_._3 >= SimilarityQueries.NearDupThreshold))
    // (c) the final state is exactly the live window's width-(b0+1)
    // banding: W's buckets — touched only by the re-registration batch —
    // evicted on their re-armed timeouts instead of leaking, and the
    // A/S'-epoch buckets evicted once the watermark passed ts(36)
    val snap2 = StreamOps.annStateSnapshotEvicting(spark, ck2)
    val freshLive = SimilarityQueries.bandRowsOf(
      Seq((101L, vec(12, 0f)), (102L, altVec)).toDF("vec_id", "embedding"),
      b0 + 1)
    assert(keySet(snap2) == keySet(freshLive),
      s"post-resume state must equal the live window's banding — no immortal migrated buckets")
  }

  test("evicting ANN stream equals the gap-chain batch replay rule (boundary pinned)") {
    // Pins r_ann_evict_replay's residency rule against the RUNNING
    // operator. Planted chains at watermark W=2 minutes:
    //   A: gap W+1=3 — alive under either timeout-boundary semantics
    //      (arrival in the first possible eviction batch rescues);
    //   B: gap W+2=4 — THE discriminator: strict `timeout < watermark`
    //     means the eviction batch is m = u+W+2, which is exactly when
    //     B2 arrives (input processes before timeouts → rescued → pair);
    //     a non-strict boundary would have evicted at m = u+W+1;
    //   D: gap W+3=5 — evicted under either semantics, no pair.
    // The assertion is FULL SET EQUALITY stream vs replay (fillers and
    // any bucket interference affect both models identically), plus the
    // planted outcomes that prove the fixture exercises eviction.
    import graft.ext.SimilarityQueries
    val in = ckptDir("evr_in")
    val out = ckptDir("evr_out")
    val ckpt = ckptDir("evr_ck")
    val baseMs = java.sql.Timestamp.valueOf("2020-09-14 07:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(baseMs + min * 60000L)
    def vec(seed: Int, jitter: Float): Array[Float] =
      Array.tabulate(64)(d => (math.sin(seed + d * 0.7).toFloat + (if (d == 0) jitter else 0f)))
    val alt1: Array[Float] = Array.tabulate(64)(d => if (d % 2 == 0) 1f else -1f)
    val alt2: Array[Float] = Array.tabulate(64)(d => if (d % 4 < 2) 1f else -1f)
    // (vec_id, embedding, minute)
    val feed: Seq[(Long, Array[Float], Long)] = Seq(
      (1L, vec(3, 0f), 0L), (50L, vec(77, 0f), 0L), (60L, vec(23, 0f), 0L),
      (100L, alt1, 1L), (101L, alt2, 2L),
      (2L, vec(3, 0.01f), 3L),   // A: gap 3 = W+1
      (51L, vec(77, 0.01f), 4L), // B: gap 4 = W+2 (the discriminator)
      (61L, vec(23, 0.01f), 5L)) // D: gap 5 = W+3
    val b = 6
    def runMinute(m: Long): Unit = {
      feed.filter(_._3 == m).map(r => (r._1, r._2, ts(r._3)))
        .toDF("vec_id", "embedding", "ts").write.mode("append").parquet(in)
      val q = StreamOps.streamingAnnPairsEvicting(spark,
          spark.readStream
            .schema("vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP")
            .parquet(in), b = b, watermark = "2 minutes",
          maxBucket = Int.MaxValue)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.AnnPair], _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    (0L to 5L).foreach(runMinute)
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bands = SimilarityQueries.bandRowsOf(
        feed.map(r => (r._1, r._2)).toDF("vec_id", "embedding"), b)
      .join(feed.map(r => (r._1, r._3)).toDF("vec_id", "minute"), "vec_id")
    val replayed = SimilarityQueries
      .evictingPairsReplayOn(bands, SimilarityQueries.EvictReplayWm + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == replayed,
      s"stream must equal the replay rule: stream=$streamed replay=$replayed")
    assert(streamed.contains((1L, 2L)), "gap W+1 chain must survive")
    assert(!streamed.contains((60L, 61L)), "gap W+3 chain must evict")
  }

  test("evicting ANN stream equals the replay rule on a minute-fed corpus") {
    // The same pin on NATURAL structure: the sf0.001 embedding corpus
    // spread over 10 synthetic minutes (vec_id div 5), so bucket chains
    // break where the data says, not where the fixture plants them.
    import graft.ext.SimilarityQueries
    val in = ckptDir("evc_in")
    val out = ckptDir("evc_out")
    val ckpt = ckptDir("evc_ck")
    val baseMs = java.sql.Timestamp.valueOf("2020-09-14 07:00:00").getTime
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toSeq
    val perMin = 5
    val b = 6
    def minuteOf(v: Long): Long = v / perMin
    def runMinute(m: Long): Unit = {
      corpus.filter(r => minuteOf(r._1) == m)
        .map(r => (r._1, r._2, new java.sql.Timestamp(baseMs + m * 60000L)))
        .toDF("vec_id", "embedding", "ts").write.mode("append").parquet(in)
      val q = StreamOps.streamingAnnPairsEvicting(spark,
          spark.readStream
            .schema("vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP")
            .parquet(in), b = b, watermark = "2 minutes",
          maxBucket = Int.MaxValue)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.AnnPair], _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val maxMin = corpus.map(r => minuteOf(r._1)).max
    (0L to maxMin).foreach(runMinute)
    val streamed = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bands = SimilarityQueries.bandRowsOf(
        corpus.toDF("vec_id", "embedding"), b)
      .withColumn("minute", org.apache.spark.sql.functions.expr(s"vec_id div $perMin"))
    val replayed = SimilarityQueries
      .evictingPairsReplayOn(bands, SimilarityQueries.EvictReplayWm + 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == replayed,
      s"stream must equal the replay rule on the corpus: " +
        s"stream-only=${streamed -- replayed} replay-only=${replayed -- streamed}")
  }

  test("evicting near-dup: pre-eviction pair found across restart, post-eviction pair not") {
    // The recent-history-window contract end-to-end, across restarts:
    // (1) a near-dup arriving while the bucket is live pairs against
    // recovered state; (2) once the watermark passes the bucket's last
    // arrival (advanced by unrelated traffic) the EventTimeTimeout
    // fires, the residents are dropped, and the SAME near-dup text
    // arriving later finds nothing — dedup-against-recent-history, not
    // against-the-corpus.
    val in = ckptDir("nde_in")
    val out = ckptDir("nde_out")
    val ckpt = ckptDir("nde_state")
    val baseMs = java.sql.Timestamp.valueOf("2020-09-14 07:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(baseMs + min * 60000L)
    def land(rows: (Long, String, java.sql.Timestamp)*): Unit =
      rows.toSeq.toDF("doc_id", "text", "ts").write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = StreamOps.streamingNearDupPairsEvicting(spark,
          spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
            .parquet(in), watermark = "10 minutes")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.NearDupPair], _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    def noise(tag: String) = (1 to 40).map(i => s"$tag$i").mkString(" ")
    land((1L, base, ts(0)))
    runOnce()
    // restart: near-dup inside the window — found via RECOVERED state
    land((2L, base + " extra", ts(5)))
    runOnce()
    // unrelated traffic drags the watermark past the bucket's last
    // arrival (5 min): run 3 advances it, run 4's batch fires the timeout
    land((100L, noise("adv"), ts(120)))
    runOnce()
    land((101L, noise("more"), ts(121)))
    runOnce()
    // same near-dup text AFTER eviction: enrolls fresh, pairs with nothing
    land((3L, base + " late", ts(125)))
    runOnce()
    val rows = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.distinct.toSeq == Seq((1L, 2L)),
      s"expected only the pre-eviction pair: ${rows.mkString(",")}")
  }

  /** Shared stop/restart harness for the watermarked aggregations: land
    * files, run the op file-source → file-sink with AvailableNow against a
    * persistent checkpoint, repeat. Each runOnce is a fresh query resuming
    * from the checkpointed StateStore — the recovery shape the dedup test
    * established, applied to windowed state. */
  private def recoveryRuns(op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : Seq[(String, Double, String)] => Unit = {
    val in = ckptDir("wckpt_in")
    val out = ckptDir("wckpt_out")
    val ckpt = ckptDir("wckpt_state")
    outDirs += out
    rows => {
      rows.toSeq.toDF("customer", "score", "riskDate")
        .write.mode("append").parquet(in)
      val q = op(spark.readStream
          .schema("customer STRING, score DOUBLE, riskDate STRING")
          .parquet(in))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
  }
  private val outDirs = scala.collection.mutable.Buffer.empty[String]

  test("windowed aggregation survives a stop/restart: post-restart rows merge into recovered window state") {
    val run = recoveryRuns(StreamOps.windowedRiskStats(_))
    // run 1: three events in the 07:00 window; watermark stays behind it
    run(Seq(("a@test.com", 1.0, "2020-09-14T07:01:00.000Z"),
        ("a@test.com", 2.0, "2020-09-14T07:04:00.000Z"),
        ("b@test.com", 4.0, "2020-09-14T07:05:00.000Z")))
    // run 2 (restart): one MORE event for the same window — must merge into
    // the recovered state — plus a late-morning event that drags the
    // watermark past the window's end
    run(Seq(("a@test.com", 3.0, "2020-09-14T07:07:00.000Z"),
        ("c@test.com", 9.9, "2020-09-14T09:00:00.000Z")))
    // run 3: a further event whose batch emits the now-closed 07:00 window
    run(Seq(("c@test.com", 1.1, "2020-09-14T10:00:00.000Z")))
    val rows = spark.read.parquet(outDirs.last).collect()
      .map(r => (r.getAs[String]("customer"),
        r.getAs[Long]("n_events"), r.getAs[Long]("sum_score_micro"))).toSet
    assert(rows.contains(("a@test.com", 3L, 6000000L)),
      s"recovered window must hold all three a-events (2 pre- + 1 post-restart): $rows")
    assert(rows.contains(("b@test.com", 1L, 4000000L)), rows.toString)
  }

  test("session aggregation survives a stop/restart: post-restart rows extend the recovered session") {
    val run = recoveryRuns(StreamOps.sessionRiskStats(_))
    // run 1: two events 4 min apart — one open session [07:00, 07:09)
    run(Seq(("a@test.com", 1.0, "2020-09-14T07:00:00.000Z"),
        ("a@test.com", 2.0, "2020-09-14T07:04:00.000Z")))
    // run 2 (restart): an event 3 min after the last — must EXTEND the
    // recovered session (not open a new one) — plus a watermark-advancer
    run(Seq(("a@test.com", 3.0, "2020-09-14T07:07:00.000Z"),
        ("c@test.com", 9.9, "2020-09-14T09:00:00.000Z")))
    // run 3: flush batch for the closed session
    run(Seq(("c@test.com", 1.1, "2020-09-14T10:00:00.000Z")))
    val sess = spark.read.parquet(outDirs.last).collect()
      .filter(_.getAs[String]("customer") == "a@test.com")
      .map(r => (r.getAs[java.sql.Timestamp]("sess_start").toString,
        r.getAs[java.sql.Timestamp]("sess_end").toString,
        r.getAs[Long]("n_events"), r.getAs[Long]("total_score_micro")))
    assert(sess.toSeq == Seq(("2020-09-14 07:00:00.0", "2020-09-14 07:12:00.0",
      3L, 6000000L)),
      s"one merged session spanning the restart, ending last-event+gap: ${sess.mkString(",")}")
  }

  test("mapGroupsWithState running totals survive a stop/restart via foreachBatch") {
    // The GroupState recovery path is distinct from window/session state:
    // user-defined state round-trips through the checkpoint's state store
    // encoder. Update-mode emissions can't land in a file sink directly,
    // so foreachBatch stamps each micro-batch's frame with its batch id —
    // the recoverable update-sink shape — and the LAST emission per key
    // must carry totals spanning the restart.
    val in = ckptDir("gckpt_in")
    val out = ckptDir("gckpt_out")
    val ckpt = ckptDir("gckpt_state")
    def land(rows: (String, Double, String)*): Unit =
      rows.toSeq.toDF("customer", "score", "riskDate")
        .write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = StreamOps.runningRiskTotals(spark,
          spark.readStream
            .schema("customer STRING, score DOUBLE, riskDate STRING")
            .parquet(in))
        .writeStream
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[graft.streaming.CustomerRunning], id: Long) =>
          ds.toDF().withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
            .write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land(("a@test.com", 1.0, "2020-09-14T07:01:00.000Z"),
      ("a@test.com", 2.0, "2020-09-14T07:02:00.000Z"),
      ("b@test.com", 4.0, "2020-09-14T07:03:00.000Z"))
    runOnce()
    land(("a@test.com", 3.0, "2020-09-14T07:04:00.000Z"))
    runOnce() // fresh query resuming the checkpointed GroupState
    val last = spark.read.parquet(out).collect()
      .map(r => (r.getAs[String]("customer"),
        r.getAs[Long]("batch_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("total_score_micro")))
      .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
    assert(last("a@test.com")._3 == 3L && last("a@test.com")._4 == 6000000L,
      s"recovered state must fold the post-restart event into (2, 3.0): $last")
    assert(last("b@test.com")._3 == 1L && last("b@test.com")._4 == 4000000L, last.toString)
  }

  test("streaming ewma replays the batch q49 recurrence bit-for-bit across batches") {
    import graft.streaming.EwmaPoint
    val dir = "/root/testdata/sf0.001"
    val pts = Tables.load(spark, dir, "events")
      .selectExpr("user_id", "ts", "event_id",
        "cast(round(value * 1000000.0D, 0) as bigint) as vm")
      .as[EwmaPoint].collect().toSeq
    // split into two micro-batches on a global time cutoff so per-user
    // arrival order equals event order (the operator's in-order contract)
    val cutoff = pts.map(_.ts.getTime).sorted.apply(pts.length / 2)
    val (early, late) = pts.partition(_.ts.getTime < cutoff)
    val input = MemoryStream[EwmaPoint]
    val q = StreamOps.ewmaStream(spark, input.toDS())
      .writeStream.format("memory").queryName("ewma_stream").outputMode("update").start()
    try {
      input.addData(early); q.processAllAvailable()
      input.addData(late); q.processAllAvailable()
      val last = spark.table("ewma_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
      // driver-side exact fold = the q49 integer recurrence
      val expected = pts.groupBy(_.user_id).map { case (uid, ps) =>
        val sorted = ps.sortBy(p => (p.ts.getTime, p.event_id)).map(_.vm)
        uid -> (ps.length.toLong,
          sorted.tail.foldLeft(sorted.head)((e, x) => (15 * x + 85 * e) / 100))
      }
      assert(last.map { case (k, (_, n, e)) => k -> (n, e) } == expected)
      // and the batch q49 agrees with the streamed micro value after rounding
      val batch = graft.queries.TemporalQueries.q49Ewma(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      expected.foreach { case (uid, (n, micro)) =>
        val (bn, bewma) = batch(uid)
        assert(bn == n)
        assert(math.abs(bewma - micro.toDouble / 1e6) < 1e-6)
      }
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running totals across micro-batches") {
    val input = MemoryStream[String]
    val q = StreamOps.runningRiskTotals(spark, parsed(input))
      .writeStream.format("memory").queryName("running").outputMode("update").start()
    try {
      input.addData(mkRisk("a@test.com", 1.0, "t"), mkRisk("a@test.com", 2.0, "t"))
      q.processAllAvailable()
      input.addData(mkRisk("a@test.com", 3.0, "t"), mkRisk("b@test.com", 10.0, "t"))
      q.processAllAvailable()
      val last = spark.table("running").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
      assert(last("a@test.com") == ("a@test.com", 3L, 6.0))
      assert(last("b@test.com") == ("b@test.com", 1L, 10.0))
    } finally q.stop()
  }

  test("timeout sessionizer closes a session exactly once, after the watermark") {
    val input = MemoryStream[String]
    val q = StreamOps.sessionCloseEvents(spark, parsed(input)).toDF()
      .writeStream.format("memory").queryName("sess_close")
      .outputMode("append").start()
    try {
      // a 3-event burst for A within the 5-minute gap
      input.addData(
        mkRisk("a@test.com", 1.0, "2020-09-14T07:00:00.000Z"),
        mkRisk("a@test.com", 2.0, "2020-09-14T07:02:00.000Z"),
        mkRisk("a@test.com", 4.0, "2020-09-14T07:03:30.000Z"))
      q.processAllAvailable()
      // session still open: watermark (max - 30min) is far before the
      // gap horizon, and append-mode timeouts haven't fired
      assert(spark.table("sess_close").count() == 0)
      // B's event at 07:40 pushes the watermark to 07:10 > A's horizon
      // (07:03:30 + 5min); the following (no-data) batch fires A's timeout
      input.addData(mkRisk("b@test.com", 8.0, "2020-09-14T07:40:00.000Z"))
      q.processAllAvailable()
      input.addData(mkRisk("b@test.com", 1.0, "2020-09-14T07:41:00.000Z"))
      q.processAllAvailable()
      val afterA = spark.table("sess_close").as[graft.streaming.SessionClosed]
        .collect()
      assert(afterA.count(_.customer == "a@test.com") == 1,
        s"A must close exactly once: ${afterA.mkString(",")}")
      val a = afterA.find(_.customer == "a@test.com").get
      assert(a.n_events == 3L)
      assert(a.sum_score_micro == 7000000L)
      assert(a.last_us - a.start_us == 210L * 1000000L) // 07:00 -> 07:03:30
      // far-future C closes B's burst too; A must NOT re-emit (state gone)
      input.addData(mkRisk("c@test.com", 1.0, "2020-09-14T09:00:00.000Z"))
      q.processAllAvailable()
      input.addData(mkRisk("c@test.com", 1.0, "2020-09-14T09:30:00.000Z"))
      q.processAllAvailable()
      val fin = spark.table("sess_close").as[graft.streaming.SessionClosed].collect()
      assert(fin.count(_.customer == "a@test.com") == 1)
      val b = fin.filter(_.customer == "b@test.com")
      assert(b.length == 1 && b.head.n_events == 2L)
    } finally q.stop()
  }

  test("timeout sessionizer state and its pending timeout survive a stop/restart") {
    // The EventTimeTimeout recovery path must restore BOTH the keyed
    // state and its registered timeout timestamp from the checkpoint:
    // the session opens before the stop, and the watermark that closes
    // it only arrives after the restart — the close event must still
    // fire exactly once, from the recovered query.
    val in = ckptDir("tckpt_in")
    val out = ckptDir("tckpt_out")
    val ckpt = ckptDir("tckpt_state")
    def land(rows: (String, Double, String)*): Unit =
      rows.toSeq.toDF("customer", "score", "riskDate")
        .write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = StreamOps.sessionCloseEvents(spark,
          spark.readStream
            .schema("customer STRING, score DOUBLE, riskDate STRING")
            .parquet(in)).toDF()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land(("a@test.com", 1.0, "2020-09-14T07:00:00.000Z"),
      ("a@test.com", 2.0, "2020-09-14T07:02:00.000Z"))
    runOnce()  // session open, nothing closed yet
    land(("b@test.com", 8.0, "2020-09-14T07:40:00.000Z"),
      ("b@test.com", 1.0, "2020-09-14T09:00:00.000Z"),
      ("b@test.com", 1.0, "2020-09-14T09:40:00.000Z"))
    runOnce()  // fresh query: watermark passes A's horizon post-restart
    val rows = spark.read.schema(
        "customer STRING, start_us LONG, last_us LONG, n_events LONG, " +
          "sum_score_micro LONG")
      .parquet(out).collect()
      .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    val a = rows.filter(_._1 == "a@test.com")
    assert(a.length == 1, s"A must close exactly once across the restart: ${rows.mkString(",")}")
    assert(a.head._2 == 2L && a.head._3 == 3000000L)
  }

  test("timeout sessionizer splits an intra-batch gap into two sessions, " +
      "neither emitted before its own watermark horizon") {
    val input = MemoryStream[String]
    val q = StreamOps.sessionCloseEvents(spark, parsed(input)).toDF()
      .writeStream.format("memory").queryName("sess_close2")
      .outputMode("append").start()
    try {
      // one batch carrying TWO bursts separated by > gap: the first burst
      // is HELD in state (watermark 07:00 hasn't passed its 07:06
      // horizon — a late event could still belong to it), not emitted
      input.addData(
        mkRisk("a@test.com", 1.0, "2020-09-14T07:00:00.000Z"),
        mkRisk("a@test.com", 1.0, "2020-09-14T07:01:00.000Z"),
        mkRisk("a@test.com", 5.0, "2020-09-14T07:30:00.000Z"))
      q.processAllAvailable()
      assert(spark.table("sess_close2").count() == 0,
        "no burst may emit before the watermark passes ITS gap horizon")
      // 08:00 pushes the watermark to 07:30: burst 1 (horizon 07:06)
      // closes; burst 2 (horizon 07:35) is still pending
      input.addData(mkRisk("b@test.com", 1.0, "2020-09-14T08:00:00.000Z"))
      q.processAllAvailable()
      input.addData(mkRisk("b@test.com", 1.0, "2020-09-14T08:01:00.000Z"))
      q.processAllAvailable()
      val rows = spark.table("sess_close2").as[graft.streaming.SessionClosed].collect()
        .filter(_.customer == "a@test.com")
      assert(rows.length == 1)
      assert(rows.head.n_events == 2L && rows.head.sum_score_micro == 2000000L)
      // 09:00 → watermark 08:30: burst 2 closes with its own stats
      input.addData(mkRisk("c@test.com", 1.0, "2020-09-14T09:00:00.000Z"))
      q.processAllAvailable()
      input.addData(mkRisk("c@test.com", 1.0, "2020-09-14T09:01:00.000Z"))
      q.processAllAvailable()
      val fin = spark.table("sess_close2").as[graft.streaming.SessionClosed].collect()
        .filter(_.customer == "a@test.com").sortBy(_.start_us)
      assert(fin.length == 2)
      assert(fin(1).n_events == 1L && fin(1).sum_score_micro == 5000000L)
    } finally q.stop()
  }

  test("foreachBatch upsert sink keeps latest-per-customer and replays idempotently") {
    val table = ckptDir("fbu") + "/risk"
    val ckpt = ckptDir("fbu_ck")
    val in = ckptDir("fbu_in")
    import spark.implicits._
    def land(rows: (String, Double, String)*): Unit =
      rows.toSeq.toDF("customer", "score", "riskDate")
        .write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = StreamOps.runUpsertSink(
        spark.readStream
          .schema("customer STRING, score DOUBLE, riskDate STRING")
          .parquet(in), table, ckpt)
      q.awaitTermination()
    }
    land(("a@test.com", 1.0, "2020-09-14T07:00:00.000Z"),
      ("b@test.com", 5.0, "2020-09-14T07:01:00.000Z"))
    runOnce()
    // a newer reading for a, an out-of-order OLDER one for b (must lose)
    land(("a@test.com", 3.0, "2020-09-14T08:00:00.000Z"),
      ("b@test.com", 9.0, "2020-09-14T06:00:00.000Z"))
    runOnce()
    val got = spark.read.parquet(table).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(got.size == 2)
    assert(got("a@test.com") == ((3.0, "2020-09-14T08:00:00.000Z")))
    assert(got("b@test.com") == ((5.0, "2020-09-14T07:01:00.000Z")),
      "an out-of-order older reading must not overwrite the newer state")
    // replay guard: re-delivering an ALREADY-APPLIED batchId is a no-op
    val replay = Seq(("a@test.com", 99.0, "2020-09-14T09:00:00.000Z"))
      .toDF("customer", "score", "riskDate")
    StreamOps.upsertBatch(replay, 0L, table) // batchId 0 already marked
    val after = spark.read.parquet(table).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(after("a@test.com") == 3.0, "replayed batchId must be skipped")
    // ...while a genuinely new batchId merges
    StreamOps.upsertBatch(replay, 99L, table)
    assert(spark.read.parquet(table).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap.apply("a@test.com") == 99.0)
    // crash repair: simulate dying between "move live aside" and
    // "publish replacement" — live dir gone, aside copy present. The
    // next merge must RECOVER the aside state, not restart from empty.
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(table),
      new org.apache.hadoop.fs.Path(table + "_prev")))
    StreamOps.upsertBatch(
      Seq(("c@test.com", 7.0, "2020-09-14T10:00:00.000Z"))
        .toDF("customer", "score", "riskDate"), 100L, table)
    val recovered = spark.read.parquet(table).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(recovered.size == 3, s"aside state must survive: $recovered")
    assert(recovered("b@test.com") == 5.0 && recovered("c@test.com") == 7.0)
    // corrupt marker degrades to re-apply (idempotent), never a wedge
    val mk = new org.apache.hadoop.fs.Path(table + "_last_batch")
    val out = fs.create(mk, true); out.close() // zero-byte marker
    StreamOps.upsertBatch(
      Seq(("c@test.com", 8.0, "2020-09-14T11:00:00.000Z"))
        .toDF("customer", "score", "riskDate"), 101L, table)
    assert(spark.read.parquet(table).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap.apply("c@test.com") == 8.0)
  }

  test("transformWithState running totals match the mapGroupsWithState twin per batch") {
    // the Spark 4 StatefulProcessor path runs only on the RocksDB store;
    // scope the provider to this test and restore after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[String]
    val q = StreamOps.runningRiskTotalsTws(spark, parsed(input))
      .writeStream.format("memory").queryName("running_tws")
      .outputMode("update").start()
    try {
      input.addData(mkRisk("a@test.com", 1.0, "t"), mkRisk("a@test.com", 2.0, "t"))
      q.processAllAvailable()
      input.addData(mkRisk("a@test.com", 3.0, "t"), mkRisk("b@test.com", 10.0, "t"))
      q.processAllAvailable()
      val last = spark.table("running_tws").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .groupBy(_._1).map { case (k, vs) => k -> vs.maxBy(_._2) }
      // identical totals to the mapGroupsWithState twin's spec fixture —
      // state accumulated ACROSS batches, exact micro sum carried
      assert(last("a@test.com") == (("a@test.com", 3L, 6.0, 6000000L)))
      assert(last("b@test.com") == (("b@test.com", 1L, 10.0, 10000000L)))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState sessionizer (ListState + event-time timers) matches the FMGWS twin") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[String]
    val q = StreamOps.sessionCloseEventsTws(spark, parsed(input)).toDF()
      .writeStream.format("memory").queryName("sess_tws")
      .outputMode("append").start()
    try {
      // the same scenario the FMGWS late-merge test pins: two bursts in
      // one batch, a late in-tolerance event that must land in the FIRST
      // pending burst, then a watermark push that closes both via timers
      input.addData(
        mkRisk("a@test.com", 1.0, "2020-09-14T07:00:00.000Z"),
        mkRisk("a@test.com", 1.0, "2020-09-14T07:01:00.000Z"),
        mkRisk("a@test.com", 5.0, "2020-09-14T07:30:00.000Z"))
      q.processAllAvailable()
      assert(spark.table("sess_tws").count() == 0,
        "no burst may emit before the watermark passes its horizon")
      input.addData(mkRisk("a@test.com", 2.0, "2020-09-14T07:02:00.000Z"))
      q.processAllAvailable()
      input.addData(mkRisk("b@test.com", 1.0, "2020-09-14T10:00:00.000Z"))
      q.processAllAvailable()
      input.addData(mkRisk("b@test.com", 1.0, "2020-09-14T10:01:00.000Z"))
      q.processAllAvailable()
      val a = spark.table("sess_tws").as[graft.streaming.SessionClosed].collect()
        .filter(_.customer == "a@test.com").sortBy(_.start_us)
      assert(a.length == 2, s"two sessions expected: ${a.mkString(",")}")
      assert(a(0).n_events == 3L && a(0).sum_score_micro == 4000000L)
      assert(a(0).last_us - a(0).start_us == 120L * 1000000L)
      assert(a(1).n_events == 1L && a(1).sum_score_micro == 5000000L)
      // exactly once: more watermark advance must re-emit nothing
      input.addData(mkRisk("c@test.com", 1.0, "2020-09-14T12:00:00.000Z"))
      q.processAllAvailable()
      input.addData(mkRisk("c@test.com", 1.0, "2020-09-14T12:01:00.000Z"))
      q.processAllAvailable()
      assert(spark.table("sess_tws").as[graft.streaming.SessionClosed].collect()
        .count(_.customer == "a@test.com") == 2)
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState sessionizer state and timers survive a stop/restart") {
    // the TWS twin of the FMGWS recovery proof: pending bursts
    // (ListState) AND the registered event-time timer must both restore
    // from the RocksDB checkpoint — the session opens before the stop
    // and only the post-restart watermark closes it, exactly once.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = ckptDir("tws_in")
    val out = ckptDir("tws_out")
    val ckpt = ckptDir("tws_ck")
    import spark.implicits._
    def land(rows: (String, Double, String)*): Unit =
      rows.toSeq.toDF("customer", "score", "riskDate")
        .write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val q = StreamOps.sessionCloseEventsTws(spark,
          spark.readStream
            .schema("customer STRING, score DOUBLE, riskDate STRING")
            .parquet(in)).toDF()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    try {
      land(("a@test.com", 1.0, "2020-09-14T07:00:00.000Z"),
        ("a@test.com", 2.0, "2020-09-14T07:02:00.000Z"))
      runOnce() // session open; timer registered; nothing closed
      land(("b@test.com", 8.0, "2020-09-14T07:40:00.000Z"),
        ("b@test.com", 1.0, "2020-09-14T09:00:00.000Z"),
        ("b@test.com", 1.0, "2020-09-14T09:40:00.000Z"))
      runOnce() // fresh query: recovered timer fires past A's horizon
      val rows = spark.read.schema(
          "customer STRING, start_us LONG, last_us LONG, n_events LONG, " +
            "sum_score_micro LONG")
        .parquet(out).collect()
        .map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
      val a = rows.filter(_._1 == "a@test.com")
      assert(a.length == 1,
        s"A must close exactly once across the restart: ${rows.mkString(",")}")
      assert(a.head._2 == 2L && a.head._3 == 3000000L)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("timeout sessionizer merges a late in-tolerance event into the PENDING burst") {
    // The contract ADVICE flagged: after an intra-batch gap, the older
    // burst must stay open to late events until the watermark passes its
    // horizon. 07:02 arrives AFTER the 07:30 event (out of order, but
    // above the 07:00 watermark) and belongs to the first burst — the
    // eager-emit implementation had already shipped that burst with
    // n=2 and silently glued 07:02 onto the 07:30 one.
    val input = MemoryStream[String]
    val q = StreamOps.sessionCloseEvents(spark, parsed(input)).toDF()
      .writeStream.format("memory").queryName("sess_close3")
      .outputMode("append").start()
    try {
      input.addData(
        mkRisk("a@test.com", 1.0, "2020-09-14T07:00:00.000Z"),
        mkRisk("a@test.com", 1.0, "2020-09-14T07:01:00.000Z"),
        mkRisk("a@test.com", 5.0, "2020-09-14T07:30:00.000Z"))
      q.processAllAvailable()
      // late but within the 30-min tolerance (watermark is 07:00)
      input.addData(mkRisk("a@test.com", 2.0, "2020-09-14T07:02:00.000Z"))
      q.processAllAvailable()
      // close everything: watermark well past both horizons
      input.addData(mkRisk("b@test.com", 1.0, "2020-09-14T10:00:00.000Z"))
      q.processAllAvailable()
      input.addData(mkRisk("b@test.com", 1.0, "2020-09-14T10:01:00.000Z"))
      q.processAllAvailable()
      val a = spark.table("sess_close3").as[graft.streaming.SessionClosed].collect()
        .filter(_.customer == "a@test.com").sortBy(_.start_us)
      assert(a.length == 2, s"two sessions expected: ${a.mkString(",")}")
      // the late 07:02 landed in the FIRST burst...
      assert(a(0).n_events == 3L && a(0).sum_score_micro == 4000000L)
      assert(a(0).last_us - a(0).start_us == 120L * 1000000L)
      // ...and the second burst is untouched
      assert(a(1).n_events == 1L && a(1).sum_score_micro == 5000000L)
    } finally q.stop()
  }

  test("plane-family stamp: drain fails fast on missing or mismatched version") {
    // the r12 ADVICE hazard: band state built under a different plane
    // assignment (e.g. the pre-rank-major build) must never be drained
    // or resumed silently — the stamp turns it into an explicit error
    val ck = ckptDir("pf_ck")
    val e1 = intercept[IllegalArgumentException] {
      StreamOps.verifyPlaneFamily(spark, ck)
    }
    assert(e1.getMessage.contains("no plane-family stamp"))
    // stamping is idempotent and verification then passes
    StreamOps.stampPlaneFamily(spark, ck)
    StreamOps.verifyPlaneFamily(spark, ck)
    StreamOps.stampPlaneFamily(spark, ck)
    // a checkpoint stamped under ANOTHER family version refuses both
    // re-stamp (query start) and verify (drain)
    val old = ckptDir("pf_old")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(old, "_graft_plane_family"),
      "1".getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      StreamOps.stampPlaneFamily(spark, old)
    }
    assert(e2.getMessage.contains("version 1"))
    val e3 = intercept[IllegalArgumentException] {
      StreamOps.verifyPlaneFamily(spark, old)
    }
    assert(e3.getMessage.contains("version 1"))
  }

  test("plane-family stamp: concurrent first stamps all succeed (exists/create race)") {
    // the r13 ADVICE race: two queries stamping one FRESH checkpoint can
    // both see exists=false; the loser's create(overwrite=false) must be
    // treated as "someone stamped first" (re-read + match), never thrown
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.DurationInt
    import scala.concurrent.ExecutionContext.Implicits.global
    (1 to 5).foreach { round =>
      val ck = ckptDir(s"pf_race$round")
      val attempts = (1 to 8).map(_ => Future {
        StreamOps.stampPlaneFamily(spark, ck)
      })
      // all eight concurrent stampers must succeed — any
      // FileAlreadyExistsException escaping the retry path fails here
      Await.result(Future.sequence(attempts), 2.minutes)
      StreamOps.verifyPlaneFamily(spark, ck)
    }
  }

  test("composed evict+epoch stream equals the cross-epoch replay rule (cut and gap boundaries pinned)") {
    // Pins r_ann_evict_epoch_replay's rule against the RUNNING composed
    // protocol (phase 1 evicting at b0 → drain → window-filtered
    // migration → touch-batch resume at b0+1). Conventions: W=2,
    // gapLimit=3, crossing mc=8, cut = mc-1-W = 5. Planted chains, one
    // direction each (3 sine phases — the 2-D plane's maximum — plus
    // Walsh alternating patterns, mutually below the 0.45 threshold):
    //   A @7 → @8: migrated (7 > cut), gap 1 → PAIR;
    //   B @5 → @8: gap 3 = gapLimit would pass the chain, but
    //     timeout ts(5) = cut is dropped by the strict `timeout > cut`
    //     migration filter — THE protocol knife edge the oracle
    //     encodes as the extra cut condition → NO PAIR;
    //   C @6 → @9: cross-boundary gap exactly gapLimit → PAIR;
    //   D @6 → @10: gap gapLimit+1 → child evicted on its re-armed
    //     timeout before the partner arrives → NO PAIR;
    //   E @8 → @9: both post-crossing, child-chain only → PAIR;
    //   F @0 → @1: both pre-crossing → epoch1 PAIR.
    // The assertion is per-phase FULL SET EQUALITY stream vs replay,
    // plus the planted outcomes above.
    import graft.ext.SimilarityQueries
    val in1 = ckptDir("cee_in1")
    val in2 = ckptDir("cee_in2")
    val out1 = ckptDir("cee_out1")
    val out2 = ckptDir("cee_out2")
    val ck1 = ckptDir("cee_ck1")
    val ck2 = ckptDir("cee_ck2")
    StreamOps.stampPlaneFamily(spark, ck1)
    StreamOps.stampPlaneFamily(spark, ck2)
    val baseMs = java.sql.Timestamp.valueOf("2020-09-14 07:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(baseMs + min * 60000L)
    def sine(seed: Double, jitter: Float): Array[Float] =
      Array.tabulate(64)(d => (math.sin(seed + d * 0.7).toFloat +
        (if (d == 0) jitter else 0f)))
    def walsh(period: Int, jitter: Float): Array[Float] =
      Array.tabulate(64)(d => (if ((d / period) % 2 == 0) 1f else -1f) +
        (if (d == 0) jitter else 0f))
    val b0 = 6
    val mc = 8L
    val gapLimit = 3
    val cut = 5L // = mc - 1 - W
    val feed: Seq[(Long, Array[Float], Long)] = Seq(
      (50L, walsh(7, 0f), 0L), (51L, walsh(7, 0.01f), 1L),    // F
      (60L, walsh(1, 0f), 2L), (61L, walsh(2, 0f), 3L),       // fillers
      (62L, walsh(8, 0f), 4L),
      (10L, sine(3, 0f), 5L),                                 // B
      (20L, sine(5, 0f), 6L), (30L, walsh(4, 0f), 6L),        // C, D
      (1L, sine(1, 0f), 7L),                                  // A
      (2L, sine(1, 0.01f), 8L), (11L, sine(3, 0.01f), 8L),    // A', B'
      (40L, walsh(16, 0f), 8L),                               // E
      (21L, sine(5, 0.01f), 9L), (41L, walsh(16, 0.01f), 9L), // C', E'
      (31L, walsh(4, 0.01f), 10L))                            // D'
    // fixture precondition: distinct CHAIN directions (ids < 60) never
    // share a bucket at either width — a chain-chain shared bucket
    // would let one chain's arrivals re-arm another's residency and
    // flip the planted outcomes. Filler-chain sharing is harmless by
    // construction: filler minutes (2–4) precede every cross-epoch
    // range's t_lo (≥ 5), so they can neither break a chain inside a
    // pair's range nor raise any parent bucket's last-arrival minute.
    Seq(b0, b0 + 1).foreach { w =>
      val bb = SimilarityQueries.bandRowsOf(
        feed.filter(_._1 < 60L).map(r => (r._1, r._2))
          .toDF("vec_id", "embedding"), w)
      val shared = bb.as("x").join(bb.as("y"),
          $"x.bid" === $"y.bid" && $"x.bkey" === $"y.bkey" &&
            org.apache.spark.sql.functions.expr(
              "(x.vec_id div 10) != (y.vec_id div 10)"))
        .count()
      assert(shared == 0L, s"planted chain directions share a width-$w bucket")
    }
    // phase 1: one run per minute at b0
    def runP1(m: Long): Unit = {
      feed.filter(r => r._3 == m && r._3 < mc)
        .map(r => (r._1, r._2, ts(r._3)))
        .toDF("vec_id", "embedding", "ts").write.mode("append").parquet(in1)
      val q = StreamOps.streamingAnnPairsEvicting(spark,
          spark.readStream
            .schema("vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP")
            .parquet(in1), b = b0, watermark = "2 minutes",
          maxBucket = Int.MaxValue)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.AnnPair], _: Long) =>
          df.write.mode("append").parquet(out1)
        }
        .option("checkpointLocation", ck1)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    (0L until mc).foreach(runP1)
    // drain at the internal watermark ts(mc-1-W) = ts(cut), migrate, touch
    val snap = StreamOps.annStateSnapshotEvicting(spark, ck1)
    assert(snap.filter($"vec_id" === 10L).count() > 0,
      "fixture: B must still be physically resident at drain — the cut filter, not Spark, drops it")
    val mig = SimilarityQueries
      .migrateAnnResidentsEvicting(snap, b0, ts(cut).getTime)
      .localCheckpoint()
    assert(mig.filter($"vec_id" === 10L).count() == 0,
      "the strict timeout > cut filter must drop B's buckets")
    val touches = StreamOps.annTouchRows(mig)
    // phase 2 at b0+1, resumed from the migrated state
    def land2(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("append").parquet(in2)
    def runP2(): Unit = {
      val q = StreamOps.streamingAnnPairsEvictingFrom(spark,
          spark.readStream.schema(
            "vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP, touch_bid INT, touch_bkey INT")
            .parquet(in2), b = b0 + 1, initialResidents = mig,
          watermark = "2 minutes")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.AnnPair], _: Long) =>
          df.write.mode("append").parquet(out2)
        }
        .option("checkpointLocation", ck2)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    land2(touches)
    runP2()
    (mc to 10L).foreach { m =>
      land2(feed.filter(_._3 == m).map(r => (r._1, r._2, ts(r._3)))
        .toDF("vec_id", "embedding", "ts")
        .withColumn("touch_bid", org.apache.spark.sql.functions.lit(-1))
        .withColumn("touch_bkey", org.apache.spark.sql.functions.lit(-1)))
      runP2()
    }
    def pairSet(p: String) = spark.read.parquet(p).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed1 = pairSet(out1)
    val streamed2 = pairSet(out2)
    // replay side: the oracle kernels over the same (id, vec, minute) rows
    val minutes = feed.map(r => (r._1, r._3)).toDF("vec_id", "minute")
    val rows1 = SimilarityQueries.bandRowsOf(
        feed.filter(_._3 < mc).map(r => (r._1, r._2)).toDF("vec_id", "embedding"), b0)
      .join(minutes, "vec_id")
    val replay1 = SimilarityQueries.evictingPairsReplayOn(rows1, gapLimit)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows2 = SimilarityQueries.bandRowsOf(
        feed.map(r => (r._1, r._2)).toDF("vec_id", "embedding"), b0 + 1)
      .join(minutes, "vec_id")
    val replay2 = SimilarityQueries
      .evictEpochPairsOn(rows2, b0, mc, gapLimit, cut)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed1 == replay1,
      s"epoch1 stream vs replay: stream-only=${streamed1 -- replay1} replay-only=${replay1 -- streamed1}")
    assert(streamed2 == replay2,
      s"epoch2 stream vs replay: stream-only=${streamed2 -- replay2} replay-only=${replay2 -- streamed2}")
    assert(streamed1.contains((50L, 51L)), "F: pre-crossing pair must emit in phase 1")
    assert(streamed2.contains((1L, 2L)), "A: migrated resident must pair at b0+1")
    assert(!streamed2.contains((10L, 11L)), "B: the cut knife edge — dropped despite a passing gap chain")
    assert(streamed2.contains((20L, 21L)), "C: cross-boundary gap = gapLimit must survive")
    assert(!streamed2.contains((30L, 31L)), "D: cross-boundary gap = gapLimit+1 must evict")
    assert(streamed2.contains((40L, 41L)), "E: post-crossing chain pair")
  }
}
