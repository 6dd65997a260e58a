package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc throughput readout for the streaming near-dup operator (not
  * part of the driver contract): pushes the documents fixture through
  * `StreamOps.streamingNearDupPairs` via MemoryStream in fixed-size
  * micro-batches and prints docs/sec plus the verified-pair count. The
  * interesting number is the STEADY-STATE batch rate — bucket state
  * grows with enrolled docs, so a flat per-batch wall across batches is
  * the bounded-state contract showing up as a measurement.
  *
  * Usage: runMain graft.StreamBench [batchSize]
  * [evict|ann|ann-evict|ann-epoch|ann-epoch-evict]
  * (env SPARK_GRAFT_SF_DIR). With `evict`, the same feed runs through
  * `streamingNearDupPairsEvicting` with one synthetic event-time minute
  * per batch and a 3-minute watermark — per-batch state-store rows are
  * printed so the bounded-state contract (rows PLATEAU as old buckets
  * evict, instead of growing with every enrolled doc) is a measurement,
  * not prose. `ann` runs the embedding stream through the unbounded
  * `streamingAnnPairs`; `ann-evict` through `streamingAnnPairsEvicting`
  * under the same minute-per-batch event-time scheme — the ann/ann-evict
  * state-row columns side by side are the embedding class's
  * bounded-state measurement. `ann-epoch` runs the mid-stream
  * doubling-epoch crossing (unbounded resume, exact no-missed-pairs
  * check against the batch edge set, buckets uncapped so a nonzero
  * `missed` can only mean a migration defect); `ann-epoch-evict` runs
  * the COMPOSED crossing — evicting drain, window-filtered migration,
  * touch-batch resume — whose readout is the state plateau surviving
  * the epoch. Both file-feed in ~batchSize-row chunks; nothing
  * corpus-sized crosses the driver. `two-tier` runs the full corpus
  * architecture: streaming ingest tier lands the documents fixture,
  * the batch TrainingDataPipeline consolidates over the landed table,
  * and the survivor set is diffed against the pure-batch run (0/0 is
  * the StreamOpsSpec contract as a scale measurement).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batchSize = args.headOption.map(_.toInt).getOrElse(500)
    val evict = args.lift(1).contains("evict")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // document feed for the MemoryStream doc modes only — lazy so the
    // file-fed vector modes never collect a table to the driver
    lazy val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
    val baseMs = java.sql.Timestamp.valueOf("2020-09-14 07:00:00").getTime
    def stateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
      Option(q.lastProgress).map(_.stateOperators)
        .filter(_.nonEmpty).map(_.map(_.numRowsTotal).sum).getOrElse(-1L)
    if (args.lift(1).contains("ann-epoch")) {
      // MID-STREAM DOUBLING-EPOCH crossing: phase 1 admits the first half
      // of the corpus at the frozen width b0 (checkpointed file-source
      // query), then the bucket state is drained off the checkpoint,
      // re-keyed to b0+1 (the split-property migration), and phase 2
      // resumes at the new width with the migrated residents as initial
      // state. The readout: state rows at the migration point, per-phase
      // wall + pair counts, and the no-missed-pairs check — phase 2's
      // distinct pair set must equal the batch width-(b0+1) collision
      // edge set touching the second half. The corpus never crosses the
      // driver (r11 ADVICE): halves split by a 1-row boundary read and
      // land as ~batchSize-row files consumed one per micro-batch;
      // maxBucket is UNCAPPED here so a nonzero `missed` can only mean a
      // migration defect, never cap-order noise.
      import graft.ext.SimilarityQueries
      val embAll = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val n = embAll.count()
      val half = (n / 2).toInt
      val newMin = embAll.orderBy("vec_id").offset(half).limit(1)
        .select("vec_id").collect()(0).getLong(0)
      val b0 = SimilarityQueries.scaledBandBits(half)
      val in1 = java.nio.file.Files.createTempDirectory("ep_in1").toString
      val in2 = java.nio.file.Files.createTempDirectory("ep_in2").toString
      val out1 = java.nio.file.Files.createTempDirectory("ep_out1").toString
      val out2 = java.nio.file.Files.createTempDirectory("ep_out2").toString
      val ck1 = java.nio.file.Files.createTempDirectory("ep_ck1").toString
      val ck2 = java.nio.file.Files.createTempDirectory("ep_ck2").toString
      graft.streaming.StreamOps.stampPlaneFamily(spark, ck1)
      graft.streaming.StreamOps.stampPlaneFamily(spark, ck2)
      def landChunks(df: org.apache.spark.sql.DataFrame, rows: Long,
          in: String): Int = {
        val files = math.max(1, ((rows + batchSize - 1) / batchSize).toInt)
        df.repartition(files).write.mode("append").parquet(in)
        files
      }
      def run(in: String, out: String, ck: String,
          mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[graft.streaming.AnnPair]): Double = {
        val t0 = System.nanoTime()
        val q = mk(spark.readStream
            .schema("vec_id LONG, embedding ARRAY<FLOAT>")
            .option("maxFilesPerTrigger", 1).parquet(in))
          .writeStream
          .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.AnnPair], _: Long) =>
            df.write.mode("append").parquet(out)
          }
          .option("checkpointLocation", ck)
          .outputMode("update")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      landChunks(embAll.filter(col("vec_id") < newMin), half, in1)
      val w1 = run(in1, out1, ck1,
        s => graft.streaming.StreamOps.streamingAnnPairs(spark, s, b0,
          maxBucket = Int.MaxValue))
      val snap = graft.streaming.StreamOps.annStateSnapshot(spark, ck1)
        .localCheckpoint()
      val mig = SimilarityQueries.migrateAnnResidents(snap, b0).localCheckpoint()
      println(f"[stream] epoch: b0=$b0, phase1 $half vecs in $w1%.2f s, " +
        s"state rows at migration ${snap.count()} -> ${mig.count()} (uncapped buckets)")
      landChunks(embAll.filter(col("vec_id") >= newMin), n - half, in2)
      val w2 = run(in2, out2, ck2,
        s => graft.streaming.StreamOps.streamingAnnPairsFrom(spark, s, b0 + 1, mig,
          maxBucket = Int.MaxValue))
      val p1 = spark.read.parquet(out1).dropDuplicates("vec_a", "vec_b").count()
      val got2 = spark.read.parquet(out2).dropDuplicates("vec_a", "vec_b")
        .select(col("vec_a"), col("vec_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      graft.functions.GraftFunctions.register(spark)
      val allBands = SimilarityQueries.bandRowsOf(embAll, b0 + 1)
      val expected = allBands.as("x").join(allBands.as("y"),
          col("x.bid") === col("y.bid") && col("x.bkey") === col("y.bkey") &&
            col("x.vec_id") < col("y.vec_id"))
        .filter(col("y.vec_id") >= newMin)
        .select(col("x.vec_id").as("xa"), col("y.vec_id").as("yb"),
          round(expr("cosine_sim(x.embedding, y.embedding)"), 6).as("c"))
        .filter(col("c") >= SimilarityQueries.NearDupThreshold)
        .select("xa", "yb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[stream] epoch: phase2 ${n - half} vecs in $w2%.2f s " +
        s"at b=${b0 + 1}; pairs phase1=$p1 phase2=${got2.size}, " +
        s"batch-reference=${expected.size}, " +
        s"missed=${(expected -- got2).size}, extra=${(got2 -- expected).size}")
      spark.stop()
      return
    }
    if (args.lift(1).contains("ann-epoch-evict")) {
      // The COMPOSED crossing — eviction × epoch migration (r11 verdict
      // #1): phase 1 runs the EVICTING operator at b0 with one synthetic
      // event-time minute per ~batchSize file; the drained snapshot is
      // window-filtered at the declared migration cut, re-keyed to b0+1,
      // and phase 2 resumes the evicting twin from the migrated
      // initialState with the touch batch as its first micro-batch. The
      // readout: snapshot → window-cut → migrated row counts, touch
      // buckets, per-phase wall, and the final checkpoint's state rows —
      // which must reflect the LIVE WINDOW, not the enrolled corpus
      // (the bounded-state contract surviving the epoch crossing).
      import graft.ext.SimilarityQueries
      import graft.streaming.StreamOps
      val embAll = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val n = embAll.count()
      val half = (n / 2).toInt
      val bounds = embAll.agg(min("vec_id"), max("vec_id")).collect()(0)
      val (idLo, idHi) = (bounds.getLong(0), bounds.getLong(1))
      val newMin = embAll.orderBy("vec_id").offset(half).limit(1)
        .select("vec_id").collect()(0).getLong(0)
      val b0 = SimilarityQueries.scaledBandBits(half)
      val wmDelay = "3 minutes"
      val in1 = java.nio.file.Files.createTempDirectory("epe_in1").toString
      val in2 = java.nio.file.Files.createTempDirectory("epe_in2").toString
      val out2 = java.nio.file.Files.createTempDirectory("epe_out2").toString
      val ck1 = java.nio.file.Files.createTempDirectory("epe_ck1").toString
      val ck2 = java.nio.file.Files.createTempDirectory("epe_ck2").toString
      StreamOps.stampPlaneFamily(spark, ck1)
      StreamOps.stampPlaneFamily(spark, ck2)
      // one synthetic minute per ~batchSize of vec_id span, monotone in
      // vec_id; files are range-partitioned so event time advances with
      // the feed like the MemoryStream modes' minute-per-batch scheme
      def withMinutes(df: org.apache.spark.sql.DataFrame, minuteLo: Long,
          spanLo: Long, spanHi: Long, nMinutes: Long)
          : org.apache.spark.sql.DataFrame =
        df.withColumn("ts", expr(
          s"timestamp_millis($baseMs + ($minuteLo + " +
          s"floor((vec_id - $spanLo) / ${math.max(1L, spanHi - spanLo + 1)}" +
          s".0D * $nMinutes)) * 60000)"))
      def landChunks(df: org.apache.spark.sql.DataFrame, rows: Long,
          in: String): Unit = {
        val files = math.max(1, ((rows + batchSize - 1) / batchSize).toInt)
        df.repartitionByRange(files, col("vec_id")).write.mode("append").parquet(in)
      }
      val phase1Minutes = math.max(1L, half.toLong / batchSize)
      landChunks(withMinutes(embAll.filter(col("vec_id") < newMin), 0,
        idLo, newMin - 1, phase1Minutes), half, in1)
      val t1 = System.nanoTime()
      val q1 = StreamOps.streamingAnnPairsEvicting(spark,
          spark.readStream
            .schema("vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP")
            .option("maxFilesPerTrigger", 1).parquet(in1),
          b = b0, watermark = wmDelay, maxBucket = Int.MaxValue)
        .writeStream.format("noop")
        .option("checkpointLocation", ck1)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q1.awaitTermination()
      val w1 = (System.nanoTime() - t1) / 1e9
      // declared migration cut = the drained query's own watermark
      val drainWmMs = Option(q1.lastProgress).flatMap(p =>
        Option(p.eventTime.get("watermark"))).map(w =>
          java.time.Instant.parse(w).toEpochMilli).getOrElse(0L)
      val snap = StreamOps.annStateSnapshotEvicting(spark, ck1).localCheckpoint()
      val nSnap = snap.count()
      val mig = SimilarityQueries.migrateAnnResidentsEvicting(snap, b0, drainWmMs)
        .localCheckpoint()
      val nMig = mig.count()
      val touches = StreamOps.annTouchRows(mig).localCheckpoint()
      val nTouch = touches.count()
      println(f"[stream] epoch-evict: b0=$b0, phase1 $half vecs in $w1%.2f s; " +
        s"snapshot $nSnap rows -> window cut at wm=$drainWmMs -> $nMig migrated " +
        s"($nTouch touch buckets)")
      // phase 2: touch batch FIRST (its own file => first micro-batch),
      // then the second half, minutes continuing past phase 1's
      touches.coalesce(1).write.mode("append").parquet(in2)
      landChunks(
        withMinutes(embAll.filter(col("vec_id") >= newMin), phase1Minutes,
          newMin, idHi, math.max(1L, (n - half) / batchSize))
          .withColumn("touch_bid", lit(-1)).withColumn("touch_bkey", lit(-1)),
        n - half, in2)
      val t2 = System.nanoTime()
      val q2 = StreamOps.streamingAnnPairsEvictingFrom(spark,
          spark.readStream
            .schema("vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP, " +
              "touch_bid INT, touch_bkey INT")
            .option("maxFilesPerTrigger", 1).parquet(in2),
          b = b0 + 1, initialResidents = mig,
          watermark = wmDelay, maxBucket = Int.MaxValue)
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.AnnPair], _: Long) =>
          df.write.mode("append").parquet(out2)
        }
        .option("checkpointLocation", ck2)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q2.awaitTermination()
      val w2 = (System.nanoTime() - t2) / 1e9
      val p2 = spark.read.parquet(out2).dropDuplicates("vec_a", "vec_b").count()
      val finalState = StreamOps.annStateSnapshotEvicting(spark, ck2).count()
      println(f"[stream] epoch-evict: phase2 ${n - half} vecs in $w2%.2f s " +
        s"at b=${b0 + 1}; pairs=$p2; final state $finalState resident rows " +
        s"(live window) vs ${n * SimilarityQueries.AnnHubTables} unbounded " +
        s"($n vecs x ${SimilarityQueries.AnnHubTables} tables) — " +
        s"the plateau survives the epoch crossing")
      spark.stop()
      return
    }
    if (args.lift(1).contains("two-tier")) {
      // TWO-TIER corpus architecture end-to-end (r11 verdict #8's
      // measured row): the documents fixture streams through the ingest
      // tier (quality gate, watermarked fingerprint dedup, scrub) in
      // ~batchSize-row micro-batches, lands as a documents table, and
      // the FULL batch TrainingDataPipeline consolidates over the
      // landed corpus. The readout: ingest wall + docs/s, landed count,
      // consolidation wall per tier, and the survivor-set diff vs the
      // pure-batch run over the original corpus. Contract: only-pure
      // MUST be 0 (the tier never loses a doc the batch run keeps — the
      // StreamOpsSpec contract as a scale measurement); tier-only
      // survivors are possible at blow-up scale (the tier consolidates
      // SCRUBBED text, flipping borderline-Jaccard LSH memberships —
      // first seen at 100×: 14 of 30k) and are diagnosed per pure gate
      // below. Nothing corpus-sized crosses the driver: the feed is
      // range-partitioned files, the compare is two except() counts.
      import graft.pipelines.{StreamingCorpusPipeline, TrainingDataPipeline}
      val docsAll = Tables.load(spark, dir, "documents")
      val n = docsAll.count()
      val in = java.nio.file.Files.createTempDirectory("tt_in").toString
      val out = java.nio.file.Files.createTempDirectory("tt_out").toString
      val ck = java.nio.file.Files.createTempDirectory("tt_ck").toString
      val landedDir = java.nio.file.Files.createTempDirectory("tt_dir").toString
      // ts monotone with arrival: ONE SYNTHETIC MINUTE PER RANGE FILE
      // (the minute-per-batch scheme every other mode uses), assigned
      // via spark_partition_id() AFTER the range partitioning so the
      // event-time span is exactly `files` minutes BY CONSTRUCTION —
      // and a watermark covering that whole span, so the fingerprint
      // dedup state is never evicted mid-feed (global dedup, the batch
      // d1 twin). Two r12 bugs live in this comment's history: ts
      // derived from raw doc_id (1 s/doc, then minute-per-id-bucket)
      // assumed DENSE ids, but ScaleBlowup remaps keys sparsely (30x
      // ids reach 2.9e8), stretching the synthetic span to ~100 days —
      // any out-of-order file pickup advanced the watermark far past
      // in-flight rows and the dedup operator dropped them as late
      // (landed 48,926 then 27,801 of 150,000). A bench feed must keep
      // its event-time span inside the declared lateness bound unless
      // lateness itself is the thing being measured.
      // OCCURRENCE-RANK WAVES (the r12 ADVICE determinism fix): wave 1
      // holds each fingerprint's lowest doc_id and lands entirely
      // before wave 2, so the first arrival of every fingerprint is
      // min-doc_id BY CONSTRUCTION and dropDuplicatesWithinWatermark's
      // arbitrary intra-batch pick never gets a choice on a NOVEL
      // fingerprint. Ranks ≥ 2 are BUCKETED into one wave (r13 ADVICE:
      // one wave per rank ran k sequential count+write jobs for a
      // fingerprint repeated k times, each landing a near-empty file)
      // — by the time any of them arrives, its fingerprint is already
      // in state from wave 1, so the operator drops them all
      // deterministically regardless of how they batch together.
      val waved = docsAll.select(col("doc_id"), col("text"))
        .withColumn("wave", org.apache.spark.sql.functions.least(
          org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(org.apache.spark.sql.functions.md5(col("text")))
              .orderBy(col("doc_id"))),
          org.apache.spark.sql.functions.lit(2)))
        .localCheckpoint()
      // coalesce: max(wave) is NULL on an empty documents table (r13
      // ADVICE NPE) — and a zero-wave feed must return HERE: with no
      // input files the AvailableNow query commits nothing, the parquet
      // sink writes no metadata, and the landed read would throw
      // schema-inference errors (the r14 review finding — the crash had
      // only moved downstream)
      val waves = waved.agg(org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.max("wave"),
          org.apache.spark.sql.functions.lit(0)))
        .collect()(0).getInt(0)
      if (waves == 0) {
        graft.CheckpointUtil.release(waved)
        println("[stream] two-tier: empty documents table — nothing to " +
          "ingest, consolidation diff vacuously 0/0")
        spark.stop()
        return
      }
      var fileBase = 0
      var totalFiles = 0
      (1 to waves).foreach { w =>
        val rows = waved.filter(col("wave") === w).drop("wave")
        val nw = rows.count()
        val fw = math.max(1, ((nw + batchSize - 1) / batchSize).toInt)
        rows.repartitionByRange(fw, col("doc_id"))
          .withColumn("ts", expr(
            s"timestamp_millis($baseMs + (cast(spark_partition_id() as bigint) + $fileBase) * 60000)"))
          .write.mode("append").parquet(in)
        fileBase += fw
        totalFiles += fw
      }
      graft.CheckpointUtil.release(waved)
      val wm = s"${math.max(60, totalFiles * 2)} minutes"
      val t1 = System.nanoTime()
      val q1 = StreamingCorpusPipeline.ingest(
          spark.readStream.schema("doc_id LONG, text STRING, ts TIMESTAMP")
            .option("maxFilesPerTrigger", 1).parquet(in), wm)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q1.awaitTermination()
      val w1 = (System.nanoTime() - t1) / 1e9
      val landed = spark.read.parquet(out)
      val nLanded = landed.count()
      println(f"[stream] two-tier: ingest $n docs -> $nLanded landed in " +
        f"$w1%.2f s = ${n / w1}%.0f docs/s ($totalFiles micro-batches, $waves waves)")
      landed.select(col("doc_id"), col("text"))
        .join(docsAll.select(col("doc_id"), col("lang"), col("source")), "doc_id")
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(math.max(1, totalFiles / 8))
        .write.parquet(s"$landedDir/documents.parquet")
      val embSrc = new java.io.File(s"$dir/embeddings.parquet")
      val embDst = new java.io.File(s"$landedDir/embeddings.parquet")
      if (embSrc.isDirectory) {
        embDst.mkdirs()
        embSrc.listFiles().foreach(f => java.nio.file.Files.copy(f.toPath,
          new java.io.File(embDst, f.getName).toPath))
      } else java.nio.file.Files.copy(embSrc.toPath, embDst.toPath)
      def consolidate(d: String): (org.apache.spark.sql.DataFrame, Double, Long) = {
        val t0 = System.nanoTime()
        val s = TrainingDataPipeline.survivors(spark, d).localCheckpoint()
        val c = s.count()
        (s, (System.nanoTime() - t0) / 1e9, c)
      }
      val (sPure, wPure, nPure) = consolidate(dir)
      val (sTier, wTier, nTier) = consolidate(landedDir)
      val onlyTierIds = sTier.select("doc_id").except(sPure.select("doc_id"))
        .localCheckpoint()
      val onlyTier = onlyTierIds.count()
      val onlyPure = sPure.select("doc_id").except(sTier.select("doc_id")).count()
      println(f"[stream] two-tier: consolidation pure $wPure%.2f s " +
        f"($nPure survivors) vs landed $wTier%.2f s ($nTier survivors); " +
        s"diff only-tiered=$onlyTier only-pure=$onlyPure")
      // only-pure is the DATA-LOSS direction (a doc the full-corpus
      // pipeline keeps that the tiered ingest dropped) — the contract is
      // hard zero, so fail the bench loudly rather than relying on a
      // human reading the log line (r14 ADVICE). only-tiered stays
      // print-and-diagnose: it is retention, not loss.
      require(onlyPure == 0L,
        s"two-tier DATA LOSS: $onlyPure survivor(s) present in the pure " +
        "pipeline but absent from the tiered landing — the ingest tier " +
        "dropped documents the consolidation pipeline would have kept")
      if (onlyTier > 0) {
        // self-diagnosis (r14, first seen at 100×): a tier-only survivor
        // is retention, not loss — name WHICH pure gate cut it. The
        // expected mechanism: the pure pipeline's flags are independent
        // over the FULL corpus, so a doc's dedup-cluster canonical can
        // itself be a doc another gate cut (e.g. an exact-dup copy
        // claiming ANN-cluster canonicalship); the tier removed that
        // canonical at ingest, so the next member is root and survives.
        val flags = TrainingDataPipeline.gateFlags(spark, dir)
        // derive the gate list from the flag schema: a hardcoded copy
        // would silently omit any gate added later, and an all-zero
        // histogram is exactly the confusion this readout exists to
        // resolve (r14 review)
        val gates = flags.columns.filter(_.startsWith("f_")).toSeq
        val hist = flags.join(onlyTierIds, "doc_id")
          .select(gates.map(g => sum(when(col(g), 0L).otherwise(1L)).as(g)): _*)
          .collect()(0)
        println("[stream] two-tier: tier-only survivors failed pure gates: " +
          gates.zipWithIndex.map { case (g, i) => s"$g=${hist.getLong(i)}" }
            .mkString(" "))
      }
      spark.stop()
      return
    }
    if (args.lift(1).exists(m => m == "ann" || m == "ann-evict")) {
      // embedding stream through streamingAnnPairs (unbounded) or the
      // EVICTING twin (minute-per-file event time, 3-minute watermark):
      // per-batch state rows must PLATEAU under eviction while the
      // unbounded mode grows monotonically. FILE-FED since r13 (the
      // ann-epoch discipline, r12 verdict #4): the corpus lands as
      // ~batchSize-row range files consumed one per micro-batch —
      // nothing corpus-sized crosses the driver, so blow-up-scale rows
      // measure the OPERATOR, not the feed.
      val evictMode = args.lift(1).contains("ann-evict")
      import graft.streaming.StreamOps
      val embAll = Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val n = embAll.count()
      val b = graft.ext.SimilarityQueries.scaledBandWidth(spark, dir)
      val in = java.nio.file.Files.createTempDirectory("annf_in").toString
      val out = java.nio.file.Files.createTempDirectory("annf_out").toString
      val ck = java.nio.file.Files.createTempDirectory("annf_ck").toString
      StreamOps.stampPlaneFamily(spark, ck)
      val files = math.max(1, ((n + batchSize - 1) / batchSize).toInt)
      // one synthetic minute per range file via spark_partition_id()
      // AFTER the range partitioning (the two-tier feed rule: the
      // event-time span is `files` minutes by construction, id-sparsity
      // can never stretch it past the watermark)
      embAll.repartitionByRange(files, col("vec_id"))
        .withColumn("ts", expr(
          s"timestamp_millis($baseMs + cast(spark_partition_id() as bigint) * 60000)"))
        .write.mode("append").parquet(in)
      val src = spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1).parquet(in)
      val ds = if (evictMode)
          StreamOps.streamingAnnPairsEvicting(spark,
            src.select(col("vec_id"), col("embedding"), col("ts")), b,
            watermark = "3 minutes")
        else
          StreamOps.streamingAnnPairs(spark,
            src.select(col("vec_id"), col("embedding")), b)
      val t0 = System.nanoTime()
      val q = ds.toDF().writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      // plateau readout off the retained progress history (the last
      // spark.sql.streaming.numRecentProgressUpdates batches — the tail
      // is where the plateau shows or fails)
      q.recentProgress.foreach { p =>
        val rows = Option(p.stateOperators).filter(_.nonEmpty)
          .map(_.map(_.numRowsTotal).sum).getOrElse(-1L)
        println(s"[stream] batch ${p.batchId}: ${p.batchDuration} ms, " +
          s"state rows $rows")
      }
      val pairs = spark.read.parquet(out)
        .dropDuplicates("vec_a", "vec_b").count()
      println(f"[stream] TOTAL ${if (evictMode) "ann-evict" else "ann"}: " +
        f"$n vecs in $wall%.2f s = ${n / wall}%.0f vecs/s over $files " +
        f"micro-batches, $pairs verified pairs")
      spark.stop()
      return
    }
    // (query, per-batch feed by index, total items, pair-id columns)
    val (q, feed, nItems, pairCols) =
      if (evict) {
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String, java.sql.Timestamp)]
        val query = graft.streaming.StreamOps.streamingNearDupPairsEvicting(
            spark, input.toDF().toDF("doc_id", "text", "ts"),
            watermark = "3 minutes").toDF()
          .writeStream.format("memory").queryName("nd_bench")
          .outputMode("update").start()
        val chunks = docs.grouped(batchSize).toArray
        (query, (i: Int) => input.addData(chunks(i).map { case (id, t) =>
            (id, t, new java.sql.Timestamp(baseMs + i * 60000L)) }),
          docs.size, Seq("doc_a", "doc_b"))
      } else {
        val input = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String)]
        val query = graft.streaming.StreamOps.streamingNearDupPairs(spark,
            input.toDF().toDF("doc_id", "text")).toDF()
          .writeStream.format("memory").queryName("nd_bench")
          .outputMode("update").start()
        val chunks = docs.grouped(batchSize).toArray
        (query, (i: Int) => input.addData(chunks(i)),
          docs.size, Seq("doc_a", "doc_b"))
      }
    try {
      val t0 = System.nanoTime()
      val nBatches = (nItems + batchSize - 1) / batchSize
      (0 until nBatches).foreach { i =>
        val b0 = System.nanoTime()
        feed(i)
        q.processAllAvailable()
        println(f"[stream] batch $i%2d: in " +
          f"${(System.nanoTime() - b0) / 1e9}%.2f s, state rows ${stateRows(q)}")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      val pairs = spark.table("nd_bench")
        .dropDuplicates(pairCols.head, pairCols.tail: _*).count()
      println(f"[stream] TOTAL $nItems items in $wall%.2f s = " +
        f"${nItems / wall}%.0f items/s, $pairs verified near-dup pairs")
    } finally q.stop()
    spark.stop()
  }
}
