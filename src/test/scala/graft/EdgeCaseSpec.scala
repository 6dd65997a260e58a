package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input behavior the sf-fixture oracles can never exercise:
  * empty frames, empty strings, single-row groups. A 100 TB run always
  * contains an empty partition or a pathological document somewhere. */
class EdgeCaseSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("nn-descent on a corpus with no shared bands degrades to empty graphs, not a crash") {
    // Two antipodal vectors flip every hyperplane sign, so their keys
    // complement in every band of every table — G0 is empty, the pivot
    // join runs over nothing, and both readout rows must still emit
    // with zero edges/hits (the isolated-vector behavior a sparse shard
    // of a real corpus hits).
    val dir = java.nio.file.Files.createTempDirectory("nnd_empty").toString
    val rnd = new scala.util.Random(11)
    val v = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    Seq((0L, v, 0), (20L, v.map(-_), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val rows = ext.SimilarityQueries.nnDescent(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("g0_lsh", "g1_descent"))
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L,
        r.toString)
      assert(r.getLong(2) > 0L, "exact denominator must still exist")
    }
  }

  test("query registry: no silent key collisions across modules, oracles subset") {
    // SparkEntry.queries unions per-module maps — a duplicated key would
    // silently drop one module's operator from the driver's correctness
    // sweep. Assert the union preserves every registration.
    val groups = Seq(
      graft.queries.ReferenceQueries.queries, graft.queries.StreamReplayQueries.queries,
      graft.queries.OlapQueries.queries, graft.queries.TemporalQueries.queries,
      graft.queries.AdvancedQueries.queries, graft.queries.TpchQueries.queries,
      graft.queries.TpchQueries2.queries, graft.ext.DedupQueries.queries,
      graft.ext.SimilarityQueries.queries, graft.ext.TextQueries.queries,
      graft.ext.MultimodalQueries.queries, graft.ext.PipelineQueries.queries)
    assert(groups.map(_.size).sum == SparkEntry.queries.size,
      "a query key is registered twice across modules")
    // every oracle refers to a registered query (a dangling oracle means
    // a rename missed one side)
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
    // and every query HAS an oracle (this suite has no rows-only ops)
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }

  test("tiny/degenerate corpora: epoch rebuild, widening, mp admission, provenance cut") {
    // the sf oracles never exercise a 4-vector corpus (widths clamp to
    // the floor) or an all-even id universe (empty admission batch) —
    // a 100 TB run's first bring-up does.
    def writeEmb(prefix: String, ids: Seq[Long]): String = {
      val dir = java.nio.file.Files.createTempDirectory(prefix).toString
      ids.map { i =>
        val v = Array.tabulate(64)(d =>
          (math.sin(i * 13.0 + d) + (if (i % 2 == 0) 0.5f else -0.25f)).toFloat)
        (i, v, (i % 3).toInt)
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    val tiny = writeEmb("edge_tiny", Seq(0L, 1L, 2L, 3L))
    // widths clamp to the floor (4): rebuild still emits both epochs,
    // e1 at width 5, breach 0 on both (full width == frozen width == 4)
    val reb = ext.SimilarityQueries.epochRebuild(spark, tiny).collect()
    assert(reb.map(_.getString(0)).toSeq == Seq("e0_frozen", "e1_rebuilt"))
    assert(reb.map(_.getLong(1)).toSeq == Seq(4L, 5L), reb.mkString(","))
    assert(reb.forall(_.getInt(8) == 0))
    // widening on 4 vectors: no mismatches, no containment violations
    val wid = ext.SimilarityQueries.familyWidening(spark, tiny).collect().head
    assert(wid.getLong(7) == 0L && wid.getLong(8) == 0L, wid.toString)
    // multi-probe admission on the tiny corpus emits only odd probes
    val adm = ext.SimilarityQueries.incrementalAnnMultiprobe(spark, tiny).collect()
    assert(adm.forall(_.getLong(0) % 2 == 1))
    // an all-even universe = EMPTY admission batch: zero rows, no error
    val even = writeEmb("edge_even", Seq(0L, 2L, 4L, 6L))
    assert(ext.SimilarityQueries.incrementalAnnMultiprobe(spark, even).count() == 0)
    assert(ext.SimilarityQueries.incrementalAnn(spark, even).count() == 0)
    // d31 on the tiny corpus: output is a total keep/drop verdict per id
    val d31 = ext.DedupQueries.annDedupMultiprobe(spark, tiny).collect()
    assert(d31.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d31.forall(r => r.getLong(1) <= r.getLong(0)))
  }

  test("provenance cut on a duplication-free corpus is empty, not a plan error") {
    val dir = java.nio.file.Files.createTempDirectory("edge_nodup").toString
    Seq((1L, "alpha beta gamma delta epsilon", "web"),
        (2L, "zeta eta theta iota kappa", "books"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(graft.ext.DedupQueries.provenanceCut(spark, dir).count() == 0)
    assert(graft.ext.DedupQueries.cutDedup(spark, dir).count() == 0)
  }

  test("chunking an empty corpus yields zero chunks, not a plan error") {
    assert(graft.ext.PipelineQueries.chunkOf(emptyDocs).count() == 0)
  }

  test("token packing an empty corpus yields zero shards") {
    assert(graft.ext.PipelineQueries.tokenPackingOf(emptyDocs).count() == 0)
  }

  test("pii scrub is identity on text without matches and total on text that is one match") {
    val df = Seq(
      (1L, "no pii here at all"),
      (2L, "a@b.com"),
      (3L, "")).toDF("doc_id", "text")
    val out = graft.ext.TextQueries.scrubbed(df)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "no pii here at all")
    assert(out(2L) == "<EMAIL>")
    assert(out(3L) == "")
  }

  test("gopher gate verdicts on adversarial documents: empty, degenerate, boilerplate") {
    val docs = Seq(
      (1L, ""),                                       // empty text
      (2L, Seq.fill(40)("spam").mkString(" ")),       // one token repeated
      (3L, Seq.fill(8)("the a of and to").mkString(" ")), // all stopwords
      (4L, (1 to 40).map(i => s"tok$i").mkString(" "))) // 40 distinct 4-5 char tokens
      .toDF("doc_id", "text")
      .withColumn("toks", split(lower(col("text")), " "))
    val out = graft.ext.TextQueries.gopherRulesOf(docs)
      .select("doc_id", "r_len", "r_meanlen", "r_ttr", "r_top", "r_stop", "pass")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    // empty text tokenizes to [""]: too short, zero mean length -> rejected
    assert(out(1L) == ((0, 0, 1, 0, 0, 0)))
    // spam x40: length ok, mean length 4 ok, but TTR=1/40 and top=40/40 fail
    assert(out(2L) == ((1, 1, 0, 0, 0, 0)))
    // stopword soup: stopword rule passes, mean length 2.2 and TTR/top fail
    assert(out(3L)._5 == 1 && out(3L)._2 == 0 && out(3L)._6 == 0)
    // clean doc: everything passes except the stopword requirement
    assert(out(4L) == ((1, 1, 1, 1, 0, 0)))
    // no adversarial document may slip through the full gate
    assert(out.values.forall(_._6 == 0))
  }

  test("chunking a single-token document emits exactly one full-coverage chunk") {
    val one = Seq((7L, "word")).toDF("doc_id", "text")
    val rows = graft.ext.PipelineQueries.chunkOf(one).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("chunk_len") == 1L)
    assert(rows.head.getAs[String]("chunk_text") == "word")
  }

  test("topk_pairs with k larger than the group returns the whole group, ordered") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(("g", 1.0, 10L), ("g", 3.0, 30L)).toDF("k", "score", "id")
    val top = df.groupBy($"k").agg(expr("topk_pairs(score, id, 5)").as("top"))
      .select(explode($"top").as("t")).select($"t.id".as("id")).as[Long].collect()
    assert(top.toSeq == Seq(30L, 10L))
  }

  test("cdc/scd2/concurrency handle tombstone-only and single-event users") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(
      (1L, t0, 1L, "error", 1.0, "{}"), // user 1: only a tombstone
      (2L, t0, 2L, "click", 2.0, "{}")  // user 2: a single upsert
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = java.nio.file.Files.createTempDirectory("cdcedge").toString
    rows.write.mode("overwrite").parquet(s"$out/events.parquet")
    // tombstoned key vanishes from the snapshot; the upsert survives
    val snap = graft.queries.TemporalQueries.q50CdcCompact(spark, out).collect()
    assert(snap.map(_.getLong(0)).toSeq == Seq(2L))
    assert(snap.head.getLong(4) == 1L) // n_changes
    // one open version per single-event user
    val vers = graft.queries.TemporalQueries.q51Scd2(spark, out).collect()
    assert(vers.length == 2 && vers.forall(_.getBoolean(6)))
    assert(vers.forall(r => r.getLong(1) == 1L && r.isNullAt(4)))
    // a lone interval peaks at concurrency 1, attained once
    val peaks = graft.queries.TemporalQueries.q52PeakConcurrency(spark, out)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(peaks == Set(("error", 1L, 1L), ("click", 1L, 1L)))
  }

  test("sketch aggregates track their exact counterparts within tolerance") {
    // The documented scale path when exactness can be traded (q23's
    // docstring, t6's KMV): Spark's own HLL++ and quantile sketches.
    // Not oracle-comparable (sketch internals differ per engine), so the
    // contract is pinned here instead: bounded relative error vs exact.
    val dir = "/root/testdata/sf0.01"
    val ev = Tables.load(spark, dir, "events")
    val (approxU, exactU) = ev.agg(
      approx_count_distinct(col("user_id")).as("a"),
      countDistinct(col("user_id")).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(math.abs(approxU - exactU).toDouble / exactU < 0.05,
      s"HLL++ estimate $approxU vs exact $exactU")
    val row = ev.agg(
      expr("approx_percentile(value, 0.5D, 1000)").as("a"),
      expr("percentile(value, 0.5D)").as("e")).collect().head
    val (approxM, exactM) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approxM - exactM) / exactM < 0.1,
      s"approx p50 $approxM vs exact $exactM")
  }

  test("sorted_intersect_count handles empty and disjoint arrays") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 9L))).toDF("a", "b")
    val got = df.select(expr("sorted_intersect_count(a, b)").cast("long")).as[Long].collect()
    assert(got.toSeq == Seq(0L, 0L, 2L))
  }

  test("prefix max on empty input and on all-equal keys degrades cleanly") {
    import org.apache.spark.sql.functions.col
    val empty = graft.ops.RankOps.withGlobalPrefixMax(
      Seq.empty[(Long, Long)].toDF("id", "v"), 4, "pm", col("v"), col("id"))
    assert(empty.collect().isEmpty)
    // one row: no predecessor, sentinel only
    val one = graft.ops.RankOps.withGlobalPrefixMax(
      Seq((1L, 42L)).toDF("id", "v"), 4, "pm", col("v"), col("id")).collect()
    assert(one.length == 1 && one(0).getAs[Long]("pm") == Long.MinValue)
  }

  test("q55 exact median returns (0, NULL) on an empty relation, not an NPE") {
    val dir = java.nio.file.Files.createTempDirectory("q55empty").toString
    Seq.empty[(Double, Long, Int)]
      .toDF("l_extendedprice", "l_orderkey", "l_linenumber")
      .write.parquet(s"$dir/lineitem.parquet")
    val r = graft.queries.AdvancedQueries.q55ExactMedian(spark, dir).collect()
    assert(r.length == 1 && r(0).getLong(0) == 0L && r(0).isNullAt(1))
  }

  test("containment/novelty/survivor handle short docs, exact dups and numeric source order") {
    val docs = Seq(
      // exact dups from differently-numbered sources: 'src10' sorts
      // BEFORE 'src2' lexically, so a string-ordered survivor pick would
      // wrongly keep doc 1 — the priority must compare numerically.
      (1L, "a b c d e", "en", "src10", 9L),
      (2L, "a b c d e", "en", "src2", 9L),
      (3L, "a b", "en", "src0", 3L), // < 3 tokens: no shingles at all
      (4L, "q r s t u v w x y z", "en", "src1", 19L),
      // proper superset of docs 1/2: containment is directional
      (5L, "a b c d e f g h i j", "en", "src3", 19L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("dedupedge").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val cont = graft.ext.DedupQueries.containmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // dups contain each other at 1.0; both embed in the superset at 1.0;
    // the reverse direction (5 into 1/2: 3 of 8 shingles) never appears;
    // the short doc pairs with nothing.
    assert(cont.keySet == Set((1L, 2L), (2L, 1L), (1L, 5L), (2L, 5L)), cont)
    assert(cont.values.forall(_ == 1.0))

    val nov = graft.ext.TextQueries.novelty(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(!nov.contains(3L), "shingle-less docs carry no novelty row")
    assert(nov(1L) == 0.0 && nov(2L) == 0.0, "exact dups are 0-novel")
    assert(nov(4L) == 1.0, "an all-unique doc is fully novel")
    assert(nov(5L) == 0.625, "5 of its 8 shingles are unique to doc 5")

    val kept = graft.ext.PipelineQueries.prioritySurvivor(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(kept == Set((2L, "src2", 2L), (3L, "src0", 1L),
      (4L, "src1", 1L), (5L, "src3", 1L)), kept)
  }

  test("merge-intervals: a lone event is one island; a touching start still merges") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val plus = (m: Int) => new java.sql.Timestamp(t0.getTime + m * 60000L)
    val rows = Seq(
      (1L, t0, 1L, "click", 1.0, "{}"), // user 1: single event
      (2L, t0, 2L, "click", 1.0, "{}"), // user 2: chain where each start
      (3L, plus(60), 2L, "click", 1.0, "{}"), // touches the prior end —
      (4L, plus(120), 2L, "click", 1.0, "{}"), // one island, not three
      (5L, plus(181), 2L, "click", 1.0, "{}") // 1 min past the end: break
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("mergeedge").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.TemporalQueries.q64MergeIntervals(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(got.toSeq == Seq(
      (1L, 1L, 1L, 3600000000L), // lone event: exactly the interval length
      (2L, 1L, 3L, 10800000000L), // 3 touching intervals: 3h island
      (2L, 2L, 1L, 3600000000L)))
  }

  test("cluster extension path injects the full native function surface") {
    // Parity with GraftFunctions.register is by construction (one builder
    // list); this pins the surface itself and that injection doesn't throw.
    assert(graft.functions.GraftFunctions.builders.map(_._1) == Seq(
      "cosine_sim", "dot_product", "sorted_intersect_count",
      "topk_pairs", "shingle_explode"))
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
