package graft

import graft.pipelines.TrainingDataPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end invariants of the composed training-data pipeline. */
class TrainingDataPipelineSpec extends AnyFunSuite with SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("pipeline lands deduplicated, packed, lang-partitioned chunk shards") {
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val summary = TrainingDataPipeline.run(spark, dir, out)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(summary("documents_in") > 0)
    assert(summary("documents_kept") > 0)
    assert(summary("documents_kept") < summary("documents_in"),
      "dedup + quality gate must drop something on the fixture corpus")
    assert(summary("chunks_out") >= summary("documents_kept"),
      "every kept doc yields at least one chunk")
    assert(summary("shards_out") > 0)

    val landed = spark.read.parquet(out)
    // Exact dedup: no two surviving docs share a text.
    val docs = Tables.load(spark, dir, "documents")
    val survivorTexts = landed.select("doc_id").distinct()
      .join(docs, "doc_id").select("text")
    assert(survivorTexts.count() == survivorTexts.distinct().count())
    // Near dedup: only cluster roots survive.
    val roots = graft.ext.DedupQueries.dedupClusters(spark, dir)
      .filter(col("doc_id") === col("cluster_root")).select("doc_id")
    assert(landed.select("doc_id").distinct()
      .join(roots, Seq("doc_id"), "left_anti").count() == 0)
    // Physical layout: hive-style lang partitions, split below each lang.
    val langDirs = new java.io.File(out).list().filter(_.startsWith("lang="))
    assert(langDirs.nonEmpty)
    assert(langDirs.exists(l =>
      new java.io.File(s"$out/$l").list().exists(_.startsWith("split="))))
    // Mixture: only mixture-kept docs land.
    val mixKeep = graft.ext.PipelineQueries.mixtureKeepIds(spark, dir)
    assert(landed.select("doc_id").distinct()
      .join(mixKeep, Seq("doc_id"), "left_anti").count() == 0)
    // Split accounting: per-split doc counts sum to documents_kept.
    val splitTotal = summary.collect { case (k, v) if k.startsWith("docs_") => v }.sum
    assert(splitTotal == summary("documents_kept"))
    // PII scrub ran before chunking: no landed chunk matches either regex.
    val email = graft.ext.TextQueries.EmailRe
    assert(landed.filter(col("chunk_text").rlike(email)).count() == 0)
    // Decontamination: no landed TRAIN doc is flagged contaminated.
    val contam = graft.ext.PipelineQueries.decontaminate(spark, dir)
      .filter(col("is_contaminated")).select("doc_id")
    assert(landed.filter(col("split") === "train").select("doc_id").distinct()
      .join(contam, Seq("doc_id"), "left_anti").count() ==
      landed.filter(col("split") === "train").select("doc_id").distinct().count())
    // Repetition gate: every landed doc sits at or below the threshold.
    val offenders = graft.ext.TextQueries.repetition(spark, dir)
      .filter(col("dup_ratio") > TrainingDataPipeline.RepetitionMax).select("doc_id")
    assert(landed.select("doc_id").distinct()
      .join(offenders, Seq("doc_id"), "left_anti").count() ==
      landed.select("doc_id").distinct().count())
    // ANN multi-probe gate: no landed doc is a non-canonical member of
    // an embedding near-dup component (d31's keep rule).
    val annDropped = graft.ext.DedupQueries.annDedupMultiprobe(spark, dir)
      .filter(!col("is_kept")).select(col("vec_id").as("doc_id"))
    assert(landed.select("doc_id").distinct()
      .join(annDropped, Seq("doc_id"), "left_anti").count() ==
      landed.select("doc_id").distinct().count())

    // Cut application: the landed chunk set equals chunking the
    // provenance-cut + scrubbed text of the survivors — the raw text
    // never reached the chunker.
    val docsXT = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val cutPlan = graft.ext.DedupQueries.provenanceCut(spark, dir)
      .select(col("doc_id"), col("cut_start"), col("cut_end"))
    val expectedClean = graft.ext.TextQueries.scrubbed(
      graft.ext.DedupQueries.cutAppliedOf(docsXT, cutPlan)
        .select(col("doc_id"), col("clean_text").as("text")))
    val expectedChunks = graft.ext.PipelineQueries.chunkOf(expectedClean)
      .join(landed.select("doc_id").distinct(), "doc_id")
      .select("doc_id", "chunk_idx", "chunk_text")
    val landedChunks = landed.select("doc_id", "chunk_idx", "chunk_text")
    assert(landedChunks.exceptAll(expectedChunks).count() == 0 &&
      expectedChunks.exceptAll(landedChunks).count() == 0)
    // ...and the cut machinery provably ran: the corpus HAS cut-affected
    // docs (on this fixture the span-dup copies are also whole-doc
    // near-dups, so the earlier gates drop them before the cut stage —
    // the chunk-set equality above still pins that the landed text went
    // through the cut kernel, which is the invariant that matters).
    val cutDocs = graft.ext.DedupQueries.cutAppliedOf(docsXT, cutPlan)
      .filter(col("n_cut") > 0)
    assert(cutDocs.count() > 0,
      "fixture must exercise the cut kernel on at least one document")

    // Tokenizer-budget packing: independently replay the exclusive-prefix
    // shard rule over the survivors' BPE counts (trained-tokenizer units
    // over the final cut+scrubbed text, walked in doc_id order) and
    // compare to the landed shard of every doc.
    val bpeCounts = graft.ext.TextQueries.bpeApplyOf(spark, dir,
        expectedClean.join(landed.select("doc_id").distinct(), "doc_id"))
      .select("doc_id", "n_bpe_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var before = 0L
    val expectedShard = bpeCounts.map { case (id, n) =>
      val s = before / graft.ext.PipelineQueries.PackBudget
      before += n
      id -> s
    }.toMap
    val landedShard = landed.select("doc_id", "shard").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(landedShard.keySet == expectedShard.keySet)
    landedShard.foreach { case (id, s) =>
      assert(s == expectedShard(id), s"doc $id shard $s != ${expectedShard(id)}")
    }

    // Funnel ↔ run() agreement: the registered p27 query's final stage
    // equals documents_kept and the cumulative counts never increase.
    val funnel = TrainingDataPipeline.survivorFunnel(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(funnel("s0_documents_in") == summary("documents_in"))
    assert(funnel("s7_decontaminated") == summary("documents_kept"))
    val ordered = funnel.toSeq.sortBy(_._1).map(_._2)
    assert(ordered.zip(ordered.tail).forall { case (a, b) => b <= a },
      s"funnel must be monotone non-increasing: $ordered")
  }
}
