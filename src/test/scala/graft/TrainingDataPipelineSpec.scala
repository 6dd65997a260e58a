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
  }
}
