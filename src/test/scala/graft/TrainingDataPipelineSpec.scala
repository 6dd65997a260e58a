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
    // Physical layout: hive-style lang partitions.
    assert(new java.io.File(out).list().exists(_.startsWith("lang=")))
  }
}
