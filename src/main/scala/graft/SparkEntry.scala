package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module query groups; every entry has a
  * matching DuckDB `oracleSql` statement unless the operator is not
  * SQL-expressible (then the driver records a weaker rows-only check).
  * Column names are aliased identically on both sides and every query ends
  * in a total-order sort, so the driver's sorted-column hash compare is
  * byte-stable.
  */
object SparkEntry {

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ReferenceQueries.queries, ReferenceQueries.oracles),
      (StreamReplayQueries.queries, StreamReplayQueries.oracles),
      (OlapQueries.queries, OlapQueries.oracles),
      (TemporalQueries.queries, TemporalQueries.oracles),
      (AdvancedQueries.queries, AdvancedQueries.oracles),
      (TpchQueries.queries, TpchQueries.oracles),
      (TpchQueries2.queries, TpchQueries2.oracles),
      (graft.ext.DedupQueries.queries, graft.ext.DedupQueries.oracles),
      (graft.ext.SimilarityQueries.queries, graft.ext.SimilarityQueries.oracles),
      (graft.ext.TextQueries.queries, graft.ext.TextQueries.oracles),
      (graft.ext.MultimodalQueries.queries, graft.ext.MultimodalQueries.oracles),
      (graft.ext.PipelineQueries.queries, graft.ext.PipelineQueries.oracles)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.stediPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.map(_._2).reduce(_ ++ _)
}
