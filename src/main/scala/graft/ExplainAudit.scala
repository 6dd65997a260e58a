package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted plans for representative queries so scan pushdown
  * (PushedFilters / ReadSchema), broadcast choices and codegen spans can
  * be audited. Not part of the driver contract.
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "r_sql_over_view", "r_join_events_customer",
        "stedi_pipeline", "q2_topk", "s1_ann_topk",
        "q19_asof_join", "q21_sessionize", "q26_range_frame",
        "q32_corr_subquery", "d6_levenshtein", "s5_ann_ivf",
        "d4_ngram_jaccard", "p5_mixture", "p6_zorder", "t8_pii_redact",
        "s10_knn_join", "p8_decontaminate", "t10_lm_score", "q47_histogram",
        "p10_reservoir", "d11_incremental_dedup", "d12_pagerank",
        "m7_aspect_buckets")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
