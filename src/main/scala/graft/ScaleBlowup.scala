package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Harness-side fixture scaler (not part of the driver contract, like
  * [[BenchDebug]]): writes a factor-N blow-up of an sf fixture directory
  * so the scale TREND of the heavy queries can be measured instead of
  * design-argued — `runMain graft.ScaleBlowup <srcDir> <outDir> [factor]`
  * then `SPARK_GRAFT_SF_DIR=<outDir> runMain graft.BenchDebug <q>...`.
  *
  * The blow-up multiplies the FACT tables (copy c remaps every key by
  * c·stride so join fan-outs and group cardinalities scale honestly)
  * and keeps the dimension tables (region, nation) fixed — the TPC-H
  * scaling model. Documents get copy-disjoint vocabulary (every token
  * suffixed `~c` for c>0) so the blow-up adds NEW content rather than
  * 10 near-duplicates of everything — exact/near-dup pair structure
  * scales linearly like a real 10x corpus, not quadratically like a
  * copy-paste corpus. Embeddings CIRCULAR-SHIFT their components per
  * copy — a pure scaling perturbation would preserve both hyperplane
  * signs and cosine (all copies would be exact ANN-duplicates sharing
  * every LSH bucket, a degenerate 10x); rotation preserves norms and
  * within-copy neighborhoods while giving each copy its own direction
  * set. The 64-dim rotation family repeats every 64 copies, so for
  * c >= 64 a per-copy deterministic SIGN PATTERN (the same ± mask
  * applied to every vector of copy c) multiplies the family — sign
  * flips preserve norms AND within-copy dot products exactly while
  * giving each copy fresh hyperplane signs; copies 0..63 are
  * byte-identical to the pre-round-11 fixtures, so recorded 10x/30x
  * measurements stay comparable.
  *
  * Optional 4th arg: comma-separated table subset (e.g. `embeddings`)
  * so a 300x width-growth fixture doesn't pay for 180M lineitem rows
  * it never reads. */
object ScaleBlowup {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/sf_blowup"
    val factor = if (args.length > 2) args(2).toInt else 10
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    val stride = 10000000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copyIdx: Column = explode(sequence(lit(0), lit(factor - 1)))
    def shifted(c: String): Column = col(c) + col("_c").cast("long") * stride

    /** factor copies with the named key columns shifted by c·stride. */
    def blow(name: String, keys: String*): DataFrame = {
      val df = Tables.load(spark, src, name).withColumn("_c", copyIdx)
      keys.foldLeft(df)((d, k) => d.withColumn(k, shifted(k)))
        .drop("_c")
    }

    val outTables: Seq[(String, DataFrame)] = Seq(
      "region" -> Tables.load(spark, src, "region"),
      "nation" -> Tables.load(spark, src, "nation"),
      "customer" -> blow("customer", "c_custkey"),
      "supplier" -> blow("supplier", "s_suppkey"),
      "part" -> blow("part", "p_partkey"),
      "orders" -> blow("orders", "o_orderkey", "o_custkey"),
      "lineitem" -> blow("lineitem", "l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> blow("events", "event_id", "user_id"),
      "documents" -> {
        Tables.load(spark, src, "documents").withColumn("_c", copyIdx)
          .withColumn("doc_id", shifted("doc_id"))
          .withColumn("text", when(col("_c") === 0, col("text"))
            .otherwise(array_join(expr(
              "transform(split(text, ' '), t -> concat(t, '~', _c))"), " ")))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .drop("_c")
      },
      "embeddings" -> {
        // rotate per copy; for c >= 64 (where the rotation family would
        // repeat) additionally flip signs by the murmur parity of
        // (copy-epoch, dim) — identical pattern for all vectors of a
        // copy, so within-copy cosines are exact and cross-copy bucket
        // structure is fresh for every c
        Tables.load(spark, src, "embeddings").withColumn("_c", copyIdx)
          .withColumn("vec_id", shifted("vec_id"))
          .withColumn("embedding", expr(
            "transform(sequence(1, size(embedding)), " +
              "i -> element_at(embedding, ((i - 1 + _c * 7) % size(embedding)) + 1) " +
              "* (CASE WHEN _c >= 64 AND pmod(hash(_c div 64, i), 2) = 1 " +
              "THEN -1.0F ELSE 1.0F END))"))
          .drop("_c")
      })
    outTables.foreach { case (name, df) =>
      if (only.forall(_.contains(name))) {
        df.write.mode("overwrite").parquet(s"$out/$name.parquet")
        println(s"[blowup] $name -> $out/$name.parquet")
      }
    }
    spark.stop()
  }
}
