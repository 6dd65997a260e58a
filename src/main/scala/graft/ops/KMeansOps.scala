package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column, in exact
  * micro-unit integer arithmetic.
  *
  * Floats are quantized once (`round(x·1e6)` → BIGINT) and every
  * downstream quantity — squared L2 distances, per-cluster inertia,
  * centroid means (`sum div n`) — is exact integer math. That buys the
  * same two properties the rest of this codebase leans on:
  * determinism (no float-summation-order drift across partitionings or
  * engines, so a DuckDB oracle can replicate one Lloyd step bit-for-bit)
  * and an exact convergence test (integer inertia equality, never a
  * float tolerance).
  *
  * BSP shape per round (the d8/d12 discipline): assignment is a
  * broadcast cross join of the corpus against k centroid rows + a
  * bounded k-row window argmin — the corpus never shuffles on a
  * cluster key; the centroid update reduces 64·k cells map-side. Only
  * the k×dims centroid table and one inertia scalar cross to the
  * driver per round (centroids are model state, not data). At 1000
  * executors this is the textbook scalable k-means loop: rounds are
  * O(scan) with no corpus-sized shuffle anywhere.
  *
  * Lloyd monotonicity note: floor-rounding the integer centroid mean
  * can in principle cost a point of inertia improvement, so the loop
  * stops at the first round whose inertia fails to strictly improve —
  * with micro-unit resolution the rounding loss is ~1e-6 of a
  * coordinate and the stop rule still terminates (inertia is a
  * non-negative integer, so strict decrease cannot continue forever).
  */
object KMeansOps {

  /** `(vec_id, vm: array<bigint>)` — micro-unit quantized vectors. */
  def microVectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000000.0D, 0) as bigint))")
        .as("vm"))

  /** Nearest-centroid assignment: `(vec_id, vm, cluster, d2m)`.
    * `cents` is a small `(cent_id, cm: array<bigint>)` frame — model
    * state, not data — so it is collected and folded into a literal
    * array column: assignment becomes a pure per-row projection
    * (`transform` to (d2m, cent_id) structs + `array_min`, whose struct
    * ordering IS the (distance, lowest-cent_id) tie-break). No cross
    * join, no per-vector window, no shuffle — the corpus never leaves
    * its partitions, which is what makes the Lloyd round O(scan) at
    * 100 TB. */
  def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val cs = cents.select(col("cent_id"), col("cm")).collect()
      .sortBy(_.getLong(0))
    val centArr = array(cs.map { r =>
      struct(lit(r.getLong(0)).as("cent_id"),
        array(r.getAs[scala.collection.Seq[Long]]("cm").toSeq.map(lit): _*).as("cm"))
    }.toIndexedSeq: _*)
    e.withColumn("cents", centArr)
      .withColumn("best", expr(
        "array_min(transform(cents, c -> struct(" +
          "aggregate(zip_with(vm, c.cm, (a, b) -> (a - b) * (a - b)), " +
          "cast(0 as bigint), (acc, x) -> acc + x) as d2m, " +
          "c.cent_id as cent_id)))"))
      .select(col("vec_id"), col("vm"),
        col("best.cent_id").as("cluster"), col("best.d2m").as("d2m"))
  }

  /** Exact integer centroid update: per (cluster, dim) mean as
    * `sum div n` — `(cent_id, cm)` rebuilt as array frames.
    *
    * A cluster that captured zero vectors this round has no rows in the
    * groupBy output; without `prev` it would vanish and k would shrink
    * permanently (possible from round 1 when two seeds are duplicate
    * vectors — the tie-break sends every point to the lower cent_id).
    * Passing the previous centroid frame keeps empty clusters at their
    * old position (the standard keep-old-centroid policy), so `lloyd`
    * always returns exactly k centroids. */
  def updateCentroids(asgn: DataFrame, prev: Option[DataFrame] = None): DataFrame = {
    val means = asgn
      .select(col("cluster"), posexplode(col("vm")).as(Seq("pos", "x")))
      .groupBy(col("cluster"), col("pos"))
      .agg(expr("cast(sum(x) div count(1) as bigint)").as("c"))
      .groupBy(col("cluster"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)").as("cm"))
      .select(col("cluster").as("cent_id"), col("cm"))
    prev match {
      case None => means
      case Some(p) =>
        p.select(col("cent_id"), col("cm").as("cm_prev"))
          .join(means.withColumnRenamed("cm", "cm_new"), Seq("cent_id"), "left")
          .select(col("cent_id"), coalesce(col("cm_new"), col("cm_prev")).as("cm"))
    }
  }

  /** Total inertia as an overflow-proof exact decimal. */
  private def inertia(asgn: DataFrame): java.math.BigDecimal =
    Option(asgn.agg(sum(col("d2m").cast("decimal(38,0)"))).first().get(0))
      .map(_.asInstanceOf[java.math.BigDecimal])
      .getOrElse(java.math.BigDecimal.ZERO)

  /** Full Lloyd loop from deterministic seeds (vec_id 1..k). Returns the
    * final assignment `(vec_id, cluster, d2m)` and the strictly-decreasing
    * inertia trace (one entry per accepted round). */
  def lloyd(spark: SparkSession, emb: DataFrame, k: Int, maxIter: Int)
      : (DataFrame, Seq[java.math.BigDecimal]) = {
    val e = microVectors(emb).localCheckpoint()
    var cents = e.filter(col("vec_id").between(1, k))
      .select(col("vec_id").as("cent_id"), col("vm").as("cm"))
      .localCheckpoint()
    var asgn = assign(e, cents).localCheckpoint()
    var trace = Vector(inertia(asgn))
    var it = 1
    var done = false
    while (it < maxIter && !done) {
      val nextCents = updateCentroids(asgn, Some(cents)).localCheckpoint()
      val nextAsgn = assign(e, nextCents).localCheckpoint()
      val nextInertia = inertia(nextAsgn)
      if (nextInertia.compareTo(trace.last) < 0) {
        graft.CheckpointUtil.release(cents)
        graft.CheckpointUtil.release(asgn)
        cents = nextCents
        asgn = nextAsgn
        trace :+= nextInertia
      } else {
        graft.CheckpointUtil.release(nextCents)
        graft.CheckpointUtil.release(nextAsgn)
        done = true
      }
      it += 1
    }
    // The final assignment is checkpointed, so the quantized corpus and
    // the last centroid frame are both dead — free their blocks eagerly.
    graft.CheckpointUtil.release(cents)
    graft.CheckpointUtil.release(e)
    val out = asgn.select(col("vec_id"), col("cluster"), col("d2m"))
    (out, trace)
  }
}
