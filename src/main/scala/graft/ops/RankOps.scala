package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftInternalRowShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}

/** Distributed global ordering primitives — the scale-safe replacement for
  * a single-partition `Window.orderBy(...)` (global row_number / ntile /
  * running sum), which funnels the whole relation through ONE task.
  *
  * Mechanics (the `RDD.zipWithIndex` pattern, generalized to weighted
  * prefix sums): range-repartition on the sort key so partition i holds a
  * contiguous, ordered key range, sort within partitions, reduce each
  * partition to one per-partition total (P scalars to the driver — the
  * same footprint as zipWithIndex's internal count job), and stream each
  * partition once adding its exclusive start offset. No operator anywhere
  * demands a SinglePartition distribution.
  *
  * Why not two DataFrame subtrees (per-pid window + broadcast offsets)?
  * `repartitionByRange` SAMPLES its boundaries, and nothing guarantees
  * Spark reuses one exchange across the offsets and probe subtrees — when
  * it doesn't, the two sides see DIFFERENT partitionings and ranks break
  * (observed: 17 tiles from ntile(16)). One RDD instance constructs its
  * RangePartitioner exactly once, so the totals job and the output job
  * share boundaries by construction.
  *
  * The RDD hop stays in INTERNAL rows (r16, via [[GraftInternalRowShim]]):
  * `Dataset.rdd` decoded every row to an external `GenericRowWithSchema`
  * and the pooled cache then paid Java (de)serialization per pass —
  * profiled at ~7 s of task CPU for q52's three passes at sf0.1. UnsafeRow
  * blocks cache as the sort's own binary format: re-reads deserialize
  * nothing, and MEMORY_AND_DISK's unroll accounting is a shallow walk
  * (row object + one byte[]), not the reflective schema-graph walk that
  * made the external-Row deserialized level unusable (r16 commit
  * 0c055ef).
  *
  * Requirement: `sortCols` must be a TOTAL order (tie-free). Ranks are
  * then invariant to where the sampled range boundaries land, so results
  * are deterministic and oracle-replicable even though the sampling
  * itself is not.
  */
object RankOps {

  /** The last few range-sorted RDDs, kept cached for their second job.
    * Bounded: a long session running many prefix-sum queries back-to-back
    * must not accumulate a corpus-sized block set per call until driver
    * GC gets around to ContextCleaner. Evicting early is always SAFE —
    * `persist` (unlike localCheckpoint) keeps lineage, so a late
    * re-execution of an evicted frame just recomputes. 8 entries covers
    * the deepest composition in the suite (two RankOps per query) with
    * headroom. */
  private val MaxPersisted = 8
  private val persisted = new java.util.ArrayDeque[org.apache.spark.rdd.RDD[InternalRow]]
  private def persistBounded(rdd: org.apache.spark.rdd.RDD[InternalRow]) = synchronized {
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    persisted.addLast(rdd)
    while (persisted.size > MaxPersisted)
      persisted.removeFirst().unpersist(blocking = false)
    rdd
  }

  /** Eagerly release every pooled RDD (Bench/Verify teardown — the same
    * discipline as the ext caches; without it up to [[MaxPersisted]]
    * range-sorted corpus copies stay pinned in storage memory for the
    * rest of the session). Safe at any time: persist keeps lineage, so a
    * late re-execution just recomputes. */
  def clearCaches(): Unit = synchronized {
    while (!persisted.isEmpty)
      persisted.removeFirst().unpersist(blocking = false)
  }

  /** The range-sorted frame as a persisted RDD of COPIED internal rows
    * (the sort streams reused row objects — see the shim's contract). */
  private def sortedInternal(df: DataFrame, numPartitions: Int,
      sortCols: Seq[Column]): (DataFrame, org.apache.spark.rdd.RDD[InternalRow]) = {
    val sorted = df.repartitionByRange(numPartitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    (sorted, persistBounded(
      GraftInternalRowShim.toInternalRdd(sorted).map(_.copy())))
  }

  /** One appended long column: the input row joined with a fresh 1-slot
    * suffix — the downstream `RDDScanExec` unsafe projection flattens the
    * view, so no per-field copy happens here. */
  private def appendLong(r: InternalRow, v: Long): InternalRow =
    new JoinedRow(r, new GenericInternalRow(Array[Any](v)))

  /** Append 0-based global rank under `sortCols` as column `rankCol`. */
  def withGlobalRank(df: DataFrame, numPartitions: Int, rankCol: String,
      sortCols: Column*): DataFrame =
    withGlobalPrefixSum(df, numPartitions, rankCol, lit(1L), sortCols: _*)

  /** [[withGlobalRank]] plus the TOTAL row count — free out of the
    * per-partition totals job, so callers needing `n` (ntile tile
    * arithmetic, stage offsets) don't pay a separate full pass over the
    * input to `count(*)` it. */
  def withGlobalRankAndTotal(df: DataFrame, numPartitions: Int, rankCol: String,
      sortCols: Column*): (DataFrame, Long) =
    withGlobalPrefixSumAndTotal(df, numPartitions, rankCol, lit(1L), sortCols: _*)

  /** Append `prefixCol` = sum of `value` over all rows STRICTLY BEFORE the
    * current row in `sortCols` order (a distributed exclusive running
    * sum; with value = 1 it degenerates to the 0-based global rank).
    * `value` must be non-null; it is evaluated once per row as a long. */
  def withGlobalPrefixSum(df: DataFrame, numPartitions: Int, prefixCol: String,
      value: Column, sortCols: Column*): DataFrame =
    withGlobalPrefixSumAndTotal(df, numPartitions, prefixCol, value, sortCols: _*)._1

  /** [[withGlobalPrefixSum]] plus the grand total of `value` (the last
    * exclusive offset), already on the driver from the totals job. */
  def withGlobalPrefixSumAndTotal(df: DataFrame, numPartitions: Int, prefixCol: String,
      value: Column, sortCols: Column*): (DataFrame, Long) = {
    val spark = df.sparkSession
    val withV = df.withColumn("__v", value.cast("long"))
    val vIdx = withV.schema.fieldIndex("__v")
    // ONE RDD: its RangePartitioner (and thus the pid→key-range map) is
    // constructed exactly once and shared by both jobs below. Persisted,
    // because the totals job and the output job would otherwise EACH pay
    // the scan + range shuffle + sort; with the blocks cached the second
    // job is a pure streaming pass.
    val (sorted, rdd) = sortedInternal(withV, numPartitions, sortCols)
    val totals = rdd
      .mapPartitions(it => Iterator(it.foldLeft(0L)((a, r) => a + r.getLong(vIdx))))
      .collect()
    val offsets = totals.scanLeft(0L)(_ + _)
    // the OUTPUT rdd is NOT pooled (r15 tried it; r16 reverted): most
    // consumers reference the prefix frame exactly once, so persisting it
    // was a pure second block-manager write per call. A consumer that
    // re-references the frame (q52's peak join) re-runs only this
    // streaming pass over the already-persisted sorted input.
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        val o = appendLong(r, acc)
        acc += r.getLong(vIdx)
        o
      }
    }
    (GraftInternalRowShim.fromInternalRdd(spark, out,
      sorted.schema.add(prefixCol, LongType, nullable = false))
      .drop("__v"), offsets.last)
  }

  /** Append `prefixCol` = MAX of `value` over all rows STRICTLY BEFORE
    * the current row in `sortCols` order (a distributed exclusive running
    * max; Long.MinValue where no predecessor exists — callers translate
    * that sentinel, never subtract from it). Same two-job range-partition
    * shape as [[withGlobalPrefixSumAndTotal]]: per-partition maxes to the
    * driver (P scalars), exclusive max-scan of those, one streaming
    * output pass — running max is associative exactly like sum, so the
    * whole prefix-scan pattern carries over unchanged. */
  def withGlobalPrefixMax(df: DataFrame, numPartitions: Int, prefixCol: String,
      value: Column, sortCols: Column*): DataFrame = {
    val spark = df.sparkSession
    val withV = df.withColumn("__v", value.cast("long"))
    val vIdx = withV.schema.fieldIndex("__v")
    val (sorted, rdd) = sortedInternal(withV, numPartitions, sortCols)
    val maxes = rdd
      .mapPartitions(it =>
        Iterator(it.foldLeft(Long.MinValue)((a, r) => math.max(a, r.getLong(vIdx)))))
      .collect()
    val offsets = maxes.scanLeft(Long.MinValue)(math.max)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        val o = appendLong(r, acc)
        acc = math.max(acc, r.getLong(vIdx))
        o
      }
    }
    GraftInternalRowShim.fromInternalRdd(spark, out,
        sorted.schema.add(prefixCol, LongType, nullable = false))
      .drop("__v")
  }

  /** Append 0-based rank WITHIN each `groupKeys` group under `sortCols`
    * (the scalable `row_number() OVER (PARTITION BY group ORDER BY sort)`
    * for groups too big or too skewed for one reducer each): one global
    * rank over (group, sort), minus the group's start offset.
    *
    * The range sort on (group, sort) makes each group a CONTIGUOUS run,
    * so the per-partition totals job can return the ordered run-length
    * list of (group, count) — P + G·(partitions a group spans) tuples,
    * metadata-scale for the batch/bucket/stage/lang groups this serves
    * (the r15 form already broadcast a |G|² triangular self-join of the
    * same frame). The driver derives each group's first global position
    * in one scan and the output pass subtracts it inline — no counts
    * aggregation, no triangular join, no final broadcast join: the same
    * two jobs as [[withGlobalRank]] instead of five-plus (measured at
    * sf0.1: p15 12 jobs, p23 14, each job ~130 ms of fixed local-mode
    * latency; the join's exchanges cost the same latency on a cluster).
    *
    * NOTE the output column order is the INPUT order plus `rankCol`
    * (the r15 join-based form surfaced `groupKeys` first); consumers
    * select by name. */
  def withGroupRank(df: DataFrame, numPartitions: Int, rankCol: String,
      groupKeys: Seq[String], sortCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val allSort = groupKeys.map(col) ++ sortCols
    val gIdx = df.schema.fieldNames.zipWithIndex.toMap
    val gPos: Array[Int] = groupKeys.map(gIdx(_)).toArray
    val gTypes: Array[DataType] = gPos.map(df.schema.fields(_).dataType)
    val (sorted, rdd) = sortedInternal(df, numPartitions, allSort)
    // group-key values come out of COPIED cached rows, so UTF8String /
    // Decimal views are stable; their equals/hashCode are value-based,
    // which is all the run-length compare and the starts map need.
    def keyOf(r: InternalRow): Seq[Any] = {
      val a = new Array[Any](gPos.length)
      var i = 0
      while (i < gPos.length) { a(i) = r.get(gPos(i), gTypes(i)); i += 1 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    }
    // ONE totals job: ordered (group, count) runs per partition.
    val perPart: Array[Seq[(Seq[Any], Long)]] = rdd.mapPartitions { it =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], Long)]
      var cur: Seq[Any] = null
      var n = 0L
      it.foreach { r =>
        val k = keyOf(r)
        if (cur == null) { cur = k; n = 1L }
        else if (k == cur) n += 1L
        else { runs += ((cur, n)); cur = k; n = 1L }
      }
      if (cur != null) runs += ((cur, n))
      Iterator(runs.toSeq)
    }.collect()
    // Partition start offsets and each group's first global position.
    val pOffsets = new Array[Long](perPart.length)
    val starts = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
    var pos = 0L
    var pid = 0
    while (pid < perPart.length) {
      pOffsets(pid) = pos
      perPart(pid).foreach { case (k, n) =>
        if (!starts.contains(k)) starts(k) = pos
        pos += n
      }
      pid += 1
    }
    val bStarts = spark.sparkContext.broadcast(starts.toMap)
    val out = rdd.mapPartitionsWithIndex { (p, it) =>
      val st = bStarts.value
      var acc = pOffsets(p)
      it.map { r =>
        val o = appendLong(r, acc - st(keyOf(r)))
        acc += 1L
        o
      }
    }
    GraftInternalRowShim.fromInternalRdd(spark, out,
      sorted.schema.add(rankCol, LongType, nullable = false))
  }

  /** SQL NTILE(k) (1-based) from a 0-based global rank column and a total
    * row count column (both BIGINT, referenced BY NAME): the first
    * `n % k` tiles take `n div k + 1` rows. Exact integer arithmetic via
    * SQL `div` — pair with [[withGlobalRank]] and a broadcast count. */
  def ntileFromRank(rankCol: String, nCol: String, k: Int): Column = {
    val q = s"($nCol div $k)"
    val rem = s"($nCol % $k)"
    expr(
      s"CAST(CASE WHEN $rankCol < $rem * ($q + 1) THEN $rankCol div ($q + 1) " +
        s"ELSE $rem + ($rankCol - $rem * ($q + 1)) div greatest($q, 1) END + 1 AS BIGINT)")
  }
}
