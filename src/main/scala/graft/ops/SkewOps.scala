package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks for hot keys at cluster scale.
  *
  * Spark's hash aggregate already map-side-combines algebraic aggregates,
  * so plain sums don't need salting — these cover the cases that DO hold
  * per-key state proportional to the data: exact distinct counting and
  * equi-joins where one key dominates (AQE's skew-join handles sort-merge
  * splits at runtime; the salted join is the declarative fallback that
  * also works for hash joins and streaming).
  */
object SkewOps {

  /** Exact distinct count with the distinct-value space sharded `shards`
    * ways by value hash: each (key, shard) reducer deduplicates only its
    * shard, so no single task ever holds a hot key's full distinct set;
    * the final per-key sum of shard counts is exact because the shards
    * partition the value space. */
  def shardedCountDistinct(df: DataFrame, key: String, value: String,
      shards: Int): DataFrame =
    df.withColumn("_shard", pmod(xxhash64(col(value)), lit(shards)))
      .groupBy(col(key), col("_shard"))
      .agg(countDistinct(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n_distinct"))

  /** Salted equi-join: the fact side gets a deterministic salt in
    * [0, salts) hashed from `saltSrc` (any well-distributed fact column);
    * the dimension side is replicated once per salt value. Matching on
    * (key, salt) spreads a hot join key across `salts` reducers; the
    * result multiset is identical to the unsalted join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltSrc: String, salts: Int): DataFrame = {
    val sf = fact.withColumn("_salt", pmod(xxhash64(col(saltSrc)), lit(salts)))
    val sd = dim.withColumn("_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    sf.join(sd, sf(factKey) === sd(dimKey) && sf("_salt") === sd("_salt"))
      .drop(sf("_salt")).drop(sd("_salt"))
  }

  /** Bloom-filter semi-join reduction: build a bloom filter over the
    * dimension's join keys on the driver (one pass over the SMALL side),
    * ship it to every executor, and drop fact rows that cannot possibly
    * match BEFORE the join's shuffle. False positives only — the filter
    * never drops a matching row — so joining afterwards yields the exact
    * join result while the shuffle carries only the (filtered) survivors.
    * This is the manual form of Spark's AQE runtime bloom filter, exposed
    * as an operator for when the optimizer's size heuristics won't fire
    * (e.g. the selective side is small in ROWS but not in estimated
    * bytes). At 100 TB: a 10M-key dimension at 1% FPP is a ~11 MB
    * broadcast that can drop 90%+ of a selective fact scan before any
    * network cost. */
  /** Build the serialized bloom sketch over `dim(dimKey)` with the
    * NATIVE BloomFilterAggregate (one distributed aggregate over the
    * small side; partial filters OR-merge, only the final sketch reaches
    * the driver). Null when the build side is empty.
    *
    * BloomFilterAggregate silently clamps (numItems, numBits) to
    * spark.sql.optimizer.runtime.bloomFilter.{maxNumItems (4M),
    * maxNumBits (~8 MB)} — sized for the optimizer's auto-injected
    * filters, not an explicit operator: a 10M-key dim at 1% FPP needs
    * ~96M bits and would silently degrade to a many-% FPP sketch (join
    * results stay exact, filter selectivity collapses). So raise the
    * caps for the duration of the build when the requested sketch
    * exceeds them, then restore — the clamp is read lazily from the
    * session's SQLConf during this aggregate's evaluation. Exposed
    * private[graft] so the spec can assert the requested size is
    * honored past the default caps. */
  /** Serializes the raise-build-restore of the session-global bloom caps:
    * two interleaved [[buildBloom]] calls on one session could otherwise
    * save each other's RAISED value as "current" and restore it as if it
    * were the default, leaving the caps permanently inflated. (A
    * concurrent UNRELATED query can still observe the raised caps for
    * the duration of the build — the caps only bound sketch sizes, so
    * the worst case is an AQE-injected runtime filter building slightly
    * larger than default while a buildBloom is in flight.) */
  private val bloomCapLock = new Object
  private[graft] def buildBloom(dim: DataFrame, dimKey: String,
      expectedKeys: Long, fpp: Double): Array[Byte] = bloomCapLock.synchronized {
    import org.apache.spark.sql.GraftColumnShim.{column => wrap, expression => unwrap}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedKeys, fpp)
    val raises = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> expectedKeys,
      "spark.sql.optimizer.runtime.bloomFilter.maxNumBits" -> numBits)
    val spark = dim.sparkSession
    val saved = raises.map { case (k, need) =>
      val cur = spark.conf.get(k).toLong
      if (need > cur) spark.conf.set(k, need)
      (k, cur, need > cur)
    }
    val bfRow =
      try dim.select(wrap(new BloomFilterAggregate(
          unwrap(col(dimKey).cast("long")),
          Literal(expectedKeys), Literal(numBits)).toAggregateExpression())
        .as("bf")).head()
      finally saved.foreach { case (k, cur, raised) =>
        if (raised) spark.conf.set(k, cur) }
    if (bfRow.isNullAt(0)) null else bfRow.getAs[Array[Byte]](0)
  }

  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    // Guard: the probe below is mightContainLong. A string key would go
    // into the bloom as raw bytes but be probed as a (null) long cast —
    // silently filtering EVERY row instead of erroring.
    val integral: Set[org.apache.spark.sql.types.DataType] = Set(
      org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
      org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
    Seq(dim.schema(dimKey) -> dimKey, fact.schema(factKey) -> factKey)
      .foreach { case (f, n) =>
        require(integral.contains(f.dataType),
          s"bloomSemiJoin requires integral join keys; '$n' is ${f.dataType.simpleString}")
      }
    // Probe with the native BloomFilterMightContain expression — the
    // same pair AQE's runtime row-level filter injects. Unlike the
    // former Scala-UDF probe, the native predicate has `doGenCode`, so
    // the filter fuses into the fact scan's whole-stage-codegen span
    // instead of breaking it with a per-row boxed function call.
    import org.apache.spark.sql.GraftColumnShim.{column => wrap, expression => unwrap}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.types.BinaryType
    // empty build side serializes to null → the probe yields null for
    // every row → all filtered: the exact inner-join result (empty)
    val bloomLit = Literal(buildBloom(dim, dimKey, expectedKeys, fpp), BinaryType)
    // Null fact keys probe to null → filtered out, matching inner-join
    // semantics (null never matches). Long-keyed joins only.
    val pre = fact.filter(wrap(BloomFilterMightContain(
      bloomLit, unwrap(col(factKey).cast("long")))))
    pre.join(dim, pre(factKey) === dim(dimKey))
  }
}
