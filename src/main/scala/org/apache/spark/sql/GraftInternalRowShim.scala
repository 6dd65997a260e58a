package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Package-private-access shim (the [[GraftColumnShim]] pattern): the
  * InternalRow round-trip `QueryExecution.toRdd` /
  * `SparkSession.internalCreateDataFrame` is `private[sql]` in Spark 4.
  *
  * Why RankOps needs it: the public crossing (`Dataset.rdd` +
  * `createDataFrame(RDD[Row], schema)`) converts every row to an external
  * `GenericRowWithSchema` — a per-row encoder pass on BOTH hops, plus
  * Java-serialized persistence whose cost was the profiled hot path of
  * every ranked query (r16: q52's three streaming passes over the cached
  * sorted input burned ~7 s of task CPU at sf0.1 deserializing external
  * Rows). The internal crossing keeps rows as UnsafeRow end to end: the
  * cache stores the sort's own binary format, re-reads deserialize
  * nothing, and the downstream scan re-enters codegen through the normal
  * `RDDScanExec` unsafe projection.
  */
object GraftInternalRowShim {

  /** The DataFrame's executed plan as `RDD[InternalRow]`. Rows may be
    * REUSED by the producing operator (SortExec streams from its pages):
    * copy before buffering or caching. */
  def toInternalRdd(df: DataFrame): RDD[InternalRow] =
    df.queryExecution.toRdd

  /** Wrap an `RDD[InternalRow]` as a DataFrame of `schema` (scans as
    * `Scan ExistingRDD`, exactly like `createDataFrame`). */
  def fromInternalRdd(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
