package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded-heap grouped top-k aggregate: `topk_pairs(score, id, k)` keeps
  * the k largest (score DESC, id ASC tie-break) pairs per group and emits
  * them best-first as `array<struct<score:double, id:bigint>>`.
  *
  * Why a custom `TypedImperativeAggregate` instead of
  * `row_number().over(Window.partitionBy(...))`: the window form sorts
  * every group in full (shuffle + per-partition sort of ALL rows) before
  * discarding everything past rank k. This aggregate carries an O(k)
  * buffer through the ordinary partial/final hash-aggregate path —
  * map-side combine keeps at most k rows per group per partition, so the
  * shuffle moves k rows per (group, partition) instead of the whole table.
  * At 100 TB that is the difference between shuffling the fact table and
  * shuffling a sketch of it.
  */
case class TopKPairs(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "topk_pairs requires k > 0")

  // Max-heap whose head is the WORST kept element (lowest score; ties →
  // largest id), so exceeding k pops the right victim.
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by(t => (-t._1, t._2))

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { t =>
      buf.enqueue(t)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortBy(t => (-t._1, t._2))
    new GenericArrayData(best.map(t => InternalRow(t._1, t._2): Any))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { t => out.writeDouble(t._1); out.writeLong(t._2) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType),
    StructField("id", LongType))))

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs expects (double, bigint), got " +
        s"(${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString})")

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(children: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = children(0), idExpr = children(1))
}
