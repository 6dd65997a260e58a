package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst table-generating function (the Spark analog of a UDTF,
  * SURVEY §2.8's last empty category): one text row in, its positional
  * word n-gram shingles out as `(pos, shingle)` rows.
  *
  * Versus composing `posexplode(transform(sequence(...)))`: the HOF chain
  * materializes the full shingle ARRAY per row before exploding —
  * `O(tokens · n)` characters of transient array for every document —
  * while a Generator streams one shingle row at a time into the
  * `GenerateExec` consumer, which is the difference between "fits" and
  * "copies the corpus once more" when documents are large. Generators sit
  * outside whole-stage codegen by design (`GenerateExec` drives them
  * row-by-row), so CodegenFallback here costs nothing extra.
  *
  * Tokenization contract matches the engine's other text ops: lowercase,
  * split on single spaces, empty tokens preserved (`split(" ", -1)` —
  * DuckDB's `string_split` semantics, which the oracle relies on).
  */
case class ShingleExplode(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"shingle_explode expects STRING text, got ${text.dataType.simpleString}")
    else if (!n.foldable || !Seq[DataType](IntegerType, LongType, ShortType, ByteType)
        .contains(n.dataType))
      TypeCheckResult.TypeCheckFailure(
        "shingle_explode expects a constant integral shingle width")
    else if (kRaw < 1 || kRaw > 1024)
      // reject rather than wrap: a BIGINT width like 2^32+3 would
      // otherwise silently truncate to 3 via toInt
      TypeCheckResult.TypeCheckFailure(
        s"shingle_explode width must be in [1, 1024], got $kRaw")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val kRaw: Long = n.eval() match {
    case i: Int => i.toLong
    case l: Long => l
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case _ => -1L
  }
  private lazy val k: Int = kRaw.toInt

  override def elementSchema: StructType =
    new StructType()
      .add("pos", IntegerType, nullable = false)
      .add("shingle", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null || k <= 0) Iterator.empty
    else {
      val toks = t.asInstanceOf[UTF8String].toString
        .toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      if (toks.length < k) Iterator.empty
      else (0 to toks.length - k).iterator.map { i =>
        InternalRow(i, UTF8String.fromString(toks.slice(i, i + k).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), n = newChildren(1))
}
