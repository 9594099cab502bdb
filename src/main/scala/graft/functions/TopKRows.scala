package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform

/** `topk(struct_col, k)` — bounded top-k-per-group TypedImperativeAggregate
  * (SURVEY.md §2B UDAF point; the 100 TB alternative to
  * rank-window-then-filter): returns the k SMALLEST struct values in
  * ascending struct order, so "top 2 by price desc, key asc" is
  * `topk(struct(-price, key), 2)`.
  *
  * Scale posture: per-group state is exactly k rows on every map-side
  * partial, merged associatively — no per-group sort of the whole input
  * the way a rank() window requires, and no unbounded collect_list. */
case class TopKRows(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[InternalRow]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue
  private lazy val structType = child.dataType.asInstanceOf[StructType]
  private lazy val ord: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]
  private lazy val proj = UnsafeProjection.create(structType)

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (!child.dataType.isInstanceOf[StructType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk expects a STRUCT ordering key, got ${child.dataType.sql}")
    else if (!kExpr.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk k must be an integer constant")
    else if (kExpr.eval().asInstanceOf[Number].intValue < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk k must be >= 1")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): ArrayBuffer[InternalRow] =
    ArrayBuffer.empty[InternalRow]

  /** Compact only at 2k: sorting every k-th... every insert would cost
    * O(k log k) per row; sorting once the buffer doubles amortizes to
    * O(log k) per row while state stays ≤ 2k rows. Callers that hand the
    * buffer onward (eval/serialize) do their own exact take(k). */
  private def trim(buf: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    if (buf.length >= 2 * k) {
      val kept = buf.sorted(ord).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def update(buf: ArrayBuffer[InternalRow], input: InternalRow): ArrayBuffer[InternalRow] = {
    val v = child.eval(input)
    if (v != null) {
      buf += v.asInstanceOf[InternalRow].copy()
      trim(buf)
    }
    buf
  }

  override def merge(buf: ArrayBuffer[InternalRow], other: ArrayBuffer[InternalRow]): ArrayBuffer[InternalRow] = {
    buf ++= other
    trim(buf)
  }

  override def eval(buf: ArrayBuffer[InternalRow]): Any =
    new GenericArrayData(buf.sorted(ord).take(k).toArray[Any])

  override def serialize(buf: ArrayBuffer[InternalRow]): Array[Byte] = {
    // exact-k before crossing the wire: shuffle bytes stay bounded by k
    val bounded = if (buf.length > k) buf.sorted(ord).take(k) else buf
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(bounded.length)
    for (row <- bounded) {
      val u = proj(row)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = ArrayBuffer.empty[InternalRow]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, Platform.BYTE_ARRAY_OFFSET, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))

  override def prettyName: String = "topk"
}
