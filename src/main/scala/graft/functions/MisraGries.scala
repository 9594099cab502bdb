package graft.functions

import java.nio.charset.StandardCharsets
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra–Gries frequent-items summary as a
  * TypedImperativeAggregate — the bounded-memory heavy-hitter
  * CANDIDATE generator (Misra & Gries 1982; mergeability per Agarwal
  * et al., "Mergeable Summaries", PODS 2012 — both public).
  *
  * The buffer is at most `k` (term → count) entries plus the total
  * item count N. Guarantee after any sequence of updates and merges:
  * every term with true count > N/(k+1) is PRESENT in the summary
  * (counts may undercount by at most N/(k+1), never overcount). So for
  * a heavy-hitter threshold φ·N with k ≥ ⌈1/φ⌉, the summary's key set
  * is a SUPERSET of the true heavy hitters — an exact verification
  * pass over just those candidates then yields the exact answer. That
  * candidates+verify pair is the 100 TB shape: the full-cardinality
  * term shuffle never happens; stage 1 moves one ≤k-entry buffer per
  * partition, stage 2 shuffles only candidate term rows.
  *
  * Update is the textbook algorithm (hit → +1; room → insert; else
  * decrement all, dropping zeros). Merge sums the two maps, then if
  * over capacity subtracts the (k+1)-th largest count from every entry
  * and drops the non-positives — the Agarwal et al. merge that
  * preserves the error bound. Output: STRUCT(n BIGINT,
  * terms ARRAY<STRING>) — total count + sorted candidate terms.
  */
case class MisraGries(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGries.Summary] {

  require(k >= 1, s"misra_gries: capacity must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(child)
  // analysis-time type error instead of an executor-side
  // ClassCastException on a non-string argument
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects a STRING argument, got ${other.catalogString}")
  }
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("terms", ArrayType(StringType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): MisraGries.Summary =
    new MisraGries.Summary(0L, mutable.HashMap.empty)

  override def update(buf: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buf.n += 1
      val m = buf.counts
      m.get(s) match {
        case Some(c) => m(s) = c + 1
        case None if m.size < k => m(s) = 1L
        case None =>
          // decrement-all; drop zeros (the classic MG step)
          val dead = mutable.ArrayBuffer.empty[String]
          for ((t, c) <- m) { if (c == 1L) dead += t else m(t) = c - 1 }
          dead.foreach(m.remove)
      }
    }
    buf
  }

  override def merge(buf: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary = {
    buf.n += other.n
    val m = buf.counts
    for ((t, c) <- other.counts) m(t) = m.getOrElse(t, 0L) + c
    if (m.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      for ((t, c) <- m) { if (c - cut <= 0L) dead += t else m(t) = c - cut }
      dead.foreach(m.remove)
    }
    buf
  }

  override def eval(buf: MisraGries.Summary): Any =
    InternalRow(buf.n, new GenericArrayData(
      buf.counts.keys.toArray.sorted.map(UTF8String.fromString(_): Any)))

  // length-prefixed binary layout (n, size, then [count, termLen,
  // termBytes]*) — terms are arbitrary strings, so no separator
  // character is safe (a '\n'-framed encoding corrupts on multi-line
  // terms)
  override def serialize(buf: MisraGries.Summary): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    for ((t, c) <- buf.counts) {
      out.writeLong(c)
      val tb = t.getBytes(StandardCharsets.UTF_8)
      out.writeInt(tb.length)
      out.write(tb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGries.Summary = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readLong()
    val size = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < size) {
      val c = in.readLong()
      val tb = new Array[Byte](in.readInt())
      in.readFully(tb)
      m(new String(tb, StandardCharsets.UTF_8)) = c
      i += 1
    }
    new MisraGries.Summary(n, m)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "misra_gries"
}

object MisraGries {
  /** Mutable aggregate buffer: total items seen + bounded counter map. */
  final class Summary(var n: Long, val counts: mutable.HashMap[String, Long])
}
