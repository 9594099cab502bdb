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
  * Update implements the textbook algorithm (hit → +1; room → insert;
  * else decrement all, dropping zeros) with the OFFSET-COUNTER
  * representation (r13): a "decrement all" is `base += 1` against
  * stored values (logical count = stored − base), so a miss on a full
  * buffer costs O(1) instead of an O(k) map walk — the difference
  * between 5 ns and 300 ns per rare token, and the dominant cost on
  * high-cardinality streams where most arrivals are misses (the
  * hh_highcard bench row). Bookkeeping that keeps it exact:
  *  - `byValCount` histograms the stored values of LIVE entries, so
  *    when base advances, `byValCount.remove(base)` says exactly how
  *    many entries just died (stored == base ⇒ logical 0) — liveSize
  *    stays O(1)-maintained without scanning;
  *  - dead entries stay in the map until re-encountered (lazily
  *    evicted) or until a compaction at 2k map size (amortized O(1):
  *    k deaths require k inserts). The logical state after every
  *    update is IDENTICAL to the textbook algorithm's.
  * Keys are UTF8String (cloned only on insert), so the hot hit path
  * never converts to java.lang.String.
  *
  * Merge materializes logical counts, sums the two maps, then if over
  * capacity subtracts the (k+1)-th largest count from every entry and
  * drops the non-positives — the Agarwal et al. merge that preserves
  * the error bound. Output: STRUCT(n BIGINT, terms ARRAY<STRING>) —
  * total count + sorted candidate terms.
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
    new MisraGries.Summary(0L, 0L, 0,
      mutable.HashMap.empty, mutable.HashMap.empty)

  override def update(buf: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v != null) {
      val u = v.asInstanceOf[UTF8String]
      buf.n += 1
      val m = buf.stored
      m.get(u) match {
        case Some(s) if s > buf.base =>
          // live hit: logical + 1 (HashMap.update on an existing key
          // keeps the canonical stored key instance)
          m(u) = s + 1
          buf.histDec(s); buf.histInc(s + 1)
        case hit =>
          if (hit.isDefined) { m.remove(u); buf.dead -= 1 } // stale, evict
          if (m.size - buf.dead < k) {
            // room: insert at logical 1 (clone — `u` aliases a reused
            // input buffer)
            m(u.clone()) = buf.base + 1
            buf.histInc(buf.base + 1)
          } else {
            // full-buffer miss: decrement-all == advance the offset;
            // entries whose stored value == new base just hit logical 0
            buf.base += 1
            buf.dead += buf.byValCount.remove(buf.base).getOrElse(0)
            if (m.size > 2 * k) buf.compact() // amortized: needs k deaths
          }
      }
    }
    buf
  }

  override def merge(buf: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary = {
    // materialize both sides' LOGICAL counts, sum, re-bound
    val m = mutable.HashMap.empty[UTF8String, Long]
    for ((t, c) <- buf.logical) m(t) = c
    for ((t, c) <- other.logical) m(t) = m.getOrElse(t, 0L) + c
    if (m.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives
      val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      for ((t, c) <- m) { if (c - cut <= 0L) dead += t else m(t) = c - cut }
      dead.foreach(m.remove)
    }
    val out = new MisraGries.Summary(buf.n + other.n, 0L, 0,
      m, mutable.HashMap.empty)
    for (c <- m.values) out.histInc(c)
    out
  }

  override def eval(buf: MisraGries.Summary): Any =
    InternalRow(buf.n, new GenericArrayData(
      buf.logical.map(_._1.toString).toArray.sorted
        .map(UTF8String.fromString(_): Any)))

  // length-prefixed binary layout (n, size, then [logicalCount,
  // termLen, termBytes]*) — terms are arbitrary strings, so no
  // separator character is safe (a '\n'-framed encoding corrupts on
  // multi-line terms)
  override def serialize(buf: MisraGries.Summary): Array[Byte] = {
    val live = buf.logical.toArray
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(live.length)
    for ((t, c) <- live) {
      out.writeLong(c)
      val tb = t.getBytes
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
    val buf = new MisraGries.Summary(n, 0L, 0,
      mutable.HashMap.empty, mutable.HashMap.empty)
    var i = 0
    while (i < size) {
      val c = in.readLong()
      val tb = new Array[Byte](in.readInt())
      in.readFully(tb)
      buf.stored(UTF8String.fromBytes(tb)) = c
      buf.histInc(c)
      i += 1
    }
    buf
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
  /** Mutable aggregate buffer, offset-counter representation:
    *  - `n`     total items seen;
    *  - `base`  decrement-alls applied so far (logical = stored − base);
    *  - `dead`  entries still in `stored` whose logical count is ≤ 0
    *            (lazily evicted);
    *  - `stored` term → stored value;
    *  - `byValCount` histogram of stored values over LIVE entries, the
    *    O(1) death detector when base advances. */
  final class Summary(
      var n: Long,
      var base: Long,
      var dead: Int,
      val stored: mutable.HashMap[UTF8String, Long],
      val byValCount: mutable.HashMap[Long, Int]) {

    def histInc(v: Long): Unit =
      byValCount(v) = byValCount.getOrElse(v, 0) + 1
    def histDec(v: Long): Unit = byValCount.get(v) match {
      case Some(1) => byValCount.remove(v)
      case Some(c) => byValCount(v) = c - 1
      case None => // value already aged out (defensive; cannot happen live)
    }

    /** Live entries as (term, logical count). */
    def logical: Iterator[(UTF8String, Long)] =
      stored.iterator.collect { case (t, s) if s > base => (t, s - base) }

    /** Evict dead entries; O(size), amortized O(1) (k deaths per call). */
    def compact(): Unit = {
      val deadKeys = stored.iterator.collect {
        case (t, s) if s <= base => t
      }.toArray
      deadKeys.foreach(stored.remove)
      dead = 0
    }
  }
}
