package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** TypedImperativeAggregate: element-wise mean of an ARRAY<DOUBLE> group —
  * `vec_mean(v)` (r11 s3). The Lloyd update previously posexploded every
  * vector into (dim, x) rows — 64× the corpus row count pushed through
  * the shuffle machinery per k-means iteration; this buffer keeps ONE
  * running (sums[64], n) accumulator per cluster per partition and merges
  * those, the same narrow partial-mergeable shape as [[MinHashSig]].
  *
  * Arithmetic: per-partition left-to-right accumulation then partial
  * merge, the same float-summation shape Spark's avg() used on the
  * exploded rows (per-dimension sums in row order, merged across
  * partials); the 6-dp centroid rounding downstream absorbs the
  * regrouping exactly as it does the Spark-vs-DuckDB order difference,
  * and SimilaritySpec pins this form against the explode twin on real
  * data. Null/ragged elements: null vectors are skipped; a length
  * mismatch OR a null element within a group throws rather than
  * mis-sums (the explode twin's avg() would skip a null per-dimension,
  * silently shifting that dimension's mean — degenerate inputs must
  * fail loudly, upstream guarantees dense fixed-width embeddings).
  */
case class VecMeanAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMeanAgg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): VecMeanAgg.Buf =
    new VecMeanAgg.Buf(null, 0L)

  override def update(buf: VecMeanAgg.Buf, input: InternalRow): VecMeanAgg.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (buf.sums == null) buf.sums = new Array[Double](n)
      require(buf.sums.length == n,
        s"vec_mean over ragged vectors: ${buf.sums.length} vs $n")
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i), s"vec_mean over a null element at dim $i")
        buf.sums(i) += arr.getDouble(i)
        i += 1
      }
      buf.n += 1
    }
    buf
  }

  override def merge(buf: VecMeanAgg.Buf, other: VecMeanAgg.Buf): VecMeanAgg.Buf = {
    if (other.sums != null) {
      if (buf.sums == null) { buf.sums = other.sums.clone(); buf.n = other.n }
      else {
        require(buf.sums.length == other.sums.length,
          s"vec_mean over ragged vectors: ${buf.sums.length} vs ${other.sums.length}")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
        buf.n += other.n
      }
    }
    buf
  }

  override def eval(buf: VecMeanAgg.Buf): Any =
    if (buf.sums == null || buf.n == 0L) null
    else {
      val out = new Array[Double](buf.sums.length)
      var i = 0
      while (i < out.length) { out(i) = buf.sums(i) / buf.n; i += 1 }
      new GenericArrayData(out.map(java.lang.Double.valueOf(_): Any))
    }

  override def serialize(buf: VecMeanAgg.Buf): Array[Byte] = {
    val len = if (buf.sums == null) -1 else buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(12 + math.max(0, len) * 8)
    bb.putLong(buf.n).putInt(len)
    if (len > 0) { var i = 0; while (i < len) { bb.putDouble(buf.sums(i)); i += 1 } }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMeanAgg.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val len = bb.getInt
    if (len < 0) new VecMeanAgg.Buf(null, n)
    else {
      val sums = new Array[Double](len)
      var i = 0
      while (i < len) { sums(i) = bb.getDouble; i += 1 }
      new VecMeanAgg.Buf(sums, n)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMeanAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "vec_mean"
}

object VecMeanAgg {
  /** Mutable accumulator: element-wise sums (lazily sized) + row count. */
  final class Buf(var sums: Array[Double], var n: Long)
}
