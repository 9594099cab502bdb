package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** TypedImperativeAggregate building a k-permutation MinHash signature
  * over a group of string shingles (SURVEY.md §4.2 item 3 — demonstrates
  * the custom binary-buffer aggregate shape for signature building: one
  * narrow pass, partial-mergeable, no exploded hash rows).
  *
  * Permutation i hashes shingle s as the first 8 hex chars of
  * md5(i + ":" + s) — deliberately md5-based so a SQL oracle reproduces
  * the signatures bit-for-bit. Output: ARRAY<STRING> of k hex entries.
  *
  * NOTE: this is a DIFFERENT permutation family from the production
  * `minhash_near_dup` pipeline, which uses double hashing ((h1 + i·h2)
  * mod p from one md5 — see TextOps) for 32× fewer md5 calls. The two
  * are not interchangeable: swapping one in for the other changes every
  * signature and band. An aggregate-based variant of the double-hash
  * family would keep this class's buffer shape with that arithmetic.
  */
case class MinHashSig(
    child: Expression,
    k: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): Array[String] =
    Array.fill(k)("￿") // lexicographically above any hex digest

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val md = MessageDigest.getInstance("MD5")
      var i = 0
      while (i < k) {
        val h = hex8(md, i + ":" + s)
        if (h.compareTo(buf(i)) < 0) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[String], other: Array[String]): Array[String] = {
    var i = 0
    while (i < k) { if (other(i).compareTo(buf(i)) < 0) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(UTF8String.fromString(_): Any))

  override def serialize(buf: Array[String]): Array[Byte] =
    buf.mkString("\n").getBytes(StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): Array[String] =
    new String(bytes, StandardCharsets.UTF_8).split("\n", -1)

  private def hex8(md: MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val sb = new StringBuilder(8)
    var i = 0
    while (i < 4) { // 4 bytes → 8 hex chars
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSig =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSig =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "minhash_sig"
}
