package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: how many elements of an ARRAY<STRING>
  * column are members of a FIXED word set — the stop-word-count shape
  * every quality-filter scan runs per document (Gopher stop-word floor,
  * the language-ID heuristic, the curation pipeline).
  *
  * The whole-stage-codegen upgrade over
  * `size(filter(arr, x -> array_contains(words, x)))`: the HOF form is
  * an interpreted lambda + an O(|words|) linear array_contains per
  * token; this compiles to a tight loop probing ONE shared
  * `HashSet<UTF8String>` reference (O(1) per token, no per-row lambda
  * dispatch, no intermediate filtered array). Null elements count as
  * non-members — exactly the HOF algebra (a null predicate drops the
  * element).
  */
case class CountIn(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_in expects an ARRAY<STRING> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = IntegerType

  // shared across rows; UTF8String hashing matches the column encoding
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    var cnt = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val setRef = ctx.addReferenceObj("countInSet", set,
        classOf[java.util.HashSet[UTF8String]].getName)
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      s"""
         |int $cnt = 0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $cnt++;
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "count_in"
}
