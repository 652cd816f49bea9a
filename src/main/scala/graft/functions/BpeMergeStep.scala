package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_merge_step(seg, left, right)`: one BPE merge applied to a token
  * segmentation — every NON-OVERLAPPING left-to-right occurrence of the
  * adjacent pair (left, right) is replaced by the concatenated token
  * (`"aaa"` under merge (a,a) → `["aa","a"]`, the standard BPE contract).
  *
  * Runs inside whole-stage codegen (the generated code calls the same
  * static walk as `eval`, so no interpreted-expression fallback splits
  * the stage), though its host frame is the DISTINCT-WORD table
  * ([[graft.ops.BpeOps]]), whose cardinality is bounded by vocabulary
  * growth (Heaps' law), not corpus size — the expression is per-word,
  * never per-token-occurrence.
  */
case class BpeMergeStep(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = first.dataType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<string>, string, string), got " +
            s"${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
    }

  override def nullSafeEval(seg: Any, l: Any, r: Any): Any =
    BpeMergeStep.mergeArr(seg.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seg, l, r) =>
      s"${ev.value} = graft.functions.BpeMergeStep.mergeArr($seg, $l, $r);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "bpe_merge_step"
}

object BpeMergeStep {
  def mergeArr(seg: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = seg.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = seg.getUTF8String(i)
      if (i + 1 < n && l.equals(cur) && r.equals(seg.getUTF8String(i + 1))) {
        out.add(UTF8String.concat(l, r))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}
