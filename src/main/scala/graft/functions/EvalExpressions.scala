package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Per-pair generation-eval kernels: clipped n-gram overlap (BLEU/ROUGE-n)
  * and LCS length (ROUGE-L), each over TWO token arrays inside one row.
  *
  * Rationale (100 TB posture): the r12 BLEU/ROUGE plans shuffled
  * gram-instance STRINGS twice — a (doc, order, gram) tf shuffle and a
  * (pair, order, gram) overlap-join re-shuffle — ~5 gram rows per token
  * on the wire. Pairing is strictly (d, d+1), so the pair-local plan
  * joins the token ARRAYS once (each document ships exactly twice) and
  * computes every order's clipped count inside the row with a bounded
  * hash-histogram walk: shuffle bytes drop from O(tokens·orders·gram
  * width) to O(tokens), and the per-pair work is O(tokens·orders) time /
  * O(tokens) space — bounded by document length, never by corpus size.
  *
  * Both expressions keep ONE kernel for eval and codegen (the generated
  * code calls the same static helper), so interpreted and whole-stage
  * paths cannot diverge; the helper is a plain static call inside the
  * codegen'd consume loop — no interpreted lambda trees, no UDF
  * serialization boundary.
  */
object EvalExprOps {

  /** Space-joined n-gram starting at 0-based `a` over pre-materialized
    * tokens — the same gram encoding the r12 explode plans and the DuckDB
    * oracles build (`concat_ws(' ', slice(w, ...))`), so swapping the
    * plan changes no result bits.
    */
  private def gram(toks: Array[String], a: Int, n: Int): String =
    if (n == 1) toks(a)
    else {
      val sb = new java.lang.StringBuilder(toks(a))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(a + j)); j += 1 }
      sb.toString
    }

  private def materialize(arr: ArrayData): Array[String] = {
    val n = arr.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) { out(i) = arr.getUTF8String(i).toString; i += 1 }
    out
  }

  /** Clipped overlap per order 1..maxOrder: m_n = Σ_g min(tf_ref(g),
    * tf_cand(g)) — real BLEU/ROUGE's multiset-min counts. Histogram the
    * reference's n-grams, then walk the candidate's consuming matches;
    * consuming IS the min without a second histogram.
    */
  def clippedOverlaps(ref: ArrayData, cand: ArrayData,
                      maxOrder: Int): ArrayData = {
    val r = materialize(ref)
    val c = materialize(cand)
    val out = new Array[Long](maxOrder)
    var n = 1
    while (n <= maxOrder) {
      val hist = new java.util.HashMap[String, Integer]()
      var a = 0
      while (a + n <= r.length) {
        val g = gram(r, a, n)
        val v = hist.get(g)
        hist.put(g, if (v == null) 1 else v + 1)
        a += 1
      }
      var cnt = 0L
      a = 0
      while (a + n <= c.length) {
        val g = gram(c, a, n)
        val v = hist.get(g)
        if (v != null && v > 0) {
          cnt += 1
          hist.put(g, v - 1)
        }
        a += 1
      }
      out(n - 1) = cnt
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Longest-common-subsequence length over two token arrays — the
    * ROUGE-L kernel. Classic two-row DP: O(n·m) time, O(min-side) space
    * (the shorter array indexes the rolling rows).
    */
  def lcsLength(x: ArrayData, y: ArrayData): Long = {
    val a0 = materialize(x)
    val b0 = materialize(y)
    // roll over the shorter side so the DP rows stay small
    val (a, b) = if (a0.length >= b0.length) (a0, b0) else (b0, a0)
    val m = b.length
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= a.length) {
      val ai = a(i - 1)
      var j = 1
      while (j <= m) {
        cur(j) =
          if (ai == b(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
        j += 1
      }
      val t = prev; prev = cur; cur = t
      java.util.Arrays.fill(cur, 0)
      i += 1
    }
    prev(m).toLong
  }
}

abstract class TokenPairExpression extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<string> arguments, got " +
            s"${left.dataType.sql} and ${right.dataType.sql}")
    }
}

/** `clipped_ngram_overlaps(ref_tokens, cand_tokens, maxOrder)` →
  * array<long> of the clipped match counts m_1..m_maxOrder. maxOrder is a
  * literal baked into the expression (2 for ROUGE, 4 for BLEU).
  */
case class ClippedNgramOverlaps(left: Expression, right: Expression,
                                maxOrder: Int)
    extends TokenPairExpression {
  require(maxOrder >= 1 && maxOrder <= 8, s"maxOrder $maxOrder out of range")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any =
    EvalExprOps.clippedOverlaps(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], maxOrder)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.EvalExprOps." +
        s"clippedOverlaps($x, $y, $maxOrder);")

  override def prettyName: String = "clipped_ngram_overlaps"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ClippedNgramOverlaps =
    copy(left = l, right = r)
}

/** `lcs_length(ref_tokens, cand_tokens)` → bigint LCS length. */
case class LcsLength(left: Expression, right: Expression)
    extends TokenPairExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    EvalExprOps.lcsLength(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.EvalExprOps.lcsLength($x, $y);")

  override def prettyName: String = "lcs_length"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LcsLength =
    copy(left = l, right = r)
}
