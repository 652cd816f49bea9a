package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** `hilbert_index(x, y)`: the d-index of cell (x, y) on the
  * 2^[[HilbertIndex.Bits]]-per-side Hilbert curve — the textbook xy2d
  * walk fused into ONE codegen'd kernel. The previous form was 16 chained
  * `selectExpr` projections (one per fold level, each a 3-way CASE tree);
  * correct and map-only, but ~7× the cost of the Morton interleave purely
  * from expression-tree overhead. Here the whole walk is a single tight
  * loop inside whole-stage codegen: no intermediate rows, no CASE trees,
  * one multiply-free iteration per bit.
  *
  * Both coordinates are MASKED to the grid (`& (N−1)`) before the walk —
  * out-of-range input used to walk the flip `N−1−x` negative and silently
  * produce non-Hilbert keys (bijectivity and adjacency void); masking
  * makes the key the Hilbert index of the coordinate's low
  * [[HilbertIndex.Bits]] bits, the same truncation contract
  * `zvalueSql` has always applied to the Morton key. The DuckDB oracle
  * applies the identical mask at its h0 CTE, so the parity gate now
  * proves an in-domain walk on both sides instead of two engines agreeing
  * on out-of-domain two's-complement accidents.
  *
  * The oracle side deliberately does NOT share this kernel: it remains
  * the 16 chained CTEs generated from
  * [[graft.ops.StorageOps.hilbertStepExprs]], so the hash match is a
  * cross-derivation check (fused imperative loop vs per-level relational
  * fold) rather than one string evaluated twice. HilbertSpec pins the
  * defining curve properties — bijectivity and unit-step adjacency on a
  * complete grid — against a third, straight-line driver replay, plus the
  * out-of-range masking contract.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  /** Integral arguments (TINYINT/SMALLINT/INT/BIGINT columns and literals)
    * are accepted directly and widen inside the kernel — no analyzer cast,
    * matching built-in function ergonomics for the common case. Anything
    * else — and in particular DOUBLE/FLOAT/DECIMAL — FAILS ANALYSIS
    * instead of implicit-casting: the r16 `ImplicitCastInputTypes` form
    * admitted the standard fractional→BIGINT implicit cast, which under
    * non-ANSI semantics silently truncates (`hilbert_index(1.9, 2.3)`
    * quietly computed the cell for (1, 2)). A curve key built from a
    * truncated coordinate is a data bug the analyzer should catch; a
    * caller who really wants floor semantics writes the CAST explicitly.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    def integral(t: DataType): Boolean = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integral(left.dataType) && integral(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires integral (TINYINT/SMALLINT/INT/BIGINT) " +
          s"arguments, got (${left.dataType.simpleString}, " +
          s"${right.dataType.simpleString}); fractional coordinates would " +
          "truncate — CAST explicitly if floor semantics are intended")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(a.asInstanceOf[Number].longValue,
      b.asInstanceOf[Number].longValue)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xin, yin) => {
      val x = ctx.freshName("hx")
      val y = ctx.freshName("hy")
      val d = ctx.freshName("hd")
      val s = ctx.freshName("hs")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("ht")
      val mask = HilbertIndex.Mask
      s"""
         |long $x = $xin & ${mask}L;
         |long $y = $yin & ${mask}L;
         |long $d = 0L;
         |for (long $s = ${1L << (HilbertIndex.Bits - 1)}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = ${mask}L - $x; $y = ${mask}L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override def prettyName: String = "hilbert_index"
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)
}

object HilbertIndex {
  /** Bits per dimension; grid side N = 2^Bits. The oracle's CTE chain and
    * the ops-layer constants derive from this single value.
    */
  val Bits = 16
  val Mask: Long = (1L << Bits) - 1

  /** The same walk as the codegen body, for interpreted eval and specs. */
  def compute(x0: Long, y0: Long): Long = {
    var x = x0 & Mask
    var y = y0 & Mask
    var d = 0L
    var s = 1L << (Bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = Mask - x; y = Mask - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
