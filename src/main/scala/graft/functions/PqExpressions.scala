package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization kernels for [[graft.ops.SimilarityOps.annPq]].
  *
  * Both are bit-identical to the higher-order-function forms pinned in
  * PqExpressionsSpec; the HOF forms walk M×K interpreted lambda trees and
  * allocate a (dist, code) struct per candidate centroid, which made the
  * corpus encode the dominant cost of the PQ path (measured ~8 s of a 9 s
  * ann_pq run at sf0.1). These run as primitive double loops in whole-stage
  * codegen.
  */

/** `pq_encode(array<double>) -> array<int>`: per subspace j, the index of
  * the centroid minimizing ‖u_sub − c‖², ranked as `cn2 − 2·⟨u_sub, c⟩`
  * (the ‖u_sub‖² term is constant across candidates) with the smallest
  * index winning ties — the exact ranking and tiebreak of the reference
  * HOF form (`array_min` over (d, c) structs).
  *
  * The codebook rides the expression (Kryo-serialized to executors, a
  * broadcast-variable-sized constant of M×K×subDim doubles), so this is
  * constructed per corpus via a session-registry builder closure rather
  * than a global registration.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = codebooks.length
  private val k = codebooks(0).length
  private val subDim = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // null also for vectors SHORTER than m*subDim: UnsafeArrayData.getDouble
  // has no bounds check, so reading past numElements would return garbage
  // codes silently — see PqEncode.encode
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${other.sql}")
  }

  // flat(j*k + c) = centroid; cn2(j*k + c) = its squared norm, summed in
  // index order (matches the Scala `.map(x => x*x).sum` the HOF literal uses)
  @transient private lazy val flat: Array[Array[Double]] =
    codebooks.flatten
  @transient private lazy val cn2: Array[Double] =
    flat.map(c => { var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s })

  override def nullSafeEval(input: Any): Any =
    PqEncode.encode(input.asInstanceOf[ArrayData], flat, cn2, m, k, subDim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[][]")
    val cn2Ref = ctx.addReferenceObj("pqCn2", cn2, "double[]")
    nullSafeCodeGen(ctx, ev, u =>
      s"""
         |${ev.value} = graft.functions.PqEncode.encode($u, $flatRef, $cn2Ref, $m, $k, $subDim);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin)
  }

  override def prettyName: String = "pq_encode"
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Returns null for vectors shorter than the trained dimensionality —
    * never reads past the input (out-of-bounds `getDouble` on
    * UnsafeArrayData is unchecked and would produce garbage codes).
    */
  def encode(u: ArrayData, flat: Array[Array[Double]], cn2: Array[Double],
             m: Int, k: Int, subDim: Int): GenericArrayData = {
    if (u.numElements() < m * subDim) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val ctr = flat(j * k + c)
        var dot = 0.0
        var t = 0
        while (t < subDim) { dot += u.getDouble(base + t) * ctr(t); t += 1 }
        val d = cn2(j * k + c) - 2.0 * dot
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `pq_adc(array<int>, array<array<double>>) -> double`: the asymmetric
  * distance Σ_j dtab[j][codes[j]] — M table lookups and adds per corpus
  * row, the PQ query-scan kernel. Bit-identical to the interpreted
  * `aggregate(sequence(0, M-1), 0D, (acc, j) -> acc + dtab[j][codes[j]])`
  * left fold (same index order, same IEEE adds).
  */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null for null/out-of-range code elements — the TOLERANT `get()`
  // indexing semantics (`get(dtab[j], NULL/oob)` is NULL and poisons the
  // aggregate). Spark 4's strict `[]` would THROW on an out-of-range
  // code; an ADC scan kernel must degrade to null, not kill the query,
  // on a corrupt code.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<array<double>>), got (${l.sql}, ${r.sql})")
  }

  override def nullSafeEval(codes: Any, dtab: Any): Any =
    PqAdc.adc(codes.asInstanceOf[ArrayData], dtab.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, d) => {
      val boxed = ctx.freshName("adc")
      s"""
         |java.lang.Double $boxed = graft.functions.PqAdc.adc($c, $d);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })

  override def prettyName: String = "pq_adc"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}

object PqAdc {
  /** Boxed so null can signal "some lookup was null/out-of-range" — the
    * same result the HOF fold produces on those inputs (SQL array indexing
    * past the end is NULL, and NULL poisons the sum).
    */
  def adc(codes: ArrayData, dtab: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (dtab.numElements() < m) return null
    var s = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      val row = dtab.getArray(j)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      s += row.getDouble(c)
      j += 1
    }
    s
  }
}
