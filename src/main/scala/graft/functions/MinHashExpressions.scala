package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash signature: `minhash_sig(array<long>) -> array<long>`.
  *
  * Semantically identical to the higher-order-function form
  * `transform(sequence(0, N-1), j -> array_min(transform(hh, h -> xxhash64(j, h))))`
  * — bit-for-bit, because the per-(seed, hash) mix is the same composition
  * Spark's `xxhash64(j, h)` evaluates: `XXH64.hashLong(h, XXH64.hashInt(j, 42))`,
  * with the 64 per-seed prefixes precomputed once.
  *
  * Rationale (100 TB posture): the HOF form walks two nested lambda trees and
  * allocates an intermediate N-element array per (document, seed) — measured
  * as the single most expensive expression in the engine (40% of bench
  * total). This expression is one primitive `long` loop in whole-stage
  * codegen with a single output allocation per document: O(shingles × N)
  * fused multiply-rotate hashes and nothing else.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }

  // seed-j prefix of Spark's xxhash64(j, h): hashInt folds j into seed 42
  // first, then hashLong folds each candidate hash. Computing the prefixes
  // once hoists half the mixing out of the per-shingle loop.
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(j => XXH64.hashInt(j, 42L))

  override def nullSafeEval(input: Any): Any = {
    val hh = input.asInstanceOf[ArrayData]
    val n = hh.numElements()
    val out = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hh.getLong(i)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashLong(h, seeds(j))
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    val xxh = classOf[XXH64].getName
    nullSafeCodeGen(ctx, ev, hh => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |int $n = $hh.numElements();
         |long[] $out = new long[${numHashes}];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $hh.getLong($i);
         |  for (int $j = 0; $j < ${numHashes}; $j++) {
         |    long $v = $xxh.hashLong($h, $seedsRef[$j]);
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override def prettyName: String = "minhash_sig"
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}
