package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_prefix60(s)`: the top 60 bits of md5(s) as a BIGINT — the KMV
  * sketch's hash, computed natively. Bit-identical to the composed form
  * `conv(substr(md5(s), 1, 15), 16, 10)` (15 hex digits = the first 7.5
  * digest bytes = the big-endian first-8-bytes long `>>> 4`), which is
  * also exactly what the DuckDB oracle computes via
  * `('0x' || substr(md5(s), 1, 15))::BIGINT`. The composed form
  * materializes a 32-char hex string, substrings it, and re-parses it
  * through Conv's radix machinery PER ROW; this expression goes digest
  * bytes → long directly with a thread-local reused MessageDigest —
  * measured ~2.6× cheaper on the profiler's 6-hashes-per-row scan at the
  * sf10x probe (53.7 → 20.8 s), which matters at 100 TB where the sketch
  * pass is md5-compute-bound.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    Md5Prefix60.hash60(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix60.hash60($c)")

  override def prettyName: String = "md5_prefix60"
  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5 over the UTF-8 bytes, as an unsigned-safe long. */
  def hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    val top8 =
      ((b(0) & 0xffL) << 56) | ((b(1) & 0xffL) << 48) |
        ((b(2) & 0xffL) << 40) | ((b(3) & 0xffL) << 32) |
        ((b(4) & 0xffL) << 24) | ((b(5) & 0xffL) << 16) |
        ((b(6) & 0xffL) << 8) | (b(7) & 0xffL)
    top8 >>> 4
  }
}
