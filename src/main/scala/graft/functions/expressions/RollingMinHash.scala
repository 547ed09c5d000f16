package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp-Rabin document fingerprint: the minimum polynomial rolling hash over
  * all `width`-byte windows of the input (base 31, mod 1e9+7).
  *
  * One pass over the bytes with an O(1) rolling update per position — the
  * winnowing-style fingerprint primitive for shift-robust near-dup detection
  * at corpus scale (no per-window substring allocation, unlike the md5
  * min-shingle variant). Codegen emits a single static call; the loop runs
  * as plain JVM primitives.
  *
  * Windows shorter than `width` (input shorter than the window) are
  * zero-padded on the right, matching `ascii('') = 0` semantics in the SQL
  * oracle formulation. Exact integer arithmetic — bit-identical across
  * engines.
  */
case class RollingMinHash(child: Expression, width: Int) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.RollingMinHash.compute($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingMinHash {
  final val Base = 31L
  final val Mod = 1000000007L

  def compute(s: UTF8String, width: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    // highest-position base power for the rolling removal: Base^(width-1) mod Mod
    var topPow = 1L
    var i = 0
    while (i < width - 1) { topPow = topPow * Base % Mod; i += 1 }
    def at(j: Int): Long = if (j < n) (bytes(j) & 0xffL) else 0L
    // first window (right-zero-padded when n < width)
    var h = 0L
    i = 0
    while (i < width) { h = (h * Base + at(i)) % Mod; i += 1 }
    var min = h
    var start = 1
    while (start <= n - width) {
      h = ((h - at(start - 1) * topPow % Mod + Mod) % Mod * Base + at(start + width - 1)) % Mod
      if (h < min) min = h
      start += 1
    }
    min
  }
}
