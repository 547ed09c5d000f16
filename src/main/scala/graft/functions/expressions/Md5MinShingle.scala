package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Minimum md5 (lowercase hex) over all `width`-character shingles of the
  * input — the winnowing-style content fingerprint, computed in one pass
  * with a per-thread reused MessageDigest and zero per-window object
  * churn.
  *
  * BIT-IDENTICAL to the declarative formulation it replaces (r12):
  *
  *   array_min(transform(sequence(1, greatest(length(nm) - width + 1, 1)),
  *     i => md5(substr(nm, i, width))))
  *
  * which allocated a start-index array, a substring UTF8String, a digest
  * and a 32-char hex string PER WINDOW — ~n windows per doc, the
  * dominant cost of the tx3 corpus pass. Equivalences that make the
  * rewrite exact: the input is the [a-z0-9 ]-normalized text, so
  * characters == bytes (substr-by-char == slice-by-byte); min over hex
  * strings == unsigned byte order over raw digests (the nibble-to-hex
  * map is monotone), so the comparison runs on the 16 digest bytes and
  * hex-encodes once at the end; inputs shorter than `width` hash the
  * whole (possibly empty) input exactly like substr(1, width) does.
  *
  * ASCII PRECONDITION: offsets are byte offsets. Callers must pass text
  * whose multi-byte codepoints have already been normalized away
  * ([[graft.functions.TextFunctions.fingerprint]] feeds the
  * regexp-normalized column, which is pure [a-z0-9 ] by construction).
  */
case class Md5MinShingle(child: Expression, width: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    Md5MinShingle.compute(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.Md5MinShingle.compute($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5MinShingle {
  private val digester =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private val hexChars = "0123456789abcdef".toCharArray

  def compute(s: UTF8String, width: Int): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    val md = digester.get()
    // sequence(1, greatest(n - width + 1, 1)): n >= width gives windows
    // at 0-based starts 0..n-width (each exactly `width` bytes); n < width
    // gives ONE window holding the whole input (substr caps at the end)
    val lastStart = math.max(n - width, 0)
    val best = new Array[Byte](16)
    val cur = new Array[Byte](16)
    var haveBest = false
    var i = 0
    while (i <= lastStart) {
      md.reset()
      md.update(bytes, i, math.min(width, n - i))
      md.digest(cur, 0, 16)
      if (!haveBest || unsignedLess(cur, best)) {
        System.arraycopy(cur, 0, best, 0, 16)
        haveBest = true
      }
      i += 1
    }
    val hex = new Array[Byte](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = hexChars((best(j) >> 4) & 0xf).toByte
      hex(2 * j + 1) = hexChars(best(j) & 0xf).toByte
      j += 1
    }
    UTF8String.fromBytes(hex)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }
}
