package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization for dedup keys and corpus joins: Unicode
  * NFC composition, ROOT-locale lowercasing, and whitespace-run collapse
  * (any run of ASCII whitespace becomes one ASCII space; leading and
  * trailing runs are dropped).
  *
  * Whitespace contract: the collapsed class is exactly RE2's `\s` —
  * `[\t\n\f\r ]` — NOT full Unicode whitespace. Unicode spaces (U+2003
  * em-space, U+2028 line separator, U+1680...) pass through untouched so
  * both engines agree byte-for-byte; callers wanting Unicode-space folding
  * should pre-map those code points explicitly on both sides.
  *
  * Why an Expression and not three nested built-ins: Spark has `lower`
  * and `regexp_replace` but NO NFC normalizer, and a dedup key that skips
  * NFC treats "é" (U+00E9) and "é" (combining accent) as different
  * documents — the classic silent near-dup miss in multilingual corpora.
  * One codegen'd static call keeps the scan inside whole-stage codegen
  * and makes one pass over the string instead of three.
  *
  * Engine parity: DuckDB expresses the same value as
  * `trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))`;
  * both sides are exercised by the tx29 oracle. ROOT-locale
  * `toLowerCase` matches utf8proc lowercasing on everything without
  * locale-specific casing (the documented contract; Turkish dotted-I
  * corpora should lowercase before ingestion).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.NormalizeText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  def compute(input: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(
      input.toString, java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var pendingSpace = false
    var i = 0
    while (i < lower.length) {
      val cp = lower.codePointAt(i)
      // exactly RE2's \s class — see the whitespace contract above
      val isWs = cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'
      if (isWs) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
