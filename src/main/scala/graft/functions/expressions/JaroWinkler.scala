package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity in [0, 1] — the fuzzy-matching scalar
  * Spark lacks (it ships only `levenshtein`), needed for entity-resolution
  * style dedup where edit distance over-penalizes transpositions.
  *
  * Standard Jaro (bounded match window max(|a|,|b|)/2 - 1, half-count
  * transpositions) with the Winkler common-prefix bonus (up to 4 chars,
  * weight 0.1) applied only when the Jaro score exceeds 0.7 — the same
  * convention DuckDB/RapidFuzz use, so results are oracle-checkable.
  * Either input empty yields 0.0 (also the DuckDB convention; note NOT
  * 1.0 for two empties).
  *
  * O(|a|·|b|) worst case but window-bounded; codegen emits one static
  * call so the scan stays inside whole-stage codegen — pair generation
  * should still be blocked (equi-join on a blocking key) BEFORE this
  * verifies, exactly like the bounded-levenshtein path
  * (`graft.plans.LevenshteinPrefilter`).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.expressions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  def compute(a: UTF8String, b: UTF8String): Double = {
    // UTF-16 char comparison; fixture/entity data is BMP text. (DuckDB
    // compares codepoints — identical on anything without surrogates.)
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0

    val bound = math.max(0, math.max(l1, l2) / 2 - 1)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - bound)
      val jEnd = math.min(l2, i + bound + 1)
      var found = false
      while (j < jEnd && !found) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0

    // transpositions: matched chars, in order, compared pairwise
    var trans = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }

    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - trans / 2) / m) / 3.0

    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(l1, l2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix))
      prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
