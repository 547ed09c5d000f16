package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** n-token shingles of a token array, space-joined — native replacement
  * for the `transform(sequence(...), slice+array_join)` (+ optional
  * `array_distinct`) composition, whose interpreted higher-order lambdas
  * dominate shingling cost at corpus scale (measured ~3x on the dedup
  * pipeline's hottest narrow stage).
  *
  * `distinct = true` (the dedup form) keeps first occurrences only;
  * `distinct = false` preserves the full multiset in positional order —
  * what repetition/boilerplate metrics count. Byte-identical join
  * semantics (single-space separator) to the composed form and to the SQL
  * oracle's `array_to_string(t[i:i+n-1], ' ')`.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.WordShingles.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val size = tokens.numElements()
    if (size < n) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet preserves first-occurrence order; the non-distinct form
    // appends every window
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]()
      else new java.util.ArrayList[UTF8String](size - n + 1)
    var i = 0
    while (i <= size - n) {
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = tokens.getUTF8String(i + j)
        if (j < n - 1) parts(2 * j + 1) = Space
        j += 1
      }
      out.add(UTF8String.concat(parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }
}
