package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — an operator Spark lacks natively.
  *
  * For each left row, attach the right row with the greatest right.ts such
  * that right.ts <= left.ts, within the same key. Implemented by composing
  * built-ins (preference (a) of the extension ladder): tag + union both
  * sides, one window pass per key ordered by (ts, side), and
  * `last(..., ignoreNulls)` to carry the latest right value forward.
  *
  * Scale: ONE shuffle on the key (the window partition). No range-condition
  * join (which Spark would plan as a broadcast nested loop and explode),
  * no per-row subqueries. This is the standard log-enrichment shape at
  * 100 TB: billions of left rows, the window state per key is a single
  * carried value.
  *
  * Ties: a right row at exactly left.ts matches (right sorts before left at
  * equal ts) — DuckDB ASOF JOIN inclusive semantics. Multiple right rows at
  * the same (key, ts) must be pre-deduplicated by the caller for
  * deterministic output.
  */
object AsOfJoin {

  /** Left-join shape: every left row kept, `valueCols` from the matched
    * right row (null when no prior right row exists).
    *
    * @param left       left rows, must contain keyCol + tsCol
    * @param right      right rows, must contain keyCol + tsCol + valueCols
    * @param keyCol     equi-join key
    * @param tsCol      event-time column (same name both sides)
    * @param valueCols  right columns to attach, each emitted as `asof_<name>`
    * @param toleranceSeconds  max lookback: a prior right row older than
    *                   this (relative to the left row's ts) does NOT match
    *                   — the bounded-staleness form every market-data /
    *                   log-enrichment pipeline needs. None = unbounded.
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, valueCols: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // the matched right ROW is carried as one struct (never null for right
    // rows, even when every value inside is null) — per-column
    // last(ignoreNulls) would skip null-valued right rows and could stitch
    // values from DIFFERENT right rows, breaking as-of row semantics.
    // The right ts rides inside the struct under a RESERVED field name so
    // the tolerance check applies to the ACTUAL matched row — and so
    // valueCols may itself contain tsCol without creating duplicate
    // struct fields.
    val tsField = "__asof_ts"
    val rowStruct = struct(
      col(tsCol).as(tsField) +: valueCols.map(col): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField(
          tsField, right.schema(tsCol).dataType) +:
          valueCols.map(c => right.schema(c))))
    // side 0 = right (sorts first at equal ts => inclusive match)
    val taggedRight = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"), rowStruct.as("__r")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side"), nullStruct.as("__r")) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__carried", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = toleranceSeconds match {
      case None => carried
      case Some(tol) => carried.withColumn("__carried",
        when(unix_micros(col("__carried").getField(tsField)) >=
          unix_micros(col(tsCol)) - tol * 1000000L, col("__carried"))
          .otherwise(nullStruct))
    }
    matched.select(leftCols.map(col) ++
      valueCols.map(c => col("__carried").getField(c).as(s"asof_$c")): _*)
  }
}
