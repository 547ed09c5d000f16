package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — rows not dominated on a
  * (minimize, maximize) criterion pair: row b is dominated if some row a
  * has `minCol_a <= minCol_b` and `maxCol_a >= maxCol_b` with at least
  * one strict. The multi-objective "best tradeoffs" query (cheapest
  * part per size class, highest-quality doc per token budget) that naive
  * SQL writes as a quadratic NOT EXISTS self-join.
  *
  * Plan: group to one row per distinct minimize-value (max of the
  * maximize column — only the group's best can be undominated), then two
  * running maxima over the minimize order decide dominance in O(n log n):
  *  - `run_lt`  = best maximize among STRICTLY smaller minimize values
  *    (rows-frame ending 1 preceding; one row per group, so row frames
  *    express strict value inequality exactly — no double-typed RANGE
  *    offsets needed);
  *  - `run_le`  = best maximize among <= values (frame ending at current).
  * b survives iff `run_lt < maxCol_b` (nothing strictly cheaper is as
  * good) and `run_le <= maxCol_b` (nothing as cheap is strictly better).
  * Output is identical to the NOT EXISTS form — the oracle runs that.
  *
  * Scale note: the running maxima sort a ONE-ROW-PER-DISTINCT-VALUE frame
  * (the grouped table), not the input; the dominance join back to full
  * rows is a broadcastable equi-join on the minimize value. A truly
  * un-groupable continuous key at 100 TB takes the standard
  * partition-then-merge skyline: per-partition frontiers (this same
  * window), union, one final frontier pass — each step this operator.
  */
object Skyline {

  /** Skyline rows of `df` minimizing `minCol`, maximizing `maxCol`.
    * Returns the input rows (all columns) that are on the frontier. */
  def pareto2(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    val grouped = df.groupBy(col(minCol))
      .agg(max(col(maxCol)).as("__gmax"))
    val byMin = Window.orderBy(col(minCol))
    val frontier = grouped
      .withColumn("__run_lt",
        max(col("__gmax")).over(byMin.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__run_le",
        max(col("__gmax")).over(byMin.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(
        (col("__run_lt").isNull || col("__run_lt") < col("__gmax")) &&
          col("__run_le") <= col("__gmax"))
      .select(col(minCol), col("__gmax"))
    df.join(frontier,
        df(minCol) === frontier(minCol) && col(maxCol) === col("__gmax"),
        "left_semi")
  }
}
