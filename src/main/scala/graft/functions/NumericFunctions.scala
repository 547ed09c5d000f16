package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

object NumericFunctions {

  /** Deterministic fixed-precision truncation: floor(x * 10^k) / 10^k.
    *
    * Used instead of `round` wherever a double crosses the engine boundary:
    * `round` half-way semantics differ subtly between Spark (BigDecimal
    * HALF_UP on the decimal expansion) and DuckDB, so a value that prints as
    * x.xxxx5 can round differently. floor over identical IEEE doubles is
    * bit-stable in every engine, which is what the oracle hash needs.
    */
  def fround(c: Column, k: Int): Column = {
    val p = math.pow(10, k)
    floor(c * lit(p)) / lit(p)
  }

  /** Apply a trained linear model: sigmoid(w · features + bias).
    *
    * The distributed shape of "run a (linear) quality classifier over the
    * corpus": the model is a handful of literals folded into one codegen'd
    * projection — no broadcast state, no UDF, engine-portable arithmetic.
    * (fastText-style document classifiers reduce to exactly this once the
    * embedding average is a column.) */
  def linearModelScore(
      features: Seq[Column], weights: Seq[Double], bias: Double): Column = {
    require(features.length == weights.length,
      s"${features.length} features vs ${weights.length} weights")
    val z = features.zip(weights)
      .map { case (f, w) => f * lit(w) }
      .foldLeft(lit(bias): Column)(_ + _)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
