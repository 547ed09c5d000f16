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
}
