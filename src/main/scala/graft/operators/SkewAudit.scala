package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-key skew profiling — the measurement a pipeline runs BEFORE
  * choosing a join strategy: per candidate key column, how many rows, how
  * many distinct keys, how heavy is the heaviest key, and the skew ratio
  * (heaviest key's row count over the mean per-key row count). A ratio
  * near 1 means hash partitioning balances; a large ratio predicts one
  * straggler reducer and argues for `JoinStrategies.skewSplitJoin` /
  * salting on that key.
  *
  * Scale shape: one map-side-combined aggregation per profiled column —
  * the per-key counts collapse to a single summary row before leaving the
  * shuffle, so the audit costs one pass per column regardless of corpus
  * size. The ratio is computed as (max * n_keys) / n_rows in integer
  * arithmetic up to the final double division, floored to 4 decimals —
  * engine-exact.
  *
  * The reference throttles per-table deletes but never measures key
  * distribution (`osarchiver/source/db.py:237-277` pages blindly on the
  * PK); this is part of the SURVEY.md 2.8 scale surface.
  */
object SkewAudit {

  /** One summary row per profiled column:
    * (key_col, n_rows, n_keys, max_key_rows, skew_ratio). */
  def keyProfile(df: DataFrame, keyCols: Seq[String]): DataFrame =
    keyCols.map { c =>
      df.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          count(lit(1)).as("n_keys"),
          max(col("cnt")).as("max_key_rows"))
        .select(lit(c).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_key_rows"),
          (floor((col("max_key_rows") * col("n_keys")).cast("double") /
            col("n_rows") * 10000.0) / 10000.0).as("skew_ratio"))
    }.reduce(_ unionAll _)
}
