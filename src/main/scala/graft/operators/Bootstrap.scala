package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic subsampling confidence intervals (Politis & Romano 1994,
  * "Large Sample Confidence Regions Based on Subsamples") — uncertainty
  * quantification for corpus-level statistics: is the observed mean doc
  * quality a stable property of the corpus or noise? Each of `replicates`
  * half-samples includes a row iff an md5 parity on (replicate, id) says
  * so — RNG-free, so the SAME replicate membership reproduces on any
  * engine, partitioning, or rerun, and a SQL oracle can check the interval
  * bit-for-bit (the same discipline as [[Sampling]]'s md5 buckets).
  *
  * Scale shape: the replicate fan-out is a constant-factor row
  * multiplication (x replicates/2 after the parity filter) into ONE
  * map-side-combined aggregation keyed on the replicate id; the quantile
  * step then orders `replicates` rows — a constant-size window, never a
  * corpus sort. Integer sums up to a single floored division per
  * replicate.
  */
object Bootstrap {

  /** 95%-ish subsampling interval for the mean of `valueCol` (integral
    * column): one row (n_replicates, est_mean, lo95, hi95), where lo/hi
    * are the 2nd-smallest and 2nd-largest replicate means — the
    * (1/R, 1-1/R) empirical quantiles of the replicate distribution. */
  def subsampleMeanCI(df: DataFrame, idCol: String, valueCol: String,
      replicates: Int = 32): DataFrame = {
    require(replicates >= 4, "need at least 4 replicates for quantiles")
    val rep = df
      .select(col(idCol).cast("string").as("id"),
        col(valueCol).cast("long").as("v"))
      .select(col("id"), col("v"),
        explode(sequence(lit(0), lit(replicates - 1))).as("r"))
      // md5 parity membership: deterministic half-sample per replicate
      .filter(pmod(conv(substring(md5(concat(col("r").cast("string"),
        lit(":"), col("id"))), 1, 8), 16, 10).cast("long"), lit(2)) === 0)
    val means = rep.groupBy("r")
      .agg((floor(sum(col("v")).cast("double") / count(lit(1)) * 10000.0)
        / 10000.0).as("m"))
    val ranked = means.withColumn("rn",
      row_number().over(Window.orderBy(col("m"), col("r"))))
    val overall = df.agg(
      (floor(sum(col(valueCol).cast("long")).cast("double") /
        count(lit(1)) * 10000.0) / 10000.0).as("est_mean"))
    // quantiles via a single always-one-row aggregate, NOT a crossJoin of
    // filtered rows: on degenerate input an empty half-sample drops its
    // replicate from the groupBy, the rn = replicates-1 row may then not
    // exist, and a filter+crossJoin would yield ZERO rows while a SQL
    // scalar subquery yields one row with NULL bounds. The aggregate
    // keeps the row and lets a missing quantile surface as a loud NULL
    // — identical on both engines.
    val q = ranked.agg(
      max(when(col("rn") === 2, col("m"))).as("lo95"),
      max(when(col("rn") === replicates - 1, col("m"))).as("hi95"))
    overall
      .crossJoin(broadcast(q))
      .select(lit(replicates).as("n_replicates"), col("est_mean"),
        col("lo95"), col("hi95"))
  }
}
