package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles WITHOUT a global sort — the
  * histogram-bisection scale path.
  *
  * `percentile()` (tx7's oracle baseline) holds per-value state
  * proportional to the number of distinct values and `orderBy` ranks pay
  * a full-data range exchange; neither survives a 100 TB column. The
  * standard scale answer is bisection: histogram the value range into
  * equal-width buckets (map-side combined agg, output is |buckets| rows
  * regardless of data size), locate the bucket holding the k-th value
  * from the cumulative counts, recurse into that bucket, and only ever
  * sort the final sliver. Two levels of 4096 buckets bound the sliver at
  * n / 4096^2 rows (~60 K rows even at 10^12 input rows), so the one
  * window sort at the end is always partition-local in practice.
  *
  * Everything is lazy and integer-exact:
  *  - target rank k = ceil(n * num / den) per requested quantile,
  *    computed from a 1-row count frame (exact rational, no doubles);
  *  - bucket ids are floor divisions of (x - min); the level-2 id is a
  *    global fine id at nBuckets^2 resolution whose floor-div parent is
  *    EXACTLY the level-1 id (nested floor-division identity), so the
  *    two levels can never disagree on bucket boundaries;
  *  - the corpus is scanned once per level plus once for the final pick
  *    (each scan is embarrassingly parallel; the only exchanges carry
  *    bucket-count rows and the final sliver);
  *  - ties are a non-issue: the k-th smallest VALUE is well-defined
  *    under duplicates whatever order row_number visits them.
  *
  * Domain requirement: (max - min + 1) * nBuckets^2 must fit in a Long —
  * holds for any realistic integer-unit measure (cents at 2^63 /
  * 4096^2 ~ 5.5e11 dollars of range).
  *
  * Reference context: osarchiver never computes quantiles (its only
  * ordering is the keyset-paginated PK scan, `source/db.py`); this is
  * part of the north-star analytics surface (SURVEY.md §2.8).
  *
  * Output: one row per requested quantile — (q, k, value), where k is
  * the 1-based target rank and value the exact k-th smallest.
  */
object Quantile {

  /** @param quantiles (label, numerator, denominator) — e.g.
    *                  ("p90", 9, 10) targets rank ceil(9n/10). */
  def exactQuantiles(df: DataFrame, valueCol: String,
      quantiles: Seq[(String, Long, Long)],
      nBuckets: Int = 4096): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall { case (_, nu, de) =>
      nu >= 0 && de > 0 && nu <= de }, "quantiles must be rationals in [0,1]")
    val nB = nBuckets.toLong
    // persisted (r11): stats, the level-1 histogram and both fine-level
    // consumers all scan v — unpersisted, each re-ran the CALLER'S
    // upstream plan (q94 re-scanned the fact table 4x; dq11 worse). The
    // cached frame is the narrow (x) projection, the cheapest thing the
    // bisection can hold; at scale this is the standard "materialize the
    // measure column once, histogram it repeatedly" shape.
    val v = PlanPersist("quantile.v",
      df.select(col(valueCol).cast("long").as("x"))
        .filter(col("x").isNotNull))
    val stats = v.agg(min(col("x")).as("mn"), max(col("x")).as("mx"),
      count(lit(1)).as("n"))

    // level-1 bucket counts: one corpus scan, exchange carries <= nB rows
    val coarse = v.crossJoin(broadcast(stats))
      .select(expr(s"CASE WHEN mx = mn THEN 0L ELSE (x - mn) * $nB div " +
        "(mx - mn + 1) END").as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
    val cum = coarse
      .withColumn("cum_thru", sum(col("c")).over(Window.orderBy(col("b"))))
      .withColumn("cum_below", col("cum_thru") - col("c"))

    // target ranks from the 1-row stats frame: k = ceil(n * nu / de)
    val targets = stats.select(explode(array(quantiles.map {
        case (lb, nu, de) => struct(lit(lb).as("q"),
          expr(s"greatest(1L, (n * $nu + $de - 1) div $de)").as("k"))
      }: _*)).as("t"))
      .select(col("t.q").as("q"), col("t.k").as("k"))
    val tb1 = targets.join(cum,
        col("k") > col("cum_below") && col("k") <= col("cum_thru"))
      .select(col("q"), col("k"), col("b"), col("cum_below"))

    // level-2: re-scan filtered (map-side, broadcast predicate) to the
    // target buckets, histogram them at fine resolution
    val fine = v.crossJoin(broadcast(stats))
      .select(col("x"),
        expr(s"CASE WHEN mx = mn THEN 0L ELSE (x - mn) * $nB * $nB div " +
          "(mx - mn + 1) END").as("f"))
      .withColumn("b", expr(s"f div $nB"))
    val cum2 = fine
      .join(broadcast(tb1), Seq("b"))
      .groupBy(col("q"), col("f"))
      .agg(count(lit(1)).as("c2"), first(col("k")).as("k"),
        first(col("cum_below")).as("cum_below"))
      .withColumn("cum2_thru", col("cum_below") + sum(col("c2"))
        .over(Window.partitionBy(col("q")).orderBy(col("f"))))
      .withColumn("cum2_below", col("cum2_thru") - col("c2"))
    val tb2 = cum2
      .filter(col("k") > col("cum2_below") && col("k") <= col("cum2_thru"))
      .select(col("q"), col("k"), col("f").as("tf"), col("cum2_below"))

    // final pick: the sliver (one fine bucket per quantile, n / nB^2
    // rows each) sorts partition-locally under the per-q window
    fine.join(broadcast(tb2), col("f") === col("tf"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q")).orderBy(col("x"))))
      .filter(col("rn") === col("k") - col("cum2_below"))
      .select(col("q"), col("k"), col("x").as("value"))
  }

  /** Per-group exact quantiles — the grouped form of [[exactQuantiles]]
    * ("p99 per category" at 100 TB): the same two-level histogram
    * bisection with the group key threaded through every stage. All
    * histogram frames are |groups| * nBuckets rows; the group-stats
    * frame (|groups| rows) rides broadcast joins, so the corpus pays
    * map-side scans only, and the final sliver sort is per (group,
    * quantile) — n_g / nBuckets^2 rows each. `percentile()` holds
    * per-distinct-value state per group and a grouped sort re-ranges
    * everything; neither shape survives a wide group.
    *
    * Output: (g, q, k, value) — one row per (group, quantile); groups
    * arrive from the data, empty groups don't exist by construction. */
  def exactQuantilesByGroup(df: DataFrame, groupCol: String,
      valueCol: String, quantiles: Seq[(String, Long, Long)],
      nBuckets: Int = 4096): DataFrame = {
    require(quantiles.nonEmpty && quantiles.forall { case (_, nu, de) =>
      nu >= 0 && de > 0 && nu <= de }, "quantiles must be rationals in [0,1]")
    val nB = nBuckets.toLong
    // persisted (r11): same rationale as exactQuantiles — four consumers
    // (group stats, level-1 histogram, fine histogram, final pick) each
    // re-ran the caller's upstream unpersisted; for q99 that upstream is
    // a user-partitioned lag WINDOW over the fact table, re-paid per
    // consumer (plan audit: 7 parquet scans -> 1).
    val v = PlanPersist("quantile.vg",
      df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("x"))
        .filter(col("x").isNotNull))
    val stats = v.groupBy("g").agg(min(col("x")).as("mn"),
      max(col("x")).as("mx"), count(lit(1)).as("n"))

    val coarse = v.join(broadcast(stats), Seq("g"))
      .select(col("g"), expr(s"CASE WHEN mx = mn THEN 0L ELSE " +
        s"(x - mn) * $nB div (mx - mn + 1) END").as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("c"))
    val cum = coarse
      .withColumn("cum_thru", sum(col("c")).over(
        Window.partitionBy(col("g")).orderBy(col("b"))))
      .withColumn("cum_below", col("cum_thru") - col("c"))

    val targets = stats.select(col("g"), explode(array(quantiles.map {
        case (lb, nu, de) => struct(lit(lb).as("q"),
          expr(s"greatest(1L, (n * $nu + $de - 1) div $de)").as("k"))
      }: _*)).as("t"))
      .select(col("g"), col("t.q").as("q"), col("t.k").as("k"))
    val tb1 = targets.join(cum, Seq("g"))
      .filter(col("k") > col("cum_below") && col("k") <= col("cum_thru"))
      .select(col("g"), col("q"), col("k"), col("b"), col("cum_below"))

    val fine = v.join(broadcast(stats), Seq("g"))
      .select(col("g"), col("x"),
        expr(s"CASE WHEN mx = mn THEN 0L ELSE (x - mn) * $nB * $nB div " +
          "(mx - mn + 1) END").as("f"))
      .withColumn("b", expr(s"f div $nB"))
    val cum2 = fine
      .join(broadcast(tb1), Seq("g", "b"))
      .groupBy(col("g"), col("q"), col("f"))
      .agg(count(lit(1)).as("c2"), first(col("k")).as("k"),
        first(col("cum_below")).as("cum_below"))
      .withColumn("cum2_thru", col("cum_below") + sum(col("c2")).over(
        Window.partitionBy(col("g"), col("q")).orderBy(col("f"))))
      .withColumn("cum2_below", col("cum2_thru") - col("c2"))
    val tb2 = cum2
      .filter(col("k") > col("cum2_below") && col("k") <= col("cum2_thru"))
      .select(col("g"), col("q"), col("k"), col("f").as("tf"),
        col("cum2_below"))

    fine.join(broadcast(tb2),
        col("f") === col("tf") && fine("g") === tb2("g"))
      .drop(tb2("g"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g"), col("q")).orderBy(col("x"))))
      .filter(col("rn") === col("k") - col("cum2_below"))
      .select(col("g"), col("q"), col("k"), col("x").as("value"))
  }

  /** Winsorization report: clamp the column at its EXACT lo/hi quantiles
    * (from [[exactQuantiles]] — no global sort) and report what clamping
    * does to the mean — the outlier-robustness pass a feature pipeline
    * runs before normalizing anything, with the clip bounds it should
    * persist alongside the model.
    *
    * Fully lazy: the two quantile rows pivot into a 1-row bounds frame
    * broadcast over one final corpus scan. Integer-exact; means are
    * floored divisions (sum must fit a Long — true for any sane integer
    * unit, the same contract every micro-unit op here carries).
    *
    * Output (1 row): (lo, hi, n, n_low, n_high, mean_value,
    * w_mean_value). */
  def winsorizeReport(df: DataFrame, valueCol: String,
      lo: (String, Long, Long), hi: (String, Long, Long),
      nBuckets: Int = 4096): DataFrame = {
    val v = df.select(col(valueCol).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val bounds = exactQuantiles(v, "x", Seq(lo, hi), nBuckets)
      .agg(max(when(col("q") === lo._1, col("value"))).as("lo"),
        max(when(col("q") === hi._1, col("value"))).as("hi"))
    v.crossJoin(broadcast(bounds))
      .select(col("x"), col("lo"), col("hi"),
        greatest(col("lo"), least(col("hi"), col("x"))).as("w"))
      .agg(min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        count(lit(1)).as("n"),
        count(when(col("x") < col("lo"), 1)).as("n_low"),
        count(when(col("x") > col("hi"), 1)).as("n_high"),
        expr("sum(x) div count(1)").as("mean_value"),
        expr("sum(w) div count(1)").as("w_mean_value"))
  }
}
