package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series structure extraction over event streams — the classical
  * decomposition and changepoint primitives an analytics pipeline runs on
  * per-key activity counts.
  *
  * Scale shape: everything partitions by the series key (event_type) —
  * windows are per-key sorted scans, never a global sort, and per-key
  * history is bounded by the bucket count, not the event count (the
  * bucketing aggregation is map-side combined). All scores reduce to
  * integer arithmetic or a single floored division so results are engine-
  * and partitioning-exact.
  */
object TimeSeries {

  private def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))

  /** Classical additive seasonal decomposition of hourly activity:
    * seasonal = the series' mean count at that hour-of-day, trend = a
    * centered 25-hour moving average, resid = n - seasonal - trend.
    * Means are explicit floored divisions of integer sums (never a bare
    * avg(), whose accumulation order an engine may choose freely).
    * Output: (event_type, h, n, seasonal, trend, resid). */
  def seasonalDecompose(events: DataFrame): DataFrame = {
    val hc = hourly(events)
    val seasonal = hc.groupBy(col("event_type"),
        hour(col("h")).as("hod"))
      .agg((floor(sum(col("n")).cast("double") / count(lit(1)) * 10000.0)
        / 10000.0).as("seasonal"))
    val wTrend = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(-12, 12)
    hc.withColumn("hod", hour(col("h")))
      .join(broadcast(seasonal), Seq("event_type", "hod"))
      .withColumn("trend",
        floor(sum(col("n")).over(wTrend).cast("double") /
          count(col("n")).over(wTrend) * 10000.0) / 10000.0)
      .select(col("event_type"), col("h"), col("n"),
        col("seasonal"), col("trend"),
        (floor((col("n") - col("seasonal") - col("trend")) * 10000.0)
          / 10000.0).as("resid"))
  }

  /** CUSUM changepoint detection per series (Page 1954): the bucket where
    * the cumulative deviation from the series mean peaks — the most likely
    * single level-shift point. To stay in integers the statistic is scaled
    * by the bucket count: S_k = T * cumsum_k - k * total (= T^2 * the
    * usual mean-centered CUSUM), and the changepoint is argmax |S_k| with
    * ties to the earliest bucket. Output one row per series:
    * (event_type, cp_h, s_abs) with s_abs the scaled peak deviation. */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    val hc = hourly(events)
    val wOrd = Window.partitionBy("event_type").orderBy("h")
    val wAll = Window.partitionBy("event_type")
    val scored = hc
      .withColumn("cum", sum(col("n")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("total", sum(col("n")).over(wAll))
      .withColumn("t_buckets", count(lit(1)).over(wAll))
      .withColumn("s_abs",
        abs(col("t_buckets") * col("cum") - col("k") * col("total")))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type")
          .orderBy(col("s_abs").desc, col("h"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("h").as("cp_h"), col("s_abs"))
  }
}
