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

  /** Theil-Sen robust trend estimator (Theil 1950 / Sen 1968) per series:
    * the median of all pairwise slopes over a PRE-AGGREGATED series — the
    * outlier-robust answer to "is this KPI drifting", immune to the
    * single crazy month OLS would chase.
    *
    * Determinism: each pairwise slope is one floored division to
    * micro-units per x step (`1e6 * dy div dx` — signed `div` truncates
    * toward zero identically on every engine), and the median is the
    * LOWER median — the row at rank `(n+1) div 2` under the total order
    * (slope, x1, x2), so ties and even counts resolve identically
    * everywhere.
    *
    * Scale shape: the O(n^2) pair join runs on the AGGREGATE series —
    * bounded by the calendar (84 months of TPC-H dates; `maxBuckets`
    * `require`s the bound holds), never the fact rows, so the pair count
    * is a constant ~3.5k per series regardless of data scale. The heavy
    * work is the one map-side-combined bucketing aggregation.
    *
    * `series`: (key, x BIGINT bucket index, y BIGINT) one row per bucket.
    * Output: (key, n_buckets, n_pairs, median_slope_micro). */
  def theilSen(series: DataFrame, keyCol: String, xCol: String,
      yCol: String, maxBuckets: Int = 1024): DataFrame = {
    val s = series.select(col(keyCol).as("key"),
      col(xCol).cast("long").as("x"), col(yCol).cast("long").as("y"))
    val maxN = s.groupBy("key").count().agg(max("count")).head()
    require(maxN.isNullAt(0) || maxN.getLong(0) <= maxBuckets,
      s"a series exceeds $maxBuckets buckets — aggregate coarser first")
    val pairs = s.as("a").join(s.as("b"),
        col("a.key") === col("b.key") && col("a.x") < col("b.x"))
      .select(col("a.key").as("key"), col("a.x").as("x1"),
        col("b.x").as("x2"),
        expr("(b.y - a.y) * 1000000L div (b.x - a.x)")
          .as("slope_micro"))
    val wOrd = Window.partitionBy("key")
      .orderBy(col("slope_micro"), col("x1"), col("x2"))
    val wAll = Window.partitionBy("key")
    pairs
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .join(s.groupBy("key").agg(count(lit(1)).as("n_buckets")), "key")
      .select(col("key"), col("n_buckets"), col("n_pairs"),
        col("slope_micro").as("median_slope_micro"))
  }

  /** Box-Jenkins sample autocorrelation of an aggregated series — the
    * seasonality/memory diagnostic run before fitting any forecast model
    * (a weekly cycle shows as a rho spike at lag 7).
    *
    * Definition (the classic one, integer-exact, libm-free): center at
    * the floor mean c_t = y_t - (Σy div n); rho_k in ppm is
    * Σ_t c_t * c_{t+k} normalized by the GLOBAL Σ c_t^2 — the standard
    * ACF normalizer, which needs no per-lag sqrt. The ppm ratio uses
    * div-before-mul when the denominator exceeds 1e6 (`num div (den div
    * 1e6)`), so no product ever overflows a BIGINT at any data scale;
    * the formula (not an idealized real-number ratio) is the contract
    * and the oracle replicates it bit-exactly. Relative error vs the
    * exact ratio is < 1e-6 of the denominator — sub-ppm in practice.
    *
    * Lags are CALENDAR lags: pairs join on x + k, so bucket gaps drop
    * pairs rather than sliding across them (n_pairs reports coverage).
    *
    * Scale shape: like [[theilSen]], everything after the caller's
    * bucketing aggregation is bucket-sized — the centered series joins
    * itself once per lag via one hash equi-join against a broadcast
    * <= 64-row lag frame; the fact rows are never touched here.
    *
    * `series`: (x BIGINT bucket index, y BIGINT) — ONE row per bucket.
    * Output: (lag, n_pairs, rho_ppm), lags with zero pairs omitted. */
  def acf(series: DataFrame, xCol: String, yCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 64, "1 <= maxLag <= 64")
    val s = series.select(col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val stats = s.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val c = s.crossJoin(broadcast(stats))
      .select(col("x"), (col("y") - expr("sy div n")).as("c"))
    val den = c.agg(sum(expr("c * c")).as("den"))
    val lags = stats.select(explode(array((1 to maxLag).map(k =>
      lit(k.toLong)): _*)).as("lag"))
    c.as("a").crossJoin(broadcast(lags))
      .join(c.as("b"), col("b.x") === col("a.x") + col("lag"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(expr("a.c * b.c")).as("num"))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"),
        expr("CASE WHEN den >= 1000000L THEN num div (den div 1000000L) " +
          "ELSE num * 1000000L div greatest(den, 1L) END").as("rho_ppm"))
  }

  /** Additive Holt-Winters triple exponential smoothing (Holt 1957,
    * Winters 1960) carried in EXACT integer arithmetic: level, trend and
    * the `period`-slot seasonal state are BIGINTs in the series' own
    * units, smoothing constants are unit fractions (alpha = 1/alphaInv,
    * ...), and every update truncates with integral `div` — Spark's
    * `div` and DuckDB's `//` share truncate-toward-zero semantics, so
    * the whole trajectory is engine- and partitioning-exact even when
    * trend or residuals go negative.
    *
    * Updates, for t > period (x = observation, sOld = seasonal slot
    * from one period ago):
    *   fitted_t = L + B + sOld                      (one-step forecast)
    *   L' = ((x - sOld) + (alphaInv-1)(L + B)) div alphaInv
    *   B' = ((L' - L)   + (betaInv-1) B)       div betaInv
    *   S' = ((x - L')   + (gammaInv-1) sOld)   div gammaInv
    * Init: L0 = mean of season 1 (floored), B0 = (mean season 2 - mean
    * season 1) div period (per-step trend), seasonal slots = season-1
    * deviations from L0. Fitted rows start at t = period + 1.
    *
    * The input must carry a CONTIGUOUS 1-based index (the caller's
    * calendar bucketing provides it); the series is calendar-sized by
    * construction, so the sequential fold runs on ONE collected row —
    * the same bounded-fold discipline as Survival.kaplanMeier. The one
    * data-sized cost is whatever aggregation built the series.
    *
    * Output: (idx, x, fitted, resid) for t > period.
    */
  def holtWintersAdditive(series: DataFrame, idxCol: String, valCol: String,
      period: Int, alphaInv: Int, betaInv: Int, gammaInv: Int): DataFrame =
    holtWintersByGroup(series.withColumn("__hw_g", lit(1)), "__hw_g",
        idxCol, valCol, period, alphaInv, betaInv, gammaInv)
      .select("idx", "x", "fitted", "resid")

  /** [[holtWintersAdditive]] fitted per series key — the production
    * shape: "forecast every source/SKU/event-type at once". Each key's
    * fold is independent, so the work is one grouped aggregation whose
    * per-group state is period+history-bounded, parallel across the
    * key domain — no per-series driver loop, no global sort. Output:
    * (key, idx, x, fitted, resid) for t > period per key. Keys without
    * TWO FULL seasons of observations (a point at every index in
    * [1, 2*period]) are dropped: HW cannot initialize level, trend and
    * the seasonal slots from a partial history.
    */
  def holtWintersByGroup(series: DataFrame, keyCol: String,
      idxCol: String, valCol: String,
      period: Int, alphaInv: Int, betaInv: Int, gammaInv: Int): DataFrame = {
    require(period >= 2 && alphaInv >= 2 && betaInv >= 2 && gammaInv >= 2)
    val m = period
    val src = series.select(col(keyCol).as("g"),
      col(idxCol).cast("long").as("i"),
      col(valCol).cast("long").as("x"))
    val one = hwInit(src, m)
    val folded = one.select(col("g"), explode(expr(
        hwFold(m, alphaInv, betaInv, gammaInv, "acc -> acc.out"))).as("k"))
      .select(col("g"), col("k.i").as("i"), col("k.fitted").as("fitted"))
    // fitted frame is |keys| x |calendar| — broadcast onto the series
    src.filter(col("i") > m)
      .join(broadcast(folded), Seq("g", "i"))
      .select(col("g").as("key"), col("i").as("idx"), col("x"),
        col("fitted"), (col("x") - col("fitted")).as("resid"))
  }

  /** True h-step-ahead Holt-Winters FORECAST per key — what q102/q103's
    * one-step fitted values stop short of: roll the SAME exact integer
    * fold to the end of each key's history, keep the final (level,
    * trend, seasonal-ring) state, and extrapolate with no further
    * observations:
    *
    *   forecast(t_last + h) = L + h·B + S[((h-1) mod period) + 1]
    *
    * (after the last update the ring's head is the slot for t_last + 1).
    * Same engine-exact arithmetic: the extrapolation is pure integer
    * multiply-add on the folded state, so every horizon row is exact.
    *
    * Scale: identical to [[holtWintersByGroup]] — one grouped
    * aggregation whose per-key state is history-bounded, then a
    * |keys| x horizon explode. Keys without two full seasons drop.
    *
    * Output: (key, h, idx, forecast) for h in [1, horizon]. */
  def holtWintersForecastByGroup(series: DataFrame, keyCol: String,
      idxCol: String, valCol: String, period: Int,
      alphaInv: Int, betaInv: Int, gammaInv: Int,
      horizon: Int): DataFrame = {
    require(period >= 2 && alphaInv >= 2 && betaInv >= 2 && gammaInv >= 2)
    require(horizon >= 1)
    val m = period
    val src = series.select(col(keyCol).as("g"),
      col(idxCol).cast("long").as("i"),
      col(valCol).cast("long").as("x"))
    val state = hwInit(src, m).select(col("g"), col("last_i"),
      expr(hwFold(m, alphaInv, betaInv, gammaInv,
        "acc -> named_struct('l', acc.l, 'b', acc.b, 's', acc.s)"))
        .as("st"))
    state.select(col("g").as("key"), explode(expr(
        s"""transform(sequence(1L, ${horizon}L), h -> named_struct(
           |  'h', h, 'idx', last_i + h,
           |  'forecast', st.l + h * st.b
           |    + element_at(st.s, cast((h - 1) % $m + 1 as int))))"""
          .stripMargin)).as("f"))
      .select(col("key"), col("f.h").as("h"), col("f.idx").as("idx"),
        col("f.forecast").as("forecast"))
  }

  /** Single-series form of [[holtWintersForecastByGroup]]. Output:
    * (h, idx, forecast). */
  def holtWintersForecast(series: DataFrame, idxCol: String,
      valCol: String, period: Int, alphaInv: Int, betaInv: Int,
      gammaInv: Int, horizon: Int): DataFrame =
    holtWintersForecastByGroup(series.withColumn("__hw_g", lit(1)),
        "__hw_g", idxCol, valCol, period, alphaInv, betaInv, gammaInv,
        horizon)
      .select("h", "idx", "forecast")

  /** Shared HW init: per-key (l0, b0, season-1 rows, fold steps, last
    * observed index), keys without two full seasons dropped. */
  private def hwInit(src: DataFrame, m: Int): DataFrame =
    src.groupBy("g").agg(
      expr(s"sum(CASE WHEN i <= $m THEN x END) div $m").as("l0"),
      expr(s"(sum(CASE WHEN i > $m AND i <= ${2 * m} THEN x END)" +
        s" - sum(CASE WHEN i <= $m THEN x END)) div ${m.toLong * m}")
        .as("b0"),
      sort_array(collect_list(when(col("i") <= m,
        struct(col("i"), col("x"))))).as("season1"),
      sort_array(collect_list(when(col("i") > m,
        struct(col("i"), col("x"))))).as("steps"),
      max(col("i")).as("last_i"),
      sum(when(col("i") <= 2 * m, 1L).otherwise(0L)).as("n_init"))
      .filter(col("n_init") === 2L * m)

  /** Shared HW fold over `steps` from the [[hwInit]] state; `finish`
    * is the aggregate's final lambda (fitted trajectory for the fit
    * form, raw (l, b, s) state for the forecast form). */
  private def hwFold(m: Int, alphaInv: Int, betaInv: Int, gammaInv: Int,
      finish: String): String =
    s"""aggregate(steps,
       |  named_struct('l', l0, 'b', b0,
       |    's', transform(season1, e -> e.x - l0),
       |    'out', cast(array() as
       |      array<struct<i: bigint, fitted: bigint>>)),
       |  (acc, st) -> named_struct(
       |    'l', ((st.x - element_at(acc.s, 1))
       |      + ${alphaInv - 1}L * (acc.l + acc.b)) div ${alphaInv}L,
       |    'b', ((((st.x - element_at(acc.s, 1))
       |        + ${alphaInv - 1}L * (acc.l + acc.b)) div ${alphaInv}L
       |      - acc.l) + ${betaInv - 1}L * acc.b) div ${betaInv}L,
       |    's', concat(slice(acc.s, 2, ${m - 1}), array(
       |      ((st.x - ((st.x - element_at(acc.s, 1))
       |        + ${alphaInv - 1}L * (acc.l + acc.b)) div ${alphaInv}L)
       |       + ${gammaInv - 1}L * element_at(acc.s, 1))
       |      div ${gammaInv}L)),
       |    'out', array_append(acc.out, named_struct('i', st.i,
       |      'fitted', acc.l + acc.b + element_at(acc.s, 1)))),
       |  $finish)""".stripMargin
}
