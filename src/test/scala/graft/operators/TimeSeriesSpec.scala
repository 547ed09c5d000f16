package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** events with `n` rows in hour bucket `h` (hours since epoch). */
  private def series(tpe: String, counts: Seq[(Long, Int)]) =
    counts.flatMap { case (h, n) =>
      (1 to n).map(i =>
        (tpe, h * 3600L * 1000000L + i)) // i keeps event times distinct
    }

  private def toDf(rows: Seq[(String, Long)]) =
    rows.toDF("event_type", "us")
      .select(col("event_type"), timestamp_micros(col("us")).as("ts"))

  test("CUSUM changepoint lands on the level shift") {
    // type a: 5/hour for 6 hours then 50/hour for 6 hours — the peak
    // cumulative deviation sits at the last low bucket (hour 5)
    val df = toDf(series("a",
      (0L to 5L).map(_ -> 5) ++ (6L to 11L).map(_ -> 50)))
    val r = TimeSeries.cusumChangepoint(df)
      .select(col("event_type"),
        (unix_micros(col("cp_h")) / 3600000000L).cast("long").as("hr"),
        col("s_abs"))
      .as[(String, Long, Long)].collect().head
    assert(r._1 === "a")
    assert(r._2 === 5L)
    // hand check: T=12, total=330; at k=6 (hour 5): cum=30 ->
    // |12*30 - 6*330| = 1620
    assert(r._3 === 1620L)
  }

  test("flat series peaks trivially and deterministically (earliest tie)") {
    val df = toDf(series("b", (0L to 7L).map(_ -> 4)))
    val r = TimeSeries.cusumChangepoint(df)
      .select((unix_micros(col("cp_h")) / 3600000000L).cast("long")
        .as("hr"), col("s_abs"))
      .as[(Long, Long)].collect().head
    assert(r._2 === 0L) // every S_k is exactly 0 on a flat series
    assert(r._1 === 0L) // tie broken to the earliest bucket
  }

  test("CUSUM statistic is invariant under uniform level shifts " +
      "(S_k = T*cum_k - k*total cancels any +c per bucket)") {
    val counts = (0L to 9L).map(h => h -> (3 + (h % 4)).toInt)
    val base = TimeSeries.cusumChangepoint(toDf(series("s", counts)))
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    val shifted = TimeSeries.cusumChangepoint(
        toDf(series("s", counts.map { case (h, n) => h -> (n + 5) })))
      .as[(String, java.sql.Timestamp, Long)].collect().toSet
    assert(base === shifted,
      "adding a constant per bucket must not move the changepoint " +
        "or its magnitude")
  }

  test("seasonal decomposition: seasonal is the hour-of-day mean and " +
      "resid = n - seasonal - trend exactly") {
    // two days, hour-of-day pattern 10,20 alternating; seasonal mean per
    // hod is exact, so residuals reduce to n - seasonal - trend
    val counts = (0L until 48L).map(h => h -> (if (h % 2 == 0) 10 else 20))
    val df = toDf(series("c", counts))
    val rows = TimeSeries.seasonalDecompose(df)
      .select(col("n"), col("seasonal"), col("trend"), col("resid"))
      .as[(Long, Double, Double, Double)].collect()
    assert(rows.length === 48)
    rows.foreach { case (n, seasonal, trend, resid) =>
      assert(seasonal === (if (n == 10) 10.0 else 20.0))
      assert(resid ===
        math.floor((n - seasonal - trend) * 10000.0) / 10000.0)
    }
    // in the interior the 25h centered average is 13x10 + 12x20 or
    // 12x10 + 13x20 over 25 buckets
    val interior = TimeSeries.seasonalDecompose(df)
      .filter(col("h") >= to_timestamp(lit("1970-01-01 12:00:00")) &&
        col("h") < to_timestamp(lit("1970-01-02 12:00:00")))
      .select("trend").as[Double].collect()
    assert(interior.forall(t => t == math.floor(370.0 / 25 * 10000) / 10000
      || t == math.floor(380.0 / 25 * 10000) / 10000))
  }

  test("theilSen: hand-computed lower median over all pairwise slopes") {
    // (0,0) (1,10) (2,14) (3,100): six slopes in micro-units
    // 10e6, 7e6, 33333333, 4e6, 45e6, 86e6 -> sorted rank (6+1)/2 = 3
    // -> 10e6. The trunc division shows on the (0,3) pair: 100/3.
    val s = Seq(("a", 0L, 0L), ("a", 1L, 10L), ("a", 2L, 14L),
      ("a", 3L, 100L)).toDF("key", "x", "y")
    val r = TimeSeries.theilSen(s, "key", "x", "y")
      .select("key", "n_buckets", "n_pairs", "median_slope_micro")
      .as[(String, Long, Long, Long)].collect().head
    assert(r === (("a", 4L, 6L, 10000000L)))
  }

  test("theilSen: one wild outlier cannot move the median slope; " +
      "negative-trend truncation is toward zero") {
    // y = 2x on x=0..4 plus a wild (5, 1000): 10 of 15 pairwise slopes
    // are exactly 2e6, so the rank-8 lower median stays 2e6
    val s = ((0L to 4L).map(x => ("k", x, 2L * x)) :+ (("k", 5L, 1000L)))
      .toDF("key", "x", "y")
    val r = TimeSeries.theilSen(s, "key", "x", "y")
      .select("n_pairs", "median_slope_micro")
      .as[(Long, Long)].collect().head
    assert(r === ((15L, 2000000L)))
    // falling series: -7 over 2 steps -> -3500000 exactly; over 3 steps
    // -7e6/3 truncates toward zero to -2333333 (not floor -2333334)
    val neg = Seq(("n", 0L, 7L), ("n", 3L, 0L)).toDF("key", "x", "y")
    assert(TimeSeries.theilSen(neg, "key", "x", "y")
      .select("median_slope_micro").as[Long].collect().head
      === -2333333L)
  }

  test("theilSen: maxBuckets guard fails loudly; partition invariance") {
    val big = (0L to 40L).map(x => ("k", x, x)).toDF("key", "x", "y")
    intercept[IllegalArgumentException] {
      TimeSeries.theilSen(big, "key", "x", "y", maxBuckets = 10)
    }
    val a = TimeSeries.theilSen(big, "key", "x", "y").collect().toSeq
    val b = TimeSeries.theilSen(big.repartition(7), "key", "x", "y")
      .collect().toSeq
    assert(a === b)
  }

  test("acf: hand-computed lags on a linear ramp") {
    // y = 1..5: mean 3, c = [-2,-1,0,1,2], den = 10
    // lag1 num = 2+0+0+2 = 4 -> 400000; lag2 num = 0-1+0 = -1 ->
    // -100000; lag3 num = -2-2 = -4 -> -400000
    val s = (1L to 5L).map(x => (x, x)).toDF("x", "y")
    val r = TimeSeries.acf(s, "x", "y", maxLag = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r === Seq((1L, 4L, 400000L), (2L, 3L, -100000L),
      (3L, 2L, -400000L)))
  }

  test("acf: alternating series has strongly negative lag-1, " +
      "positive lag-2") {
    // y = [0,10,0,10]: mean 5, c = [-5,5,-5,5], den = 100
    // lag1 num = -25*3 = -75 -> -750000; lag2 num = 25*2 -> 500000
    val s = Seq((1L, 0L), (2L, 10L), (3L, 0L), (4L, 10L)).toDF("x", "y")
    val r = TimeSeries.acf(s, "x", "y", 2)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(r === Seq((1L, 3L, -750000L), (2L, 2L, 500000L)))
  }

  test("acf: calendar gaps drop pairs instead of sliding; constant " +
      "series yields rho 0, not a division error") {
    // x = [1,2,4]: lag-1 pairs only (1,2); lag-2 only (2,4)
    val g = Seq((1L, 1L), (2L, 2L), (4L, 4L)).toDF("x", "y")
    val np = TimeSeries.acf(g, "x", "y", 2)
      .select("lag", "n_pairs").as[(Long, Long)].collect().sortBy(_._1)
    assert(np === Seq((1L, 1L), (2L, 1L)))
    val const = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
    assert(TimeSeries.acf(const, "x", "y", 1)
      .select("rho_ppm").as[Long].collect() === Array(0L))
  }

  test("acf: partitioning-invariant") {
    val s = (1L to 40L).map(x => (x, (x * 48271L) % 101L)).toDF("x", "y")
    val a = TimeSeries.acf(s, "x", "y", 7).collect().toSeq
      .sortBy(_.getLong(0))
    val b = TimeSeries.acf(s.repartition(9), "x", "y", 7).collect().toSeq
      .sortBy(_.getLong(0))
    assert(a === b)
  }

  test("holtWintersAdditive: hand-computed trajectory, m=2, a=b=g=1/2") {
    // x = 10,20,14,26,18,30: L0=15, B0=2, S=[-5,5]; stepping the
    // integer recurrence by hand gives fitted 12,25,18,29
    val s = Seq((1L, 10L), (2L, 20L), (3L, 14L), (4L, 26L), (5L, 18L),
      (6L, 30L)).toDF("i", "x")
    val got = TimeSeries.holtWintersAdditive(s, "i", "x", period = 2,
        alphaInv = 2, betaInv = 2, gammaInv = 2)
      .orderBy("idx").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((3L, 14L, 12L, 2L), (4L, 26L, 25L, 1L),
      (5L, 18L, 18L, 0L), (6L, 30L, 29L, 1L)))
  }

  test("holtWintersAdditive: negative trend exercises truncate-toward-zero") {
    // decreasing series: B0 = -10 and every div sees negative numerators
    // (e.g. -25 div 2 = -12, not floor's -13) — the engine-parity case
    val s = Seq((1L, 100L), (2L, 90L), (3L, 80L), (4L, 70L), (5L, 60L),
      (6L, 50L)).toDF("i", "x")
    val got = TimeSeries.holtWintersAdditive(s, "i", "x", 2, 2, 2, 2)
      .orderBy("idx").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((3L, 80L, 90L, -10L), (4L, 70L, 63L, 7L),
      (5L, 60L, 63L, -3L), (6L, 50L, 45L, 5L)))
    // partition-invariance: pure integer fold
    val again = TimeSeries.holtWintersAdditive(s.repartition(5), "i", "x",
        2, 2, 2, 2)
      .orderBy("idx").as[(Long, Long, Long, Long)].collect().toSeq
    assert(again === got)
  }

  test("holtWintersByGroup: independent per-key folds; short series dropped") {
    // key "up" = the rising fixture, key "dn" = the falling one — each
    // group must reproduce its single-series trajectory exactly; key
    // "short" has fewer than 2 periods and is dropped (no init trend)
    val s = (Seq((1L, 10L), (2L, 20L), (3L, 14L), (4L, 26L), (5L, 18L),
        (6L, 30L)).map { case (i, x) => ("up", i, x) } ++
      Seq((1L, 100L), (2L, 90L), (3L, 80L), (4L, 70L), (5L, 60L),
        (6L, 50L)).map { case (i, x) => ("dn", i, x) } ++
      Seq(("short", 1L, 5L), ("short", 2L, 6L), ("short", 3L, 7L)))
      .toDF("k", "i", "x")
    val got = TimeSeries.holtWintersByGroup(s, "k", "i", "x", 2, 2, 2, 2)
      .orderBy("key", "idx")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("dn", 3L, 80L, 90L, -10L), ("dn", 4L, 70L, 63L, 7L),
      ("dn", 5L, 60L, 63L, -3L), ("dn", 6L, 50L, 45L, 5L),
      ("up", 3L, 14L, 12L, 2L), ("up", 4L, 26L, 25L, 1L),
      ("up", 5L, 18L, 18L, 0L), ("up", 6L, 30L, 29L, 1L)))
  }

  test("holtWintersForecast: hand-computed horizon off the final state") {
    // rising fixture's final state after step 6: L=24, B=2, S=[-4, 5]
    // h=1: 24+2-4=22, h=2: 24+4+5=33, h=3: 24+6-4=26, h=4: 24+8+5=37
    val s = Seq((1L, 10L), (2L, 20L), (3L, 14L), (4L, 26L), (5L, 18L),
      (6L, 30L)).toDF("i", "x")
    val got = TimeSeries.holtWintersForecast(s, "i", "x", period = 2,
        alphaInv = 2, betaInv = 2, gammaInv = 2, horizon = 4)
      .orderBy("h").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 7L, 22L), (2L, 8L, 33L), (3L, 9L, 26L),
      (4L, 10L, 37L)))
  }

  test("holtWintersForecast: h=1 equals the next fitted value; " +
      "grouped form; partition-invariant") {
    // fit on 1..6 produces fitted(6)=29; forecasting h=1 from the
    // series TRUNCATED at 5 must give the same 29 (same state, no
    // observation yet)
    val full = Seq((1L, 10L), (2L, 20L), (3L, 14L), (4L, 26L), (5L, 18L),
      (6L, 30L)).toDF("i", "x")
    val cut = full.where(col("i") <= 5L)
    val f1 = TimeSeries.holtWintersForecast(cut, "i", "x", 2, 2, 2, 2,
      horizon = 1).as[(Long, Long, Long)].head()
    assert(f1 === ((1L, 6L, 29L)))
    val s = (Seq((1L, 10L), (2L, 20L), (3L, 14L), (4L, 26L), (5L, 18L),
        (6L, 30L)).map { case (i, x) => ("up", i, x) } ++
      Seq((1L, 100L), (2L, 90L), (3L, 80L), (4L, 70L), (5L, 60L),
        (6L, 50L)).map { case (i, x) => ("dn", i, x) } ++
      Seq(("short", 1L, 5L), ("short", 2L, 6L), ("short", 3L, 7L)))
      .toDF("k", "i", "x")
    val g = TimeSeries.holtWintersForecastByGroup(s, "k", "i", "x",
        2, 2, 2, 2, horizon = 2).orderBy("key", "h")
      .as[(String, Long, Long, Long)].collect().toSeq
    // dn final state: L=50, B=-10, S=[1, -1]
    assert(g === Seq(("dn", 1L, 7L, 41L), ("dn", 2L, 8L, 29L),
      ("up", 1L, 7L, 22L), ("up", 2L, 8L, 33L)))
    val again = TimeSeries.holtWintersForecastByGroup(s.repartition(7),
        "k", "i", "x", 2, 2, 2, 2, horizon = 2).orderBy("key", "h")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(again === g)
  }
}
