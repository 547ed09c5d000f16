package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class QuantileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Q = Seq(("p50", 1L, 2L), ("p90", 9L, 10L), ("p99", 99L, 100L))

  private def run(xs: Seq[Long], nBuckets: Int = 8) =
    Quantile.exactQuantiles(xs.toDF("v"), "v", Q, nBuckets)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq

  /** Ground truth: k = ceil(n * nu / de), value = k-th smallest. */
  private def truth(xs: Seq[Long]) = {
    val sorted = xs.sorted
    Q.map { case (q, nu, de) =>
      val k = math.max(1L, (xs.size * nu + de - 1) / de)
      (q, k, sorted((k - 1).toInt))
    }.sortBy(_._1)
  }

  test("hand-computed ranks on 1..10") {
    // n=10: p50 k=5 -> 5, p90 k=9 -> 9, p99 k=10 -> 10
    assert(run(1L to 10L) ===
      Seq(("p50", 5L, 5L), ("p90", 9L, 9L), ("p99", 10L, 10L)))
  }

  test("duplicates: the k-th smallest value is tie-stable") {
    // sorted [1,5,5,5,9]: p50 k=3 -> 5, p90 k=5 -> 9, p99 k=5 -> 9
    assert(run(Seq(5L, 5L, 5L, 1L, 9L)) ===
      Seq(("p50", 3L, 5L), ("p90", 5L, 9L), ("p99", 5L, 9L)))
  }

  test("degenerate single-value domain (mx = mn) hits bucket 0") {
    assert(run(Seq(7L, 7L, 7L)) ===
      Seq(("p50", 2L, 7L), ("p90", 3L, 7L), ("p99", 3L, 7L)))
  }

  test("matches the sorted ground truth on a scattered domain with " +
      "few buckets (multi-level bisection exercised)") {
    // Weyl-sequence spread over a range >> nBuckets^2 so both histogram
    // levels carry real mass; negatives included
    val xs = (1 to 500).map(i => ((i.toLong * 2654435761L) % 100000L) - 50000L)
    assert(run(xs, nBuckets = 4) === truth(xs))
  }

  test("grouped: each group gets its own exact quantiles from its own " +
      "distribution") {
    // group a = 1..10, group b = 1000..1004: radically different ranges
    val xs = (1L to 10L).map(("a", _)) ++ (1000L to 1004L).map(("b", _))
    val r = Quantile.exactQuantilesByGroup(xs.toDF("g", "v"), "g", "v",
        Seq(("p50", 1L, 2L), ("p99", 99L, 100L)), nBuckets = 8)
      .as[(String, String, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(r === Seq(
      ("a", "p50", 5L, 5L), ("a", "p99", 10L, 10L),
      ("b", "p50", 3L, 1002L), ("b", "p99", 5L, 1004L)))
  }

  test("grouped: matches per-group sorted ground truth on scattered " +
      "data; partitioning-invariant") {
    val xs = (1 to 600).map(i =>
      (s"g${i % 4}", ((i.toLong * 2654435761L) % 9973L) - 5000L))
    def truthG = xs.groupBy(_._1).toSeq.flatMap { case (g, rows) =>
      val sorted = rows.map(_._2).sorted
      Q.map { case (q, nu, de) =>
        val k = math.max(1L, (rows.size * nu + de - 1) / de)
        (g, q, k, sorted((k - 1).toInt))
      }
    }.sortBy(t => (t._1, t._2))
    def run(df: org.apache.spark.sql.DataFrame) =
      Quantile.exactQuantilesByGroup(df, "g", "v", Q, nBuckets = 4)
        .as[(String, String, Long, Long)].collect()
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(xs.toDF("g", "v")) === truthG)
    assert(run(xs.toDF("g", "v").repartition(13)) === truthG)
  }

  test("winsorize: hand-computed clip report with outliers on both " +
      "tails") {
    // 1..98 plus outliers 1000 and -500; p05 -> rank 5 -> 4,
    // p95 -> rank 95 -> 94. n_low = |{-500,1,2,3}| = 4,
    // n_high = |{95..98,1000}| = 5; mean 5351 div 100 = 53,
    // winsorized mean (16 + 4459 + 470) div 100 = 49
    val xs = (1L to 98L) ++ Seq(1000L, -500L)
    val r = Quantile.winsorizeReport(xs.toDF("v"), "v",
        ("p05", 5L, 100L), ("p95", 95L, 100L), nBuckets = 8)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r === Array((4L, 94L, 100L, 4L, 5L, 53L, 49L)))
  }

  test("winsorize: clamping is a no-op when nothing crosses the bounds") {
    val xs = Seq.fill(50)(10L)
    val r = Quantile.winsorizeReport(xs.toDF("v"), "v",
        ("p01", 1L, 100L), ("p99", 99L, 100L))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(r === Array((10L, 10L, 50L, 0L, 0L, 10L, 10L)))
  }

  test("result is partitioning-invariant") {
    val xs = (1 to 300).map(i => (i.toLong * 48271L) % 7919L)
    val base = run(xs)
    val repart = Quantile
      .exactQuantiles(xs.toDF("v").repartition(13), "v", Q, 8)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(base === repart && base === truth(xs))
  }
}
