package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketized containment matches the naive range join exactly") {
    val points = Seq((1L, -3.0), (2L, 0.0), (3L, 4.99), (4L, 5.0), (5L, 17.2))
      .toDF("pid", "p")
    val intervals = Seq(
      (10L, -5.0, 0.0),   // half-open: point 2 at hi=0.0 excluded
      (20L, 0.0, 5.0),    // point 2 at lo included, 3 in, 4 at hi excluded
      (30L, 4.0, 20.0),   // overlaps 20
      (40L, 9.0, 9.0),    // empty interval: never matches
      (50L, 8.0, 3.0)     // inverted: never matches
    ).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        bucketWidth = 2.5)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val expected = Set((1L, 10L), (2L, 20L), (3L, 20L), (3L, 30L),
      (4L, 30L), (5L, 30L))
    assert(got === expected)
    // parity with the naive non-equi join at a different bucket width
    val wide = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi",
        bucketWidth = 100.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(wide === expected, "bucket width must not change the result")
  }

  test("a sentinel open-ended interval fails loudly, not with an OOM") {
    val points = Seq((1L, 5.0)).toDF("pid", "p")
    val sentinel = Seq((10L, 0.0, 1.0e15)).toDF("iid", "lo", "hi")
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(points, "p", sentinel, "lo", "hi",
        bucketWidth = 1.0, maxBucketsPerInterval = 1000).count()
    }
    assert(e.getMessage != null)
  }

  test("interval overlap emits each overlapping pair exactly once") {
    val a = Seq((1L, 0.0, 10.0), (2L, 20.0, 21.0), (3L, -5.0, -1.0))
      .toDF("aid", "a_lo", "a_hi")
    val b = Seq(
      (10L, 5.0, 30.0),   // overlaps 1 (many shared buckets) and 2
      (20L, 9.999, 10.0), // tiny sliver inside 1
      (30L, 10.0, 12.0),  // touches 1 at the boundary: half-open, no overlap
      (40L, -10.0, -4.0)  // overlaps 3 (negative domain)
    ).toDF("bid", "b_lo", "b_hi")
    def run(w: Double) = RangeJoin.intervalOverlap(
        a, "a_lo", "a_hi", b, "b_lo", "b_hi", bucketWidth = w)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq
    val expected = Set((1L, 10L), (2L, 10L), (1L, 20L), (3L, 40L))
    for (w <- Seq(1.0, 3.0, 100.0)) {
      val got = run(w)
      assert(got.toSet === expected, s"width $w")
      assert(got.size === expected.size,
        s"width $w produced duplicates: $got")
    }
  }
}
