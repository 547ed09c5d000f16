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
}
