package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class SkewAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("key profile reports exact counts and the max/mean skew ratio") {
    val df = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"),
      (3L, "a"), (3L, "b")).toDF("k", "v")
    val r = SkewAudit.keyProfile(df, Seq("k", "v"))
      .as[(String, Long, Long, Long, Double)].collect()
      .map(x => x._1 -> x).toMap
    // k: 6 rows, 3 keys, max 3 -> skew 3/(6/3) = 1.5
    assert(r("k") === (("k", 6L, 3L, 3L, 1.5)))
    // v: 6 rows, 3 keys (a=3, b=2, c=1), max 3 -> 1.5
    assert(r("v") === (("v", 6L, 3L, 3L, 1.5)))
  }

  test("uniform keys profile to skew ratio 1.0") {
    val df = (1L to 100L).map(i => (i % 10, i)).toDF("k", "x")
    val r = SkewAudit.keyProfile(df, Seq("k"))
      .as[(String, Long, Long, Long, Double)].collect().head
    assert(r === (("k", 100L, 10L, 10L, 1.0)))
  }
}
