package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class BootstrapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def data = (1L to 400L).map(i => (i, (i % 97) * 3 + 10))
    .toDF("id", "v")

  test("subsample CI brackets reasonably and orders lo <= hi") {
    val r = Bootstrap.subsampleMeanCI(data, "id", "v", replicates = 32)
      .as[(Int, Double, Double, Double)].collect().head
    val (n, est, lo, hi) = r
    assert(n === 32)
    assert(lo <= hi)
    // half-sample means of a 400-row corpus cluster tightly around the
    // full mean; the interval must contain it here
    assert(lo <= est && est <= hi)
    assert(hi - lo < est, "interval should be much narrower than the mean")
  }

  test("interval is deterministic under repartitioning (md5 membership, " +
      "integer sums)") {
    val a = Bootstrap.subsampleMeanCI(data, "id", "v")
      .as[(Int, Double, Double, Double)].collect().head
    val b = Bootstrap.subsampleMeanCI(data.repartition(7), "id", "v")
      .as[(Int, Double, Double, Double)].collect().head
    assert(a === b)
  }

  test("wider spread widens the interval") {
    val tight = (1L to 400L).map(i => (i, 100L + (i % 3))).toDF("id", "v")
    val wide = (1L to 400L).map(i => (i, (i % 2) * 200L)).toDF("id", "v")
    def width(df: org.apache.spark.sql.DataFrame): Double = {
      val r = Bootstrap.subsampleMeanCI(df, "id", "v")
        .as[(Int, Double, Double, Double)].collect().head
      r._4 - r._3
    }
    assert(width(wide) > width(tight))
  }
}
