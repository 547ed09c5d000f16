package graft.functions

import graft.TestSpark

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sketch(df: DataFrame, capacity: Int): Map[String, Long] = {
    GraftExtensions.register(spark)
    df.createOrReplaceTempView("mg_input")
    spark.sql(s"SELECT graft_approx_topk(k, $capacity) AS mp FROM mg_input")
      .head().getMap[String, Long](0).toMap
  }

  // zipf-ish skew: key i appears (21 - i)^2 times, i in 1..20
  private def skewed = (1 to 20).flatMap(i =>
    Seq.fill((21 - i) * (21 - i))(s"k$i")).toDF("k")

  test("capacity >= distinct count makes the sketch the exact count table") {
    val exact = skewed.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    assert(sketch(skewed, 64) === exact)
    // partitioning-independent: merge topology cannot change the answer
    assert(sketch(skewed.repartition(7), 64) === exact)
    assert(sketch(skewed.repartition(1), 64) === exact)
  }

  test("sub-capacity regime: underestimates within N/(capacity+1), heavy hitters present") {
    val exact = skewed.groupBy("k").count()
      .as[(String, Long)].collect().toMap
    val n = exact.values.sum
    for (parts <- Seq(1, 3, 8)) {
      val mg = sketch(skewed.repartition(parts), 4)
      assert(mg.size <= 4)
      val bound = n / 5 // N / (capacity + 1)
      mg.foreach { case (k, est) =>
        assert(est <= exact(k), s"$k overestimated: $est > ${exact(k)}")
        assert(exact(k) - est <= bound,
          s"$k error ${exact(k) - est} exceeds N/(m+1)=$bound")
      }
      // every key with true count > N/(m+1) must be present
      exact.filter(_._2 > bound).keys.foreach(k =>
        assert(mg.contains(k), s"heavy hitter $k missing at parts=$parts"))
    }
  }

  test("nulls are ignored and empty input yields an empty map") {
    val withNulls = Seq(Some("a"), None, Some("a"), None).toDF("k")
    assert(sketch(withNulls, 8) === Map("a" -> 2L))
    assert(sketch(Seq.empty[String].toDF("k"), 8) === Map.empty)
  }
}
