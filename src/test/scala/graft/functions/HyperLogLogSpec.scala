package graft.functions

import graft.{Tables, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HyperLogLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("HLL estimate lands within 5% of the exact distinct count") {
    GraftExtensions.register(spark)
    Tables.load(spark, TestSpark.sf0001, "lineitem")
      .createOrReplaceTempView("hll_lineitem")
    val exact = spark.sql(
      "SELECT count(DISTINCT l_partkey) FROM hll_lineitem").head.getLong(0)
    val est = spark.sql(
      "SELECT graft_hll_distinct(l_partkey) FROM hll_lineitem").head.getLong(0)
    val err = math.abs(est - exact).toDouble / exact
    assert(err < 0.05, s"exact=$exact est=$est err=$err")
  }

  test("estimate is bit-deterministic under any partitioning (max-merge)") {
    GraftExtensions.register(spark)
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    def est(parts: Int): Long = {
      li.repartition(parts).createOrReplaceTempView("hll_parts")
      spark.sql("SELECT graft_hll_distinct(l_orderkey) FROM hll_parts")
        .head.getLong(0)
    }
    assert(est(1) === est(32), "register maxima are order/partition independent")
  }

  test("grouped HLL tracks per-group exact counts") {
    GraftExtensions.register(spark)
    Tables.load(spark, TestSpark.sf0001, "lineitem")
      .createOrReplaceTempView("hll_grouped")
    val rows = spark.sql(
      """SELECT l_returnflag, graft_hll_distinct(l_suppkey) AS est,
        |count(DISTINCT l_suppkey) AS exact
        |FROM hll_grouped GROUP BY l_returnflag""".stripMargin).collect()
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      // tiny cardinalities (10 suppliers): linear counting is near-exact
      assert(math.abs(est - exact) <= 1, s"${r.getString(0)}: est=$est exact=$exact")
    }
  }
}
