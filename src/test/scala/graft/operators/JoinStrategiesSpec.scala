package graft.operators

import graft.{Tables, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinStrategiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join returns exactly the plain join result") {
    val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(orders, Seq("l_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val salted = JoinStrategies.saltedJoin(li, orders, Seq("l_orderkey"), 8)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("bucketed pair joins without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val li = Tables.load(spark, TestSpark.sf0001, "lineitem")
      val orders = Tables.load(spark, TestSpark.sf0001, "orders")
      val (bl, bo) = JoinStrategies.bucketizePair(spark,
        li, "b_lineitem", "l_orderkey",
        orders, "b_orders", "o_orderkey", buckets = 4)
      val joined = bl.join(bo, bl("l_orderkey") === bo("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free:\n$plan")
      assert(joined.count() === li.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
