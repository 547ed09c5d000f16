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

  test("salting spreads a hot key over many salts; skew-split join is exact") {
    import spark.implicits._
    // one key owns half the rows — the shape where a plain shuffle join
    // sends 50% of the data to a single reducer
    val big = spark.range(0, 10000).select(
      when(col("id") % 2 === 0, 1L).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val dim = spark.range(0, 10000).select(col("id").as("k"), (col("id") * 2).as("dval"))
    // distribution property: the hot key's rows land on every salt value
    // (content-hashed salt — stable under task recomputation)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col("payload")), lit(8)).cast("int"))
    val saltsOfHot = salted.filter(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(saltsOfHot === 8L, "hot key must spread over all salt values")
    // hot-key detection finds the planted key (and only plausible ones)
    val hot = JoinStrategies.sampleHotKeys(big, Seq("k"), fraction = 0.1,
      minShare = 0.05)
    assert(hot.as[Long].collect().contains(1L))
    assert(hot.count() <= 3)
    // hybrid skew-split join returns exactly the plain join multiset
    val plain = big.join(dim, Seq("k"))
    val split = JoinStrategies.skewSplitJoin(big, dim, Seq("k"), 8, hot)
    assert(plain.exceptAll(split).count() === 0)
    assert(split.exceptAll(plain).count() === 0)
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
