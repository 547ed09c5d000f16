package graft.sinks

import graft.{Tables, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S6's scale path against a real JDBC store: Spark's partitioned JDBC scan
  * replaces the reference's manual keyset-pagination loop
  * (source/db.py:216-277) — bounds on the PK split the table into parallel
  * range scans, and the retention predicate is pushed into each one. */
class JdbcSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("partitioned jdbc read round-trips the archive and pushes the filter") {
    val c = JdbcSinkConfig(url = "jdbc:derby:memory:srcread;create=true",
      maxRetries = 1, retryDelayMs = 10)
    val sink = new JdbcUpsertSink(c)
    val spec = Tables.byName("orders")
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    sink.write("db", spec, orders, dryRun = false)

    val back = spark.read.format("jdbc")
      .option("url", c.url)
      .option("dbtable", "orders")
      .option("partitionColumn", "o_orderkey")
      .option("lowerBound", "0")
      .option("upperBound", "1500")
      .option("numPartitions", "4")
      .load()
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === orders.count())

    val filtered = back.filter(col("o_totalprice") > 300000)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.toLowerCase.contains("greaterthan(o_totalprice"),
      s"retention-style predicate must reach the JDBC scan:\n$plan")
    assert(filtered.count() ===
      orders.filter(col("o_totalprice") > 300000).count())
  }
}
