package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout gate: a date-partitioned archive must prune partitions
  * at the scan — at 100 TB, reading one year instead of seven is the
  * difference between a job and an incident. */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("year-partitioned write prunes to the filtered partitions only") {
    val out = TestSpark.tmpDir("part-orders")
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.partitionBy("o_year").parquet(s"$out/orders")

    val pruned = spark.read.parquet(s"$out/orders")
      .filter(col("o_year") === 1998)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("o_year"), plan)
    // physically: only the one partition directory is read
    val scanned = pruned.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.nonEmpty && scanned.forall(_.contains("o_year=1998")),
      s"scan touched non-matching partitions: ${scanned.mkString(", ")}")
    assert(pruned.count() ===
      orders.filter(col("o_year") === 1998).count())
  }
}
