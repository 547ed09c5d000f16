package graft.operators

import graft.{Tables, TestSpark}

import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction collapses many small files without changing the data") {
    val out = TestSpark.tmpDir("compact") + "/orders"
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    orders.repartition(40).write.parquet(out) // 40 tiny files
    val before = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before === 40)
    Compaction.compact(spark, out) // everything fits one 128MB target
    val after = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after === 1)
    val back = spark.read.parquet(out)
    assert(back.count() === orders.count())
    assert(back.exceptAll(orders).count() === 0)
  }
}
