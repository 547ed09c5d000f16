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

  test("clustered write yields files with disjoint key ranges (scan skipping)") {
    val out = TestSpark.tmpDir("clustered") + "/orders"
    val orders = Tables.load(spark, TestSpark.sf0001, "orders")
    Compaction.clusteredWrite(orders, out, Seq("o_orderdate"), parts = 4)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted
    assert(files.length === 4)
    // each file owns a disjoint o_orderdate range — the property parquet
    // min/max stats need for file- and row-group-level skipping
    import org.apache.spark.sql.functions.{col, max, min}
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("o_orderdate").cast("string")),
          max(col("o_orderdate").cast("string"))).head()
      (r.getString(0), r.getString(1)) // ISO strings: ordering = time order
    }.sorted
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"file ranges overlap: $hi vs $lo — clustering broken")
      case _ => ()
    }
    // nothing lost in the layout rewrite
    val back = spark.read.parquet(out)
    assert(back.count() === orders.count())
    assert(back.exceptAll(orders).count() === 0)
  }
}
