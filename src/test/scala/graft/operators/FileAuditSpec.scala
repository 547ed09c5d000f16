package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class FileAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeTable(rows: Int, files: Int): String = {
    val dir = TestSpark.tmpDir("graft-fa") + "/t.parquet"
    (1 to rows).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(files).write.parquet(dir)
    dir
  }

  test("inventory reports one row per data file with exact counts") {
    val dir = writeTable(rows = 90, files = 3)
    val inv = FileAudit.fileInventory(spark, Seq("t1" -> dir))
      .as[(String, String, String, Long)].collect()
    assert(inv.length === 3)
    assert(inv.map(_._4).sum === 90L)
    assert(inv.forall(_._1 == "t1"))
    assert(inv.forall(_._2 == "t.parquet")) // immediate parent dir
    assert(inv.map(_._3).distinct.length === 3) // distinct file basenames
    assert(inv.forall(_._3.endsWith(".parquet")))
  }

  test("inventory distinguishes partitionBy value dirs via file_dir") {
    val dir = TestSpark.tmpDir("graft-fa") + "/p.parquet"
    (1 to 30).map(i => (i.toLong, i % 3)).toDF("id", "b")
      .repartition($"b").write.partitionBy("b").parquet(dir)
    val inv = FileAudit.fileInventory(spark, Seq("p" -> dir))
      .as[(String, String, String, Long)].collect()
    assert(inv.map(_._2).sorted.toSeq === Seq("b=0", "b=1", "b=2"))
    assert(inv.forall(_._4 === 10L))
  }

  test("compaction report flags tables whose mean file is small") {
    val small = writeTable(rows = 90, files = 9) // mean 10 rows/file
    val big = writeTable(rows = 90, files = 1)   // mean 90 rows/file
    val r = FileAudit.compactionReport(spark,
        Seq("small" -> small, "big" -> big), smallRowThreshold = 50L)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    val (_, sFiles, sRows, sMin, sFlag) = r("small")
    // round-robin repartition is *approximately* even — pin the exact
    // file/row totals and the flag, bound the smallest file
    assert((sFiles, sRows, sFlag) === ((9L, 90L, true)))
    assert(sMin >= 1L && sMin <= 10L)
    assert(r("big") === (("big", 1L, 90L, 90L, false)))
  }
}
