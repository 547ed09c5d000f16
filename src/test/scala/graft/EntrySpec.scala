package graft

import org.scalatest.funsuite.AnyFunSuite

class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry runs the flagship archiver and reports per-table results") {
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    assert(rows.length === 3) // events, lineitem, orders elected
    assert(rows.forall(r => r.getAs[Long]("archived") > 0))
    assert(rows.forall(r => !r.getAs[Boolean]("vetoed")))
    // the full semantic: delete-back applied, and the re-run archived 0
    assert(rows.forall(r => r.getAs[Long]("deleted") > 0))
    assert(rows.forall(r => r.getAs[Boolean]("rerun_idempotent")))
  }

  test("every oracle entry has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("all queries run non-empty on sf0.001 except known-empty at tiny scale") {
    val mayBeEmptyAtTinySf = Set("p3_keyset_page")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sf0001).count()
      if (!mayBeEmptyAtTinySf.contains(name))
        assert(n > 0, s"$name returned 0 rows")
    }
  }
}
