package graft.operators

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WatermarksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-wm").toString + "/wm"

  test("incremental runs archive only rows beyond the advancing watermark") {
    val wm = new Watermarks(spark, tmpStore())
    val batch1 = (1L to 100L).map(i => (i, s"r$i")).toDF("id", "payload")
    // first run: no watermark, everything passes
    assert(wm.beyond(batch1, "t", "id").count() === 100)
    wm.advance("t", "id", batch1)
    assert(wm.get("t", "id").map(_._1).contains("100"))
    // second run over old+new data: new rows pass, PLUS the boundary row
    // (inclusive compare: same-valued late arrivals are never lost; the
    // idempotent sinks make re-archiving the boundary free)
    val batch2 = (1L to 150L).map(i => (i, s"r$i")).toDF("id", "payload")
    val inc = wm.beyond(batch2, "t", "id")
    assert(inc.count() === 51)
    assert(inc.agg(min("id")).head().getLong(0) === 100L)
    wm.advance("t", "id", inc)
    assert(wm.get("t", "id").map(_._1).contains("150"))
  }

  test("advance is monotone: replays and empty batches never regress it") {
    val wm = new Watermarks(spark, tmpStore())
    val full = (1L to 60L).toDF("id")
    wm.advance("t", "id", full)
    // replay of an OLD batch must not pull the watermark back
    wm.advance("t", "id", (1L to 10L).toDF("id"))
    assert(wm.get("t", "id").map(_._1).contains("60"))
    // empty batch is a no-op
    wm.advance("t", "id", full.filter(col("id") > 1000))
    assert(wm.get("t", "id").map(_._1).contains("60"))
    // all-null batch is a no-op too
    wm.advance("t", "id", Seq[Option[Long]](None, None).toDF("id"))
    assert(wm.get("t", "id").map(_._1).contains("60"))
  }

  test("a crash between the backup and swap renames is recovered on load") {
    val store = tmpStore()
    val wm = new Watermarks(spark, store)
    wm.advance("t", "id", (1L to 40L).toDF("id"))
    assert(wm.get("t", "id").map(_._1).contains("40"))
    // simulate a process death mid-writeSwap: the store was renamed to
    // .bak but the .tmp never made it into place
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(store),
      new org.apache.hadoop.fs.Path(store + ".bak")))
    // next load restores the backup: the watermark survives (no silent
    // full-rescan), and advance keeps working on the restored store
    assert(wm.get("t", "id").map(_._1).contains("40"))
    wm.advance("t", "id", (1L to 55L).toDF("id"))
    assert(wm.get("t", "id").map(_._1).contains("55"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(store + ".bak")))
  }

  test("crash after swap (stale .bak + .tmp beside a live store) is cleaned, not restored") {
    val store = tmpStore()
    val wm = new Watermarks(spark, store)
    wm.advance("t", "id", (1L to 40L).toDF("id"))
    wm.advance("t", "id", (1L to 70L).toDF("id"))
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a death AFTER .tmp was renamed into place but BEFORE the
    // .bak cleanup: live store holds 70, .bak holds the stale 40
    (1L to 40L).toDF("id").coalesce(1).write.parquet(store + ".bak")
    // plus an abandoned .tmp from yet another dead writer
    (1L to 5L).toDF("id").coalesce(1).write.parquet(store + ".tmp")
    // recovery must KEEP the live store (never let the stale backup win)
    assert(wm.get("t", "id").map(_._1).contains("70"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(store + ".bak")))
    // and the next advance overwrites the abandoned .tmp cleanly
    wm.advance("t", "id", (1L to 90L).toDF("id"))
    assert(wm.get("t", "id").map(_._1).contains("90"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(store + ".tmp")))
  }

  test("timestamp watermarks compare in the column type and filters push down") {
    val wm = new Watermarks(spark, tmpStore())
    val ev = Seq("2023-01-01 00:00:00", "2023-06-01 00:00:00",
        "2023-12-01 00:00:00")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    wm.advance("events", "ts", ev.filter(col("ts") < "2023-07-01"))
    assert(wm.get("events", "ts").map(_._2).contains("timestamp"))
    val inc = wm.beyond(ev, "events", "ts")
    assert(inc.count() === 2) // the boundary row (inclusive) + the new one
    // NULL-valued rows always pass: the watermark cannot order them
    val withNull = ev.unionByName(
      Seq("x").toDF("s").select(lit(null).cast("timestamp").as("ts")))
    assert(wm.beyond(withNull, "events", "ts").count() === 3)
    // the watermark predicate is a plain comparison (the optimizer even
    // constant-folds it through a LocalRelation; over a file source it is
    // a pushable Filter — see the analyzed plan)
    val plan = wm.beyond(ev, "events", "ts").queryExecution.analyzed.toString
    assert(plan.toLowerCase.contains("filter"),
      s"expected a plain comparison filter:\n$plan")
    // stores are independent per (table, column)
    assert(wm.get("events", "other").isEmpty)
  }
}
