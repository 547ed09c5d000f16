package graft.streaming

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RateAlertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Tiny events parquet: (event_id, event_type, minute offset). */
  private def eventsFile(rows: Seq[(Long, String, Long)]): String = {
    val dir = TestSpark.tmpDir("graft-ra")
    rows.toDF("event_id", "event_type", "min_off")
      .select(col("event_id"), lit(1L).as("user_id"),
        timestamp_micros(col("min_off") * 60L * 1000000L).as("ts"),
        col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    s"$dir/events.parquet"
  }

  private def runStream(rows: Seq[(Long, String, Long)], name: String) = {
    val q = RateAlert.alertStream(spark, eventsFile(rows), name,
      bucketMinutes = 15, threshold = 2, delayMinutes = 30)
    q.awaitTermination()
    spark.table(name)
      .as[(String, Long, Long, String)].collect().toSeq.sorted
  }

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  test("rise on threshold, fall on silence; horizon holds back unproven buckets") {
    // bucket 15m, threshold 2, delay 30m. Driver key (far future) pins the
    // global max at t=300m -> horizon = 270m -> buckets 0..17 proven.
    // key "a": 2 events in bucket 0 (rise), nothing after -> fall at
    //          bucket 1, then a new burst in bucket 4 (rise) + fall at 5
    // key "b": burst at t=290m (bucket 19, beyond horizon) -> NO emission
    var id = 0L
    def e(tpe: String, m: Long) = { id += 1; (id, tpe, m) }
    val got = runStream(Seq(
      e("a", 1), e("a", 2),            // bucket 0: n=2 -> rise
      e("a", 61), e("a", 62),          // bucket 4: n=2 -> rise again
      e("b", 290), e("b", 291),        // bucket 19: unproven
      e("drv", 300)), "graft_ra1")     // pins the watermark
    val a = got.filter(_._1 == "a")
    assert(a === Seq(
      ("a", us(0), 2L, "rise"), ("a", us(15), 0L, "fall"),
      ("a", us(60), 2L, "rise"), ("a", us(75), 0L, "fall")))
    assert(!got.exists(_._1 == "b"))
  }

  test("stream emissions equal the batch reference on a mixed trace") {
    var id = 0L
    def e(tpe: String, m: Long) = { id += 1; (id, tpe, m) }
    val rows = Seq(
      e("x", 0), e("x", 1), e("x", 2),   // bucket 0 above
      e("x", 16), e("x", 17),            // bucket 1 above (no edge)
      e("x", 31),                        // bucket 2 below -> fall
      e("y", 5),                         // never above
      e("x", 200), e("x", 201),          // bucket 13 above -> rise
      e("drv", 400))
    val stream = runStream(rows, "graft_ra2")
    val batch = RateAlert.alertEdgesBatch(
      rows.toDF("event_id", "event_type", "min_off")
        .select(col("event_type"),
          timestamp_micros(col("min_off") * 60L * 1000000L).as("ts")),
      bucketMinutes = 15, threshold = 2, delayMinutes = 30)
      .as[(String, Long, Long, String)].collect().toSeq.sorted
    assert(stream === batch)
    assert(stream.exists(r => r._1 == "x" && r._4 == "fall"))
    assert(!stream.exists(_._1 == "y"))
  }
}
