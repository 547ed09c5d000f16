package graft.streaming

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TimerSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Write a tiny events parquet with the schema the stream expects. */
  private def eventsFile(rows: Seq[(Long, Long, String)]): String = {
    val dir = TestSpark.tmpDir("graft-tsn")
    rows.toDF("event_id", "user_id", "min_off")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("min_off").cast("long") * 60L * 1000000L)
          .as("ts"),
        lit("click").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    s"$dir/events.parquet"
  }

  private def run(rows: Seq[(Long, Long, String)], name: String):
      Map[(Long, Long), (Long, Long, Long)] = {
    val q = TimerSessions.sessionStream(spark, eventsFile(rows), name,
      gapMinutes = 10, delayMinutes = 30)
    q.awaitTermination()
    spark.table(name)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
  }

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  test("watermark-proven sessions emit complete; open sessions stay in state") {
    // gap 10m, delay 30m; global max at t=70m -> watermark 40m
    // user 1: 0m, 5m, 30m  -> sessions [0,5m](2) and [30m,30m](1);
    //         timer at 30m+10m=40m == watermark -> the boundary case
    // user 2: 70m          -> timer at 80m > wm -> open, NOT emitted
    // user 3: 0m, 2m       -> timer at 12m < wm -> both in one session
    val got = run(Seq(
      (1L, 1L, "0"), (2L, 1L, "5"), (3L, 1L, "30"),
      (4L, 2L, "70"),
      (5L, 3L, "0"), (6L, 3L, "2")), "graft_tsn1")
    // user 3 emits one complete session
    assert(got((3L, 1L)) === ((us(0), us(2), 2L)))
    // user 2's session is NOT provably closed — nothing emitted
    assert(!got.keySet.exists(_._1 == 2L))
    // user 1: the boundary case — timer expiry == watermark exactly.
    // Spark fires timers INCLUSIVELY (expiry <= watermark), pinned here
    // because the st9 oracle mirrors this exact rule; if an upgrade
    // flips it to strict comparison this assertion catches it
    assert(got((1L, 1L)) === ((us(0), us(5), 2L)))
    assert(got((1L, 2L)) === ((us(30), us(30), 1L)))
  }

  test("session assembly is arrival-order independent (buffer sorts at emission)") {
    // same events, shuffled ids/order in the file; global max 60m -> wm 30m
    // user 7: 0m, 11m, 12m -> [0,0](1) then [11m,12m](2); timer 22m < wm
    val a = run(Seq(
      (1L, 7L, "12"), (2L, 7L, "0"), (3L, 7L, "11"),
      (4L, 8L, "60")), "graft_tsn2")
    assert(a((7L, 1L)) === ((us(0), us(0), 1L)))
    assert(a((7L, 2L)) === ((us(11), us(12), 2L)))
  }
}
