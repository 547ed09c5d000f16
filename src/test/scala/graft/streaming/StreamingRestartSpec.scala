package graft.streaming

import graft.TestSpark

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-restart coverage for the transformWithState processors: stop
  * after an AvailableNow drain, append new source files, restart from the
  * SAME checkpoint, and assert the two runs' emissions partition the
  * full-trace reference — nothing duplicated (state and source offsets
  * resumed), nothing lost (carried state continued, not reset). This is the
  * exactly-once claim the alert/session state machines imply.
  *
  * The memory sink refuses checkpoint recovery by design, so observation
  * here goes through a checkpointed foreachBatch sink — the same recovery
  * path a production fault-tolerant sink uses.
  */
class StreamingRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Append a batch of (event_id, user_id, event_type, minute) rows as a
    * new part file of one shared events parquet directory. */
  private def writeEvents(dir: String,
      rows: Seq[(Long, Long, String, Long)]): Unit =
    rows.toDF("event_id", "user_id", "event_type", "min_off")
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("min_off") * 60L * 1000000L).as("ts"),
        col("event_type"), lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("append").parquet(dir)

  /** Drain `stream` through a checkpointed foreachBatch collector and
    * return everything it emitted during this run. */
  private def drain(stream: DataFrame, ckpt: String): Seq[Row] = {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    val q = StatefulUserAgg.withRocksDb(spark)(
      stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], _: Long) =>
          batch.collect().foreach(buf.add)
        }
        .start())
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toSeq
  }

  private def us(minutes: Long): Long = minutes * 60L * 1000000L

  test("rate alerts resume from the checkpoint: no duplicate, no lost edges") {
    val dir = TestSpark.tmpDir("graft-rst-ra") + "/events.parquet"
    val ckpt = TestSpark.tmpDir("graft-rst-ra-ck")
    def edges(rows: Seq[Row]): Seq[(String, Long, Long, String)] =
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sorted
    // bucket 15m, threshold 2, delay 30m
    // run 1: key "a" bursts in bucket 0 -> rise@0 then fall@1; watermark
    // pinned to 270m by the driver key -> both edges proven and emitted
    writeEvents(dir, Seq(
      (1L, 1L, "a", 1L), (2L, 1L, "a", 2L),
      (3L, 1L, "drv", 300L)))
    val e1 = edges(drain(RateAlert.alertEdges(spark, dir,
      bucketMinutes = 15, threshold = 2, delayMinutes = 30), ckpt))
    assert(e1 === Seq(("a", us(0), 2L, "rise"), ("a", us(15), 0L, "fall")))

    // run 2: append a second burst well past the run-1 watermark; the
    // restarted processor must CONTINUE from the carried alert state
    // (off after the fall) and the recorded source offset (the run-1
    // file is never re-read)
    writeEvents(dir, Seq(
      (4L, 1L, "a", 310L), (5L, 1L, "a", 311L),
      (6L, 1L, "drv", 600L)))
    val e2 = edges(drain(RateAlert.alertEdges(spark, dir,
      bucketMinutes = 15, threshold = 2, delayMinutes = 30), ckpt))
    // only the NEW edges — 310m,311m land in bucket 20 (rise), silence
    // after -> fall@21; the run-1 edges must NOT re-emit
    assert(e2 === Seq(("a", us(300), 2L, "rise"), ("a", us(315), 0L, "fall")))

    // union == the batch reference over the full trace (nothing lost)
    val full = Seq(
      (1L, "a", 1L), (2L, "a", 2L), (3L, "drv", 300L),
      (4L, "a", 310L), (5L, "a", 311L), (6L, "drv", 600L))
      .toDF("event_id", "event_type", "min_off")
      .select(col("event_type"),
        timestamp_micros(col("min_off") * 60L * 1000000L).as("ts"))
    val batch = RateAlert.alertEdgesBatch(full, bucketMinutes = 15,
        threshold = 2, delayMinutes = 30)
      .as[(String, Long, Long, String)].collect().toSeq.sorted
    assert((e1 ++ e2).sorted === batch)
  }

  test("timer sessions resume from the checkpoint: indices continue, " +
      "closed sessions never re-emit") {
    val dir = TestSpark.tmpDir("graft-rst-ts") + "/events.parquet"
    val ckpt = TestSpark.tmpDir("graft-rst-ts-ck")
    def sessions(rows: Seq[Row]): Seq[(Long, Long, Long, Long, Long)] =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).sorted
    // gap 10m, delay 30m
    // run 1: user 1 session [0,5]; driver user 9 at 60m -> watermark 30m
    // proves user 1's timer (15m); user 9 stays open in state
    writeEvents(dir, Seq(
      (1L, 1L, "click", 0L), (2L, 1L, "click", 5L),
      (3L, 9L, "click", 60L)))
    val e1 = sessions(drain(TimerSessions.sessionEvents(spark, dir,
      gapMinutes = 10, delayMinutes = 30), ckpt))
    assert(e1 === Seq((1L, 1L, us(0), us(5), 2L)))

    // run 2: user 1 returns (a SECOND session — the carried session index
    // must continue at 2, proving per-key state survived the restart);
    // user 9's open session gains one event then closes under the new
    // watermark (170m)
    writeEvents(dir, Seq(
      (4L, 1L, "click", 100L), (5L, 1L, "click", 105L),
      (6L, 9L, "click", 61L),
      (7L, 8L, "click", 200L)))
    val e2 = sessions(drain(TimerSessions.sessionEvents(spark, dir,
      gapMinutes = 10, delayMinutes = 30), ckpt))
    assert(e2 === Seq(
      (1L, 2L, us(100), us(105), 2L),
      (9L, 1L, us(60), us(61), 2L)))
    // no (user, session_idx) appears twice across the runs
    val keys = (e1 ++ e2).map(r => (r._1, r._2))
    assert(keys.distinct.size === keys.size)
  }
}
