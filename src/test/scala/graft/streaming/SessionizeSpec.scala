package graft.streaming

import graft.{Tables, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Two event files so the stream runs 2 micro-batches and the watermark
    * advances between them (append-mode session output needs finalization). */
  private lazy val twoBatchDir: String = {
    val dir = TestSpark.tmpDir("sess-events")
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    events.filter(col("event_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/batch1")
    events.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/batch2")
    val flat = TestSpark.tmpDir("sess-flat")
    // flatten part files into one directory so maxFilesPerTrigger=1 gives 2 batches
    var i = 0
    Seq("batch1", "batch2").foreach { b =>
      new java.io.File(s"$dir/$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            new java.io.File(s"$flat/part$i.parquet").toPath)
          i += 1
        }
    }
    flat
  }

  test("batch sessionization: gap split is exact on a crafted sequence") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    val ev = Seq(
      (1L, ts(0)), (1L, ts(10)), (1L, ts(29)),  // one session (gaps < 30)
      (1L, ts(59)),   // exactly 30min gap => still merged (boundary inclusive)
      (1L, ts(90)),   // 31min gap => NEW session
      (2L, ts(0))
    ).toDF("user_id", "ts")
    val got = Sessionize.sessionsBatch(ev, 30)
      .select("user_id", "n_events").as[(Long, Long)].collect().sorted
    assert(got === Array((1L, 1L), (1L, 4L), (2L, 1L)))
  }

  test("streaming sessionization emits finalized sessions matching batch") {
    val q = Sessionize.sessionsStream(spark, twoBatchDir, 30, "sess_stream")
    q.awaitTermination()
    val streamed = spark.table("sess_stream")
    val batch = Sessionize.sessionsBatch(
      Tables.load(spark, TestSpark.sf0001, "events"), 30)
    assert(streamed.count() > 0, "watermark must finalize some sessions")
    // every emitted session must exist identically in the batch result
    val missing = streamed.exceptAll(batch)
    assert(missing.count() === 0)
  }

  test("mapGroupsWithState accumulates per-user stats across micro-batches") {
    import spark.implicits._
    val q = Sessionize.userStatsStream(spark, twoBatchDir, "user_stats")
    q.awaitTermination()
    // update-mode memory sink keeps one row per (user, batch); the final
    // state per user must equal the batch-computed totals
    val finalStats = spark.table("user_stats")
      .groupBy("user_id").agg(max("n_events").as("n_events"))
      .as[(Long, Long)].collect().toMap
    val expected = Tables.load(spark, TestSpark.sf0001, "events")
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n")).as[(Long, Long)].collect().toMap
    assert(finalStats === expected)
  }
}
