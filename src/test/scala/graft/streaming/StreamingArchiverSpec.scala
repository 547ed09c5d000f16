package graft.streaming

import java.time.Instant

import graft.{Tables, TestSpark}
import graft.operators.Retention
import graft.sinks.ParquetUpsertSink

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingArchiverSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val snap = Instant.parse("2024-01-20T00:00:00Z")

  test("streamed archive equals the batch retention filter; restart adds no dupes") {
    val src = TestSpark.writableCopy()
    val arch = TestSpark.tmpDir("stream-arch")
    val ckpt = TestSpark.tmpDir("stream-ckpt")
    val sink = new ParquetUpsertSink(arch)
    val spec = Tables.byName("events")

    val q = StreamingArchiver.start(spark, src, spec, Seq(sink), "live",
      retention = "24 HOURS", checkpoint = ckpt, now = Some(snap))
    q.awaitTermination()

    val expected = Tables.load(spark, TestSpark.sf0001, "events")
      .filter(Retention.predicate("ts", snap, "24 HOURS"))
    val got = sink.read(spark, "live", "events")
    assert(got.count() === expected.count())
    assert(got.count() > 0)
    assert(got.exceptAll(expected).count() === 0)

    // fresh checkpoint, same source+sink: upsert keeps the archive exact
    val q2 = StreamingArchiver.start(spark, src, spec, Seq(sink), "live",
      retention = "24 HOURS", checkpoint = TestSpark.tmpDir("ckpt2"), now = Some(snap))
    q2.awaitTermination()
    assert(sink.read(spark, "live", "events").count() === expected.count())
  }

  test("a failing sink fails the batch; restart with a healthy sink loses nothing") {
    val src = TestSpark.writableCopy()
    val arch = TestSpark.tmpDir("stream-arch2")
    val ckpt = TestSpark.tmpDir("stream-ckpt2")
    val spec = Tables.byName("events")
    val boom = new graft.sinks.Sink {
      def name = "boom"
      def write(db: String, spec: Tables.TableSpec,
          df: org.apache.spark.sql.DataFrame, dryRun: Boolean): Unit =
        throw new RuntimeException("sink down")
    }
    val q = StreamingArchiver.start(spark, src, spec, Seq(boom), "live",
      retention = "24 HOURS", checkpoint = ckpt, now = Some(snap))
    val failed = intercept[Exception](q.awaitTermination())
    assert(failed.getMessage != null)
    // restart over the SAME checkpoint with a working sink: the failed
    // batch was never committed, so it replays and the archive is complete
    val sink = new ParquetUpsertSink(arch)
    val q2 = StreamingArchiver.start(spark, src, spec, Seq(sink), "live",
      retention = "24 HOURS", checkpoint = ckpt, now = Some(snap))
    q2.awaitTermination()
    val expected = Tables.load(spark, TestSpark.sf0001, "events")
      .filter(Retention.predicate("ts", snap, "24 HOURS"))
    assert(sink.read(spark, "live", "events").count() === expected.count())
  }
}
