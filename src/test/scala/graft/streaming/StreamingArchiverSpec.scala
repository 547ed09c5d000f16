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
}
