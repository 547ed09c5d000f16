package graft.streaming

import graft.{Tables, TestSpark}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventsStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming complete-mode result equals the batch aggregation") {
    val batch = EventsStreaming.hourlyBatch(
      Tables.load(spark, TestSpark.sf0001, "events"))
    val q = EventsStreaming.hourlyStream(
      spark, s"${TestSpark.sf0001}/events.parquet", "st_spec_complete")
    q.awaitTermination()
    val stream = spark.table("st_spec_complete")
    assert(stream.count() === batch.count())
    // exact same (window, type) -> counts
    val joined = stream.alias("s").join(batch.alias("b"),
      Seq("win_start", "event_type"))
      .filter(col("s.n_events") =!= col("b.n_events"))
    assert(joined.count() === 0)
  }

  test("sliding windows place every event in exactly size/slide windows") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val slid = EventsStreaming.slidingAgg(ev) // 2h window, 30m hop -> 4x
    val total = slid.agg(sum("n_events")).head().getLong(0)
    assert(total === ev.count() * 4)
    // every (win_start, event_type) is a real aggregation key (no zeros)
    assert(slid.filter(col("n_events") <= 0).count() === 0)
  }

  test("streaming dedup suppresses duplicate ids within the watermark") {
    // source with every event duplicated across two files
    val dir = TestSpark.tmpDir("dup-events")
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    ev.coalesce(1).write.parquet(s"$dir/a")
    ev.coalesce(1).write.parquet(s"$dir/b")
    val flat = TestSpark.tmpDir("dup-flat")
    var i = 0
    Seq("a", "b").foreach { b =>
      new java.io.File(s"$dir/$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).foreach { f =>
          java.nio.file.Files.copy(f.toPath,
            new java.io.File(s"$flat/part$i.parquet").toPath)
          i += 1
        }
    }
    val q = EventsStreaming.dedupStream(spark, flat, "dedup_stream")
    q.awaitTermination()
    val got = spark.table("dedup_stream")
    assert(got.count() === ev.count(), "each event_id must survive exactly once")
  }

  test("stream-stream interval join emits a subset equal to the batch join") {
    val q = EventsStreaming.clickErrorJoinStream(
      spark, s"${TestSpark.sf0001}/events.parquet", "ss_join")
    q.awaitTermination()
    val streamed = spark.table("ss_join")
    val batch = EventsStreaming.clickErrorJoinBatch(
      Tables.load(spark, TestSpark.sf0001, "events"))
    assert(streamed.count() > 0, "some click-error pairs must join")
    // every streamed pair must exist in the batch join (watermark may
    // withhold tail pairs, never invent them)
    assert(streamed.exceptAll(batch).count() === 0)
  }

  test("left-outer stream-stream join: matches complete, unmatched only past the watermark") {
    import org.apache.spark.sql.functions._
    val q = EventsStreaming.clickPurchaseLeftOuterStream(
      spark, s"${TestSpark.sf0001}/events.parquet", "ss_left_outer",
      maxFilesPerTrigger = Int.MaxValue)
    q.awaitTermination()
    val out = spark.table("ss_left_outer").persist()
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("click_us"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("buy_id"), col("user_id").as("bu"),
        unix_micros(col("ts")).as("buy_us"))
    val batchPairs = clicks.join(buys,
      col("user_id") === col("bu") && col("buy_us") > col("click_us") &&
        col("buy_us") <= col("click_us") + lit(3600000000L))
      .select("click_id", "user_id", "click_us", "buy_id", "buy_us")
    // every match the batch join finds is emitted, and nothing invented
    val matched = out.filter(col("buy_id").isNotNull)
    assert(matched.exceptAll(batchPairs).count() === 0)
    assert(batchPairs.exceptAll(matched).count() === 0)
    // null-extended rows: only for clicks the batch join cannot match,
    // and each click appears at most once across the whole output
    val unmatched = out.filter(col("buy_id").isNull)
    assert(unmatched.join(batchPairs, Seq("click_id"), "left_semi")
      .count() === 0, "a matched click must never also emit null-extended")
    assert(out.select("click_id").distinct().count() ===
      out.select("click_id").count() - (matched.count() -
        matched.select("click_id").distinct().count()),
      "only multi-purchase matches may repeat a click_id")
    out.unpersist()
  }

  test("stream-stream join state is bounded by the watermark: eviction " +
      "observed in stateOperators metrics across micro-batches") {
    // the streaming analogue of the PlanSpec gates: st7 is the most
    // expensive bench query every round BECAUSE of its four state stores —
    // this proves the stores drain as the watermark advances instead of
    // accumulating the stream (two time-ordered files -> ordered
    // micro-batches, so batch b's watermark must evict batch a's state)
    val tmp = new java.io.File(TestSpark.tmpDir("st7-state"))
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val split = lit("2024-01-16 00:00:00").cast("timestamp")
    def writeHalf(name: String, half: org.apache.spark.sql.DataFrame,
        mtime: Long): Unit = {
      val stage = new java.io.File(tmp, name + "_stage")
      half.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.listFiles().find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(tmp, name + ".parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime) // file streams order batches by mtime
      stage.listFiles().foreach(_.delete()); stage.delete()
    }
    writeHalf("a", ev.filter(col("ts") < split), 1700000000000L)
    writeHalf("b", ev.filter(col("ts") >= split), 1700000100000L)
    val q = EventsStreaming.clickPurchaseLeftOuterStream(
      spark, tmp.toString, "st7_state_spec", maxFilesPerTrigger = 1)
    q.awaitTermination()
    val stateProgress = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
    assert(stateProgress.size >= 2,
      "need multiple micro-batches to observe watermark movement")
    val removed = stateProgress.flatMap(_.stateOperators.toSeq)
      .map(_.numRowsRemoved).sum
    assert(removed > 0, "watermark advance must EVICT expired join state")
    val finalTotal = stateProgress.last.stateOperators.map(_.numRowsTotal).sum
    val inputs = ev.filter(col("event_type").isin("click", "purchase"))
      .count()
    assert(finalTotal < inputs,
      s"state must stay watermark-bounded, not accumulate the stream: " +
        s"$finalTotal state rows vs $inputs inputs")
  }

  test("append-mode with watermark emits only finalized windows") {
    val q = EventsStreaming.hourlyStreamAppend(
      spark, s"${TestSpark.sf0001}/events.parquet", "st_spec_append")
    q.awaitTermination()
    val appended = spark.table("st_spec_append")
    val batch = EventsStreaming.hourlyBatch(
      Tables.load(spark, TestSpark.sf0001, "events"))
    // watermark holds back windows near max event time; everything emitted
    // must match batch, and the tail windows may be withheld
    assert(appended.count() <= batch.count())
    val mismatched = appended.alias("s").join(batch.alias("b"),
      Seq("win_start", "event_type"))
      .filter(col("s.n_events") =!= col("b.n_events"))
    assert(mismatched.count() === 0)
  }

  test("stream-static enrichment join equals the batch join, tiers are exact") {
    val ev = Tables.load(spark, TestSpark.sf0001, "events")
    val batch = EventsStreaming.tierAgg(ev, EventsStreaming.userTierDim(ev))
    val q = EventsStreaming.tierAggStream(
      spark, s"${TestSpark.sf0001}/events.parquet", "st_spec_tier")
    q.awaitTermination()
    val stream = spark.table("st_spec_tier")
    assert(stream.count() === batch.count())
    assert(stream.exceptAll(batch).count() === 0 &&
      batch.exceptAll(stream).count() === 0,
      "stream-static join must equal the batch join row-for-row")
    // the dim itself: mean split is exhaustive and two-valued
    val dim = EventsStreaming.userTierDim(ev)
    assert(dim.count() === ev.select("user_id").distinct().count())
    assert(dim.select("user_tier").distinct().count() <= 2)
  }
}
