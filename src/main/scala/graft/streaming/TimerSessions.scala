package graft.streaming

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig,
  ValueState}

/** Inactivity-gap sessionization on EVENT-TIME TIMERS — the
  * `transformWithState` shape `session_window` (st6) cannot express:
  * sessions are held open in per-key state and emitted only when the
  * WATERMARK proves the user has been idle for the full gap, so a session
  * closes exactly once, complete, and never re-opens. st6's built-in
  * operator owns this logic internally; here it is explicit state — the
  * template for custom session semantics (per-session caps, carried
  * aggregates, straddling emission policies) the built-in cannot do.
  *
  * Mechanics per key: arriving event times buffer in a `ListState`
  * (micro-batch arrival order is irrelevant — the buffer is sorted at
  * emission); ONE live event-time timer per key tracks
  * `ms(last activity) + gap`, re-registered forward as later activity
  * arrives (the previous timer is deleted — the handle API keeps every
  * registered timer otherwise). When the watermark passes the timer, the
  * buffered times sort, split into gap-islands, and emit as complete
  * sessions; state clears to empty. Integer microsecond arithmetic
  * throughout — emission content is engine- and partitioning-exact, which
  * is what lets a batch SQL oracle check a timer-driven streaming query.
  *
  * Scale shape: state is per-user event-time longs (8 bytes/event) in
  * RocksDB, not shuffle-resident; the only shuffle is the groupByKey hash
  * on user id. At 100 TB the buffer bound is the session length bound —
  * a production deployment adds a per-key cap (emit-and-truncate) in
  * `handleInputRows`, which this processor's explicit buffer makes a
  * two-line change.
  */
class SessionTimerProcessor(gapMs: Long)
  extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long, Long)] {

  @transient private var buf: ListState[Long] = _
  @transient private var timerAt: ValueState[Long] = _
  // next session index for this key — PERSISTED, not a local counter: a
  // key whose sessions emit across several timer expiries (a live stream,
  // or a checkpoint restart) must keep numbering where it left off, or
  // downstream consumers see duplicate (user, session_idx) keys
  @transient private var nextIdx: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[Long]("buf", Encoders.scalaLong,
      TTLConfig.NONE)
    timerAt = getHandle.getValueState[Long]("timerAt", Encoders.scalaLong,
      TTLConfig.NONE)
    nextIdx = getHandle.getValueState[Long]("nextIdx", Encoders.scalaLong,
      TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
    // one appendList per key per batch: per-event appendValue is one
    // RocksDB merge operand each, and the merge-chain read at timer
    // expiry is what melts on hot keys (measured minutes-slow at 20k
    // events/key in the RateAlert twin of this processor)
    val batch = scala.collection.mutable.ArrayBuffer.empty[Long]
    var maxUs = Long.MinValue
    rows.foreach { case (_, us) =>
      batch += us
      if (us > maxUs) maxUs = us
    }
    if (batch.nonEmpty) buf.appendList(batch.toArray)
    if (maxUs != Long.MinValue) {
      // single live timer per key: last-activity ms + gap, moved forward
      // only (an older batch must never pull an armed timer backwards)
      val want = maxUs / 1000 + gapMs
      val cur = if (timerAt.exists()) timerAt.get() else Long.MinValue
      if (want > cur) {
        if (cur != Long.MinValue) getHandle.deleteTimer(cur)
        getHandle.registerTimer(want)
        timerAt.update(want)
      }
    }
    Iterator.empty
  }

  override def handleExpiredTimer(
      key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long, Long)] = {
    val times = buf.get().toArray.sorted
    buf.clear()
    timerAt.clear()
    if (times.isEmpty) Iterator.empty
    else {
      val gapUs = gapMs * 1000L
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long, Long, Long)]
      var idx = if (nextIdx.exists()) nextIdx.get() else 1L
      var start = times(0); var last = times(0); var n = 1L
      var i = 1
      while (i < times.length) {
        val t = times(i)
        if (t - last > gapUs) {
          out += ((key, idx, start, last, n))
          idx += 1; start = t; n = 0L
        }
        last = t; n += 1
        i += 1
      }
      out += ((key, idx, start, last, n))
      nextIdx.update(idx + 1)
      out.iterator
    }
  }
}

object TimerSessions {

  /** Per-user gap sessions over a parquet file stream, emitted on
    * event-time timer expiry; memory-sink observation named `queryName`.
    * Output: (user_id, session_idx, start_us, end_us, n_events). Only
    * sessions the watermark has PROVEN closed (user idle >= gap as of
    * `max(ts) - delay`) are emitted — open sessions stay in state, which
    * is exactly the correctness contract a downstream consumer wants.
    */
  /** The session transform: watermarked events -> per-user proven-closed
    * session stream (see [[RateAlert.alertEdges]] for why this is
    * factored from the sink). */
  def sessionEvents(spark: SparkSession, parquetPath: String,
      gapMinutes: Int, delayMinutes: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    EventsStreaming.fileStream(spark, parquetPath)
      .filter(col("ts").isNotNull)
      .withWatermark("ts", s"$delayMinutes minutes")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapMinutes * 60000L),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("user_id", "session_idx", "start_us", "end_us", "n_events")
  }

  def sessionStream(
      spark: SparkSession, parquetPath: String, queryName: String,
      gapMinutes: Int = 10, delayMinutes: Int = 30): StreamingQuery = {
    val writer = sessionEvents(spark, parquetPath, gapMinutes, delayMinutes)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
    StatefulUserAgg.withRocksDb(spark)(writer.start())
  }
}
