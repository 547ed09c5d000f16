package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, StreamingQuery, TimeMode, TimerValues, Trigger, TTLConfig,
  ValueState}

/** Threshold-crossing rate alerting: per key (event_type), event counts in
  * fixed buckets become an alert STATE (above/below a rate threshold), and
  * only the TRANSITIONS emit — `rise` when a bucket first reaches the
  * threshold, `fall` when the rate drops back below it (including via a
  * silent bucket: absence of events IS a rate of zero, so the bucket grid
  * is zero-filled between the key's first activity and the emission
  * horizon). The monitoring/alerting staple — page on the edge, not on
  * every hot bucket.
  *
  * The streaming form is a `transformWithState` processor (the windowed
  * count is declarative, but edge detection needs the PREVIOUS bucket's
  * state — a chained aggregation streaming append mode cannot express):
  * per-key event times buffer in ListState; one moving event-time timer
  * (last activity + delay) fires when the watermark proves a prefix of
  * buckets complete; proven buckets zero-fill, compare against the carried
  * alert state, emit transitions, and the carried state/buffer advance.
  * Unproven buckets stay in state — an alert edge never emits until the
  * watermark guarantees no late event can flip it (the same
  * emit-once-proven discipline as [[TimerSessions]]).
  *
  * Scale shape: state per key is (bounded) pending event times + two
  * scalars in RocksDB; the only shuffle is the key hash. Integer
  * microsecond bucket arithmetic end-to-end, so the batch form
  * ([[alertEdgesBatch]]) and a SQL oracle reproduce the stream's emissions
  * exactly under the shared horizon predicate.
  */
class RateAlertProcessor(bucketUs: Long, threshold: Long)
  extends StatefulProcessor[String, (String, Long), (String, Long, Long, String)] {

  // pending (bucketId, count) increments — PRE-AGGREGATED per batch and
  // written with ONE appendList per key per batch. Appending raw event
  // times one RocksDB merge at a time is the naive alternative and
  // measured minutes-slow on hot keys (a 20k-event key = 20k list
  // merges); counts bound state by buckets TOUCHED, not events seen
  @transient private var buf: ListState[(Long, Long)] = _
  @transient private var timerAt: ValueState[Long] = _
  // last fully-processed bucket id and whether the alert was ON after it
  @transient private var lastBucket: ValueState[Long] = _
  @transient private var alertOn: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[(Long, Long)]("buf",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)
    timerAt = getHandle.getValueState[Long]("timerAt", Encoders.scalaLong,
      TTLConfig.NONE)
    lastBucket = getHandle.getValueState[Long]("lastBucket",
      Encoders.scalaLong, TTLConfig.NONE)
    alertOn = getHandle.getValueState[Boolean]("alertOn",
      Encoders.scalaBoolean, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: String, rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long, String)] = {
    var maxUs = Long.MinValue
    val inc = scala.collection.mutable.LongMap.empty[Long]
    rows.foreach { case (_, us) =>
      // floorDiv, not truncating /: expiry path and the batch/SQL oracles
      // all floor-divide, and pre-epoch (negative) timestamps must land in
      // the same bucket on both paths.
      val b = Math.floorDiv(us, bucketUs)
      inc(b) = inc.getOrElse(b, 0L) + 1L
      if (us > maxUs) maxUs = us
    }
    if (inc.nonEmpty)
      buf.appendList(inc.iterator.map { case (b, n) => (b, n) }.toArray)
    if (maxUs != Long.MinValue) {
      // arm ONE timer just past the current watermark: it expires in the
      // batch AFTER this one, when the watermark has advanced over this
      // batch's data — i.e. "wake me when more buckets become provable".
      // (Arming at the key's own last event time would strand keys whose
      // latest activity sits inside the watermark delay — most keys on a
      // live stream.) Forward-move-only, single live timer per key.
      val want = timerValues.getCurrentWatermarkInMs() + 1
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
      key: String, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(String, Long, Long, String)] = {
    timerAt.clear()
    val wmUs = timerValues.getCurrentWatermarkInMs() * 1000L
    // buckets with end <= watermark are complete: no late event can land
    val provenEnd = Math.floorDiv(wmUs, bucketUs) // first UNPROVEN bucket id
    val entries = buf.get().toArray
    if (entries.isEmpty) return Iterator.empty
    val (done, pending) = entries.partition { case (b, _) => b < provenEnd }
    if (done.isEmpty) return Iterator.empty
    buf.clear()
    if (pending.nonEmpty) buf.appendList(pending)
    val counts = scala.collection.mutable.LongMap.empty[Long]
    done.foreach { case (b, n) => counts(b) = counts.getOrElse(b, 0L) + n }
    val startBucket =
      if (lastBucket.exists()) lastBucket.get() + 1 else counts.keys.min
    var on = alertOn.exists() && alertOn.get()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, String)]
    // evaluate EVERY proven bucket, including trailing silent ones — a
    // quiet stretch right before the horizon is a proven `fall`
    var b = startBucket
    while (b < provenEnd) {
      val n = counts.getOrElse(b, 0L) // zero-fill: silence is rate zero
      val above = n >= threshold
      if (above != on) {
        out += ((key, b * bucketUs, n, if (above) "rise" else "fall"))
        on = above
      }
      b += 1
    }
    lastBucket.update(provenEnd - 1)
    alertOn.update(on)
    out.iterator
  }
}

object RateAlert {

  /** Batch reference implementation with identical semantics: per-type
    * bucket counts on a zero-filled grid from the type's first bucket to
    * the horizon (`max(ts) - delay` across the whole input — the final
    * watermark an AvailableNow run proves), lag-compared, transitions
    * only. One aggregation + one bounded spine + one window. */
  def alertEdgesBatch(events: DataFrame, bucketMinutes: Int,
      threshold: Long, delayMinutes: Int): DataFrame = {
    val bucketUs = bucketMinutes * 60L * 1000000L
    val e = events.filter(col("ts").isNotNull)
      .select(col("event_type"),
        floor(unix_micros(col("ts")) / bucketUs).cast("long").as("bk"))
    // the horizon mirrors the stream's watermark EXACTLY, including its
    // millisecond truncation of the max event time
    val wm = events.filter(col("ts").isNotNull)
      .agg(floor(((floor(unix_micros(max(col("ts"))) / 1000L) -
        delayMinutes * 60L * 1000L) * 1000L) / bucketUs)
        .cast("long").as("proven"))
    val counts = e.groupBy("event_type", "bk").agg(count(lit(1)).as("n"))
    val span = counts.groupBy("event_type").agg(min(col("bk")).as("b0"))
    val spine = span.crossJoin(broadcast(wm))
      .filter(col("b0") < col("proven"))
      .select(col("event_type"),
        explode(sequence(col("b0"), col("proven") - 1)).as("bk"))
    val grid = spine.join(counts, Seq("event_type", "bk"), "left")
      .select(col("event_type"), col("bk"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("bk")
    grid
      .withColumn("above", col("n") >= threshold)
      .withColumn("prev", lag(col("above"), 1, false).over(w))
      .filter(col("above") =!= col("prev"))
      .select(col("event_type"), (col("bk") * bucketUs).as("bucket_us"),
        col("n").as("n_events"),
        when(col("above"), "rise").otherwise("fall").as("edge"))
  }

  /** The alert-edge transform: watermarked events -> per-type stateful
    * edge stream. Factored out so every sink shape (memory observation
    * here; checkpointed foreachBatch in the restart spec; a real
    * fault-tolerant sink in production) runs the identical pipeline. */
  def alertEdges(spark: SparkSession, parquetPath: String,
      bucketMinutes: Int, threshold: Long, delayMinutes: Int): DataFrame = {
    import spark.implicits._
    val bucketUs = bucketMinutes * 60L * 1000000L
    EventsStreaming.fileStream(spark, parquetPath)
      .filter(col("ts").isNotNull)
      .withWatermark("ts", s"$delayMinutes minutes")
      .select(col("event_type"), unix_micros(col("ts")).as("ts_us"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new RateAlertProcessor(bucketUs, threshold),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF("event_type", "bucket_us", "n_events", "edge")
  }

  /** Streaming form: parquet file stream, watermarked `delayMinutes`,
    * alert edges via [[RateAlertProcessor]]; memory-sink observation.
    * (The memory sink cannot recover from a checkpoint by design — for
    * restart semantics pair [[alertEdges]] with a fault-tolerant sink;
    * StreamingRestartSpec proves exactly-once across a restart that
    * way.) */
  def alertStream(
      spark: SparkSession, parquetPath: String, queryName: String,
      bucketMinutes: Int, threshold: Long,
      delayMinutes: Int): StreamingQuery = {
    val writer = alertEdges(spark, parquetPath, bucketMinutes, threshold,
        delayMinutes)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
    StatefulUserAgg.withRocksDb(spark)(writer.start())
  }
}
