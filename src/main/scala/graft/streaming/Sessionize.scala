package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Sessionization + custom stateful aggregation over the events stream.
  *
  * - [[sessionsBatch]]: gap-based sessions via Spark's native
  *   `session_window` (merges events whose gap < gapDuration). Same
  *   declarative form works for batch and streaming, so the DuckDB oracle
  *   can verify the batch semantics while ScalaTest drives the stream.
  * - [[sessionsStream]]: the streaming form — watermark + session_window,
  *   state bounded by the watermark (the 100 TB-ingest shape).
  * - [[userStatsStream]]: `mapGroupsWithState` — arbitrary per-key state
  *   (the escape hatch when built-in windows can't express the logic).
  */
object Sessionize {

  /** Gap-based sessions per user: (user_id, session_start, session_end_ts,
    * n_events). A new session starts when the gap to the previous event is
    * >= gapMinutes. */
  def sessionsBatch(events: DataFrame, gapMinutes: Int): DataFrame =
    events
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("last_ts"), col("n_events"))

  def sessionsStream(
      spark: SparkSession, parquetPath: String, gapMinutes: Int,
      queryName: String, maxFilesPerTrigger: Int = 1): StreamingQuery = {
    val stream = EventsStreaming.fileStream(spark, parquetPath, maxFilesPerTrigger)
    sessionsBatch(stream.withWatermark("ts", "1 hour"), gapMinutes)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, max_value: Double)

  /** Arbitrary per-user state across micro-batches: cumulative event count
    * and max value, updated with mapGroupsWithState. */
  def userStatsStream(
      spark: SparkSession, parquetPath: String, queryName: String,
      maxFilesPerTrigger: Int = 1): StreamingQuery = {
    import spark.implicits._
    val stream = EventsStreaming.fileStream(spark, parquetPath, maxFilesPerTrigger)
    val typed: Dataset[UserEvent] =
      stream.select(col("user_id"), col("event_type"), col("value")).as[UserEvent]
    val stats = typed
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[UserEvent], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(user, 0L, Double.MinValue))
          val next = rows.foldLeft(prev) { (acc, e) =>
            UserStats(user, acc.n_events + 1, math.max(acc.max_value, e.value))
          }
          state.update(next)
          next
      }
    stats.writeStream.outputMode("update")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
