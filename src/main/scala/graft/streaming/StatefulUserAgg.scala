package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, StreamingQuery,
  TimeMode, TimerValues, Trigger, TTLConfig, ValueState}

/** Arbitrary per-key streaming state on the Spark 4 `transformWithState`
  * API (the successor to mapGroupsWithState: versioned state variables,
  * TTL, timers, RocksDB-backed). Here: a running per-user aggregate held
  * in a `ValueState`, updated as event batches stream in — the
  * unbounded-ingest form of a per-user groupBy, with state the engine can
  * TTL/evict instead of an ever-growing shuffle.
  *
  * Value amounts are aggregated as integer CENTS (floor(value·100)) so the
  * running state is exact integer arithmetic: replays, batch boundaries,
  * and partitioning cannot change the result — which is what lets the
  * batch oracle check a streaming-state query at all.
  */
class UserAggProcessor
  extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var state: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[(Long, Long)]("agg",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(
      key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    var (n, cents) = if (state.exists()) state.get() else (0L, 0L)
    rows.foreach { case (_, c) => n += 1; cents += c }
    state.update((n, cents))
    Iterator.single((key, n, cents))
  }
}

object StatefulUserAgg {

  /** Per-user running (event count, value cents) over a parquet file
    * stream; memory-sink observation named `queryName`. Each trigger emits
    * the keys it saw with their UPDATED running totals (so with one input
    * batch the emission is the final per-user aggregate). */
  /** transformWithState requires the RocksDB state store. The provider is
    * a session-global conf read at query START, so flip it only for this
    * start and put the previous value back immediately after — later
    * streaming queries in the same session keep their own backend. */
  private[streaming] def withRocksDb[A](spark: SparkSession)(start: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try start
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  def userAggStream(
      spark: SparkSession, parquetPath: String, queryName: String): StreamingQuery = {
    import spark.implicits._
    val writer = EventsStreaming.fileStream(spark, parquetPath)
      .select(col("user_id"),
        floor(col("value") * 100.0).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new UserAggProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "n_events", "value_cents")
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
    withRocksDb(spark)(writer.start())
  }
}
