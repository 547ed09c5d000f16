package graft.operators

import graft.TestSpark

import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("attaches the most recent prior right row per key, inclusive at equal ts") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:10:00")),
      (2L, 10L, ts("2024-01-01 00:30:00")),
      (3L, 10L, ts("2024-01-01 00:05:00")), // before any right row
      (4L, 20L, ts("2024-01-01 00:30:00"))  // other key, no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:10:00"), 100L), // equal ts as event 1 -> matches
      (10L, ts("2024-01-01 00:20:00"), 200L)
    ).toDF("user_id", "ts", "err_id")
    val got = AsOfJoin.leftAsOf(left, right, "user_id", "ts", Seq("err_id"))
      .select("event_id", "asof_err_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L) === Some(100L)) // inclusive boundary
    assert(got(2L) === Some(200L)) // latest prior, not first
    assert(got(3L) === None)       // nothing prior
    assert(got(4L) === None)       // key with no right rows
  }

  test("tolerance nulls matches older than the lookback, keeps the boundary") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 01:00:00")), // match exactly 30 min old
      (2L, 10L, ts("2024-01-01 01:01:00")), // match 31 min old -> stale
      (3L, 10L, ts("2024-01-01 00:31:00"))  // match 1 min old
    ).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 00:30:00"), 100L))
      .toDF("user_id", "ts", "err_id")
    val got = AsOfJoin.leftAsOf(left, right, "user_id", "ts", Seq("err_id"),
        toleranceSeconds = Some(1800L))
      .select("event_id", "asof_err_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L) === Some(100L)) // >= boundary is inclusive
    assert(got(2L) === None)       // beyond the lookback window
    assert(got(3L) === Some(100L))
  }

  test("valueCols may include the ts column itself (matched row's ts)") {
    val left = Seq((1L, 10L, ts("2024-01-01 00:10:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((10L, ts("2024-01-01 00:05:00"), 100L))
      .toDF("user_id", "ts", "err_id")
    val row = AsOfJoin.leftAsOf(left, right, "user_id", "ts",
      Seq("ts", "err_id")).select("asof_ts", "asof_err_id").head()
    assert(row.getTimestamp(0) === ts("2024-01-01 00:05:00"))
    assert(row.getLong(1) === 100L)
  }

  test("left row count is preserved (left-join shape)") {
    val ev = graft.Tables.load(spark, TestSpark.sf0001, "events")
    import org.apache.spark.sql.functions._
    val clicks = ev.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts")
    val errors = ev.filter(col("event_type") === "error")
      .groupBy("user_id", "ts").agg(max("event_id").as("err_id"))
    val joined = AsOfJoin.leftAsOf(clicks, errors, "user_id", "ts", Seq("err_id"))
    assert(joined.count() === clicks.count())
  }
}
