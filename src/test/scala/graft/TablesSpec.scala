package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-robustness gate for `Tables.load`'s `ts` normalization.
  *
  * The driver has regenerated the events fixture with different parquet
  * encodings across rounds — TIMESTAMP(NANOS) (Spark reads as long under
  * nanosAsLong), TIMESTAMP(MICROS) UTC-adjusted (TIMESTAMP), and
  * TIMESTAMP(MICROS) unadjusted (TIMESTAMP_NTZ). One regeneration broke 8
  * queries and 10 tests at once because only the nanos branch was handled.
  * This spec writes `events` under each encoding and asserts `Tables.load`
  * yields TimestampType micros with identical wall-clock values for all
  * three, so the next regeneration is caught in-repo, not by the driver.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // one fixed UTC instant, micros precision
  private val microsUtc = 1723500000123456L // 2024-08-12T22:00:00.123456Z

  private def loadTs(dir: String): (org.apache.spark.sql.types.DataType, Long) = {
    val df = Tables.load(spark, dir, "events")
    val dt = df.schema("ts").dataType
    import org.apache.spark.sql.functions.unix_micros
    val v = df.select(unix_micros(df.col("ts"))).head().getLong(0)
    (dt, v)
  }

  private def writeEvents(dir: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
    mk.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("LTZ-micros fixture loads as TimestampType with exact value") {
    val dir = TestSpark.tmpDir("fix-ltz")
    writeEvents(dir) {
      import org.apache.spark.sql.functions.timestamp_micros
      spark.range(1).select(timestamp_micros(
        org.apache.spark.sql.functions.lit(microsUtc)).as("ts"))
    }
    val (dt, v) = loadTs(dir)
    assert(dt == TimestampType)
    assert(v == microsUtc)
  }

  test("NTZ-micros fixture (unadjusted, current driver encoding) normalizes to TimestampType") {
    val dir = TestSpark.tmpDir("fix-ntz")
    writeEvents(dir) {
      import org.apache.spark.sql.functions.{lit, timestamp_micros}
      val df = spark.range(1)
        .select(timestamp_micros(lit(microsUtc)).cast(TimestampNTZType).as("ts"))
      assert(df.schema("ts").dataType == TimestampNTZType)
      df
    }
    // verify the file really round-trips as NTZ before normalization
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    val (dt, v) = loadTs(dir)
    assert(dt == TimestampType)
    // session tz is UTC, so NTZ wall-clock == the original UTC instant
    assert(v == microsUtc)
  }

  test("nanos-as-long fixture (legacy NANOS encoding) normalizes to TimestampType micros") {
    val dir = TestSpark.tmpDir("fix-nanos")
    // Spark cannot write TIMESTAMP(NANOS) parquet; under nanosAsLong the
    // reader surfaces that physical column as LongType nanos, which is the
    // shape normalizeTs sees — write the long directly to exercise it.
    writeEvents(dir) {
      import org.apache.spark.sql.functions.lit
      spark.range(1).select((lit(microsUtc) * lit(1000L) + lit(789L)).as("ts"))
    }
    val (dt, v) = loadTs(dir)
    assert(dt == TimestampType)
    // sub-micro nanos truncate (same truncation DuckDB applies)
    assert(v == microsUtc)
  }

  test("events fixture on disk loads with TimestampType ts (whatever its vintage)") {
    val df = Tables.load(spark, TestSpark.sf0001, "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.schema("ts").dataType != LongType)
  }
}
