package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The loader owns every parquet event-time encoding: legacy
  * TIMESTAMP(NANOS)-as-Long, timestamp[us] NTZ, and plain TIMESTAMP must
  * all come out as one TimestampType schema with identical values.
  */
class TablesSpec extends SparkSpec {

  private val base = "target/tmp/tables_spec"

  // 2024-03-01 12:34:56.789012 UTC, in epoch micros
  private val us = 1709296496789012L

  test("all three parquet ts encodings normalize to one schema and value") {
    import spark.implicits._
    val fs = new java.io.File(base)
    org.apache.commons.io.FileUtils.deleteQuietly(fs)

    // plain TIMESTAMP (writer adjusts to UTC)
    Seq((1L, us)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
      .write.parquet(s"$base/tz/events.parquet")
    // TIMESTAMP_NTZ (timestamp[us], isAdjustedToUTC=false — the round-6
    // fixture encoding that broke the time layer)
    Seq((1L, us)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$base/ntz/events.parquet")
    // legacy TIMESTAMP(NANOS): nanosAsLong delivers a LongType of nanos,
    // which a raw Long column reproduces exactly at the loader's boundary
    Seq((1L, us * 1000L)).toDF("event_id", "ts")
      .write.parquet(s"$base/nanos/events.parquet")

    val out = Seq("tz", "ntz", "nanos").map { enc =>
      val df = Tables.load(spark, s"$base/$enc", "events")
      assert(df.schema("ts").dataType == TimestampType, s"enc=$enc")
      df.select(unix_micros(col("ts"))).as[Long].head()
    }
    assert(out == Seq(us, us, us))
  }

  test("normalizeTs floor-divides pre-epoch nanos") {
    import spark.implicits._
    // -1500 ns is -2 us floored (truncation toward zero would give -1)
    val df = Seq((1L, -1500L)).toDF("event_id", "ts")
    val norm = Tables.normalizeTs(df, "ts")
    assert(norm.select(unix_micros(col("ts"))).as[Long].head() == -2L)
  }

  test("normalizeTs leaves plain TIMESTAMP untouched") {
    import spark.implicits._
    val df = Seq((1L, us)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"))
    assert(Tables.normalizeTs(df, "ts") eq df)
  }
}
