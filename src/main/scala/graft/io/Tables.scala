package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Driver-fixture table loader (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet writers encode event time three different ways, and the engine
    * owns all of them — a lakehouse table's timestamp encoding is the
    * writer's choice, not ours:
    *
    *  - TIMESTAMP(NANOS): Spark 4 reads it only via
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/
    *    test sessions), arriving as LongType nanos → floor-divide to micros
    *    (integer `div` keeps full precision; ns-since-epoch exceeds Double's
    *    2^53 mantissa).
    *  - timestamp[us] with isAdjustedToUTC=false: arrives as TIMESTAMP_NTZ,
    *    which Spark refuses in casts to DOUBLE, `unix_micros`, and
    *    `withWatermark` → cast to TIMESTAMP (sessions run UTC, so the
    *    wall-clock value is preserved and epoch arithmetic matches the
    *    DuckDB oracle's naive-timestamp `epoch_us`).
    *  - plain TIMESTAMP: pass through.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df, "ts") else df
  }

  /** Normalize one event-time column to TimestampType whatever the parquet
    * encoding delivered (legacy-nanos Long, TIMESTAMP_NTZ, or TIMESTAMP). */
  def normalizeTs(df: DataFrame, colName: String): DataFrame =
    df.schema(colName).dataType match {
      case LongType =>
        // `div` truncates toward zero; floor-divide so hypothetical
        // pre-epoch nanos don't round up a microsecond
        df.withColumn(colName, timestamp_micros(expr(
          s"CASE WHEN $colName >= 0 THEN $colName div 1000 " +
            s"ELSE -((-$colName + 999) div 1000) END")))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }

  /** Column form: a TIMESTAMP however the source typed it (NTZ included). */
  def tsCol(df: DataFrame, colName: String): Column =
    df.schema(colName).dataType match {
      case TimestampNTZType => col(colName).cast(TimestampType)
      case _                => col(colName)
    }
}
