package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Driver-fixture table loader (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark 4 only reads via
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set in Verify/Bench/test
    * sessions). Normalize it back to a timestamp here; integer `div` keeps
    * full precision (ns-since-epoch exceeds Double's 2^53 mantissa).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `div` truncates toward zero; floor-divide so hypothetical pre-epoch
    // nanos don't round up a microsecond
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(
        expr("CASE WHEN ts >= 0 THEN ts div 1000 ELSE -((-ts + 999) div 1000) END")))
    else df
  }
}
