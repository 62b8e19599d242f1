package graft.streaming

import graft.SparkSpec
import graft.io.Tables
import graft.pipeline.RangeJoin
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The bucketed range join is STATELESS (point → one bin → equi join →
  * residual), so it runs unchanged as a stream-static join — arriving
  * events attributed against a static interval table at the door, no
  * watermark or state store needed. Streamed output must equal the
  * batch join over the same rows.
  */
class StreamingRangeJoinSpec extends SparkSpec {

  test("stream-static bucketed range join == batch join") {
    val base = "target/tmp/stream_rangejoin"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    val events = Tables.load(spark, sf("0.001"), "events").cache()
    val hourUs = 3600L * 1000000L
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("lo"),
        (unix_micros(col("ts")) + hourUs).as("hi"))
    val points = events.where(col("event_type").isin("click", "view"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("pt"))
      .cache()
    // two files → two micro-batches
    points.where(pmod(col("event_id"), lit(2)) === 0)
      .coalesce(1).write.parquet(s"$base/in/b0")
    points.where(pmod(col("event_id"), lit(2)) === 1)
      .coalesce(1).write.parquet(s"$base/in/b1")

    val stream = spark.readStream.schema(points.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
    val q = RangeJoin.pointInInterval(stream, purchases, Seq("user_id"),
        "pt", "lo", "hi", binWidth = hourUs)
      .select(col("event_id"), col("range.purchase_id").as("purchase_id"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ck")
      .format("memory").queryName("rj_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    import spark.implicits._
    val streamed = spark.table("rj_out").as[(Long, Long)].collect()
    val batch = RangeJoin.pointInInterval(points, purchases, Seq("user_id"),
        "pt", "lo", "hi", binWidth = hourUs)
      .select($"event_id", $"range.purchase_id").as[(Long, Long)]
      .collect().toSet
    assert(batch.nonEmpty)
    assert(streamed.length === streamed.toSet.size, "no duplicates across batches")
    assert(streamed.toSet === batch)
  }
}
