package graft.streaming

import graft.SparkSpec
import graft.io.Tables
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming EWMA must equal the batch fold bit-for-bit when micro-batches
  * arrive in chronological order — the state hand-off across the batch
  * boundary is exactly the per-key accumulator.
  */
class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming EWMA over chronological micro-batches == batch fold") {
    val base = "target/tmp/stream_ewma"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    val events = Tables.load(spark, sf("0.001"), "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .cache()
    // three chronological files → three micro-batches → the accumulator
    // must survive two state hand-offs; cut on exact event-time micros
    // so batch boundaries are strictly time-ordered
    val cuts = events.select(unix_micros(col("ts")).as("m"))
      .stat.approxQuantile("m", Array(0.33, 0.66), 0.0)
    events.where(unix_micros(col("ts")) <= cuts(0))
      .coalesce(1).write.parquet(s"$base/in/b0")
    events.where(unix_micros(col("ts")) > cuts(0) &&
        unix_micros(col("ts")) <= cuts(1))
      .coalesce(1).write.parquet(s"$base/in/b1")
    events.where(unix_micros(col("ts")) > cuts(1))
      .coalesce(1).write.parquet(s"$base/in/b2")

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$base/in/*")
      .as[EwmaStream.Ev]
    val q = EwmaStream.streaming(stream, alpha = 0.25)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ck")
      .format("memory").queryName("ewma_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamedMap = spark.table("ewma_out")
      .select($"key", $"tie", $"ewma_micro")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val batch = graft.pipeline.TimeSeries
      .ewma(events, "user_id", "ts", "event_id", "value", alpha = 0.25)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(streamedMap.size === batch.size)
    assert(streamedMap === batch)
  }
}
