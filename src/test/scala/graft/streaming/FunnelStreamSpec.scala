package graft.streaming

import graft.SparkSpec
import graft.io.Tables
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming funnel state must land on the batch min-chain result after
  * chronological micro-batches: the greedy fold IS the min-chain when
  * events arrive in time order, including across state hand-offs.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed funnel advances == batch funnel per user") {
    val base = "target/tmp/stream_funnel"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    val steps = Seq("signup", "view", "click", "purchase")
    val events = Tables.load(spark, sf("0.001"), "events")
      .select(col("user_id"), col("ts"), col("event_type")).cache()
    val cuts = events.select(unix_micros(col("ts")).as("m"))
      .stat.approxQuantile("m", Array(0.5), 0.0)
    events.where(unix_micros(col("ts")) <= cuts(0))
      .coalesce(1).write.parquet(s"$base/in/b0")
    events.where(unix_micros(col("ts")) > cuts(0))
      .coalesce(1).write.parquet(s"$base/in/b1")

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
      .as[FunnelStream.Ev]
    val q = FunnelStream.streaming(stream, steps)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ck")
      .format("memory").queryName("funnel_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // reconstruct per-user step times from the advance log
    val advances = spark.table("funnel_out")
      .as[FunnelStream.Advance].collect()
      .groupBy(_.user_id).view
      .mapValues(_.sortBy(_.step).map(a => a.step -> a.ts_us).toMap).toMap

    val batch = graft.pipeline.TimeSeries
      .funnel(events, "user_id", "ts", "event_type", steps)
      .select(col("user_id"), unix_micros(col("step1_ts")),
        unix_micros(col("step2_ts")), unix_micros(col("step3_ts")),
        unix_micros(col("step4_ts")))
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect()

    assert(batch.nonEmpty)
    batch.foreach { case (u, t1, t2, t3, t4) =>
      val adv = advances.getOrElse(u, Map.empty)
      val expect = Seq(t1, t2, t3, t4)
      expect.zipWithIndex.foreach { case (t, i) =>
        assert(adv.get(i + 1) === t, s"user=$u step ${i + 1}")
      }
      assert(adv.size === expect.count(_.isDefined), s"user=$u extra advances")
    }
    // every streamed user exists in the batch result
    assert(advances.keySet === batch.map(_._1).toSet)
  }
}
