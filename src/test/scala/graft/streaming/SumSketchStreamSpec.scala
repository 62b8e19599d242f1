package graft.streaming

import graft.SparkSpec
import graft.pipeline.Sketches
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Sum-merged sketch streams (CMS counters, HDR histograms): addition
  * is exact and associative, so the maintained store must equal a
  * batch build over the UNION bit-for-bit — the strongest parity class
  * — regardless of how the stream was chopped into micro-batches.
  */
class SumSketchStreamSpec extends SparkSpec {
  import spark.implicits._

  private def runStream(tag: String, src: DataFrame,
      build: DataFrame => DataFrame, keyCols: Seq[String],
      countCol: String): DataFrame = {
    val base = s"target/tmp/stream_sum_$tag"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    for (i <- 0 until 4) {
      src.where(pmod(col("__split"), lit(4)) === i).drop("__split")
        .coalesce(1).write.parquet(s"$base/in/b$i")
      Thread.sleep(5)
    }
    val q = SumSketchStream.start(spark, s"$base/in/*", s"$base/store",
      s"$base/ck", src.drop("__split").schema, build, keyCols, countCol)
    q.awaitTermination(120000)
    val store = SumSketchStream.sketch(spark, s"$base/store",
      build(src.drop("__split")).schema)
    val versions = new java.io.File(s"$base/store").listFiles()
      .filter(_.getName.startsWith("version="))
    assert(versions.length <= 2, s"store kept ${versions.length} versions")
    store
  }

  test("streamed CMS counter store == batch counters of the union") {
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id").as("__split"),
        explode(graft.pipeline.Dedup.tokens(col("text"))).as("token"))
      .cache()
    val streamed = runStream("cms", docs,
      b => Sketches.cmsCounters(b, "token", depth = 4, width = 256),
      Seq("row", "col"), "n")
      .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val direct = Sketches.cmsCounters(docs.drop("__split"), "token",
        depth = 4, width = 256)
      .as[(Int, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed === direct)
  }

  test("streamed HDR histogram store == batch histogram of the union") {
    val li = graft.io.Tables.load(spark, sf("0.001"), "lineitem").select(
      col("l_orderkey").as("__split"), col("l_returnflag").as("flag"),
      expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
      .cache()
    val streamed = runStream("hdr", li,
      b => Sketches.hdrHistogram(b, "cents", Seq("flag"), subBits = 5),
      Seq("flag", "bucket"), "n")
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val direct = Sketches.hdrHistogram(li.drop("__split"), "cents",
        Seq("flag"), subBits = 5)
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed === direct)
    // and the quantiles read off the maintained store match batch ones
    val sq = Sketches.hdrQuantiles(
        SumSketchStream.sketch(spark, "target/tmp/stream_sum_hdr/store",
          Sketches.hdrHistogram(li.drop("__split"), "cents",
            Seq("flag"), 5).schema),
        Seq("flag"), 5, Seq((1, 2), (99, 100)))
      .collect().toSet
    val bq = Sketches.hdrQuantiles(
        Sketches.hdrHistogram(li.drop("__split"), "cents", Seq("flag"), 5),
        Seq("flag"), 5, Seq((1, 2), (99, 100)))
      .collect().toSet
    assert(sq === bq)
  }
}
