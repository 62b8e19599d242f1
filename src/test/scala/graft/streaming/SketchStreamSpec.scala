package graft.streaming

import graft.SparkSpec
import graft.pipeline.Sketches
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming HLL maintenance: the store after N micro-batches must hold
  * EXACTLY the registers a batch build over the union produces (max-merge
  * associativity is what makes sketch maintenance incremental), and the
  * version discipline must keep the store bounded.
  */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed register store == batch registers of the union; store bounded") {
    val base = "target/tmp/stream_sketch"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id"), col("source"), col("text")).cache()
    // four files → four micro-batches
    for (i <- 0 until 4)
      docs.where(pmod(col("doc_id"), lit(4)) === i)
        .coalesce(1).write.parquet(s"$base/in/b$i")

    val q = SketchStream.start(spark, s"$base/in/*", s"$base/store",
      s"$base/ck", docs.schema, keyCol = "text",
      groupCols = Seq("source"), m = 64)
    q.awaitTermination(120000)

    val streamed = SketchStream.registers(spark, s"$base/store",
        Sketches.hllRegisters(docs, "text", Seq("source"), 64).schema)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val direct = Sketches.hllRegisters(docs, "text", Seq("source"), 64)
      .as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed === direct)

    // vacuum keeps at most the retry horizon {last-1, last}
    val versions = new java.io.File(s"$base/store").listFiles()
      .filter(_.getName.startsWith("version="))
    assert(versions.length <= 2,
      s"store kept ${versions.length} versions: ${versions.map(_.getName).toSeq}")

    // and the estimate off the maintained store equals the batch estimate
    val estStream = Sketches.hllEstimate(
        SketchStream.registers(spark, s"$base/store",
          Sketches.hllRegisters(docs, "text", Seq("source"), 64).schema),
        Seq("source"), 64, 0.709)
      .as[(String, Long)].collect().toMap
    val estBatch = Sketches.hllEstimate(
        Sketches.hllRegisters(docs, "text", Seq("source"), 64),
        Seq("source"), 64, 0.709)
      .as[(String, Long)].collect().toMap
    assert(estStream === estBatch)
  }
}
