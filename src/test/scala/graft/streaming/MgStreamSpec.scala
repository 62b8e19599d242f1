package graft.streaming

import graft.SparkSpec
import graft.pipeline.Sketches
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming Misra-Gries maintenance: unlike HLL, the MG fold is
  * order-SENSITIVE (each merge's truncation adds to the error ledger),
  * so the parity target is the batch-mode SEQUENTIAL fold over the same
  * micro-batch boundaries — bit-for-bit — plus the bracket invariant
  * against exact corpus counts, which must hold no matter how the
  * stream was chopped.
  */
class MgStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed MG store == sequential batch fold; bracket holds; store bounded") {
    val base = "target/tmp/stream_mg"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id"), col("source"),
        explode(graft.pipeline.Dedup.tokens(col("text"))).as("token"))
      .cache()
    val batches = (0 until 4).map(i =>
      docs.where(pmod(col("doc_id"), lit(4)) === i).drop("doc_id").cache())
    for (i <- 0 until 4) {
      batches(i).coalesce(1).write.parquet(s"$base/in/b$i")
      Thread.sleep(5) // distinct mod-times pin the micro-batch order
    }
    val k = 8

    val q = MgStream.start(spark, s"$base/in/*", s"$base/store",
      s"$base/ck", batches(0).schema, keyCol = "token",
      groupCols = Seq("source"), k = k)
    q.awaitTermination(120000)

    val outSchema = Sketches.mgSketch(docs, "token", Seq("source"), k).schema
    val streamed = MgStream.sketch(spark, s"$base/store", outSchema)
      .as[(String, String, Long, Long)].collect().toSet

    // the same fold, replayed in batch mode over the same boundaries
    var store = Sketches.mgSketch(batches(0), "token", Seq("source"), k)
    for (i <- 1 until 4) {
      val bs = Sketches.mgSketch(batches(i), "token", Seq("source"), k)
        .withColumn("__src", lit("batch"))
      store = Sketches.mgMerge(
        bs.unionByName(store.withColumn("__src", lit("store"))),
        "token", Seq("source"), k)
    }
    val folded = store.as[(String, String, Long, Long)].collect().toSet
    assert(streamed === folded, "stream must equal the sequential batch fold")

    // bracket vs exact union counts: stored <= true <= stored + err
    val exact = docs.groupBy("source", "token").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(streamed.nonEmpty)
    streamed.foreach { case (src, tok, cnt, err) =>
      val truth = exact((src, tok))
      assert(cnt <= truth && truth <= cnt + err,
        s"($src,$tok): stored $cnt err $err vs exact $truth")
    }
    // per-group size stays <= k across all batches
    streamed.groupBy(_._1).values.foreach(g => assert(g.size <= k))

    // vacuum keeps at most the retry horizon {last-1, last}
    val versions = new java.io.File(s"$base/store").listFiles()
      .filter(_.getName.startsWith("version="))
    assert(versions.length <= 2,
      s"store kept ${versions.length} versions")
  }
}
