package graft.streaming

import graft.SparkSpec
import graft.pipeline.Sampling
import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streamed reservoir maintenance: min-k over a fixed total order is
  * associative and idempotent, so the maintained store must equal the
  * batch reservoir of the UNION bit-for-bit no matter how (or how
  * unevenly) the stream was chopped.
  */
class ReservoirStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed reservoir == batch reservoir of the union, any chopping") {
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("source"), col("doc_id")).cache()
    val direct = Sampling.hashReservoir(docs, 20, Seq("source"))
      .as[(String, Long, Long)].collect().toSet

    for ((nChops, tag) <- Seq((4, "a"), (7, "b"))) {
      val base = s"target/tmp/stream_res_$tag"
      FileUtils.deleteDirectory(new java.io.File(base))
      Files.createDirectories(Paths.get(s"$base/in"))
      for (i <- 0 until nChops) {
        docs.where(pmod(col("doc_id"), lit(nChops)) === i)
          .coalesce(1).write.parquet(s"$base/in/b$i")
        Thread.sleep(5)
      }
      val q = ReservoirStream.start(spark, s"$base/in/*", s"$base/store",
        s"$base/ck", docs.schema, k = 20, groupCols = Seq("source"))
      q.awaitTermination(120000)
      val streamed = ReservoirStream.reservoir(spark, s"$base/store",
          Sampling.hashReservoir(docs, 20, Seq("source")).schema)
        .as[(String, Long, Long)].collect().toSet
      assert(streamed === direct, s"chopping x$nChops diverged")
      val versions = new java.io.File(s"$base/store").listFiles()
        .filter(_.getName.startsWith("version="))
      assert(versions.length <= 2)
    }
  }

  test("global reservoir plans a TakeOrdered, never a one-partition window sort") {
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id"))
    val plan = Sampling.hashReservoir(docs, 20, Seq.empty)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k + driver merge:\n$plan")
    assert(!plan.contains("Window"),
      s"global reservoir must not window-sort the corpus:\n$plan")
    // and it selects the same rows as the grouped machinery would
    val viaGlobal = Sampling.hashReservoir(docs, 20, Seq.empty)
      .select("doc_id").as[Long].collect().toSet
    val viaGroup = Sampling.hashReservoir(
        docs.withColumn("g", lit(1)), 20, Seq("g"))
      .select("doc_id").as[Long].collect().toSet
    assert(viaGlobal == viaGroup)
  }

  test("reservoir sample is uniform-ish, join-stable, and size-capped") {
    val docs = graft.io.Tables.load(spark, sf("0.01"), "documents")
      .select(col("source"), col("doc_id")).cache()
    val r = Sampling.hashReservoir(docs, 50, Seq("source"))
      .as[(String, Long, Long)].collect()
    val sizes = r.groupBy(_._1).view.mapValues(_.length).toMap
    assert(sizes.values.forall(_ <= 50))
    // join-stability: same seed picks the same doc_ids regardless of the
    // projected columns — the hash depends only on (seed, id)
    val r2 = Sampling.hashReservoir(
        docs.withColumn("noise", lit(1)), 50, Seq("source"))
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(r2 == r.map(t => (t._1, t._2)).toSet)
    // partitioning invariance
    val r3 = Sampling.hashReservoir(docs.repartition(13), 50, Seq("source"))
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(r3 == r2)
  }
}
