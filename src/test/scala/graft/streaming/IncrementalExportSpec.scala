package graft.streaming

import graft.SparkSpec
import graft.pipeline.Packing
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import org.apache.commons.io.FileUtils

/** Stream ≡ batch parity for the composed curate→pack door (VERDICT r14
  * #6): the packed output over ordered arrivals must be bit-identical
  * to the batch packer run over the door's OWN admitted union — and the
  * packed doc set must be exactly the admitted doc set (nothing
  * curation rejected ever reaches a bin; nothing admitted is lost). The
  * curation stages themselves are certified against the independent
  * reference fold in IncrementalCurationSpec; THIS spec certifies the
  * composition wiring, the lockstep store advance, and the restart
  * hand-off.
  */
class IncrementalExportSpec extends SparkSpec {
  import spark.implicits._

  // 58 fresh words per doc — passes the Gopher gate (≥ 50 words, sane
  // word lengths, alphabetic) and gives every doc the same token mass,
  // so admissions are decided purely by the budget walk
  private def body(f: Int): String = {
    val rng = new scala.util.Random(f * 0x9E3779B97F4A7C15L)
    (0 until 58).map(_ => s"f${f}w${rng.nextInt(500)}").mkString(" ")
  }

  // 3 ordered batches: batch 2 carries an exact dup (11 = doc 1's text,
  // rejected at the dedup door → must never reach a bin) and the "web"
  // budget (150 words < 3×58) forces budget rejections — rejected docs
  // must not be packed either
  private val batches: Seq[Seq[(Long, String, String)]] = Seq(
    Seq((0L, "web", body(1)), (1L, "web", body(2)), (2L, "blog", body(3))),
    Seq((10L, "web", body(4)), (11L, "web", body(2)), (12L, "blog", body(5))),
    Seq((20L, "web", body(6)), (21L, "blog", body(7))))

  private val Budget = 150L
  private val PackBudget = 70L
  private val Groups = 2

  private def admitted(outDir: String) =
    spark.read.parquet(s"$outDir/admitted")
      .select("doc_id", "n_words")
      .as[(Long, Long)].collect().toSet

  private def packed(outDir: String) =
    spark.read.parquet(s"$outDir/packed")
      .select("doc_id", "grp", "bin", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet

  private def batchPack(adm: Set[(Long, Long)]) =
    Packing.nextFit(adm.toSeq.toDF("doc_id", "n_tokens"),
        budget = PackBudget, groups = Groups)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("composed door: packed output == batch packer over the admitted union") {
    val base = "target/tmp/stream_export"
    FileUtils.deleteDirectory(new java.io.File(base))
    val storeDir = s"$base/store"; val outDir = s"$base/out"
    for ((b, id) <- batches.zipWithIndex)
      IncrementalExport.processBatch(spark,
        b.toDF("doc_id", "source", "text"), id.toLong,
        storeDir, outDir, Budget, PackBudget, Groups)
    val adm = admitted(outDir)
    // the exact dup was rejected before packing; the budget rejected at
    // least one web doc (150 < 3×58) — the composition is non-vacuous
    assert(!adm.map(_._1).contains(11L), "exact dup reached the packer")
    assert(adm.map(_._1).count(Set(0L, 1L, 10L, 20L)) < 4,
      "budget rejected nothing — fixture lost its bite")
    assert(adm.nonEmpty)
    val got = packed(outDir)
    assert(got.map(_._1) == adm.map(_._1),
      "packed doc set != admitted doc set")
    assert(got == batchPack(adm), s"stream $got != batch ${batchPack(adm)}")
    // at-least-once replay of the LAST batch: both doors' sinks stable
    IncrementalExport.processBatch(spark,
      batches(2).toDF("doc_id", "source", "text"), 2L,
      storeDir, outDir, Budget, PackBudget, Groups)
    assert(packed(outDir) == got, "retry changed the packed sink")
    assert(admitted(outDir) == adm, "retry changed the admitted sink")
  }

  test("tokenizer-true door: bins fill by FROZEN-model token counts, parity vs batch pack") {
    import graft.pipeline.Unigram
    // r16, mirroring the batch export's tokenizer-true turn: a FROZEN
    // trained unigram model counts each admitted doc's real tokens and
    // the bins fill by those — parity is stated against the batch
    // packer over tokenizeIds of the door's own admitted texts.
    val base = "target/tmp/stream_export_tok"
    FileUtils.deleteDirectory(new java.io.File(base))
    val storeDir = s"$base/store"; val outDir = s"$base/out"
    val allDocs = batches.flatten
    val model = Unigram.train(
      allDocs.map(d => (d._1, d._3)).toDF("doc_id", "text"),
      vocabSize = 24, maxPieceLen = 3, seedSize = 80, nIters = 2)
    for ((b, id) <- batches.zipWithIndex)
      IncrementalExport.processBatch(spark,
        b.toDF("doc_id", "source", "text"), id.toLong,
        storeDir, outDir, Budget, packBudget = 200L, Groups,
        tokenizer = Some(model))
    val adm = admitted(outDir)
    val admTexts = allDocs.filter(d => adm.map(_._1).contains(d._1))
      .map(d => (d._1, d._3)).toDF("doc_id", "text")
    val tokCounts = Unigram.tokenizeIds(admTexts, model)
      .select("doc_id", "n_tokens").as[(Long, Long)].collect().toSet
    // the tokenizer actually drove the bins: subword counts differ from
    // the whitespace word counts for every 58-word doc at vocab 24
    assert(tokCounts.exists { case (id, n) =>
      adm.find(_._1 == id).exists(_._2 != n) },
      "token counts degenerate to word counts — the witness is vacuous")
    val got = packed(outDir)
    assert(got.map(_._1) == adm.map(_._1),
      "packed doc set != admitted doc set")
    val want = Packing.nextFit(tokCounts.toSeq.toDF("doc_id", "n_tokens"),
        budget = 200L, groups = Groups)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want, s"tokenized stream pack $got != batch $want")
    // replay of the last batch stays idempotent with the tokenizer on
    IncrementalExport.processBatch(spark,
      batches(2).toDF("doc_id", "source", "text"), 2L,
      storeDir, outDir, Budget, packBudget = 200L, Groups,
      tokenizer = Some(model))
    assert(packed(outDir) == got, "retry changed the tokenized packed sink")
  }

  test("composed door: wrapper-driven stream + restart hand-off") {
    val base = "target/tmp/stream_export_wrap"
    FileUtils.deleteDirectory(new java.io.File(base))
    val storeDir = s"$base/store"; val outDir = s"$base/out"
    Files.createDirectories(Paths.get(s"$base/in"))
    batches(0).toDF("doc_id", "source", "text").coalesce(1)
      .write.parquet(s"$base/in/b0")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val q1 = IncrementalExport.start(spark, s"$base/in/*", storeDir, outDir,
      s"$base/ck", schema, Budget, PackBudget, Groups)
    q1.awaitTermination(120000)
    // restart: new files, SAME checkpoint — the door must hand its
    // open-bin and dedup/spent state off through the stores alone
    batches(1).toDF("doc_id", "source", "text").coalesce(1)
      .write.parquet(s"$base/in/b1")
    batches(2).toDF("doc_id", "source", "text").coalesce(1)
      .write.parquet(s"$base/in/b2")
    val q2 = IncrementalExport.start(spark, s"$base/in/*", storeDir, outDir,
      s"$base/ck", schema, Budget, PackBudget, Groups)
    q2.awaitTermination(120000)
    val adm = admitted(outDir)
    val got = packed(outDir)
    assert(got.map(_._1) == adm.map(_._1))
    assert(got == batchPack(adm),
      "restarted composed door diverged from the batch walk")
  }
}
