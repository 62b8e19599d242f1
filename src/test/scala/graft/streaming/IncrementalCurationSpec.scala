package graft.streaming

import graft.SparkSpec
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import org.apache.commons.io.FileUtils
import java.security.MessageDigest

/** Stream ≡ batch parity for the curation door (VERDICT r12 #5): the
  * gate → exact-dedup → fuzzy-dedup → budget composition, checked
  * against an INDEPENDENT plain-Scala reference fold (MessageDigest
  * md5, hand-rolled MinHash over the published permutation family) —
  * the same oracle discipline the SQL twins follow, so the parity is a
  * cross-implementation check, not the pipeline testing itself.
  */
class IncrementalCurationSpec extends SparkSpec {
  import spark.implicits._

  // web-source words: 233 admitted by batch 1, 291 after batch 2 — so
  // batch 3's three fresh web docs (58 words each) fit exactly one more
  private val Budget = 350L

  // ---- fixture: 3 batches, ascending ids, every stage non-vacuous ----
  private def body(f: Int): String = {
    val rng = new scala.util.Random(f * 0x9E3779B97F4A7C15L)
    (0 until 58).map(_ => s"f${f}w${rng.nextInt(500)}").mkString(" ")
  }
  // (id, source, text). Batch 1: fresh docs + an intra-batch exact dup
  // (2=3) + an intra-batch near-dup pair (4≈5, family 90). Batch 2: an
  // exact dup of doc 0, a near-dup of family 90, a gate-failing short
  // doc, fresh docs. Batch 3: another exact dup of doc 0, another
  // family-90 near-dup, and enough fresh "web" words to hit the budget.
  private val batches: Seq[Seq[(Long, String, String)]] = Seq(
    Seq((0L, "web", body(1)), (1L, "web", body(2)),
      (2L, "web", body(3)), (3L, "web", body(3)),
      (4L, "web", body(90) + " u4"), (5L, "web", body(90) + " u5"),
      (6L, "blog", body(4))),
    Seq((10L, "web", body(1)), (11L, "web", body(90) + " u11"),
      (12L, "web", "too short to pass the gopher gate at all"),
      (13L, "web", body(5)), (14L, "blog", body(6))),
    Seq((20L, "web", body(1)), (21L, "web", body(90) + " u21"),
      (22L, "web", body(7)), (23L, "web", body(8)),
      (24L, "web", body(9)), (25L, "blog", body(10))))

  // ---- independent reference implementation (plain Scala) ----
  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def rank(id: Long): Long =
    (BigInt(md5hex(s"42:$id").take(15), 16) % 1000000L).toLong
  private def shingleHashes(text: String): Set[Long] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
      .map((sh: String) => (BigInt(md5hex(sh).take(15), 16) % Dedup.P).toLong)
  }
  private def sig8(text: String): Option[Seq[Long]] = {
    val hs = shingleHashes(text)
    if (hs.isEmpty) None
    else Some((0 until 8).map(i =>
      hs.map(h => (Dedup.PermA(i) * h + Dedup.PermB(i)) % Dedup.P).min))
  }
  private def bandsOf(sig: Seq[Long]): Seq[Seq[Long]] =
    Seq(sig.slice(0, 4), sig.slice(4, 8))
  private def simOf(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count { case (x, y) => x == y } / 8.0

  /** The documented door semantics, folded sequentially over batches. */
  private def referenceFold(): Set[Long] = {
    var hashStore = Set.empty[String]
    var sigStore = Map.empty[Long, Seq[Long]]
    var spent = Map.empty[String, Long].withDefaultValue(0L)
    val admitted = scala.collection.mutable.Set.empty[Long]
    for (batch <- batches) {
      // 1. gate (the fixture only varies word count; other rules pass
      // by construction — asserted in the spec body)
      val gated = batch.filter(_._3.split("\\s+").count(_.nonEmpty) >= 50)
      // 2. exact: batch-min-id per hash, minus the store
      val first = gated.groupBy(d => md5hex(d._3)).values
        .map(_.minBy(_._1)).toSeq
      val exactAdm = first.filter(d => !hashStore.contains(md5hex(d._3)))
      // 3. fuzzy: vs store (shared band + sim ≥ 0.75), then one-pass
      // intra-batch dominance (drop the higher id of a matching pair)
      val withSig = exactAdm.map(d => (d, sig8(d._3)))
      def matchesStored(s: Seq[Long]): Boolean = sigStore.values.exists(t =>
        bandsOf(s).zip(bandsOf(t)).exists { case (x, y) => x == y } &&
          simOf(s, t) >= 0.75)
      def matchesLower(id: Long, s: Seq[Long]): Boolean = withSig.exists {
        case (e, Some(t)) => e._1 < id &&
          bandsOf(s).zip(bandsOf(t)).exists { case (x, y) => x == y } &&
          simOf(s, t) >= 0.75
        case _ => false
      }
      val fuzzyAdm = withSig.collect {
        case (d, None) => d
        case (d, Some(s)) if !matchesStored(s) && !matchesLower(d._1, s) => d
      }
      // 4. budget: per-source (rank, id) walk against remaining budget
      val bySource = fuzzyAdm.groupBy(_._2)
      val batchAdmitted = bySource.toSeq.flatMap { case (src, ds) =>
        var cum = spent(src)
        ds.sortBy(d => (rank(d._1), d._1)).flatMap { d =>
          val w = d._3.split("\\s+").count(_.nonEmpty).toLong
          cum += w
          if (cum <= Budget) Some(d) else None
        }
      }
      // 5. stores mirror the admitted output
      batchAdmitted.foreach { d =>
        admitted += d._1
        hashStore += md5hex(d._3)
        sig8(d._3).foreach(s => sigStore += d._1 -> s)
        spent += d._2 -> (spent(d._2) +
          d._3.split("\\s+").count(_.nonEmpty).toLong)
      }
    }
    admitted.toSet
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  test("curation door: sequential batches match the plain-Scala reference fold") {
    val base = "target/tmp/stream_curate_seq"
    FileUtils.deleteDirectory(new java.io.File(base))
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalCuration.processBatch(spark,
        b.toDF("doc_id", "source", "text"), i.toLong,
        s"$base/store", s"$base/out", Budget)
    }
    val got = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    val want = referenceFold()
    assert(got == want,
      s"door diverged from reference: got-only ${got -- want}, " +
        s"ref-only ${want -- got}")
    // the fixture exercised every stage — the reference itself must have
    // rejected an exact cross-batch dup (10, 20), a fuzzy near-dup (one
    // of each family-90 arrival after the first survivor), the gate-fail
    // doc (12), and at least one doc on budget
    assert(!want.contains(3L) && !want.contains(10L) &&
      !want.contains(20L), "exact door defused")
    assert(Seq(5L, 11L, 21L).count(want.contains) == 0,
      "fuzzy door defused (a later family-90 arrival was admitted)")
    assert(!want.contains(12L), "gate defused")
    val webWords = spark.read.parquet(s"$base/out")
      .where(col("source") === "web")
      .agg(sum("n_words")).as[Long].head()
    assert(webWords <= Budget, s"budget exceeded: $webWords")
    // batch 3 carries three fresh 58-word web docs against 59 words of
    // remaining budget — exactly one (the rank-smallest) must land
    assert(Seq(22L, 23L, 24L).count(want.contains) == 1,
      "budget door defused (expected exactly one of batch 3's web docs)")

    // at-least-once replay: re-running the LAST batch must leave the
    // output and every store partition identical (overwrite semantics)
    val before = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    IncrementalCuration.processBatch(spark,
      batches(2).toDF("doc_id", "source", "text"), 2L,
      s"$base/store", s"$base/out", Budget)
    val after = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(after == before, "batch replay changed the admitted set")
    val spentRows = spark.read.parquet(s"$base/store/spent")
      .groupBy("source").agg(sum("spent").as("s"))
      .as[(String, Long)].collect().toMap
    assert(spentRows("web") <= Budget, s"replay double-counted spend: $spentRows")
  }

  test("curation door: streaming restart hands state off losslessly") {
    val base = "target/tmp/stream_curate_restart"
    FileUtils.deleteDirectory(new java.io.File(base))
    Files.createDirectories(Paths.get(s"$base/in"))
    // first two batches, one file per micro-batch
    batches(0).toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$base/in/b0")
    batches(1).toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$base/in/b1")
    val q1 = IncrementalCuration.start(spark, s"$base/in/*",
      s"$base/store", s"$base/out", s"$base/ck", schema, Budget,
      maxFilesPerTrigger = Some(1))
    q1.awaitTermination(120000)
    // state hand-off: a NEW query over the same checkpoint + stores
    // picks up the third batch only
    batches(2).toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$base/in/b2")
    val q2 = IncrementalCuration.start(spark, s"$base/in/*",
      s"$base/store", s"$base/out", s"$base/ck", schema, Budget,
      maxFilesPerTrigger = Some(1))
    q2.awaitTermination(120000)
    val got = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    assert(got == referenceFold(),
      "restarted stream diverged from the reference fold")
  }
}
