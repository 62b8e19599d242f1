package graft.streaming

import graft.SparkSpec
import graft.pipeline.{Contamination, Dedup, NgramLM}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import org.apache.commons.io.FileUtils
import java.security.MessageDigest

/** Stream ≡ batch parity for the curation door (VERDICT r12 #5; r14
  * extends it to the FULL recipe): the gate → frozen-LM tail drop →
  * exact-dedup → fuzzy-dedup → decontamination → budget composition,
  * checked against an INDEPENDENT plain-Scala reference fold
  * (MessageDigest md5, hand-rolled MinHash over the published
  * permutation family, a hand-counted bigram LM) — the same oracle
  * discipline the SQL twins follow, so the parity is a
  * cross-implementation check, not the pipeline testing itself.
  */
class IncrementalCurationSpec extends SparkSpec {
  import spark.implicits._

  // web-source words: 233 admitted by batch 1, 291 after batch 2 — so
  // batch 3's three fresh web docs (58 words each) fit exactly one more
  private val Budget = 350L

  // ---- frozen artifacts (stage 1b + 3b): trained once, applied as
  // constants by every batch — the frozen-codebook convention ----
  // LM trained on a 2-word-vocab corpus: any doc of entirely-unseen
  // words scores exactly log(1/(0+V)) = log(1/2) → micro -693147,
  // comfortably above the cutoff; a doc alternating the HIGH-count
  // vocab word "the" with unseen words scores ≈ -1913126, below it.
  private val lmTrainText = Seq.fill(20)("the aaa").mkString(" ")
  private val TailCutoffMicro = -1000000L
  // benchmark: a 7-word phrase → exactly 3 distinct 5-grams; a doc
  // containing the phrase verbatim shares all 3 (≥ minShared = 3)
  private val benchPhrase = "alpha beta gamma delta epsilon zeta eta"

  // ---- fixture: 4 batches, ascending ids, every stage non-vacuous ----
  private def body(f: Int): String = {
    val rng = new scala.util.Random(f * 0x9E3779B97F4A7C15L)
    (0 until 58).map(_ => s"f${f}w${rng.nextInt(500)}").mkString(" ")
  }
  // gate-passing but LM-tail: alternates the trained vocab word "the"
  // (bigram (the, zzzN) is unseen against a HIGH unigram count) with
  // fresh words — 58 words, mean word length ≈ 3.8, all alphabetic
  private val tailBody = (1 to 29).map(i => s"the zzz$i").mkString(" ")
  // gate-passing but contaminated: the benchmark phrase verbatim + 51
  // fresh filler words
  private val contamBody =
    benchPhrase + " " + (1 to 51).map(i => s"fill$i").mkString(" ")

  // (id, source, text). Batch 1: fresh docs + an intra-batch exact dup
  // (2=3) + an intra-batch near-dup pair (4≈5, family 90) + a
  // gate-passing LM-TAIL doc (7). Batch 2: an exact dup of doc 0, a
  // near-dup of family 90, a gate-failing short doc, fresh docs, and a
  // CONTAMINATED doc (15). Batch 3: another exact dup of doc 0, another
  // family-90 near-dup, and enough fresh "web" words to hit the budget.
  // Batch 4 pins the r13-ADVICE store semantics (dedup memory is
  // independent of budget timing): an exact dup (30) and a near-dup
  // (31) of batch 3's two BUDGET-REJECTED web docs arrive under the
  // fresh "blog" budget — both must be rejected by the dedup doors even
  // though the originals were never admitted — plus a fresh blog doc
  // (32) that is admitted.
  private val batch3Web = Seq((22L, 7), (23L, 8), (24L, 9))
  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  private def rank(id: Long): Long =
    (BigInt(md5hex(s"42:$id").take(15), 16) % 1000000L).toLong
  private val rejected3: Seq[Int] = {
    val admitted = batch3Web.minBy { case (id, _) => (rank(id), id) }
    batch3Web.filterNot(_ == admitted).map(_._2)
  }
  private val batches: Seq[Seq[(Long, String, String)]] = Seq(
    Seq((0L, "web", body(1)), (1L, "web", body(2)),
      (2L, "web", body(3)), (3L, "web", body(3)),
      (4L, "web", body(90) + " u4"), (5L, "web", body(90) + " u5"),
      (6L, "blog", body(4)), (7L, "web", tailBody)),
    Seq((10L, "web", body(1)), (11L, "web", body(90) + " u11"),
      (12L, "web", "too short to pass the gopher gate at all"),
      (13L, "web", body(5)), (14L, "blog", body(6)),
      (15L, "web", contamBody)),
    Seq((20L, "web", body(1)), (21L, "web", body(90) + " u21"),
      (22L, "web", body(7)), (23L, "web", body(8)),
      (24L, "web", body(9)), (25L, "blog", body(10))),
    Seq((30L, "blog", body(rejected3(0))),
      (31L, "blog", body(rejected3(1)) + " u31"),
      (32L, "blog", body(11))))

  private lazy val frozen = IncrementalCuration.FrozenArtifacts(
    lm = NgramLM.train(Seq((0L, lmTrainText)).toDF("doc_id", "text")),
    tailCutoffMicro = TailCutoffMicro,
    benchGrams = Contamination.hashedGrams(
      Seq((0L, benchPhrase)).toDF("bench_id", "text"), n = 5),
    contaminationN = 5, minShared = 3)

  // ---- independent reference implementation (plain Scala) ----
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

  // frozen-LM replay: hand-counted bigram/unigram tables over the
  // training text, add-one smoothing, position-ordered mean log-prob on
  // the micro grid — NgramLM.score recomputed from its published formula
  private val lmBigramC: Map[(String, String), Long] = {
    val toks = lmTrainText.toLowerCase.split("\\s+").filter(_.nonEmpty)
    toks.sliding(2).map(a => (a(0), a(1))).toSeq
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
  }
  private val lmUniC: Map[String, Long] =
    lmBigramC.groupBy(_._1._1).map { case (w, m) => (w, m.values.sum) }
  private val lmV: Long =
    lmTrainText.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.length
  private def lmMicro(text: String): Long = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val lps = toks.sliding(2).filter(_.length == 2).map { a =>
      math.log((lmBigramC.getOrElse((a(0), a(1)), 0L) + 1.0) /
        (lmUniC.getOrElse(a(0), 0L) + lmV.toDouble))
    }.toSeq
    math.floor(lps.sum / lps.length * 1000000.0 + 0.5).toLong
  }

  // decontamination replay: distinct 5-gram md5-prefix-60 hashes
  private def grams5(text: String): Set[Long] = {
    val toks = text.toLowerCase.split("\\s+")
    if (toks.length < 5) Set.empty
    else toks.sliding(5).map(_.mkString(" ")).toSet
      .map((g: String) => java.lang.Long.parseLong(md5hex(g).take(15), 16))
  }
  private val benchGramSet: Set[Long] = grams5(benchPhrase)
  private def isContaminated(text: String): Boolean =
    grams5(text).count(benchGramSet.contains) >= 3

  /** The documented door semantics, folded sequentially over batches. */
  /** Per-batch stage counts alongside the admitted set — the funnel
    * twin's independent reference (same fold, counts taken at each
    * stage boundary). */
  private def referenceFoldCounts(): (Set[Long], Seq[Seq[(Int, String, Long)]]) = {
    var hashStore = Set.empty[String]
    var sigStore = Map.empty[Long, Seq[Long]]
    var spent = Map.empty[String, Long].withDefaultValue(0L)
    val admitted = scala.collection.mutable.Set.empty[Long]
    val funnel = scala.collection.mutable.ArrayBuffer.empty[Seq[(Int, String, Long)]]
    for (batch <- batches) {
      // 1. gate (the fixture only varies word count; other rules pass
      // by construction — asserted in the spec body)
      // 1b. frozen-LM tail drop
      val gateOnly = batch
        .filter(_._3.split("\\s+").count(_.nonEmpty) >= 50)
      val gated = gateOnly
        .filter(d => lmMicro(d._3) >= TailCutoffMicro)
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
      // 3b. decontamination (rejected FOR CAUSE — no dedup trace)
      val survivors = fuzzyAdm.filterNot(d => isContaminated(d._3))
      // dedup stores mirror the SURVIVORS (budget-rejected included —
      // dedup memory is independent of budget timing, ADVICE r13)
      survivors.foreach { d =>
        hashStore += md5hex(d._3)
        sig8(d._3).foreach(s => sigStore += d._1 -> s)
      }
      // 4. budget: per-source (rank, id) walk against remaining budget;
      // output and spend mirror the ADMITTED set only
      val bySource = survivors.groupBy(_._2)
      val batchAdmitted = bySource.toSeq.flatMap { case (src, ds) =>
        var cum = spent(src)
        ds.sortBy(d => (rank(d._1), d._1)).flatMap { d =>
          val w = d._3.split("\\s+").count(_.nonEmpty).toLong
          cum += w
          if (cum <= Budget) Some(d) else None
        }
      }
      batchAdmitted.foreach { d =>
        admitted += d._1
        spent += d._2 -> (spent(d._2) +
          d._3.split("\\s+").count(_.nonEmpty).toLong)
      }
      funnel += Seq(
        (1, "arrived", batch.size.toLong),
        (2, "gopher_gate", gateOnly.size.toLong),
        (3, "lm_kept", gated.size.toLong),
        (4, "exact_admitted", exactAdm.size.toLong),
        (5, "fuzzy_admitted", fuzzyAdm.size.toLong),
        (6, "decontaminated", survivors.size.toLong),
        (7, "admitted", batchAdmitted.size.toLong))
    }
    (admitted.toSet, funnel.toSeq)
  }

  private def referenceFold(): Set[Long] = referenceFoldCounts()._1

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType)))

  test("curation door: sequential batches match the plain-Scala reference fold") {
    val base = "target/tmp/stream_curate_seq"
    FileUtils.deleteDirectory(new java.io.File(base))
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalCuration.processBatch(spark,
        b.toDF("doc_id", "source", "text"), i.toLong,
        s"$base/store", s"$base/out", Budget, frozen = Some(frozen))
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
    // doc (12), the LM-tail doc (7), the contaminated doc (15), and at
    // least one doc on budget
    assert(!want.contains(3L) && !want.contains(10L) &&
      !want.contains(20L), "exact door defused")
    assert(Seq(5L, 11L, 21L).count(want.contains) == 0,
      "fuzzy door defused (a later family-90 arrival was admitted)")
    assert(!want.contains(12L), "gate defused")
    assert(!want.contains(7L), "frozen-LM tail door defused")
    assert(!want.contains(15L), "decontamination door defused")
    val webWords = spark.read.parquet(s"$base/out")
      .where(col("source") === "web")
      .agg(sum("n_words")).as[Long].head()
    assert(webWords <= Budget, s"budget exceeded: $webWords")
    // batch 3 carries three fresh 58-word web docs against 59 words of
    // remaining budget — exactly one (the rank-smallest) must land
    assert(Seq(22L, 23L, 24L).count(want.contains) == 1,
      "budget door defused (expected exactly one of batch 3's web docs)")
    // r13-ADVICE store semantics: batch 4's exact dup (30) and near-dup
    // (31) of batch 3's BUDGET-REJECTED web docs must bounce off the
    // dedup stores even though the originals were never admitted —
    // without survivor-store semantics all three batch-4 blog docs fit
    // the blog budget and would be admitted
    assert(!want.contains(30L),
      "exact-door memory of a budget-rejected survivor defused")
    assert(!want.contains(31L),
      "fuzzy-door memory of a budget-rejected survivor defused")
    assert(want.contains(32L), "batch 4's fresh blog doc should admit")

    // at-least-once replay: re-running the LAST batch must leave the
    // output and every store partition identical (overwrite semantics)
    val before = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().sorted.toSeq
    IncrementalCuration.processBatch(spark,
      batches(3).toDF("doc_id", "source", "text"), 3L,
      s"$base/store", s"$base/out", Budget, frozen = Some(frozen))
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
      maxFilesPerTrigger = Some(1), frozen = Some(frozen))
    q1.awaitTermination(120000)
    // state hand-off: a NEW query over the same checkpoint + stores
    // picks up the remaining batches only
    batches(2).toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$base/in/b2")
    batches(3).toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$base/in/b3")
    val q2 = IncrementalCuration.start(spark, s"$base/in/*",
      s"$base/store", s"$base/out", s"$base/ck", schema, Budget,
      maxFilesPerTrigger = Some(1), frozen = Some(frozen))
    q2.awaitTermination(120000)
    val got = spark.read.parquet(s"$base/out")
      .select("doc_id").as[Long].collect().toSet
    assert(got == referenceFold(),
      "restarted stream diverged from the reference fold")
  }

  test("door funnel accounting matches the reference fold's stage counts") {
    val base = "target/tmp/stream_curate_funnel"
    FileUtils.deleteDirectory(new java.io.File(base))
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalCuration.processBatch(spark,
        b.toDF("doc_id", "source", "text"), i.toLong,
        s"$base/store", s"$base/out", Budget, frozen = Some(frozen))
    }
    val want = referenceFoldCounts()._2
    val gotRows = spark.read.parquet(s"$base/store/funnel")
      .select(col("batch"), col("stage_ord"), col("stage"), col("n_docs"))
      .as[(Long, Int, String, Long)].collect()
    val got = gotRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) =>
        rs.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq }
    assert(got == want,
      s"door funnel diverged from the fold:\n got $got\nwant $want")
    // the fixture makes every stage bite somewhere: across all batches
    // each adjacent stage pair must show at least one strict drop
    val byStage = (1 to 7).map(o =>
      want.map(_.find(_._1 == o).get._3).sum)
    assert((0 until 6).forall(i => byStage(i) >= byStage(i + 1)) &&
      (0 until 6).count(i => byStage(i) > byStage(i + 1)) >= 5,
      s"funnel totals not a strictly-biting chain: $byStage")
    // replaying the last batch leaves the accounting identical
    IncrementalCuration.processBatch(spark,
      batches.last.toDF("doc_id", "source", "text"),
      (batches.size - 1).toLong,
      s"$base/store", s"$base/out", Budget, frozen = Some(frozen))
    val again = spark.read.parquet(s"$base/store/funnel").count()
    assert(again == gotRows.length.toLong, "retry changed funnel rows")
  }
}
