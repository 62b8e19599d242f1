package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring duplicate-span detection and trimming, pinned on a
  * hand-computable corpus: shared runs between docs, an in-document
  * repeat, and a doc with no duplication. n = 3 keeps the arithmetic
  * small; the catalog queries run the production n = 8.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // doc 0: "a b c d e f g h"            — tokens 0..7
  // doc 1: "x y a b c d e z"            — shares run a..e (len 5) with doc 0
  // doc 2: "p q r p q r p q r s"        — self-repeating period 3
  // doc 3: "unique tokens only here"    — no duplication
  private lazy val docs = Seq(
    (0L, "a b c d e f g h"),
    (1L, "x y a b c d e z"),
    (2L, "p q r p q r p q r s"),
    (3L, "unique tokens only here")
  ).toDF("doc_id", "text")

  test("duplicateSpans finds the maximal shared run in both docs") {
    val spans = Dedup.duplicateSpans(docs, n = 3)
      .orderBy("doc_id", "span_id")
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Int, Int, Int)].collect().toSeq
    // doc 0: a..e at tokens 0..4 → 3-grams at pos 0,1,2 → span [0,5)
    // doc 1: a..e at tokens 2..6 → span [2,7)
    // doc 2: "p q r" repeats: 3-grams at 0..6 all repeat (pqr/qrp/rpq
    //        content each ≥2 occurrences) → one merged span [0,9)
    assert(spans == Seq((0L, 0, 5, 5), (1L, 2, 7, 5), (2L, 0, 9, 9)))
  }

  test("minOcc raises the duplication bar") {
    // with minOcc=3 only doc 2's period-3 content (3 occurrences of
    // each gram) survives; the cross-doc run (2 occurrences) does not
    val spans = Dedup.duplicateSpans(docs, n = 3, minOcc = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(spans == Seq(2L))
  }

  test("trimDuplicateSpans keeps the canonical first copy") {
    val out = Dedup.trimDuplicateSpans(docs, n = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_kept", "text")
      .as[(Long, Int, Int, String)].collect().toSeq
    // doc 0 owns the first occurrence of a..e → untouched
    assert(out(0) == ((0L, 8, 8, "a b c d e f g h")))
    // doc 1's copy of the run (pos 2..6) is cut
    assert(out(1) == ((1L, 8, 3, "x y z")))
    // doc 2: first 3-gram occurrences at pos 0 (pqr), 1 (qrp), 2 (rpq)
    // survive; later positions 3..6 are flagged → span [3,9) cut
    assert(out(2) == ((2L, 10, 4, "p q r s")))
    // doc 3 untouched
    assert(out(3) == ((3L, 4, 4, "unique tokens only here")))
  }

  test("span report is deterministic across runs and partitionings") {
    val a = Dedup.duplicateSpans(docs.repartition(7), n = 3)
      .orderBy("doc_id", "span_id").collect().toSeq
    val b = Dedup.duplicateSpans(docs.repartition(2), n = 3)
      .orderBy("doc_id", "span_id").collect().toSeq
    assert(a == b)
  }

  // ---- CCNet paragraph dedup (fixed non-overlapping blocks) ----

  test("paragraphBlocks cuts non-overlapping blocks, last short") {
    val d = Seq((1L, "a b c d e f g"), (2L, "  "), (3L, "x y")).toDF("doc_id", "text")
    val b = Dedup.paragraphBlocks(d, blockWords = 3)
      .orderBy("doc_id", "block_idx")
      .as[(Long, Long, String)].collect().toSeq
    assert(b == Seq((1L, 0L, "a b c"), (1L, 1L, "d e f"), (1L, 2L, "g"),
      (3L, 0L, "x y")))
  }

  test("paragraphDedup keeps first corpus occurrence and reassembles") {
    // doc 10 owns blocks [a b c][d e f]; doc 11 repeats [a b c] then adds
    // its own; doc 12 repeats [a b c] TWICE within itself plus doc 11's
    // block; doc 13 is blank
    val d = Seq(
      (10L, "a b c d e f"),
      (11L, "a b c u v w"),
      (12L, "a b c a b c u v w"),
      (13L, " ")
    ).toDF("doc_id", "text")
    val r = Dedup.paragraphDedup(d, blockWords = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      (10L, "a b c d e f", 2L, 2L),   // first owner keeps everything
      (11L, "u v w", 2L, 1L),         // dup of doc 10's block dropped
      (12L, "", 3L, 0L),              // all blocks seen earlier (incl. within-doc rule: doc 11 owns "u v w")
      (13L, "", 0L, 0L)))
  }

  test("paragraphDedupNewline dedups real paragraph structure on '\\n\\n'") {
    // doc 20: two paragraphs + a footer; doc 21 repeats doc 20's footer
    // and first paragraph (different \n\n spacing noise: blank segment
    // from a triple separator must not shift indices of later blocks);
    // doc 22 is only boilerplate; doc 23 blank
    val d = Seq(
      (20L, "first para here\n\nsecond para\n\nCOPYRIGHT FOOTER"),
      (21L, "first para here\n\n\n\nits own paragraph\n\nCOPYRIGHT FOOTER"),
      (22L, "COPYRIGHT FOOTER"),
      (23L, "  ")
    ).toDF("doc_id", "text")
    val r = Dedup.paragraphDedupNewline(d)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq(
      (20L, "first para here\n\nsecond para\n\nCOPYRIGHT FOOTER", 3L, 3L),
      (21L, "its own paragraph", 3L, 1L),
      (22L, "", 1L, 0L),
      (23L, "", 0L, 0L)))
    // whitespace-trimmed hashing: a padded copy of a paragraph is the
    // same paragraph
    val p = Seq((30L, "alpha beta\n\ngamma"), (31L, "  alpha beta \n\ndelta"))
      .toDF("doc_id", "text")
    val rp = Dedup.paragraphDedupNewline(p).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(rp == Seq(
      (30L, "alpha beta\n\ngamma", 2L, 2L),
      (31L, "delta", 2L, 1L)))
  }

  test("paragraphDedup drops within-doc repeats after the first") {
    val d = Seq((5L, "p q r p q r s t u")).toDF("doc_id", "text")
    val r = Dedup.paragraphDedup(d, blockWords = 3)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(r == Seq((5L, "p q r s t u", 3L, 2L)))
  }

  test("paragraphDedup is repartition-invariant and refuses blockWords < 1") {
    val d = Seq((0L, "a b c d"), (1L, "a b c d"), (2L, "c d a b")).toDF("doc_id", "text")
    val a = Dedup.paragraphDedup(d, blockWords = 2).orderBy("doc_id").collect().toSeq
    val b = Dedup.paragraphDedup(d.repartition(3), blockWords = 2)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // doc 1 is an exact dup of doc 0 → empty; doc 2 reuses both blocks
    // in swapped order → also empty
    assert(a.map(r => r.getLong(0) -> r.getString(1)) ==
      Seq(0L -> "a b c d", 1L -> "", 2L -> ""))
    intercept[IllegalArgumentException] {
      Dedup.paragraphBlocks(d, blockWords = 0)
    }
  }

  test("canonicalByScore keeps the arg-max copy, ties break to smaller id") {
    val members = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), // cluster 100
      (4L, 200L), (5L, 200L),             // cluster 200 (tied scores)
      (6L, 6L)                            // singleton
    ).toDF("doc_id", "component")
    val scores = Seq(
      (1L, 10L), (2L, 50L), (3L, 30L),
      (4L, 7L), (5L, 7L),
      (6L, 1L)
    ).toDF("doc_id", "score")
    val r = Dedup.canonicalByScore(members, scores)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(
      (1L, 100L, 10L, 2L, false),
      (2L, 100L, 50L, 2L, true),   // best quality wins, not min id
      (3L, 100L, 30L, 2L, false),
      (4L, 200L, 7L, 4L, true),    // tie -> smaller doc_id
      (5L, 200L, 7L, 4L, false),
      (6L, 6L, 1L, 6L, true)))
    // partitioning-invariant (agg, not window)
    val again = Dedup.canonicalByScore(members.repartition(4), scores)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(again == r)
  }

  // ---- variable-length suffix-LCP dedup (Lee et al. suffix-array way) ----

  test("suffixDupLengths reports exact maximal duplicate lengths") {
    val lens = Dedup.suffixDupLengths(docs, minLen = 3)
      .orderBy("doc_id", "pos")
      .as[(Long, Int, Int)].collect().toSeq
    // doc 0/1 share the 5-token run a..e: maximal lengths 5,4,3 at the
    // run's successive starts in BOTH docs; doc 2 self-repeats with
    // period 3 (pos 0 vs pos 3 share "p q r p q r" = 6, etc.); doc 3
    // has nothing ≥ 3
    assert(lens == Seq(
      (0L, 0, 5), (0L, 1, 4), (0L, 2, 3),
      (1L, 2, 5), (1L, 3, 4), (1L, 4, 3),
      (2L, 0, 6), (2L, 1, 5), (2L, 2, 4),
      (2L, 3, 6), (2L, 4, 5), (2L, 5, 4), (2L, 6, 3)))
  }

  test("suffixDupLengths equals a brute-force all-pairs reference") {
    // 40 docs with planted exact duplicates (runs of equal suffixes that
    // must cross range-partition boundaries), shared runs, self-repeats
    // — pinned against an independent O(n²) plain-Scala fold
    val corpus = (0 until 30).map(i => (i.toLong, "dup dup text body one two three")) ++
      Seq((30L, "alpha beta gamma delta epsilon zeta"),
        (31L, "omega alpha beta gamma delta epsilon end"),
        (32L, "self self self self self self"),
        (33L, "lone words without any twin here")) ++
      (34 until 40).map(i => (i.toLong, s"noise$i filler mixed dup dup text tail$i"))
    val df = corpus.toDF("doc_id", "text")
    val got = Dedup.suffixDupLengths(df, minLen = 2, cap = 5)
      .orderBy("doc_id", "pos").as[(Long, Int, Int)].collect().toSeq
    assert(got == bruteForceDupLengths(corpus, minLen = 2, cap = 5))
  }

  /** Independent O(n²) reference: all capped suffixes, all-pairs token
    * LCP, max per position. */
  private def bruteForceDupLengths(corpus: Seq[(Long, String)],
      minLen: Int, cap: Int): Seq[(Long, Int, Int)] = {
    val sufs = corpus.flatMap { case (d, t) =>
      val toks = t.toLowerCase.split("\\s+", -1)
      toks.indices.map(p => (d, p, toks.slice(p, p + cap).toSeq))
    }
    def lcp(a: Seq[String], b: Seq[String]): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    sufs.flatMap { case (d, p, s) =>
      val best = sufs.iterator
        .filter { case (d2, p2, _) => (d2, p2) != ((d, p)) }
        .map { case (_, _, o) => lcp(s, o) }.max
      if (best >= minLen) Some((d, p, best)) else None
    }.sortBy(x => (x._1, x._2))
  }

  test("suffixDupLengths matches brute force on randomized tiny-alphabet corpora") {
    // fixed-seed randomized sweep: 2-4 letter alphabets make near-maximal
    // tie structure (equal suffixes everywhere, every prefix shared by
    // many positions) — the hardest regime for the neighbor-adjacency
    // argument and the partition-boundary stitch
    val rng = new scala.util.Random(20260816L)
    for (round <- 1 to 6) {
      val alphabet = (0 until 2 + rng.nextInt(3)).map(i => ('a' + i).toChar.toString)
      val corpus = (0 until 5 + rng.nextInt(20)).map { d =>
        val len = 1 + rng.nextInt(15)
        (d.toLong,
          (0 until len).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString(" "))
      }
      val minLen = 1 + rng.nextInt(3)
      val cap = minLen + rng.nextInt(4)
      val got = Dedup.suffixDupLengths(corpus.toDF("doc_id", "text"),
          minLen = minLen, cap = cap)
        .orderBy("doc_id", "pos").as[(Long, Int, Int)].collect().toSeq
      val want = bruteForceDupLengths(corpus, minLen, cap)
      assert(got == want,
        s"round $round minLen=$minLen cap=$cap corpus=$corpus")
    }
  }

  test("suffixDupLengths caps reported lengths at cap") {
    val d = Seq(
      (0L, "one two three four five six seven eight nine ten"),
      (1L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val lens = Dedup.suffixDupLengths(d, minLen = 2, cap = 4)
      .as[(Long, Int, Int)].collect().toSeq
    // 10-token exact dup, but no reported length exceeds the 4-token cap
    assert(lens.nonEmpty && lens.forall(_._3 <= 4))
    assert(lens.count(_._3 == 4) == 14) // positions 0..6 in both docs
  }

  test("suffixDupSpans merges variable-length flags into maximal spans") {
    val spans = Dedup.suffixDupSpans(docs, minLen = 3)
      .orderBy("doc_id", "span_id")
      .select("doc_id", "span_start", "span_end", "max_dup_len", "span_tokens")
      .as[(Long, Int, Int, Int, Int)].collect().toSeq
    assert(spans == Seq(
      (0L, 0, 5, 5, 5),   // the shared a..e run
      (1L, 2, 7, 5, 5),
      (2L, 0, 9, 6, 9)))  // the whole periodic doc, maximal piece 6
  }

  test("suffixDupTrim keeps one canonical copy of each duplicated content") {
    val out = Dedup.suffixDupTrim(docs, minLen = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_kept", "text")
      .as[(Long, Int, Int, String)].collect().toSeq
    // doc 0 owns every content's first occurrence → untouched; doc 1's
    // copies of a..e (flagged pos 2,3,4) merge into span [2,7) and cut;
    // doc 2's pos 0,1,2,6 are first occurrences of their contents, pos
    // 3,4,5 are later copies → span [3,9) cut; doc 3 untouched
    assert(out == Seq(
      (0L, 8, 8, "a b c d e f g h"),
      (1L, 8, 3, "x y z"),
      (2L, 10, 4, "p q r s"),
      (3L, 4, 4, "unique tokens only here")))
  }

  /** Independent plain-Scala trim reference: brute-force flagged
    * positions + contents, min-(doc,pos) canonical per content, interval
    * merge of the non-canonical flags, token cut — no Spark anywhere. */
  private def bruteForceTrim(corpus: Seq[(Long, String)],
      minLen: Int, cap: Int): Seq[(Long, Int, Int, String)] = {
    val sufs = corpus.flatMap { case (d, t) =>
      val toks = t.toLowerCase.split("\\s+", -1)
      toks.indices.map(p => (d, p, toks.slice(p, p + cap).toSeq))
    }
    def lcp(a: Seq[String], b: Seq[String]): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val flagged = sufs.flatMap { case (d, p, s) =>
      val best = sufs.iterator
        .filter { case (d2, p2, _) => (d2, p2) != ((d, p)) }
        .map { case (_, _, o) => lcp(s, o) }.max
      if (best >= minLen) Some((d, p, best, s.take(best).mkString(" ")))
      else None
    }
    val firstOf = flagged.groupBy(_._4)
      .map { case (c, fs) => c -> fs.map(f => (f._1, f._2)).min }
    val cut = flagged.filter { case (d, p, _, c) => firstOf(c) != ((d, p)) }
    corpus.map { case (d, t) =>
      val toks = t.toLowerCase.split("\\s+", -1)
      // interval merge in pos order, then cut
      var reach = -1
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      cut.filter(_._1 == d).sortBy(_._2).foreach { case (_, p, dl, _) =>
        if (spans.nonEmpty && p <= reach) {
          val (st, en) = spans.last
          spans(spans.length - 1) = (st, math.max(en, p + dl))
        } else spans += ((p, p + dl))
        reach = math.max(reach, p + dl)
      }
      val kept = toks.zipWithIndex.collect {
        case (tk, i) if !spans.exists(sp => i >= sp._1 && i < sp._2) => tk
      }
      (d, toks.length, kept.length, kept.mkString(" "))
    }.sortBy(_._1)
  }

  test("suffixDupTrim matches the brute-force reference incl. cross-partition equal runs") {
    // 30 identical docs force equal-suffix runs across range-partition
    // boundaries; the canonical copy must be the single (min doc, pos)
    // one, with exact kept-token accounting everywhere
    val corpus = (0 until 30).map(i => (i.toLong, "dup dup text body one two three")) ++
      Seq((30L, "alpha beta gamma delta epsilon zeta"),
        (31L, "omega alpha beta gamma delta epsilon end"),
        (32L, "self self self self self self"),
        (33L, "lone words without any twin here")) ++
      (34 until 40).map(i => (i.toLong, s"noise$i filler mixed dup dup text tail$i"))
    val got = Dedup.suffixDupTrim(corpus.toDF("doc_id", "text"),
        minLen = 2, cap = 5)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_kept", "text")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got == bruteForceTrim(corpus, minLen = 2, cap = 5))
    // cross-doc conservation: the content shared by the 30 identical
    // docs survives EXACTLY once (doc 0, the global first occurrence,
    // untouched; docs 1..29 fully cut) — the keep-one rule across
    // range-partition-crossing equal-suffix runs. (A universal
    // every-content check would be wrong: an in-document overlapping
    // span may cut through a canonical copy, the documented ExactSubstr
    // caveat — doc 32's periodic 'self' run exercises it here.)
    assert(got.count(_._4.contains("dup dup text body one two three")) == 1)
    assert(got.head == ((0L, 7, 7, "dup dup text body one two three")))
    assert((1 until 30).forall(i => got(i) == ((i.toLong, 7, 0, ""))))
    // the cross-doc 5-token run alpha..epsilon keeps its doc-30 copy and
    // is cut from doc 31 (doc 31 keeps its unique frame words)
    assert(got(30)._4 == "alpha beta gamma delta epsilon zeta")
    assert(got(31)._4 == "omega end")
  }

  test("suffixDupTrim matches brute force on randomized tiny-alphabet corpora") {
    val rng = new scala.util.Random(20260815L)
    for (round <- 1 to 4) {
      val alphabet = (0 until 2 + rng.nextInt(3)).map(i => ('a' + i).toChar.toString)
      val corpus = (0 until 5 + rng.nextInt(15)).map { d =>
        val len = 1 + rng.nextInt(12)
        (d.toLong,
          (0 until len).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString(" "))
      }
      val minLen = 1 + rng.nextInt(3)
      val cap = minLen + rng.nextInt(4)
      val got = Dedup.suffixDupTrim(corpus.toDF("doc_id", "text"),
          minLen = minLen, cap = cap)
        .orderBy("doc_id")
        .select("doc_id", "n_tokens", "n_kept", "text")
        .as[(Long, Int, Int, String)].collect().toSeq
      val want = bruteForceTrim(corpus, minLen, cap)
      assert(got == want,
        s"round $round minLen=$minLen cap=$cap corpus=$corpus")
    }
  }

  test("suffixDupLengths is partitioning-invariant") {
    val a = Dedup.suffixDupLengths(docs.repartition(7), minLen = 3)
      .orderBy("doc_id", "pos").collect().toSeq
    val b = Dedup.suffixDupLengths(docs.coalesce(1), minLen = 3)
      .orderBy("doc_id", "pos").collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Dedup.suffixDupLengths(docs, minLen = 9, cap = 8)
    }
  }
}
