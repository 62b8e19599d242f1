package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals by hand: duplicated bigrams raise both ratios") {
    val docs = Seq(
      (1L, "a b a b a b"),      // bigrams: ab,ba,ab,ba,ab → 5 total, 2 distinct
      (2L, "one two three four"), // 3 distinct of 3
      (3L, "x")                  // too short → zero row
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs, n = 2).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 5L)
    assert(math.abs(r(0).getDouble(2) - 3.0 / 5) < 1e-12) // (5-2)/5
    assert(math.abs(r(0).getDouble(3) - 3.0 / 5) < 1e-12) // "a b" ×3
    assert(r(1).getLong(1) == 3L)
    assert(r(1).getDouble(2) == 0.0)
    assert(math.abs(r(1).getDouble(3) - 1.0 / 3) < 1e-12)
    assert(r(2).getLong(1) == 0L && r(2).getDouble(2) == 0.0)
  }

  test("pii scrub redacts emails, ips, and phones with correct counts") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@corp.example.org or call +1 (555) 010-7788 from 192.168.1.77"),
      (2L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(docs).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 1L) // email
    assert(r(0).getLong(2) == 1L) // ip
    assert(r(0).getLong(3) == 1L) // phone
    val scrubbed = r(0).getString(4)
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<IP>")
      && scrubbed.contains("<PHONE>"))
    assert(!scrubbed.contains("@") && !scrubbed.contains("192.168"))
    assert(r(1).getLong(1) == 0L && r(1).getString(4) == "nothing sensitive here")
  }

  test("corpusStats: sketch estimates track exact values within rsd bounds") {
    val docs = graft.io.Tables.load(spark, sf("0.01"), "documents")
    val r = TextAnalysis.corpusStats(docs, rsd = 0.01).collect()
    assert(r.length == 1)
    val row = r(0)
    val nDocs = row.getAs[Long]("n_docs")
    val exactTexts = docs.select(countDistinct(col("text"))).as[Long].head()
    val exactTokens = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .where(length(col("t")) > 0)
      .select(countDistinct(col("t"))).as[Long].head()
    assert(nDocs == docs.count())
    // HLL++ at rsd=0.01; allow 5x the nominal error for small-n slack
    assert(math.abs(row.getAs[Long]("approx_distinct_texts") - exactTexts)
      <= math.max(5, exactTexts * 0.05), s"texts: $row vs $exactTexts")
    assert(math.abs(row.getAs[Long]("approx_distinct_tokens") - exactTokens)
      <= math.max(5, exactTokens * 0.05), s"tokens: $row vs $exactTokens")
    // quantile sketch: p50 within 2% rank error of the exact median length
    val lens = docs.select(length(col("text")).cast("long").as("l"))
      .orderBy("l").as[Long].collect()
    def exactQ(q: Double) = lens(((lens.length - 1) * q).toInt)
    val lo = lens((lens.length * 0.48).toInt)
    val hi = lens((lens.length * 0.52).toInt)
    val p50 = row.getAs[Int]("len_p50").toLong
    assert(p50 >= lo && p50 <= hi, s"p50 $p50 outside [$lo,$hi]")
    assert(row.getAs[Int]("len_p90") >= p50)
    assert(row.getAs[Int]("len_p99") >= row.getAs[Int]("len_p90"))
    assert(exactQ(0.99) >= exactQ(0.5)) // sanity on the exact side too
  }

  test("corpusStats HLL estimate is partition-layout invariant") {
    val docs = graft.io.Tables.load(spark, sf("0.01"), "documents")
    def est(parts: Int): (Long, Long) = {
      val row = TextAnalysis.corpusStats(docs.repartition(parts)).head()
      (row.getAs[Long]("approx_distinct_texts"),
        row.getAs[Long]("approx_distinct_tokens"))
    }
    // register-max merging: the sketch is a set union, so the estimate
    // cannot depend on how rows are split across tasks
    assert(est(1) == est(13))
  }

  test("phrase PMI: a glued collocation outranks frequent-but-independent pairs") {
    import spark.implicits._
    // "new york" always co-occurs; "the cat"/"the dog" mix freely
    val docs = (0 until 40).map { i =>
      (i.toLong, if (i % 2 == 0) "new york is where the cat saw the dog"
        else "the dog and the cat left new york")
    }.toDF("doc_id", "text")
    val got = TextAnalysis.phrasePmi(docs, k = 30, minCount = 5)
      .select($"a", $"b", $"pmi_micro").as[(String, String, Long)].collect()
    assert(got.nonEmpty)
    val pmiMap = got.map(r => (r._1, r._2) -> r._3).toMap
    // the independent pair scores strictly below the glued collocation
    assert(pmiMap.contains(("the", "cat")) || pmiMap.contains(("the", "dog")))
    Seq(("the", "cat"), ("the", "dog")).flatMap(pmiMap.get).foreach(p =>
      assert(p < pmiMap(("new", "york"))))
    // hand-check the score: n_ab(new,york)=40, n(new)=40, n(york)=40;
    // 20 nine-token docs + 20 eight-token docs
    val (nUni, nBi) = (20L * 9 + 20L * 8, 20L * 8 + 20L * 7)
    val expect = math.floor(math.log(
      (40L * nUni * nUni).toDouble / (nBi * 40L * 40L).toDouble) * 1e6 + 0.5).toLong
    assert(pmiMap(("new", "york")) === expect)
  }

  test("sketched vocabTopK: exact when counters cover the vocab, bracketed below") {
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id"), col("text")).cache()
    // sketchK ≥ vocab (31 tokens): t = 0 → the sketch IS the exact count
    val exact = TextAnalysis.vocabTopK(docs, k = 10)
      .as[(String, Long)].collect().toSeq
    val wide = TextAnalysis.vocabTopKSketched(docs, k = 10, sketchK = 64)
      .select("token", "freq").as[(String, Long)].collect().toSeq
    assert(wide == exact, "uncompressed sketch must reproduce exact top-k")
    // sketchK < vocab: truncation engaged — bracket holds, #1 survives
    val all = TextAnalysis.vocabTopK(docs, k = 100)
      .as[(String, Long)].collect().toMap
    val tight = TextAnalysis.vocabTopKSketched(docs, k = 10, sketchK = 16)
      .as[(String, Long, Long)].collect()
    assert(tight.nonEmpty && tight.length <= 10)
    tight.foreach { case (tok, freq, err) =>
      assert(freq <= all(tok) && all(tok) <= freq + err, s"$tok bracket")
    }
    assert(tight.head._1 == exact.head._1,
      "the true #1 token must survive sketching")
  }

  test("compression ratio separates repetition from noise, deterministically") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the " * 500),                                   // pure repetition
      (2L, (0 until 500).map(i =>                           // prose-ish variety
        s"word${i % 97} term${(i * 7) % 89}").mkString(" ")),
      (3L, {                                                // entropy soup
        var x = 88172645463325252L
        (0 until 2000).map { _ =>
          x = x * 6364136223846793005L + 1442695040888963407L
          ((x >>> 59) & 31).toHexString
        }.mkString("")
      }))
      .toDF("doc_id", "text")
    val r = TextAnalysis.compressionRatio(docs)
      .select($"doc_id", $"ratio_micro").as[(Long, Long)].collect().toMap
    assert(r(1L) < r(2L) && r(2L) < r(3L),
      s"repetition ${r(1L)} < prose ${r(2L)} < noise ${r(3L)} expected")
    // deterministic across partition layouts (one Deflater per partition,
    // reset per doc — no cross-doc state leaks into the bitstream)
    val a = TextAnalysis.compressionRatio(docs.repartition(1))
      .orderBy("doc_id").collect().toSeq
    val b = TextAnalysis.compressionRatio(docs.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("gopher rules: hand-computed counts and flags on planted docs") {
    val goodText = (Seq.fill(13)("the cat and dog sat") :+ "have fun with that")
      .mkString(" ") // 69 words, all alpha, 4+ distinct stop words
    val docs = Seq(
      (1L, goodText),
      // all 3 lines bulleted, 1 ends with an ellipsis
      (2L, "- first item\n* second thing goes...\n- third"),
      // symbol soup: 4 '#' + 2 '...' in 5 words
      (3L, "## tag ## wait... what... ok"),
      (4L, "x 12 99 . , ;") // mostly non-alpha words
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
      .map(row => row.getLong(0) -> row).toMap

    val g = r(1L)
    assert(g.getAs[Long]("n_words") == 69L)
    assert(g.getAs[Boolean]("pass_words") && g.getAs[Boolean]("pass_mwl"))
    assert(g.getAs[Long]("n_stop_present") >= 4L)
    assert(g.getAs[Boolean]("pass_all"))

    val b = r(2L)
    assert(b.getAs[Long]("n_lines") == 3L)
    assert(b.getAs[Long]("n_bullet_lines") == 3L)
    assert(b.getAs[Long]("n_ellipsis_lines") == 1L)
    // 10·3 > 9·3 → bullet rule fails; 10·1 > 3·3 → ellipsis rule fails
    assert(!b.getAs[Boolean]("pass_bullet"))
    assert(!b.getAs[Boolean]("pass_ellipsis"))
    assert(!b.getAs[Boolean]("pass_all"))

    val s = r(3L)
    assert(s.getAs[Long]("n_words") == 6L)
    assert(s.getAs[Long]("n_symbols") == 6L) // 4 '#' + 2 '...'
    assert(!s.getAs[Boolean]("pass_symbol")) // 60 > 6

    val a = r(4L)
    assert(a.getAs[Long]("n_words") == 6L)
    assert(a.getAs[Long]("n_alpha_words") == 1L) // only "x"
    assert(!a.getAs[Boolean]("pass_alpha")) // 5·1 < 4·6
    assert(a.getAs[Long]("n_stop_present") == 0L)
    assert(!a.getAs[Boolean]("pass_stop"))
  }

  test("gopher rules: empty text and boundary thresholds") {
    val fifty = Seq.fill(25)("the cats").mkString(" ") // exactly 50 words
    val docs = Seq((1L, ""), (2L, fifty)).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_words") == 0L)
    assert(!r(0).getAs[Boolean]("pass_words"))
    assert(r(0).getAs[Long]("n_lines") == 1L) // split("") → [""]
    assert(r(1).getAs[Long]("n_words") == 50L)
    assert(r(1).getAs[Boolean]("pass_words")) // inclusive lower bound
    // mean word length 175/50 = 3.5 → in [3,10]
    assert(r(1).getAs[Boolean]("pass_mwl"))
  }

  test("blocklist screen: word-boundary hits, phrase positions, pass rule") {
    val docs = Seq(
      (0L, "the fast red fox"),          // 'fast' hits; 'fas' must not
      (1L, "breakfast is fastest"),      // substrings only — no hit
      (2L, "slow slow slow query"),      // 'slow slow' at 2 positions
      (3L, "a Drop Table here"),         // case-insensitive phrase
      (4L, "clean document"))            // no hits
      .toDF("doc_id", "text")
    val terms = Seq("fast", "fas", "slow slow", "drop table")
      .toDF("term")
    val r = TextAnalysis.blocklistScreen(docs, terms)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_hits") == 1L)
    assert(r(0).getAs[String]("hit_terms") == "fast")
    assert(!r(0).getAs[Boolean]("pass"))
    // 'fast'/'fas' inside 'breakfast'/'fastest' are NOT word matches
    assert(r(1).getAs[Long]("n_hits") == 0L)
    assert(r(1).getAs[Boolean]("pass"))
    // overlapping phrase occurrences count per position
    assert(r(2).getAs[Long]("n_hits") == 2L)
    assert(r(2).getAs[String]("hit_terms") == "slow slow")
    assert(r(3).getAs[Long]("n_hits") == 1L)
    assert(r(3).getAs[String]("hit_terms") == "drop table")
    assert(r(4).getAs[Long]("n_hits") == 0L &&
      r(4).getAs[Boolean]("pass"))
    // empty blocklist: everything passes, schema intact
    val open = TextAnalysis.blocklistScreen(docs,
      Seq.empty[String].toDF("term")).collect()
    assert(open.length == 5 && open.forall(_.getAs[Boolean]("pass")))
    // distinct hit terms sort and join deterministically
    val multi = TextAnalysis.blocklistScreen(
      Seq((9L, "fast slow slow fast")).toDF("doc_id", "text"),
      Seq("fast", "slow slow").toDF("term")).head()
    assert(multi.getAs[Long]("n_hits") == 3L)
    assert(multi.getAs[String]("hit_terms") == "fast,slow slow")
    // surrounding/inner whitespace in a term normalizes away — a CSV
    // blocklist's ' fast ' / 'slow  slow' must still match
    val ws = TextAnalysis.blocklistScreen(
      Seq((9L, "fast slow slow fast")).toDF("doc_id", "text"),
      Seq(" fast ", "slow  slow", "   ").toDF("term")).head()
    assert(ws.getAs[Long]("n_hits") == 3L)
    assert(ws.getAs[String]("hit_terms") == "fast,slow slow")
  }
}
