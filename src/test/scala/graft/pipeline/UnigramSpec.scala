package graft.pipeline

import graft.SparkSpec

/** Unigram-LM tokenizer induction (VERDICT r13 #4): hard-EM
  * monotonicity, exact Viterbi semantics (micro-Long scores, the
  * comma-joined lexicographic tie-break the oracle replays), coverage
  * after pruning, and the apply path. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (0L, "the cat sat on the mat the cat sat"),
    (1L, "a banana and a bandana in the cabana"),
    (2L, "cats eat bananas and rats eat mats"),
    (3L, "the theme of the theater is thespian"),
    (4L, "banana bandana cabana banana the the the"))
    .toDF("doc_id", "text")

  test("viterbi picks the higher-probability segmentation") {
    val pieces = Map("a" -> -100L, "b" -> -100L, "ab" -> -150L)
    assert(Unigram.tokenizeWord("ab", pieces, 4).toSeq == Seq("ab"))
    assert(Unigram.tokenizeWord("aab", pieces, 4).toSeq == Seq("a", "ab"))
  }

  test("viterbi tie breaks on the lexicographically smaller token string") {
    // "a,b" (-200) ties "ab" (-200); ',' < 'b' so the split form wins —
    // the same rule the SQL oracle's ORDER BY toks ASC applies
    val pieces = Map("a" -> -100L, "b" -> -100L, "ab" -> -200L)
    assert(Unigram.tokenizeWord("ab", pieces, 4).toSeq == Seq("a", "b"))
  }

  test("unknown characters fall back to single-char UNK tokens") {
    val pieces = Map("a" -> -100L)
    assert(Unigram.tokenizeWord("axa", pieces, 4).toSeq == Seq("a", "x", "a"))
  }

  test("hard-EM complete-data log-likelihood is non-decreasing") {
    val model = Unigram.train(fixture, vocabSize = 32, maxPieceLen = 4,
      seedSize = 120, nIters = 5)
    val trace = Unigram.lastTrainLLTrace
    assert(trace.size == 5)
    trace.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a, s"EM regressed: $trace")
    }
    assert(model.pieces.nonEmpty)
  }

  test("pruned vocab keeps every corpus character and respects the cap") {
    val model = Unigram.train(fixture, vocabSize = 24, maxPieceLen = 4,
      seedSize = 120, nIters = 3)
    val corpusChars = fixture.as[(Long, String)].collect()
      .flatMap(_._2.toLowerCase.replaceAll("[^a-z0-9]", ""))
      .map(_.toString).toSet
    val pieceSet = model.pieces.map(_._1).toSet
    assert(corpusChars.subsetOf(pieceSet),
      s"coverage lost: ${corpusChars -- pieceSet}")
    assert(model.pieces.size <= math.max(24, corpusChars.size))
    // multi-char pieces were actually learned (the corpus repeats
    // "the"/"banana" heavily)
    assert(model.pieces.exists(_._1.length > 1), "no subwords learned")
    // log-probs are negative micro values
    assert(model.pieces.forall(_._2 < 0L))
  }

  test("likelihood-loss prune drops a redundant piece count-ranking would keep") {
    // 'xy' occurs 200x but its chars are individually frequent (the
    // standalone words x, y), so removing it re-segments cheaply; 'zq'
    // occurs only 30x but z and q appear NOWHERE else, so removing it
    // costs two floor-probability fallbacks per occurrence. Count-prune
    // (the r14 form) would keep 'xy' (200 > 30); the likelihood-loss
    // criterion must keep 'zq'.
    //   loss(xy) = 200·(lp(xy) − lp(x) − lp(y)) ≈ 200·2.15 nats
    //   loss(zq) = 30·(lp(zq) − 2·floor)       ≈ 30·77 nats  ≫
    val corpus = Seq((0L,
      (Seq.fill(200)("xy") ++ Seq.fill(100)("x") ++ Seq.fill(100)("y") ++
        Seq.fill(30)("zq")).mkString(" ")))
      .toDF("doc_id", "text")
    // vocabSize 5 = 4 chars + exactly ONE multi-char survivor
    val model = Unigram.train(corpus, vocabSize = 5, maxPieceLen = 2,
      seedSize = 8, nIters = 2)
    val kept = model.pieces.map(_._1).toSet
    assert(kept.contains("zq"), s"high-loss piece pruned: $kept")
    assert(!kept.contains("xy"), s"redundant piece survived: $kept")
    // and the survivor is actually used by the apply path
    assert(Unigram.tokenizeWord("zq", model.pieces.toMap, 2).toSeq ==
      Seq("zq"))
  }

  test("tokenizeIds is the integer twin of tokenize (rank ids, same segmentation)") {
    // the tokenizer-true export packs ID streams; their bijection with
    // the piece strings is what makes the artifact decodable — id k
    // must be the k-th piece of the SORTED trained table, and mapping
    // each id back must reproduce tokenize's comma-joined pieces
    val model = Unigram.train(fixture, vocabSize = 32, maxPieceLen = 4,
      seedSize = 120, nIters = 3)
    // train returns the piece table sorted ascending — pieceIds relies on it
    assert(model.pieces.map(_._1) == model.pieces.map(_._1).sorted,
      "trained piece table not sorted — pieceIds ranks would be unstable")
    val byId = model.pieces.map(_._1).toIndexedSeq
    val strs = Unigram.tokenize(fixture, model)
      .as[(Long, String)].collect().toMap
    val idsRows = Unigram.tokenizeIds(fixture, model)
      .as[(Long, Long, Array[Int])].collect()
    idsRows.foreach { case (id, n, ids) =>
      assert(n == ids.length.toLong, s"doc $id n_tokens != ids length")
      assert(ids.forall(i => i >= 0 && i < byId.size),
        s"doc $id carries an out-of-vocab id")
      assert(ids.map(byId).mkString(",") == strs(id),
        s"doc $id ids do not decode to tokenize's pieces")
    }
  }

  test("tokenize concatenates per-word viterbi pieces in document order") {
    val model = Unigram.train(fixture, vocabSize = 32, maxPieceLen = 4,
      seedSize = 120, nIters = 3)
    val pieces = model.pieces.toMap
    val got = Unigram.tokenize(fixture, model)
      .as[(Long, String)].collect().toMap
    val pat = java.util.regex.Pattern.compile("[a-z0-9]+")
    fixture.as[(Long, String)].collect().foreach { case (id, text) =>
      val m = pat.matcher(text.toLowerCase)
      val want = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find())
        want ++= Unigram.tokenizeWord(m.group(), pieces, model.maxPieceLen)
      assert(got(id) == want.mkString(","), s"doc $id")
      // tokens re-join to the original words
      assert(got(id).replace(",", "") ==
        text.toLowerCase.replaceAll("[^a-z0-9]", ""))
    }
  }

  test("local E-step twin matches the distributed usageCounts exactly") {
    // train's size gate routes fixture-scale corpora to the driver
    // twin (r16) — pin that both executors produce IDENTICAL counts,
    // so the gate can never change a trained model
    val words = Bpe.wordCounts(fixture, "text").localCheckpoint()
    val local = words.as[(String, Long)].collect()
    val probs = local.flatMap { case (w, _) =>
      w.sliding(1) ++ (if (w.length >= 2) w.sliding(2) else Iterator.empty)
    }.distinct.map(p => p -> -1000000L * p.length).toMap
    val dist = Unigram.usageCounts(words, probs, maxPieceLen = 2)
    val drv = Unigram.usageCountsLocal(local, probs, maxPieceLen = 2)
    assert(dist.nonEmpty)
    assert(dist == drv)
    // whole-model parity: forcing the DISTRIBUTED path (gate 0) trains
    // the bit-identical model the driver path produces — every EM and
    // prune round agrees, not just one count pass
    val localModel = Unigram.train(fixture, vocabSize = 32,
      maxPieceLen = 4, seedSize = 120, nIters = 3)
    val distModel = Unigram.train(fixture, vocabSize = 32,
      maxPieceLen = 4, seedSize = 120, nIters = 3, localEmGate = 0L)
    assert(localModel == distModel)
  }
}
