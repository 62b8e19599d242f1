package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(lines: String*) =
    lines.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("wordCounts lower-cases and counts [a-z0-9]+ words") {
    val wc = Bpe.wordCounts(corpus("Low low LOW!", "lower, newest"))
      .as[(String, Long)].collect().toMap
    assert(wc == Map("low" -> 3L, "lower" -> 1L, "newest" -> 1L))
  }

  test("pairs weights adjacent char pairs by corpus frequency") {
    // "ab" ×3, "abc" ×1 → (a,b): 3+1=4, (b,c): 1
    val vocab = Bpe.initSymbols(
      Seq(("ab", 3L), ("abc", 1L), ("x", 5L)).toDF("word", "cnt"))
    val p = Bpe.pairs(vocab)
      .as[(String, String, Long)].collect()
      .map { case (l, r, c) => (l, r) -> c }.toMap
    assert(p == Map(("a", "b") -> 4L, ("b", "c") -> 1L)) // "x" contributes none
  }

  test("applyMerge merges leftmost-first on overlaps (reference BPE semantics)") {
    val vocab = Bpe.initSymbols(
      Seq(("aaa", 1L), ("aaaa", 1L), ("baab", 1L)).toDF("word", "cnt"))
    val merged = Bpe.applyMerge(vocab, "a", "a")
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    assert(merged("aaa") == Seq("aa", "a"))
    assert(merged("aaaa") == Seq("aa", "aa"))
    assert(merged("baab") == Seq("b", "aa", "b"))
  }

  test("applyMerge only fuses the exact (lhs, rhs) pair") {
    val vocab = Bpe.initSymbols(Seq(("abab", 1L)).toDF("word", "cnt"))
    val m1 = Bpe.applyMerge(vocab, "a", "b")
      .select("syms").as[Seq[String]].head()
    assert(m1 == Seq("ab", "ab"))
    // second round on the merged symbols: ("ab","ab") → "abab"
    val m2 = Bpe.applyMerge(Bpe.applyMerge(vocab, "a", "b"), "ab", "ab")
      .select("syms").as[Seq[String]].head()
    assert(m2 == Seq("abab"))
  }

  test("train learns the classic merges on a hand-checkable corpus") {
    // vocab: low ×5, lowest ×2 → pairs: (l,o):7 (o,w):7 (w,e):2 (e,s):2 (s,t):2
    // tie (l,o)/(o,w) broken by (lhs,rhs) ascending → (l,o) first, then (lo,w)
    val docs = corpus(Array.fill(5)("low").mkString(" "),
      "lowest lowest")
    val merges = Bpe.train(docs, nMerges = 3)
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")))
    // third merge: remaining pairs all count 2; ("e","s") wins the tie
    assert(merges(2) == ("e", "s"))
  }

  test("train stops when no pairs remain") {
    val docs = corpus("a b a b")
    val merges = Bpe.train(docs, nMerges = 5)
    assert(merges.isEmpty) // all words single-char: nothing to merge
  }

  test("tokenizeWord applies merges in rank order with leftmost-first passes") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "s"))
    assert(Bpe.tokenizeWord("low", merges).toSeq == Seq("low"))
    assert(Bpe.tokenizeWord("lowest", merges).toSeq == Seq("low", "es", "t"))
    // overlap: leftmost pair merges first within a pass, and a merged
    // token re-merges only on the NEXT pass's pattern, never its own
    assert(Bpe.tokenizeWord("aaa", Seq(("a", "a"))).toSeq == Seq("aa", "a"))
    assert(Bpe.tokenizeWord("aaaa", Seq(("a", "a"))).toSeq == Seq("aa", "aa"))
    assert(Bpe.tokenizeWord("aaaa",
      Seq(("a", "a"), ("aa", "aa"))).toSeq == Seq("aaaa"))
    // rank order matters: ("o","w") before ("l","o") blocks the lo merge
    assert(Bpe.tokenizeWord("low",
      Seq(("o", "w"), ("l", "o"))).toSeq == Seq("l", "ow"))
    assert(Bpe.tokenizeWord("x", merges).toSeq == Seq("x"))
  }

  test("applyMerges tokenizes docs word-by-word against the trained table") {
    val docs = corpus(Array.fill(5)("low").mkString(" "), "lowest lowest")
    val merges = Bpe.train(docs, nMerges = 3) // (l,o), (lo,w), (e,s)
    val out = Bpe.applyMerges(
      Seq((0L, "low lowest"), (1L, "Low! 9lowest?"), (2L, ""))
        .toDF("doc_id", "text"), merges)
      .as[(Long, String)].collect().toMap
    assert(out(0L) == "low,low,es,t")
    // lowercasing + [a-z0-9]+ word split match the trainer's wordCounts
    assert(out(1L) == "low,9,low,es,t")
    assert(out(2L) == "")
    // matches a per-word replay through applyMerge's DataFrame fold
    val vocabOut = merges.foldLeft(
      Bpe.initSymbols(Seq(("lowest", 1L)).toDF("word", "cnt"))) {
        case (v, (l, r)) => Bpe.applyMerge(v, l, r)
      }.select("syms").as[Seq[String]].head()
    assert(vocabOut == Bpe.tokenizeWord("lowest", merges).toSeq)
  }
}
