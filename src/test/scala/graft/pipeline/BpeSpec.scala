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
}
