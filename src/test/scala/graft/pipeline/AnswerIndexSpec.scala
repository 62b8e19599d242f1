package graft.pipeline

import graft.SparkSpec

class AnswerIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def answers(rows: (Long, String)*) = rows.toDF("query_idx", "answer")

  test("token containment: substring-but-not-token is NOT a match") {
    val d = docs(
      0L -> "we concatenate strings here",
      1L -> "the cat sat on the mat",
      2L -> "a catalog of cats")
    val a = answers(0L -> "cat")
    val got = AnswerIndex.tokenContainmentJoin(d, a)
      .as[(Long, Long)].collect().toSet
    // "concatenate" and "catalog" contain the substring but not the token;
    // "cats" is a different token too — only doc 1 matches
    assert(got == Set((0L, 1L)))
    // the raw-substring variant (kept for loose screens) would say 0, 1, 2
    val loose = AnswerIndex.containmentJoin(d, a)
      .as[(Long, Long)].collect().toSet
    assert(loose == Set((0L, 0L), (0L, 1L), (0L, 2L)))
  }

  test("multi-token answers must appear contiguously, case-insensitively") {
    val d = docs(
      0L -> "The New York Times reported",
      1L -> "new jersey and york county",   // both words, not adjacent
      2L -> "brand NEW YORK flavor")
    val a = answers(7L -> "New York")
    val got = AnswerIndex.tokenContainmentJoin(d, a)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((7L, 0L), (7L, 2L)))
  }

  test("punctuation tokenizes as single chars, like DPR's SimpleTokenizer") {
    // "u.s." → [u, ., s, .]; a doc with "u . s ." spacing still matches,
    // a doc with "us" does not
    val d = docs(0L -> "the u.s. economy", 1L -> "tell us more")
    val a = answers(3L -> "U.S.")
    val got = AnswerIndex.tokenContainmentJoin(d, a)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 0L)))
  }

  test("NFD + lowercase: precomposed and combining forms match") {
    // doc carries precomposed é (U+00E9), answer the decomposed e+◌́ form
    val d = docs(0L -> "meet me at the café tonight")
    val a = answers(1L -> "CAFÉ")
    val got = AnswerIndex.tokenContainmentJoin(d, a)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 0L)))
  }

  test("answer longer than doc and empty-token answers match nothing") {
    val d = docs(0L -> "short doc")
    val a = answers(0L -> "short doc plus more words", 1L -> "   ")
    assert(AnswerIndex.tokenContainmentJoin(d, a).count() == 0)
  }
}
