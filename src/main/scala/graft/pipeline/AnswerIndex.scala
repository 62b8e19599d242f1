package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** NQ-style answer machinery:
  *
  * J5 — answer-containment theta join (get_answers.py:109-172): for every
  * (query, answer-strings) row, find docs whose text contains any answer.
  * The reference matches TOKEN SUBSEQUENCES, not raw substrings: both
  * sides are NFD-normalized, tokenized by DPR's SimpleTokenizer and
  * lowercased (get_answers.py:36-107), then the answer token list is
  * KMP-searched in the doc token list (strStr, get_answers.py:110-138) —
  * so "cat" does NOT match "concatenate". Spark layout: broadcast the
  * small query/answer side and stream the corpus through a nested-loop
  * join whose predicate is a token-window `exists` — the corpus side
  * never shuffles and tokenizes once per doc, not once per pair.
  *
  * A9 — inverse answer index (get_inverse_answers.py:10-27): invert
  * query→docs into doc→sorted query list (the CSR offsets/array pair
  * becomes one ARRAY<INT> column).
  */
object AnswerIndex {

  /** DPR SimpleTokenizer as a column expression: alphanumeric runs
    * (`[\p{L}\p{N}\p{M}]+`) or single non-space/control chars, over the
    * NFD-normalized lowercase text (get_answers.py:37-47 — the regex is
    * case-insensitive and `words(uncased=True)` lowercases after, so
    * lowering first is equivalent). */
  private val DprTokenRe = "[\\p{L}\\p{N}\\p{M}]+|[^\\p{Z}\\p{C}]"
  def dprTokens(c: Column): Column =
    regexp_extract_all(lower(TextFunctions.nfd(c)), lit(DprTokenRe), lit(0))

  /** Raw-substring variant (kept for the loose-screen use case; the
    * reference-faithful matcher is [[tokenContainmentJoin]]).
    * @param docs    (doc_id, text) — large
    * @param answers (query_idx, answer STRING) — small, broadcast
    * @return (query_idx, doc_id) matches
    */
  def containmentJoin(docs: DataFrame, answers: DataFrame): DataFrame =
    docs.join(broadcast(answers),
        col("text").contains(col("answer")))
      .select(col("query_idx"), col("doc_id"))
      .distinct()

  /** Token-subsequence containment (the reference's semantics): doc
    * matches iff the answer's token list appears contiguously in the
    * doc's token list. Both sides tokenize ONCE (projection before the
    * join); the window scan is a codegen'd `exists` over slice equality
    * — work per pair ∝ doc tokens, same as the reference's KMP without
    * the prefix table (window compare short-circuits on first mismatch).
    * Empty answer token lists match nothing (a pure-whitespace answer is
    * senseless as a relevance label).
    */
  def tokenContainmentJoin(docs: DataFrame, answers: DataFrame): DataFrame = {
    val dt = docs.select(col("doc_id"), dprTokens(col("text")).as("dtoks"))
    val at = answers.select(col("query_idx"), dprTokens(col("answer")).as("atoks"))
    val la = size(col("atoks"))
    val ld = size(col("dtoks"))
    // when() guards the window scan: sequence(1, n) with n ≤ 0 would
    // generate a DESCENDING sequence and slice() would fault on start 0
    val matched = when(la > 0 && la <= ld,
      exists(sequence(lit(1), ld - la + lit(1)),
        p => slice(col("dtoks"), p, la) === col("atoks"))
    ).otherwise(lit(false))
    dt.join(broadcast(at), matched)
      .select(col("query_idx"), col("doc_id"))
      .distinct()
  }

  /** doc_id → sorted query_idx list (+ n_queries). */
  def inverse(matches: DataFrame): DataFrame =
    matches.groupBy("doc_id")
      .agg(sort_array(collect_set(col("query_idx"))).as("query_idx"),
        countDistinct(col("query_idx")).as("n_queries"))
}
