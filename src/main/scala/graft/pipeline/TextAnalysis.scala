package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID
  * (stopword-ratio heuristic), quality scoring, token counting, and
  * document fingerprinting (rolling hash). All per-row column expressions —
  * shuffle-free, codegen'd, oracle-expressible.
  */
object TextAnalysis {

  val EnStopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "for", "on", "with",
    "as", "by", "at", "an", "or", "it", "this", "that", "be", "are")

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(EnStopwords: _*))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Heuristic language ID: stopword-ratio over threshold → "en".
    * (The reference corpus is English-only; the operator exists for the
    * pipeline surface — an n-gram profile per language plugs in the same
    * column shape.)
    */
  def langId(text: Column, threshold: Double = 0.03): Column =
    when(stopwordRatio(text) >= threshold, "en").otherwise("unknown")

  /** (doc_id, n_tokens, n_chars, avg_token_len, punct_ratio,
    * stopword_ratio, quality_score) — length/punct/stopword quality
    * heuristics on one pass.
    */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val input = Dedup.ensureParallelism(docs)
    val text = col(textCol)
    val toks = tokens(text)
    val nTokens = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val punct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double")
    val avgTokLen = (nChars - (nTokens - 1)) / greatest(nTokens, lit(1.0))
    val swr = stopwordRatio(text)
    // quality in [0,1]: reward mid-length docs and prose-like stopword
    // ratios, penalize punctuation soup
    val lenScore = least(nTokens / lit(64.0), lit(1.0))
    val punctScore = greatest(lit(1.0) - punct / greatest(nChars, lit(1.0)) * 10, lit(0.0))
    val swScore = least(swr * 10, lit(1.0))
    val q = lenScore * 0.4 + punctScore * 0.3 + swScore * 0.3
    input.select(col(idCol),
      nTokens.cast("long").as("n_tokens"),
      nChars.cast("long").as("n_chars"),
      avgTokLen.as("avg_token_len"),
      (punct / greatest(nChars, lit(1.0))).as("punct_ratio"),
      swr.as("stopword_ratio"),
      q.as("quality_score"))
  }

  /** Order-sensitive rolling-hash fingerprint over token hashes:
    * h ← (h·1000003 + h32(token)) mod (2^31−1). Exact integer arithmetic →
    * reproducible in the oracle via list_reduce.
    */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val htoks = transform(tokens(col(textCol)), t => Dedup.md5Hash32(t))
    val fp = aggregate(htoks, lit(0L),
      (acc, h) => pmod(acc * 1000003L + h, lit(Dedup.P)))
    docs.select(col(idCol), fp.as("fingerprint"))
  }
}
