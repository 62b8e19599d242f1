package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Okapi BM25 lexical scoring — the classic sparse-retrieval baseline the
  * reference ensembles against dense retrieval (its MARCO runs fuse with
  * BM25-family rank lists; see `MEVI/ensemble_marco.py` rank-file inputs).
  * Also the standard quality-filter/retrieval primitive of a training-data
  * pipeline (e.g. importance sampling against a target corpus).
  *
  * Scale shape: one groupBy builds the (doc, term, tf) postings table —
  * the only corpus-sized shuffle; doc lengths derive from postings (sum of
  * tf, no second pass over raw tokens); query terms and their per-term
  * document frequencies are tiny after the query-term semi-restriction and
  * ship broadcast, so scoring is a map-side join over postings followed by
  * one (query, doc) aggregation. Corpus stats (N, avgdl) ride along as a
  * broadcast single-row frame — the whole thing is ONE distributed plan,
  * no driver-side collects.
  */
object BM25 {

  /** THE engine tokenizer (TextAnalysis.tokens) — one definition site so
    * postings can never drift from the dedup/text-analysis family. */
  private def tokens(c: org.apache.spark.sql.Column) =
    graft.pipeline.TextAnalysis.tokens(c)

  /** (doc_id, term, tf) postings from a document table. Empty tokens are
    * dropped: Spark's split keeps leading/trailing empties, and an ""
    * term would (a) inflate every doc's length and (b) let a query with
    * stray whitespace join the ENTIRE corpus through the "" posting. */
  def postings(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** BM25 score of every (query, doc) pair sharing at least one term.
    * `queries`: (qidCol, qtextCol). Returns (qidCol, idCol, score).
    *
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))   (Lucene's +1 form —
    * never negative, so stopword-ish terms dampen instead of flipping sign)
    * contrib(t, D) = idf · tf·(k1+1) / (tf + k1·(1 − b + b·|D|/avgdl))
    */
  def score(docs: DataFrame, queries: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      qidCol: String = "query_id", qtextCol: String = "qtext",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = postings(docs, idCol, textCol)
    val dl = tf.groupBy(col(idCol))
      .agg(sum(col("tf")).cast("double").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val qterms = queries.select(col(qidCol),
      explode(array_distinct(tokens(col(qtextCol)))).as("term"))
      .where(length(col("term")) > 0)
    // restrict postings to query terms FIRST (broadcast semi-shape), then
    // attach the vocabulary-sized df only for the surviving terms
    val contrib = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(qterms.select("term").distinct()
        .join(dfreq, Seq("term"))), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .select(col(qidCol), col(idCol), col("term"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf").cast("double") * (k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))).as("c"))
    // term-ordered sequential fold, NOT sum(): float addition is
    // order-sensitive and partial-agg order varies with partitioning — the
    // library's determinism contract (and the DuckDB twin's
    // `list_sum(list(c ORDER BY term))`) needs one canonical fold order
    contrib.groupBy(col(qidCol), col(idCol))
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0),
        (acc, s) => acc + s.getField("c")).as("score"))
  }

  /** Top-k per query — through the shared bounded-heap aggregator
    * (TopK.ranked, the engine's one ranked-list contract), NOT a window:
    * a query with one common term scores a large corpus slice, and the
    * partial-aggregated top-k ships ≤ ~4k rows per group per map task
    * where a window sort would shuffle every scored pair. */
  def topK(docs: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      qidCol: String = "query_id", qtextCol: String = "qtext",
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val scored = score(docs, queries, idCol, textCol, qidCol, qtextCol, k1, b)
      .select(col(qidCol).as("query_id"), col(idCol).as("doc_id"),
        col("score"))
    TopK.ranked(scored, k)
      .select(col("query_id").as(qidCol), col("rank"),
        col("doc_id").as(idCol), col("score"))
  }
}
