package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet/Wenzek-style LM
  * fluency gate (docs scored by a corpus-trained LM; low mean log-prob =
  * boilerplate/gibberish, the classic pretraining-data filter). The
  * production form is a KenLM 5-gram; this self-contained bigram form has
  * the same dataflow (count tables + a per-token join + a per-doc fold)
  * and is exactly oracle-replayable.
  *
  * Model: p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)  (add-one smoothing;
  * c(w1) sums over the bigram table so the conditional normalizes; V =
  * distinct vocabulary size). Score(doc) = mean log p over the doc's
  * bigrams, folded in POSITION order (unordered float sums are banned by
  * the library's determinism contract).
  *
  * Scale: the model is two hash-aggregated count tables (distinct-bigram
  * and distinct-token sized, ≪ corpus tokens); scoring is one join of the
  * doc bigram stream against them (broadcast when the vocab fits, shuffle
  * hash join otherwise) and a per-doc window/fold — no driver state.
  */
object NgramLM {

  /** (bigrams(w1, w2, c), unigrams(w1, cw), V). */
  case class Model(bigrams: DataFrame, unigrams: DataFrame, vocabSize: Long)

  private def tokenStream(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol),
        posexplode(filter(TextAnalysis.tokens(col(textCol)),
          t => length(t) > 0)).as(Seq("pos", "w")))

  /** The per-doc bigram stream (idCol, pos, w1, w2) via a lead window —
    * partitioned by doc, never a global sort. */
  private def bigramStream(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos").asc)
    tokenStream(docs, idCol, textCol)
      .withColumn("w2", lead(col("w"), 1).over(w))
      .where(col("w2").isNotNull)
      .select(col(idCol), col("pos"), col("w").as("w1"), col("w2"))
  }

  def train(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): Model = {
    val big = bigramStream(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val uni = big.groupBy("w1").agg(sum("c").as("cw"))
    val v = tokenStream(docs, idCol, textCol)
      .select("w").distinct().count()
    Model(big, uni, v)
  }

  /** (idCol, n_bigrams, avg_logp): mean log p(w2|w1) per document, the
    * position-ordered sequential fold. Docs with fewer than two tokens
    * have no bigrams and are absent (a length gate runs before an LM gate
    * in any real pipeline). Unseen bigrams/tokens smooth to
    * (0+1)/(0|cw + V) — scoring held-out text works, not just the
    * training corpus. */
  def score(docs: DataFrame, model: Model, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val logp: Column =
      log((coalesce(col("c"), lit(0L)) + lit(1.0)) /
        (coalesce(col("cw"), lit(0L)) + lit(model.vocabSize.toDouble)))
    bigramStream(docs, idCol, textCol)
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.unigrams, Seq("w1"), "left")
      .select(col(idCol), col("pos"), logp.as("lp"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("lp")))).as("a"))
      .select(col(idCol),
        size(col("a")).cast("long").as("n_bigrams"),
        (aggregate(col("a"), lit(0.0),
          (acc, s) => acc + s.getField("lp")) / size(col("a"))).as("avg_logp"))
  }
}
