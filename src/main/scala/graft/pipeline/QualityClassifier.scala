package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GPT-3-style quality-classifier data selection (Brown et al. 2020,
  * appendix A): train a logistic-regression classifier to separate a
  * curated target slice from the raw corpus over hashed token features,
  * score every raw document, and keep a document iff
  * `score > 1 − x` with `x` a per-document Pareto(α) draw — the
  * stochastic threshold that keeps mostly-high-quality docs while
  * letting through a long tail of low-scoring ones (the published
  * recipe uses α = 9). The OTHER canonical selection method next to
  * DSIR ([[ImportanceResampling]]); both run over the same md5-bucket
  * feature space, so a pipeline can A/B them on identical features.
  *
  * Determinism contract: the FIT is a train-once artifact (MLlib LBFGS,
  * same discipline as the V15 reranker — the trained weights are what
  * gets certified, by inlining them into the oracle). SCORING is a
  * bucket-ordered sequential fold of w_b·x_b (absent buckets contribute
  * an exact ±0.0 — an IEEE addition identity — so a present-buckets-only
  * replay in SQL lands on identical bits), one `exp`, and a micro-grid
  * snap; the Pareto draw inverts the Lomax CDF on the library's md5
  * uniform (`x = u^(−1/α) − 1`), micro-snapped too, and the keep rule
  * compares the two Longs. The SELECTION replays bit-for-bit.
  *
  * Scale shape: features are the [[ImportanceResampling.docBuckets]]
  * map-side-combined counts; scoring is a per-doc fold (no join — the
  * weights inline into the plan as literals); the filter is a predicate.
  * Nothing is driver-resident but the `buckets`-sized weight vector.
  */
object QualityClassifier {

  private val M = 1000000L

  /** Per-doc relative-frequency feature vector
    * (idCol, x ARRAY<DOUBLE> of length `buckets`, n_tokens LONG). */
  def features(docs: DataFrame, buckets: Int = 64, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    ImportanceResampling.docBuckets(docs, buckets, idCol, textCol)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("b"), col("n")))).as("__m"),
        sum("n").as("n_tokens"))
      .select(col(idCol), col("n_tokens"),
        transform(sequence(lit(0L), lit(buckets - 1L)),
          b => coalesce(element_at(col("__m"), b), lit(0L)).cast("double") /
            col("n_tokens").cast("double")).as("x"))

  /** Train the quality LR: label 1.0 for docs in `target`, 0.0 otherwise.
    * Returns (coefficients, intercept) — the inlinable artifact. The fit
    * is the opaque-model step (train-once, ArtifactCache it); everything
    * downstream replays from the returned weights. */
  def train(raw: DataFrame, target: DataFrame, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text",
      maxIter: Int = 50): (Array[Double], Double) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val labeled = features(raw, buckets, idCol, textCol)
      .join(target.select(col(idCol), lit(1.0).as("label")), Seq(idCol), "left")
      .select(array_to_vector(col("x")).as("features"),
        coalesce(col("label"), lit(0.0)).as("label"))
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(0.01)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(labeled)
    (m.coefficients.toArray, m.intercept)
  }

  /** Score docs with inlined weights: (idCol, prob_micro LONG) with
    * prob = σ(Σ_b w_b·x_b + c), the term sum folded in bucket order. */
  def score(docs: DataFrame, coef: Array[Double], intercept: Double,
      buckets: Int = 64, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(coef.length == buckets,
      s"got ${coef.length} weights for $buckets buckets")
    val f = features(docs, buckets, idCol, textCol)
    // ((0 + w0·x0) + w1·x1) + … — 0 + t0 == t0 and t_b = ±0.0 for absent
    // buckets are IEEE identities, so a present-only ordered replay matches
    val termSum = coef.zipWithIndex.foldLeft(lit(0.0): Column) {
      case (acc, (w, b)) => acc + lit(w) * element_at(col("x"), b + 1)
    }
    val prob = lit(1.0) / (lit(1.0) + exp(-(termSum + lit(intercept))))
    f.select(col(idCol),
      floor(prob * M + lit(0.5)).cast("long").as("prob_micro"))
  }

  /** The Pareto keep DECISION per doc: kept iff prob > 1 − x with
    * x ~ Pareto(α) drawn from the deterministic md5 uniform of
    * (seed, id) via the Lomax inverse CDF x = u^(−1/α) − 1. Returns
    * EVERY scored row as (idCol, prob_micro, thr_micro, kept) — both
    * sides micro-snapped before the strict compare, so the boundary is
    * engine-independent. (At the published α = 9 the rule is aggressive:
    * P(keep) = (2 − p)^−α, under 1% at base-rate scores — emitting the
    * decision rather than the survivors keeps the whole scoring surface
    * auditable.) */
  def paretoDecide(scored: DataFrame, alpha: Double = 9.0, seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0.0)
    val u = (pmod(graft.functions.HashFunctions.md5_prefix(
        concat(lit(seed.toString), lit(":"), col(idCol).cast("string")), 15),
      lit(M)).cast("double") + lit(1.0)) / lit((M + 1).toDouble)
    val x = pow(u, lit(-1.0 / alpha)) - lit(1.0)
    val thr = floor((lit(1.0) - x) * M + lit(0.5)).cast("long")
    scored
      .withColumn("thr_micro", thr)
      .withColumn("kept", col("prob_micro") > col("thr_micro"))
  }

  /** [[paretoDecide]] filtered to the survivors — the form a selection
    * pipeline actually materializes. */
  def paretoFilter(scored: DataFrame, alpha: Double = 9.0, seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame =
    paretoDecide(scored, alpha, seed, idCol)
      .where(col("kept")).drop("kept")
}
