package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ensemble score fusion of an ANN ranked list with a coarse (cluster-rank)
  * list — exactly MEVI/ensemble_marco.py:235-238 (verified against source):
  *
  *   crank(p) = 0-based rank of p's cluster in the coarse list,
  *              or C (= numClusters, the sentinel) when absent
  *   fused(p) = s_ann(p) + α / (β · crank(p) + 1)
  *   fused(p) *= (1 − γ·α)            iff crank(p) == C   (punish)
  *
  * Note the punish multiplier applies ON TOP of the additive term computed
  * with the sentinel crank — not on the raw score. Defaults α=0.6, β=0.03,
  * γ=0.02 (ensemble_marco.py:251-253; NQ α=0.4, ensemble_nqdpr.py:261).
  * Pure column arithmetic after the alignment join (J6) — no UDF.
  */
object Ensemble {

  /** @param ann         (query_id, doc_id, score) — ANN ranked candidates
    * @param coarse      (query_id, doc_id, crank) — 1-BASED cluster rank
    *                    (row_number convention; converted to the
    *                    reference's 0-based internally); absent rows =
    *                    cluster not predicted → sentinel + punish
    * @param numClusters C: the coarse list length (num_return_sequences)
    * @return (query_id, rank, doc_id, fused_score)
    */
  def fuse(
      ann: DataFrame,
      coarse: DataFrame,
      numClusters: Int,
      alpha: Double = 0.6,
      beta: Double = 0.03,
      gamma: Double = 0.02,
      k: Int = 100): DataFrame = {

    val crank0 = coalesce(col("crank") - 1, lit(numClusters))
    val additive = col("score") + lit(alpha) / (lit(beta) * crank0 + 1)
    val fused = ann
      .join(coarse, Seq("query_id", "doc_id"), "left")
      .select(
        col("query_id"), col("doc_id"),
        when(crank0 === numClusters,
          additive * (lit(1.0) - lit(gamma) * lit(alpha)))
          .otherwise(additive)
          .as("fused_score"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("fused_score").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "fused_score")
  }

  /** Hyperparameter grid sweep — the reference's `--alphas/--betas/--gammas`
    * comma lists looped at ensemble_marco.py:214-258, in ONE distributed
    * pass: the alignment join runs once, each joined row explodes over the
    * (tiny, literal) combo list, and ranking windows partition by
    * (combo, query). |combos|× more rows through one shuffle instead of
    * |combos| separate jobs re-reading both inputs.
    *
    * @return (alpha, beta, gamma, query_id, rank, doc_id, fused_score),
    *         top-k rows per (combo, query).
    */
  def fuseGrid(
      ann: DataFrame,
      coarse: DataFrame,
      numClusters: Int,
      alphas: Seq[Double],
      betas: Seq[Double],
      gammas: Seq[Double],
      k: Int = 100): DataFrame = {

    val combos = for { a <- alphas; b <- betas; g <- gammas } yield (a, b, g)
    val crank0 = coalesce(col("crank") - 1, lit(numClusters))
    val additive = col("score") + col("alpha") / (col("beta") * crank0 + 1)

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("alpha", "beta", "gamma", "query_id")
      .orderBy(col("fused_score").desc, col("doc_id").asc)

    ann
      .join(coarse, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("doc_id"), col("crank"), col("score"),
        explode(typedLit(combos)).as("c"))
      .select(col("query_id"), col("doc_id"), col("crank"), col("score"),
        col("c._1").as("alpha"), col("c._2").as("beta"), col("c._3").as("gamma"))
      .withColumn("fused_score",
        when(crank0 === numClusters,
          additive * (lit(1.0) - col("gamma") * col("alpha")))
          .otherwise(additive))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("alpha", "beta", "gamma", "query_id", "rank", "doc_id",
        "fused_score")
  }
}
