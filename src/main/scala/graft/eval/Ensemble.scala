package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ensemble score fusion of an ANN ranked list with a coarse (cluster-rank)
  * list — MEVI/ensemble_marco.py:221-240:
  *
  *   fused(p) = s_ann(p) + α / (β · crank(p) + 1)        if p's cluster ranked
  *   fused(p) = s_ann(p) · (1 − γ·α)                      otherwise (punish)
  *
  * Defaults α=0.6, β=0.03, γ=0.02 (ensemble_marco.py:251-253; NQ α=0.4,
  * ensemble_nqdpr.py:261). Pure column arithmetic after the alignment join
  * (J6) — no UDF, fully codegen'd.
  */
object Ensemble {

  /** @param ann    (query_id, doc_id, score) — ANN ranked candidates
    * @param coarse (query_id, doc_id, crank) — 1-based cluster rank of the
    *               doc's cluster within the query's coarse list (absent rows
    *               = cluster not predicted → punished)
    * @return (query_id, rank, doc_id, fused_score)
    */
  def fuse(
      ann: DataFrame,
      coarse: DataFrame,
      alpha: Double = 0.6,
      beta: Double = 0.03,
      gamma: Double = 0.02,
      k: Int = 100): DataFrame = {

    val fused = ann
      .join(coarse, Seq("query_id", "doc_id"), "left")
      .select(
        col("query_id"), col("doc_id"),
        when(col("crank").isNotNull,
          col("score") + lit(alpha) / (lit(beta) * col("crank") + 1))
          .otherwise(col("score") * (lit(1.0) - lit(gamma) * lit(alpha)))
          .as("fused_score"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id")
      .orderBy(col("fused_score").desc, col("doc_id").asc)
    fused
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "fused_score")
  }
}
