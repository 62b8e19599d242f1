package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}

/** Learned score fusion: an MLlib LogisticRegression over retrieval
  * features — the idiomatic Spark stand-in for the reference's trained
  * cluster-feature projections (V19, MEVI/main_models.py:1054-1239) and
  * the (q·p, label) contrastive reranker shape (V15, SURVEY §2.8). The
  * hand-tuned fusion formula ([[Ensemble.fuse]]) stays the zero-training
  * default; this learns the weights instead of grid-searching α/β/γ
  * (ensemble_marco.py:251-253).
  */
object Reranker {

  /** Feature columns from an aligned candidate table:
    * (score, crank?) → [score, 1/(1+crank), crank-missing flag].
    * Mirrors the rank-reciprocal features of main_models.py:1119-1135.
    */
  def features(aligned: DataFrame): DataFrame =
    aligned.withColumn("features", array_to_vector(array(
      col("score").cast("double"),
      (lit(1.0) / (coalesce(col("crank"), lit(1000)).cast("double") + 1.0)),
      when(col("crank").isNull, 1.0).otherwise(0.0))))

  /** Train on (features, label) — label 1.0 for relevant candidates. */
  def train(labeled: DataFrame, maxIter: Int = 50): LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(0.01)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(labeled)

  /** Re-rank candidates by the model's relevance probability.
    * Returns (query_id, rank, doc_id, prob).
    */
  def rerank(model: LogisticRegressionModel, candidates: DataFrame,
      k: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = model.transform(features(candidates))
      .withColumn("prob", element_at(vector_to_array(col("probability")), 2))
    val w = Window.partitionBy("query_id")
      .orderBy(col("prob").desc, col("doc_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "prob")
  }
}
