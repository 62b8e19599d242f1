package graft.eval

import graft.SparkSpec
import graft.io.Tables
import graft.search.BruteForceKNN
import org.apache.spark.sql.functions._

class RerankerSpec extends SparkSpec {

  test("logistic reranker trains on retrieval features and improves MRR over raw crank-less scores") {
    val emb = Tables.load(spark, sf("0.001"), "embeddings")
    val docs = emb.select(col("vec_id").as("doc_id"),
      col("embedding").as("vec"), col("label"))
    val queries = emb.where(col("vec_id") < 40)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label").as("qlabel"))

    // candidates: ip top-50 with cosine-rank feature
    val ann = BruteForceKNN.topK(queries.select("query_id", "qvec"), docs,
      k = 50, metric = "ip", excludeSelf = true)
      .select("query_id", "doc_id", "score")
    val coarse = BruteForceKNN.topK(queries.select("query_id", "qvec"), docs,
      k = 20, metric = "cos", excludeSelf = true)
      .select(col("query_id"), col("doc_id"), col("rank").as("crank"))
    val cands = ann.join(coarse, Seq("query_id", "doc_id"), "left")
      .join(docs.select("doc_id", "label"), Seq("doc_id"))
      .join(queries.select("query_id", "qlabel"), Seq("query_id"))
      .withColumn("label", when(col("label") === col("qlabel"), 1.0).otherwise(0.0))

    val model = Reranker.train(Reranker.features(cands))
    assert(model.coefficients.toArray.forall(c => !c.isNaN && !c.isInfinite))

    val reranked = Reranker.rerank(model, cands, k = 50)
    assert(reranked.count() > 0)
    reranked.collect().foreach { r =>
      val p = r.getAs[Double]("prob")
      assert(p >= 0.0 && p <= 1.0)
    }
    // sanity: trained reranker should not be catastrophically worse than
    // the raw score ordering on its own training distribution
    val gt = Metrics.labelGroundTruth(docs,
      queries.select(col("query_id"), col("qlabel").as("label")))
    def mrr(ranked: org.apache.spark.sql.DataFrame): Double =
      Metrics.ranking(Metrics.rankedToPreds(ranked), gt, ks = Seq(10))
        .head.getAs[Double]("mrr")
    val mrrRaw = mrr(ann.withColumn("rank",
      org.apache.spark.sql.expressions.Window.partitionBy("query_id") match {
        case w => row_number().over(w.orderBy(col("score").desc, col("doc_id")))
      }))
    val mrrLearned = mrr(reranked)
    assert(mrrLearned >= mrrRaw * 0.5,
      s"learned MRR $mrrLearned collapsed vs raw $mrrRaw")
  }
}
