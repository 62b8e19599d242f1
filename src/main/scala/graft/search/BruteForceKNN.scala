package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{float_dot, float_neg_l2sq}
import graft.core.VectorOps

/** Exact brute-force k-NN: the Spark-native form of the reference's
  * exhaustive oracle scorer (`save_hard_neg <corpus size>`,
  * MEVI/marco_eval_nci_rq.sh:26; eval-all path MEVI/main_models.py:3979-3989)
  * and the baseline the ANN paths are judged against.
  *
  * Plan shape: broadcast the (small) query side, crossJoin against the doc
  * side — docs stream through whole-stage codegen scoring, and the grouped
  * bounded top-k aggregator prunes map-side, so the shuffle carries at most
  * k rows per (query, map task), never the full score matrix. This is the
  * 100 TB-safe layout: the corpus is never collected, re-partitioned, or
  * fully materialized with scores.
  */
object BruteForceKNN {

  /** metric ∈ {"ip", "l2", "cos"} (document_encoder.py:128-132). */
  def score(metric: String)(q: org.apache.spark.sql.Column,
                            d: org.apache.spark.sql.Column) = metric match {
    case "ip"  => float_dot(q, d)
    case "l2"  => float_neg_l2sq(q, d)
    case "cos" => VectorOps.vecCosine(q, d)
    case other => throw new IllegalArgumentException(s"metric $other")
  }

  /** Scored (query, doc) pairs. For "cos" the norms are precomputed ONCE
    * per doc row and once per (broadcast) query row before the crossJoin —
    * the naive per-pair form recomputes both norms |Q|·|D| times, doubling
    * the flops of the scan. Bit-identical to the per-pair form: the norm
    * columns hold the same sequentially-folded doubles, and the division
    * groups the same way (zero-norm rows still score 0.0, matching
    * VectorOps.vecCosine).
    */
  private def scoredPairs(
      queries: DataFrame,
      docs: DataFrame,
      metric: String,
      excludeSelf: Boolean): DataFrame = {
    val (q2, d2, sc) =
      if (metric == "cos") {
        val qn = sqrt(float_dot(col("qvec"), col("qvec")))
        val dn = sqrt(float_dot(col("vec"), col("vec")))
        (queries.withColumn("__qn", qn), docs.withColumn("__dn", dn),
          when(col("__qn") === 0.0 || col("__dn") === 0.0, lit(0.0))
            .otherwise(float_dot(col("qvec"), col("vec")) /
              (col("__qn") * col("__dn"))))
      } else (queries, docs, score(metric)(col("qvec"), col("vec")))
    d2.crossJoin(broadcast(q2))
      .where(if (excludeSelf) col("doc_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("doc_id"), sc.as("score"))
  }

  /** Returns (query_id, rank, doc_id, score), rank 1-based best-first.
    * `queries`: (query_id LONG, qvec ARRAY<FLOAT>) — assumed broadcastable.
    * `docs`:    (doc_id LONG, vec ARRAY<FLOAT>) — arbitrarily large.
    */
  def topK(
      queries: DataFrame,
      docs: DataFrame,
      k: Int,
      metric: String = "ip",
      excludeSelf: Boolean = false): DataFrame =
    TopK.ranked(scoredPairs(queries, docs, metric, excludeSelf), k)

  /** Ranked-list form: (query_id, preds ARRAY<LONG>, scores ARRAY<DOUBLE>). */
  def topKLists(
      queries: DataFrame,
      docs: DataFrame,
      k: Int,
      metric: String = "ip",
      excludeSelf: Boolean = false): DataFrame =
    scoredPairs(queries, docs, metric, excludeSelf)
      .groupBy("query_id")
      .agg(TopK.topk(k)(col("doc_id"), col("score")).as("top"))
      .select(
        col("query_id"),
        col("top.id").as("preds"),
        col("top.score").as("scores"))
}
