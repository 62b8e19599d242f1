package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.Codebook

/** Coarse→fine retrieval: the reference's core serving shape
  * (MEVI/main_models.py:3911-4020) as one declarative join pipeline:
  *
  *   queries → beam-search top-R code tuples (coarse, V6)
  *           → equi-join cluster index on codes (J3: candidate fetch;
  *             partition-pruned by c0)
  *           → explode members, join embeddings on doc_id (J4)
  *           → exact dot-product re-rank (V2)
  *           → per-(query,doc) dedup max/sum across clusters (A10,
  *             main_models.py:3999-4011)
  *           → grouped bounded top-k (T2)
  *
  * Candidate count per query ≈ ndoc@cluster-R ≪ corpus: the join on
  * predicted codes is the engine's partition-pruning analog of the
  * reference's "only score docs in predicted clusters".
  */
object CoarseFineRetriever {

  /** @param queries       (query_id, qvec ARRAY<FLOAT>)
    * @param clusterIndex  (codes ARRAY<INT>, doc_ids ARRAY<LONG>) from
    *                      [[graft.index.ClusterIndexBuilder]]
    * @param docs          (doc_id, vec ARRAY<FLOAT>) — the full corpus
    * @param dedup         "max" | "sum" (A10 score-dedup mode)
    * @return (query_id, rank, doc_id, score)
    */
  def retrieve(
      queries: DataFrame,
      clusterIndex: DataFrame,
      docs: DataFrame,
      codebook: Codebook,
      beams: Int = 10,
      k: Int = 100,
      metric: String = "ip",
      dedup: String = "max"): DataFrame = {

    val coarse = CodebookBeamSearch.search(queries, codebook, beams)

    // J3: candidate clusters → members. Equi-join on the code tuple.
    val candidates = coarse
      .join(clusterIndex.select("codes", "doc_ids"), Seq("codes"))
      .select(col("query_id"), explode(col("doc_ids")).as("doc_id"))

    // J4 + V2: fetch embeddings, score against the query vector.
    val scored = candidates
      .join(docs, Seq("doc_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(
        col("query_id"), col("doc_id"),
        BruteForceKNN.score(metric)(col("qvec"), col("vec")).as("score"))

    // A10: a doc can appear via several predicted clusters.
    val agg = if (dedup == "sum") sum(col("score")) else max(col("score"))
    val deduped = scored
      .groupBy("query_id", "doc_id")
      .agg(agg.as("score"))

    // T2: grouped bounded top-k.
    deduped
      .groupBy("query_id")
      .agg(TopK.topk(k)(col("doc_id"), col("score")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "sd")))
      .select(
        col("query_id"),
        (col("pos") + 1).as("rank"),
        col("sd.id").as("doc_id"),
        col("sd.score").as("score"))
  }
}
