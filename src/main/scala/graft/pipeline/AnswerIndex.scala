package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NQ-style answer machinery:
  *
  * J5 — answer-containment theta join (get_answers.py:109-172): for every
  * (query, answer-strings) row, find docs whose text contains any answer.
  * Spark layout: broadcast the small query/answer side and stream the
  * corpus through a nested-loop join with a `contains` predicate — the
  * corpus side never shuffles.
  *
  * A9 — inverse answer index (get_inverse_answers.py:10-27): invert
  * query→docs into doc→sorted query list (the CSR offsets/array pair
  * becomes one ARRAY<INT> column).
  */
object AnswerIndex {

  /** @param docs    (doc_id, text) — large
    * @param answers (query_idx, answer STRING) — small, broadcast
    * @return (query_idx, doc_id) matches
    */
  def containmentJoin(docs: DataFrame, answers: DataFrame): DataFrame =
    docs.join(broadcast(answers),
        col("text").contains(col("answer")))
      .select(col("query_idx"), col("doc_id"))
      .distinct()

  /** doc_id → sorted query_idx list (+ n_queries). */
  def inverse(matches: DataFrame): DataFrame =
    matches.groupBy("doc_id")
      .agg(sort_array(collect_set(col("query_idx"))).as("query_idx"),
        countDistinct(col("query_idx")).as("n_queries"))
}
