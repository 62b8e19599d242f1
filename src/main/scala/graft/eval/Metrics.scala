package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval metrics: Recall@k, MRR@k, HitRate@k, ndoc.
  *
  * Spark-first port of MEVI/evaluate.py:7-47 and
  * MEVI/main_models.py:4144-4193: per-query ranks become array expressions,
  * the corpus-wide average is one `agg` — no per-query driver loop.
  *
  * Inputs:
  *   preds: (queryCol, preds ARRAY<LONG> rank-ordered best-first)
  *   truth: (queryCol, gt ARRAY<LONG>)
  */
object Metrics {

  val DefaultKs: Seq[Int] = Seq(1, 5, 10, 20, 50, 100, 1000)

  /** One row per k: (k, recall, mrr, hitrate, n_queries).
    * recall@k = |preds[:k] ∩ gt| / |gt|  (evaluate.py:17-26 semantics)
    * mrr@k    = 1 / (1 + min rank of any gt in preds[:k]), 0 if none
    * hit@k    = 1 if any gt in preds[:k]                 (evaluate.py:7-16)
    */
  def ranking(
      preds: DataFrame,
      truth: DataFrame,
      queryCol: String = "query_id",
      predsCol: String = "preds",
      gtCol: String = "gt",
      ks: Seq[Int] = DefaultKs): DataFrame = {

    // Queries with no prediction row still count in the denominator
    // (reference merges per-shard result lists over ALL eval queries).
    val joined = truth.join(preds, Seq(queryCol), "left")
      .select(
        col(queryCol),
        col(gtCol),
        coalesce(col(predsCol), array().cast("array<long>")).as("p"))

    val perK = ks.map { k =>
      val topk = slice(col("p"), 1, k)
      val inter = array_intersect(topk, col(gtCol))
      // per-gt-element (1-based) ranks within preds[:k]; 0 when absent
      val gtRanks = transform(col(gtCol), g => array_position(topk, g))
      val bestRank = array_min(filter(gtRanks, r => r > 0))
      // recall counts EVERY gt element found (evaluate.py:39 iterates gt,
      // so duplicated gt ids weigh multiply — array_intersect would dedupe)
      val gtHits = size(filter(gtRanks, r => r > 0))
      // empty gt → recall 0, not x/0 = null (a null would silently drop
      // the query from avg(recall) while it still counts in mrr/hitrate)
      val recall = when(size(col(gtCol)) === 0, 0.0)
        .otherwise(gtHits.cast("double") / size(col(gtCol)))
      struct(
        lit(k).as("k"),
        recall.as("recall"),
        when(bestRank.isNull, 0.0).otherwise(lit(1.0) / bestRank).as("rr"),
        when(size(inter) > 0, 1.0).otherwise(0.0).as("hit"))
    }

    joined
      .select(col(queryCol), explode(array(perK: _*)).as("m"))
      .groupBy(col("m.k").as("k"))
      .agg(
        avg("m.recall").as("recall"),
        avg("m.rr").as("mrr"),
        avg("m.hit").as("hitrate"),
        count(lit(1)).as("n_queries"))
      .orderBy("k")
  }

  /** Avg candidate-pool size per query — ndoc@cluster-k,
    * MEVI/main_models.py:3775-3777,4182. When `queries` is given, queries
    * whose predicted clusters yielded NO candidates count as 0 (the
    * reference divides by ALL eval queries); without it the average is
    * over candidate-producing queries only.
    */
  def ndoc(candidates: DataFrame, queryCol: String = "query_id",
      queries: Option[DataFrame] = None): DataFrame = {
    val counts = candidates.groupBy(queryCol).count()
    val full = queries match {
      case Some(q) => q.select(queryCol).distinct()
        .join(counts, Seq(queryCol), "left")
        .select(col(queryCol), coalesce(col("count"), lit(0L)).as("count"))
      case None => counts
    }
    full.agg(avg("count").as("ndoc_per_query"), count(lit(1)).as("n_queries"))
  }

  /** (query_id, rank, doc_id, …) ranked rows → (query_id, preds) lists. */
  def rankedToPreds(ranked: DataFrame): DataFrame =
    ranked.groupBy("query_id")
      .agg(sort_array(collect_list(struct(col("rank"), col("doc_id")))).as("r"))
      .select(col("query_id"), col("r.doc_id").as("preds"))

  /** Per-query ROC-AUC via the Mann-Whitney rank-sum with the standard
    * tie correction, in EXACT integer arithmetic: callers pass micro-
    * rounded Long scores, ranks ascend by score with min-rank ties, and
    * a tie group's doubled average rank is `2·rmin + tieCount − 1` — so
    * the doubled positive rank-sum r2p is a Long and
    * auc = (r2p − P(P+1)) / (2PN) rounds to micro-units by one integer
    * division: `(num·10⁶ + PN) div (2PN)`. Partial-aggregation order
    * cannot move a bit, and a SQL oracle replays the identical windows
    * and division. Queries with no positives or no negatives drop (AUC
    * undefined there). Shape: two windows + one hash-agg, all
    * partitioned by query — per-query candidate lists sort locally,
    * never a global sort. Output: (queryCol, auc_micro, p, n). */
  def aucMicro(scored: DataFrame, queryCol: String = "query_id",
      scoreCol: String = "score_micro",
      labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wq = Window.partitionBy(queryCol).orderBy(col(scoreCol).asc)
    val wt = Window.partitionBy(queryCol, scoreCol)
    scored
      .withColumn("__rmin", rank().over(wq))
      .withColumn("__tc", count(lit(1)).over(wt))
      .groupBy(queryCol)
      .agg(
        sum(when(col(labelCol) === 1,
          lit(2L) * col("__rmin") + col("__tc") - 1L).otherwise(0L))
          .as("__r2p"),
        sum(col(labelCol).cast("long")).as("p"),
        (count(lit(1)) - sum(col(labelCol).cast("long"))).as("n"))
      .where(col("p") > 0 && col("n") > 0)
      .select(col(queryCol),
        expr("((__r2p - p * (p + 1)) * 1000000 + p * n) div (2 * p * n)")
          .as("auc_micro"),
        col("p"), col("n"))
  }

  /** Label-match ground truth: gt(query) = every doc sharing the query's
    * label, excluding the query row itself (the fixtures' cluster labels
    * play the relevance judgments). LEFT join from the queries: a query
    * whose label has no other member still gets a row (empty gt) —
    * `ranking` counts every eval query in its averages (empty gt scores
    * recall 0), and an inner join here would silently shrink the
    * denominator and inflate the reported metrics.
    */
  def labelGroundTruth(docs: DataFrame, queries: DataFrame): DataFrame =
    queries.as("q").join(docs.as("d"),
        col("d.label") === col("q.label") &&
          col("d.doc_id") =!= col("q.query_id"), "left")
      .groupBy(col("q.query_id"))
      .agg(sort_array(collect_list(col("d.doc_id"))).as("gt"))
}
