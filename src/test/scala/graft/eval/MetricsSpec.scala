package graft.eval

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("ranking metrics match hand-computed values") {
    // q1: gt {10,20}, preds [10, 99, 20] → r@1=.5 r@5=1; rr@1=1; hit=1
    // q2: gt {30},    preds [99, 98]     → all zero
    // q3: gt {40},    no preds row       → counted, all zero
    val preds = Seq(
      (1L, Seq(10L, 99L, 20L)),
      (2L, Seq(99L, 98L))).toDF("query_id", "preds")
    val truth = Seq(
      (1L, Seq(10L, 20L)),
      (2L, Seq(30L)),
      (3L, Seq(40L))).toDF("query_id", "gt")
    val m = Metrics.ranking(preds, truth, ks = Seq(1, 5)).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(m(1).getAs[Long]("n_queries") == 3)
    assert(math.abs(m(1).getAs[Double]("recall") - 0.5 / 3) < 1e-9)
    assert(math.abs(m(1).getAs[Double]("mrr") - 1.0 / 3) < 1e-9)
    assert(math.abs(m(1).getAs[Double]("hitrate") - 1.0 / 3) < 1e-9)
    assert(math.abs(m(5).getAs[Double]("recall") - 1.0 / 3) < 1e-9)
    assert(math.abs(m(5).getAs[Double]("mrr") - 1.0 / 3) < 1e-9)
  }

  test("recall weighs duplicated gt ids multiply (evaluate.py:39 iterates gt)") {
    // gt [10,10,20], preds[:1]=[10] → 2 of 3 gt elements found → recall 2/3
    val preds = Seq((1L, Seq(10L, 99L))).toDF("query_id", "preds")
    val truth = Seq((1L, Seq(10L, 10L, 20L))).toDF("query_id", "gt")
    val m = Metrics.ranking(preds, truth, ks = Seq(1)).collect()
    assert(math.abs(m(0).getAs[Double]("recall") - 2.0 / 3) < 1e-9)
  }

  test("aucMicro matches hand-computed Mann-Whitney values incl. ties") {
    // q1: perfect separation — pos scores {30,40} above neg {10,20} →
    //     AUC 1.0. q2: pos {10,30} vs neg {20,40} — only (30,20) of the
    //     four pos/neg pairs is concordant → AUC 0.25. q3: ALL FOUR
    //     scores tie at 7 → tie-corrected AUC exactly 0.5. q4: no
    //     negatives → dropped.
    val scored = Seq(
      (1L, 10L, 0), (1L, 20L, 0), (1L, 30L, 1), (1L, 40L, 1),
      (2L, 10L, 1), (2L, 20L, 0), (2L, 30L, 1), (2L, 40L, 0),
      (3L, 7L, 1), (3L, 7L, 0), (3L, 7L, 1), (3L, 7L, 0),
      (4L, 5L, 1), (4L, 6L, 1)
    ).toDF("query_id", "score_micro", "label")
    val got = Metrics.aucMicro(scored)
      .select("query_id", "auc_micro").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1000000L, 2L -> 250000L, 3L -> 500000L))
    // local Mann-Whitney replay with average ranks, as a double check
    def brute(rows: Seq[(Long, Int)]): Double = {
      val sorted = rows.map(_._1).sorted
      def avgRank(s: Long): Double = {
        val first = sorted.indexOf(s) + 1
        val cnt = sorted.count(_ == s)
        first + (cnt - 1) / 2.0
      }
      val pos = rows.filter(_._2 == 1)
      val p = pos.size; val n = rows.size - p
      (pos.map(r => avgRank(r._1)).sum - p * (p + 1) / 2.0) / (p.toDouble * n)
    }
    for (q <- Seq(1L, 2L, 3L)) {
      val rows = Seq(
        (1L, 10L, 0), (1L, 20L, 0), (1L, 30L, 1), (1L, 40L, 1),
        (2L, 10L, 1), (2L, 20L, 0), (2L, 30L, 1), (2L, 40L, 0),
        (3L, 7L, 1), (3L, 7L, 0), (3L, 7L, 1), (3L, 7L, 0))
        .filter(_._1 == q).map(t => (t._2, t._3))
      assert(got(q) == math.floor(brute(rows) * 1000000 + 0.5).toLong, s"q$q")
    }
  }

  test("labelGroundTruth keeps singleton-label queries with empty gt") {
    import spark.implicits._
    // label 7 appears only on the query row itself → gt must be [] (not a
    // dropped row, which would shrink ranking()'s denominator)
    val docs = Seq((1L, 5), (2L, 5), (3L, 7))
      .toDF("doc_id", "label")
    val queries = Seq((2L, 5), (3L, 7))
      .toDF("query_id", "label")
    val gt = Metrics.labelGroundTruth(docs, queries)
      .as[(Long, Seq[Long])].collect().toMap
    assert(gt == Map(2L -> Seq(1L), 3L -> Seq.empty))
  }

  test("ensemble fusion matches the reference formula by hand") {
    // ensemble_marco.py:235-238: s + α/(β·crank0+1) with 0-based crank;
    // unknown cluster → crank0 = C sentinel AND the whole value ×(1−γα)
    val ann = Seq((1L, 10L, 1.0), (1L, 11L, 0.9)).toDF("query_id", "doc_id", "score")
    val coarse = Seq((1L, 10L, 2)).toDF("query_id", "doc_id", "crank") // 1-based
    val fused = Ensemble.fuse(ann, coarse, numClusters = 5,
      alpha = 0.6, beta = 0.03, gamma = 0.02, k = 10)
      .orderBy("rank").collect()
    val expected10 = 1.0 + 0.6 / (0.03 * 1 + 1)                       // crank0 = 1
    val expected11 = (0.9 + 0.6 / (0.03 * 5 + 1)) * (1 - 0.02 * 0.6) // sentinel + punish
    assert(fused(0).getAs[Long]("doc_id") == 10L)
    assert(math.abs(fused(0).getAs[Double]("fused_score") - expected10) < 1e-12)
    assert(math.abs(fused(1).getAs[Double]("fused_score") - expected11) < 1e-12)
  }

  test("fuseGrid's slice at one combo equals fuse at those params") {
    val ann = Seq((1L, 10L, 1.0), (1L, 11L, 0.9), (2L, 10L, 0.5))
      .toDF("query_id", "doc_id", "score")
    val coarse = Seq((1L, 10L, 2)).toDF("query_id", "doc_id", "crank")
    val single = Ensemble.fuse(ann, coarse, numClusters = 5,
      alpha = 0.4, beta = 0.05, gamma = 0.1, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        (r.getInt(1), r.getDouble(3))).toMap
    val grid = Ensemble.fuseGrid(ann, coarse, numClusters = 5,
      alphas = Seq(0.4, 0.6), betas = Seq(0.05), gammas = Seq(0.1), k = 10)
      .where(col("alpha") === 0.4 && col("gamma") === 0.1)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Int]("rank"), r.getAs[Double]("fused_score"))).toMap
    assert(grid.keySet == single.keySet)
    single.foreach { case (key, (rank, score)) =>
      assert(grid(key)._1 == rank)
      assert(math.abs(grid(key)._2 - score) < 1e-12)
    }
  }

  test("batch sessionize splits exactly at the gap by hand") {
    val ts = (m: Int) => new java.sql.Timestamp(m * 60000L)
    val events = Seq(
      (1L, ts(0), 1.0), (1L, ts(10), 2.0),  // session 0
      (1L, ts(50), 3.0),                    // 40 min gap → session 1
      (2L, ts(5), 4.0)                      // other user
    ).toDF("user_id", "ts", "value")
    val sessions = graft.streaming.Sessionize.batch(events, gapMinutes = 30)
      .orderBy("user_id", "session_id").collect()
    assert(sessions.length == 3)
    assert(sessions(0).getAs[Long]("n_events") == 2)
    assert(sessions(0).getAs[Double]("sum_value") == 3.0)
    assert(sessions(1).getAs[Long]("n_events") == 1)
    assert(sessions(2).getAs[Long]("user_id") == 2L)
  }
}
