package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // separable corpus: target slice speaks a disjoint vocabulary, so the
  // LR must push its probabilities toward 1 and the rest toward 0
  private def corpus() = {
    val good = Seq("theorem", "lemma", "proof", "corollary")
    val junk = Seq("click", "buy", "free", "deal")
    (0L until 90L).map { id =>
      val words =
        if (id % 3 == 0) Seq.fill(15)(good((id % 4).toInt))
        else Seq.fill(15)(junk((id % 4).toInt))
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("classifier separates the planted slices; filter keeps mostly-good") {
    val docs = corpus()
    val target = docs.where(col("doc_id") % 3 === 0)
    val (coef, icpt) = QualityClassifier.train(docs, target, buckets = 64)
    assert(coef.length == 64)
    val scored = QualityClassifier.score(docs, coef, icpt, buckets = 64)
    val probs = scored.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val good = probs.collect { case (id, p) if id % 3 == 0 => p }
    val junk = probs.collect { case (id, p) if id % 3 != 0 => p }
    assert(good.min > junk.max,
      s"good min ${good.min} !> junk max ${junk.max}")
    assert(good.min > 800000L, s"separable slice should score >0.8: ${good.min}")
    assert(junk.max < 200000L, s"junk should score <0.2: ${junk.max}")

    // Pareto(9) keep: P = (2−p)^−9 — near 1 for p≈1, ~0.002 for p≈0
    val kept = QualityClassifier.paretoFilter(scored, alpha = 9.0, seed = 42L)
      .select("doc_id").as[Long].collect().toSet
    val goodKept = kept.count(_ % 3 == 0)
    val junkKept = kept.count(_ % 3 != 0)
    assert(goodKept >= 20, s"most of the 30 good docs survive: $goodKept")
    assert(junkKept <= 3, s"junk survivors should be the rare tail: $junkKept")
  }

  test("decide is deterministic, filter == decide.where(kept), all docs decided") {
    val docs = corpus()
    val target = docs.where(col("doc_id") % 3 === 0)
    val (coef, icpt) = QualityClassifier.train(docs, target, buckets = 64)
    val scored = QualityClassifier.score(docs, coef, icpt, buckets = 64)
    val d1 = QualityClassifier.paretoDecide(scored, seed = 7L)
      .collect().map(_.toString).sorted.toSeq
    val d2 = QualityClassifier.paretoDecide(scored, seed = 7L)
      .collect().map(_.toString).sorted.toSeq
    assert(d1 == d2)
    assert(d1.size == 90) // every tokened doc gets a decision
    val viaFilter = QualityClassifier.paretoFilter(scored, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    val viaDecide = QualityClassifier.paretoDecide(scored, seed = 7L)
      .where(col("kept")).select("doc_id").as[Long].collect().toSet
    assert(viaFilter == viaDecide)
    // a different seed flips which docs draw lucky thresholds, not the
    // shape: the good slice still dominates the survivors
    val other = QualityClassifier.paretoFilter(scored, seed = 8L)
      .select("doc_id").as[Long].collect().toSet
    assert(other.count(_ % 3 == 0) >= 15,
      s"good survivors at seed 8: ${other.count(_ % 3 == 0)}")
  }

  test("guards: wrong weight width refused, tokenless docs carry no score") {
    val docs = corpus()
    val target = docs.where(col("doc_id") % 3 === 0)
    val (coef, icpt) = QualityClassifier.train(docs, target, buckets = 64)
    intercept[IllegalArgumentException] {
      QualityClassifier.score(docs, coef.take(32), icpt, buckets = 64)
    }
    intercept[IllegalArgumentException] {
      QualityClassifier.paretoDecide(
        QualityClassifier.score(docs, coef, icpt), alpha = 0.0)
    }
    // a doc with no tokens has no feature evidence → absent from scoring
    // (a length gate runs before a selection gate in any real pipeline)
    val withEmpty = docs.unionByName(
      Seq((999L, "   ")).toDF("doc_id", "text"))
    val scored = QualityClassifier.score(withEmpty, coef, icpt)
    assert(scored.where(col("doc_id") === 999L).count() == 0)
    assert(scored.count() == 90)
  }
}
