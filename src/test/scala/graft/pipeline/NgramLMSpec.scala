package graft.pipeline

import graft.SparkSpec

class NgramLMSpec extends SparkSpec {
  import spark.implicits._

  test("bigram model and mean log-prob match the hand computation") {
    // corpus: "a b a b" + "a b" → bigrams: (a,b)×3, (b,a)×1; V = 2
    val docs = Seq((0L, "a b a b"), (1L, "a b")).toDF("doc_id", "text")
    val m = NgramLM.train(docs)
    assert(m.vocabSize == 2L)
    val bc = m.bigrams.as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(bc == Map(("a", "b") -> 3L, ("b", "a") -> 1L))
    val uc = m.unigrams.as[(String, Long)].collect().toMap
    assert(uc == Map("a" -> 3L, "b" -> 1L))

    val got = NgramLM.score(docs, m)
      .select("doc_id", "n_bigrams", "avg_logp")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // p(b|a) = (3+1)/(3+2) = 0.8; p(a|b) = (1+1)/(1+2) = 2/3
    val lpAB = math.log((3 + 1.0) / (3 + 2.0))
    val lpBA = math.log((1 + 1.0) / (1 + 2.0))
    val doc0 = ((lpAB + lpBA) + lpAB) / 3.0 // fold in position order
    assert(got(0L) == (3L, doc0))
    assert(got(1L) == (1L, lpAB))
  }

  test("unseen bigrams smooth instead of failing (held-out scoring)") {
    val train = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val m = NgramLM.train(train)
    val held = Seq((9L, "b b z a")).toDF("doc_id", "text")
    val got = NgramLM.score(held, m)
      .select("doc_id", "n_bigrams", "avg_logp")
      .as[(Long, Long, Double)].collect().head
    // (b,b): c=0, cw(b)=1 → ln(1/3); (b,z): same; (z,a): cw(z)=0 → ln(1/2)
    val want = (math.log(1.0 / 3) + math.log(1.0 / 3) + math.log(1.0 / 2)) / 3.0
    assert(got == (9L, 3L, want))
  }

  test("scoring is partitioning-independent (ordered fold, not sum)") {
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
    val m = NgramLM.train(docs)
    val a = NgramLM.score(docs, m).collect().toSet
    val b = NgramLM.score(docs.repartition(13), m).collect().toSet
    assert(a == b && a.nonEmpty)
  }
}
