package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The V1 encoder seam, exercised by the SECOND encoder: the trained
  * Word2Vec table applies through the mapPartitions contract with
  * exactly the arithmetic the SQL oracle replays (double sum in token
  * order, one multiply by 1/n, float round), and the fit is
  * deterministic under re-fit and input repartitioning.
  */
class TextEmbedderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.io.Tables
    .load(spark, sf("0.001"), "documents")
    .select(col("doc_id"), col("text")).cache()

  test("word2vec vocab covers the corpus and vectors are finite") {
    val wv = TextEmbedder.word2vecTrain(docs, dim = 8)
    val vocab = wv.map(_._1).toSet
    val corpusVocab = docs
      .select(explode(graft.pipeline.Dedup.tokens(col("text"))).as("t"))
      .where(length(col("t")) > 0)
      .distinct().as[String].collect().toSet
    assert(corpusVocab.subsetOf(vocab),
      s"minCount=1 must keep every corpus token; missing ${corpusVocab -- vocab}")
    assert(wv.forall(_._2.forall(f => !f.isNaN && !f.isInfinite)))
    assert(wv.forall(_._2.length == 8))
  }

  test("word2vecApply matches a local fold replay bit-for-bit") {
    val wv = TextEmbedder.word2vecTrain(docs, dim = 8)
    val wvMap = wv.toMap
    val got = TextEmbedder.word2vecApply(docs, wv)
      .as[(Long, Seq[Float])].collect().toMap
    val local = docs.select(col("doc_id"),
        graft.pipeline.Dedup.tokens(col("text")).as("t"))
      .as[(Long, Seq[String])].collect()
      .filter(_._2.nonEmpty)
      .map { case (id, toks) =>
        val acc = new Array[Double](8)
        toks.foreach(t => wvMap.get(t).foreach { v =>
          (0 until 8).foreach(i => acc(i) += v(i))
        })
        val inv = 1.0 / toks.length
        id -> acc.map(x => (x * inv).toFloat).toSeq
      }.toMap
    assert(got === local)
  }

  test("word2vec fit is reproducible and partitioning-invariant") {
    val a = TextEmbedder.word2vecTrain(docs, dim = 8)
    val b = TextEmbedder.word2vecTrain(docs.repartition(7), dim = 8)
    assert(a.map(_._1) == b.map(_._1))
    val diffs = a.zip(b).filter { case ((_, va), (_, vb)) =>
      !java.util.Arrays.equals(va, vb)
    }
    assert(diffs.isEmpty,
      s"refit drifted on ${diffs.map(_._1._1)} — seed/sort/partition pin broken")
  }

  test("downstream retrieval is encoder-agnostic: swap feeds the same operators") {
    // same index-build + retrieve calls as the catalog entry, on the
    // swapped vectors; every query retrieves a non-empty ranked list and
    // scores arrive sorted (the operator contract, regardless of encoder)
    val wv = TextEmbedder.word2vecTrain(docs, dim = 8)
    val vecs = TextEmbedder.word2vecApply(docs, wv).cache()
    val cb = graft.index.RQTrainer.fit(vecs.select("doc_id", "vec"), "vec",
      numLevels = 2, k = 4, seed = 42L, maxIter = 5)
    val index = graft.index.ClusterIndexBuilder.build(
      graft.index.CodeAssigner.assign(vecs.select("doc_id", "vec"), cb))
    val queries = vecs.where(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("vec").as("qvec"))
    val out = graft.search.CoarseFineRetriever
      .retrieve(queries, index, vecs.select("doc_id", "vec"), cb,
        beams = 2, k = 5)
      .select($"query_id", $"rank", $"score")
      .as[(Long, Int, Double)].collect()
    assert(out.map(_._1).distinct.length == 5, "every query answered")
    out.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._3).sliding(2).forall(w =>
        w.length < 2 || w(0) >= w(1)), "scores must descend with rank")
    }
  }

  test("word2vecTrain refuses corpora past its serial-fit cap") {
    val docs = (0L until 20L).map(i => (i, s"alpha beta gamma $i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextEmbedder.word2vecTrain(docs, maxFitDocs = 10L)
    }
    assert(e.getMessage.contains("serial"), e.getMessage)
    assert(e.getMessage.contains("word2vecApply"), e.getMessage)
    // at or under the cap the fit proceeds
    assert(TextEmbedder.word2vecTrain(docs, dim = 4,
      maxFitDocs = 20L).nonEmpty)
  }
}
