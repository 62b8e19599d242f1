package graft.index

import graft.SparkSpec
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Quantization invariants from SURVEY §5 (property-based over the real
  * fixture embeddings): assignment is argmin, the cluster index partitions
  * the corpus, reconstruction error is bounded by the input norm.
  */
class RQSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf("0.001"), "embeddings")
    .select(col("vec_id").as("doc_id"), col("embedding").as("vec"))
    .cache()

  private lazy val cb = RQTrainer.fit(docs, "vec", numLevels = 2, k = 8, seed = 42L)
  private lazy val assignments = CodeAssigner.assign(docs, cb).cache()

  test("codebook geometry") {
    assert(cb.numLevels == 2)
    assert(cb.k == 8)
    assert(cb.dim == 64)
  }

  test("codebook parquet save/load round-trips the exact floats") {
    val path = "target/tmp/codebook_parquet"
    cb.save(spark, path)
    val back = Codebook.load(spark, path)
    assert(back.numLevels == cb.numLevels && back.k == cb.k && back.dim == cb.dim)
    for (m <- 0 until cb.numLevels; c <- 0 until cb.k)
      assert(back.levels(m)(c).toSeq == cb.levels(m)(c).toSeq, s"level $m code $c")
    // the reloaded codebook assigns identically (exact float round-trip)
    val v = docs.head.getSeq[Float](1).toArray
    assert(back.assign(v).toSeq == cb.assign(v).toSeq)
  }

  test("assignment emits one M-length code tuple per doc") {
    val n = docs.count()
    assert(assignments.count() == n)
    assert(assignments.where(size(col("codes")) =!= 2).count() == 0)
    assert(assignments.where(col("codes").getItem(0) < 0 ||
      col("codes").getItem(0) >= 8).count() == 0)
  }

  test("assignment is argmin at level 0 (spot check against brute force)") {
    val rows = docs.limit(10).collect()
    rows.foreach { r =>
      val vec = r.getSeq[Float](1).toArray
      val codes = cb.assign(vec)
      val dists = cb.levels(0).map { cent =>
        vec.zip(cent).map { case (x, c) => (x - c) * (x - c) }.sum
      }
      assert(codes(0) == dists.indexOf(dists.min))
    }
  }

  test("cluster index is an exact partition of the corpus") {
    val idx = ClusterIndexBuilder.build(assignments)
    // chunk rows repeat csize, so count members via the chunk arrays
    val total = idx.agg(sum(size(col("doc_ids")))).head.getLong(0)
    assert(total == docs.count())
    // no doc in two clusters
    val distinctDocs = idx.select(explode(col("doc_ids"))).distinct().count()
    assert(distinctDocs == docs.count())
  }

  test("reconstruction error is below input norm (quantizer does something)") {
    val err = CodeAssigner.reconstructionError(docs, cb)
      .agg(avg("recon_error")).head.getDouble(0)
    // embeddings are L2-normalized → ‖x‖ = 1; a trained 2-level RQ must do
    // substantially better than the zero-codebook baseline of 1.0
    assert(err > 0.0 && err < 1.0)
  }

  test("hot clusters chunk into bounded rows (skew guard)") {
    val idx = ClusterIndexBuilder.build(assignments, maxChunk = 50)
    // hash-balanced chunking: sizes cluster around maxChunk (strict bound
    // in expectation; 2x is a generous deterministic envelope here)
    val maxRow = idx.agg(max(size(col("doc_ids")))).head.getInt(0)
    assert(maxRow <= 100, s"chunk of $maxRow members for maxChunk=50")
    // clusters above maxChunk actually split
    val bigClusters = idx.where(col("csize") > 50)
    if (bigClusters.count() > 0) {
      val splits = bigClusters.groupBy("codes").count()
        .agg(min("count")).head.getLong(0)
      assert(splits >= 2, "oversize cluster not split into chunks")
    }
    val total = idx.agg(sum(size(col("doc_ids")))).head.getLong(0)
    assert(total == docs.count())
    // chunks of one cluster are disjoint and cover the cluster
    val rebuilt = idx.groupBy("codes")
      .agg(sort_array(flatten(collect_list(col("doc_ids")))).as("all"),
        first(col("csize")).as("csize"))
    assert(rebuilt.where(size(col("all")) =!= col("csize")).count() == 0)
    assert(rebuilt.where(size(array_distinct(col("all"))) =!= size(col("all")))
      .count() == 0)
  }

  test("deterministic across re-fits with same seed") {
    val cb2 = RQTrainer.fit(docs, "vec", numLevels = 2, k = 8, seed = 42L)
    assert(cb.levels.flatten.flatten.toSeq == cb2.levels.flatten.flatten.toSeq)
  }

  test("assignTopK: t rows per doc, distinct tuples, sorted logprob") {
    val topk = CodeAssigner.assignTopK(docs, cb, t = 3).cache()
    val perDoc = topk.groupBy("doc_id").count().agg(min("count"), max("count"))
      .head
    assert(perDoc.getLong(0) == 3 && perDoc.getLong(1) == 3)
    // top-T tuples per doc are distinct and ranked by logprob
    assert(topk.select("doc_id", "codes").distinct().count() == topk.count())
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("crank")
    val bad = topk.withColumn("prev", lag(col("logprob"), 1).over(w))
      .where(col("prev").isNotNull && col("prev") < col("logprob"))
    assert(bad.count() == 0, "logprob must be non-increasing in crank")
  }

  test("assignTopK with t=1 is exactly the greedy argmin chain") {
    import spark.implicits._
    // beam width 1 has no cross-branch competition: log-softmax argmax
    // per level IS the per-level L2 argmin. (Width > 1 rank-1 may
    // legitimately differ — cumulative log-prob competes across branches,
    // which is the reference's beam semantics.)
    val greedy = assignments.as[(Long, Seq[Int])].collect().toMap
    val t1 = CodeAssigner.assignTopK(docs, cb, t = 1)
      .select("doc_id", "codes").as[(Long, Seq[Int])].collect()
    assert(t1.length == greedy.size)
    t1.foreach { case (id, codes) => assert(codes == greedy(id), s"doc $id") }
  }

  test("multicluster index: every doc carries exactly t memberships") {
    val multi = ClusterIndexBuilder.build(
      CodeAssigner.assignTopK(docs, cb, t = 2).select("doc_id", "codes"))
    val m2 = multi.select(col("codes"), explode(col("doc_ids")).as("doc_id"))
    assert(m2.count() == 2 * docs.count())
    val perDoc = m2.groupBy("doc_id").count()
    assert(perDoc.where(col("count") =!= 2).count() == 0)
    // memberships of one doc are distinct clusters
    assert(m2.distinct().count() == m2.count())
  }
}
