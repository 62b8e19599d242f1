package graft.search

import graft.SparkSpec
import graft.io.Tables
import graft.index.{RQTrainer, CodebookAligner, Codebook}
import org.apache.spark.sql.functions._

class IVFSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf("0.001"), "embeddings")
    .select(col("vec_id").as("doc_id"), col("embedding").as("vec")).cache()
  private lazy val queries = Tables.load(spark, sf("0.001"), "embeddings")
    .where(col("vec_id") < 20)
    .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  test("IVF with all cells probed equals brute force") {
    val ivf = IVFIndex.build(docs, k = 8)
    val approx = IVFIndex.search(queries, ivf, docs, nprobe = 8, k = 5)
    val exact = BruteForceKNN.topK(queries, docs, k = 5)
    val a = approx.orderBy("query_id", "rank").collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2)))
    val e = exact.orderBy("query_id", "rank").collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.toSeq == e.toSeq)
  }

  test("IVF nprobe=2 finds self (recall of the trivial neighbor)") {
    val ivf = IVFIndex.build(docs, k = 8)
    val got = IVFIndex.search(queries, ivf, docs, nprobe = 2, k = 1)
    got.collect().foreach { r =>
      assert(r.getAs[Long]("doc_id") == r.getAs[Long]("query_id"))
    }
  }

  test("reconstructAll enumerates K^M tuples matching Codebook.reconstruct (V10)") {
    val cb = RQTrainer.fit(docs, "vec", numLevels = 2, k = 4, seed = 42L)
    val all = graft.index.Reconstructor.reconstructAll(spark, cb)
    val rows = all.collect()
    assert(rows.length == 16) // 4^2
    rows.foreach { r =>
      val codes = r.getSeq[Int](0).toArray
      val vec = r.getSeq[Float](1)
      val expect = cb.reconstruct(codes).toSeq
      assert(vec.zip(expect).forall { case (a, b) => math.abs(a - b) < 1e-5 },
        s"mismatch at ${codes.toSeq}")
    }
  }

  test("beam search 'last' score mode ranks by final-level log-prob") {
    val cb = RQTrainer.fit(docs, "vec", numLevels = 2, k = 4, seed = 42L)
    val vec = docs.head.getSeq[Float](1).toArray
    val out = CodebookBeamSearch.searchOne(cb, vec, beams = 16, scoreMode = "last")
    assert(out.length == 16)
    // scores are per-level log-probs → all ≤ 0, sorted desc
    assert(out.forall(_._2 <= 1e-12))
    assert(out.map(_._2).sliding(2).forall {
      case Array(a, b) => a >= b
      case _ => true
    })
  }

  test("beam search with ip metric still contains the ip-greedy path") {
    val cb = RQTrainer.fit(docs, "vec", numLevels = 2, k = 4, seed = 42L)
    val vec = docs.head.getSeq[Float](1).toArray
    val out = CodebookBeamSearch.searchOne(cb, vec, beams = 16, metric = "ip")
    assert(out.length == 16)
    assert(out.forall(_._1.length == 2))
  }

  test("iptol2-trained index retrieves by inner product consistently") {
    import graft.index.{IpToL2, ClusterIndexBuilder, CodeAssigner}
    // un-normalize the fixture vectors so ip and l2 genuinely disagree
    val scaled = docs.select(col("doc_id"),
      graft.core.VectorOps.vecAxpy(
        (col("doc_id") % 5).cast("double") * 0.3 + lit(0.5),
        transform(col("vec"), _ => lit(0.0f)), col("vec")).as("vec")).cache()
    val phi = IpToL2.phiFor(scaled)
    val cb = IpToL2.fit(scaled, phi, "vec", numLevels = 2, k = 8)
    val augDocs = IpToL2.augmentDocs(scaled, phi).cache()
    val index = ClusterIndexBuilder.build(CodeAssigner.assign(augDocs, cb))
    val queries = IpToL2.augmentQueries(
      scaled.where(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("vec").as("qvec")))
    // exhaustive beams: candidate set = full corpus; ip ranking on
    // augmented vectors must equal brute-force ip on the originals
    val got = CoarseFineRetriever.retrieve(queries, index, augDocs, cb,
      beams = 64, k = 3, metric = "ip")
    val exact = BruteForceKNN.topK(
      scaled.where(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("vec").as("qvec")),
      scaled, k = 3, metric = "ip")
    val a = got.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val e = exact.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(a == e)
  }

  test("codebook aligner recovers a permutation (V11)") {
    val cb = RQTrainer.fit(docs, "vec", numLevels = 1, k = 8, seed = 42L)
    val perm = Array(3, 1, 4, 0, 2, 7, 5, 6)
    val shuffled = Codebook(Array(perm.map(cb.levels(0))))
    val aligned = CodebookAligner.alignCodebook(cb, shuffled)
    // aligning the shuffled codebook back must reproduce the original
    cb.levels(0).indices.foreach { c =>
      assert(aligned.levels(0)(c).toSeq == cb.levels(0)(c).toSeq)
    }
  }

  test("Hungarian alignment beats greedy on an adversarial refresh (V11)") {
    // squared-distance matrix [[1, 2], [1, 3]] (rows=new, cols=old):
    // greedy grabs (n0,o0)=1 then is forced into (n1,o1)=3 → total 4;
    // the optimum is the anti-diagonal (n0→o1)+(n1→o0) = 2+1 = 3 —
    // exactly the silent code churn linear_sum_assignment avoids
    val old = Array(Array(0.0f, 0.0f), Array(0.25f, 1.19896f))
    val fresh = Array(Array(1.0f, 0.0f), Array(-1.0f, 0.0f))
    def total(perm: Array[Int]): Double =
      perm.indices.map { n =>
        fresh(n).zip(old(perm(n)))
          .map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
      }.sum
    val greedy = CodebookAligner.align(old, fresh)
    val optimal = CodebookAligner.alignOptimal(old, fresh)
    assert(greedy.toSeq == Seq(0, 1)) // mis-paired, total ≈ 4
    assert(optimal.toSeq == Seq(1, 0))
    assert(total(optimal) < total(greedy) - 0.5)
  }

  test("Hungarian equals brute-force optimum on random instances (V11)") {
    val rnd = new scala.util.Random(11)
    (0 until 20).foreach { _ =>
      val k = 2 + rnd.nextInt(5)
      val old = Array.fill(k)(Array.fill(3)(rnd.nextFloat() * 4 - 2))
      val fresh = Array.fill(k)(Array.fill(3)(rnd.nextFloat() * 4 - 2))
      def total(perm: Seq[Int]): Double =
        perm.indices.map { n =>
          fresh(n).zip(old(perm(n)))
            .map { case (a, b) => (a.toDouble - b) * (a.toDouble - b) }.sum
        }.sum
      val best = (0 until k).permutations.map(p => total(p)).min
      val got = total(CodebookAligner.alignOptimal(old, fresh).toSeq)
      assert(math.abs(got - best) < 1e-9, s"k=$k: $got vs $best")
    }
  }
}
