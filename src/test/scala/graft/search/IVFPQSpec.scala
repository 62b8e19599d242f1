package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IVFPQSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int, seed: Int = 17) = {
    val rng = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Array.fill(dim)(rng.nextGaussian().toFloat)))
      .toDF("doc_id", "vec")
  }

  private lazy val docs = vecs(400, 8).cache()
  private lazy val index = IVFPQ.build(docs, coarseK = 4, numSub = 2, k = 4,
    seed = 42L, maxIter = 10)
  private lazy val queries = docs.limit(5)
    .select(col("doc_id").as("query_id"), col("vec").as("qvec")).cache()

  /** Local replica of the ADC distance for one (query, doc). */
  private def adc(q: Array[Float], cell: Int, codes: Seq[Int]): Double = {
    val cent = index.coarse.levels(0)(cell)
    val qres = Array.tabulate(q.length)(j => q(j).toDouble - cent(j).toDouble)
    val sd = index.pq.subDim
    (0 until index.pq.numSub).map { m =>
      val sub = index.pq.subs(m)(codes(m))
      (0 until sd).map { j =>
        val d = qres(m * sd + j) - sub(j).toDouble; d * d
      }.sum
    }.sum
  }

  test("full-probe IVFPQ ranks every doc by exact ADC distance") {
    val got = IVFPQ.search(queries, index, nprobe = 4, k = 400)
      .select("query_id", "rank", "doc_id", "dist")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).distinct.length == 5)
    assert(got.count(_._1 == got.head._1) == 400, "full probe sees all docs")

    val codeMap = index.codes.select("doc_id", "cell", "codes")
      .as[(Long, Int, Seq[Int])].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val qMap = queries.as[(Long, Array[Float])].collect().toMap
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val want = codeMap.toSeq.map { case (d, (cell, codes)) =>
        (d, adc(qMap(qid), cell, codes))
      }.sortBy { case (d, dist) => (dist, d) }
      val gotSorted = rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(gotSorted.map(_._1) == want.map(_._1), s"q$qid ranking")
      gotSorted.zip(want).foreach { case ((_, gd), (_, wd)) =>
        assert(gd == wd, s"q$qid dist must be bit-exact")
      }
    }
  }

  test("partial probe returns a subset of the full-probe ranking, in order") {
    val full = IVFPQ.search(queries, index, nprobe = 4, k = 400)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    val part = IVFPQ.search(queries, index, nprobe = 2, k = 400)
      .select("query_id", "rank", "doc_id")
      .as[(Long, Long, Long)].collect()
    assert(part.forall(r => full.contains((r._1, r._3))))
    // with 4 cells and a balanced-ish split, 2 probes see fewer docs
    assert(part.length < 5 * 400)
    // self-retrieval: a query that is its own doc sits in a probed cell
    // (its own cell is always the closest) and at ADC-rank near the top
    val selfRanks = part.filter(r => r._1 == r._3).map(_._2)
    assert(selfRanks.length == 5, "every query finds its own doc")
  }

  test("codes table stores numSub small codes per doc, partitioned by cell") {
    val c = index.codes.select("cell", "codes").as[(Int, Seq[Int])].collect()
    assert(c.length == 400)
    assert(c.forall(_._2.length == 2))
    assert(c.forall(r => r._1 >= 0 && r._1 < 4))
    assert(c.forall(_._2.forall(code => code >= 0 && code < 4)))
  }

  test("search is deterministic across partitionings") {
    val a = IVFPQ.search(queries, index, nprobe = 3, k = 20).collect().toSet
    val b = IVFPQ.search(queries.repartition(7), index, nprobe = 3, k = 20)
      .collect().toSet
    assert(a == b)
  }
}
