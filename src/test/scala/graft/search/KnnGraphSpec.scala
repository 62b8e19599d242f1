package graft.search

import graft.SparkSpec
import graft.io.Tables
import graft.index.{RQTrainer, CodeAssigner}
import org.apache.spark.sql.functions._

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf("0.001"), "embeddings")
    .select(col("vec_id").as("doc_id"), col("embedding").as("vec")).cache()

  private lazy val cells = {
    val cb = RQTrainer.fit(docs, "vec", numLevels = 1, k = 16, seed = 42L,
      maxIter = 10)
    CodeAssigner.assign(docs, cb)
      .select(col("doc_id"), col("codes").getItem(0).as("cell")).cache()
  }

  /** Exact k-NN edge set (src → its k best ip-neighbors, self excluded). */
  private def bruteEdges(data: Seq[(Long, Array[Float])], k: Int): Set[(Long, Long)] =
    data.flatMap { case (a, va) =>
      data.filter(_._1 != a)
        .map { case (b, vb) =>
          var s = 0.0; var j = 0
          while (j < va.length) { s += va(j).toDouble * vb(j).toDouble; j += 1 }
          (b, s)
        }
        .sortBy { case (b, s) => (-s, b) }.take(k)
        .map { case (b, _) => (a, b) }
    }.toSet

  test("NN-descent reaches high recall on clustered data; rounds improve it") {
    // The fixture embeddings are near-random unit vectors (true 8-NN share
    // the source's label at chance rate) — NN-descent's documented worst
    // case, since proximity has no transitivity there. Real doc-embedding
    // corpora are manifold/cluster structured, so the quality property is
    // pinned on clustered data: 40 Gaussian clusters, 20 points each.
    val rng = new scala.util.Random(5)
    val data = (0 until 800).map { i =>
      val c = i % 40
      val center = Array.tabulate(16)(j =>
        math.sin((c * 16 + j).toDouble)) // fixed per-cluster direction
      val v = center.map(x => (x + 0.08 * rng.nextGaussian()).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }
    val cdocs = data.toDF("doc_id", "vec").cache()
    val cb = RQTrainer.fit(cdocs, "vec", numLevels = 1, k = 16, seed = 1L,
      maxIter = 10)
    val ccells = CodeAssigner.assign(cdocs, cb)
      .select(col("doc_id"), col("codes").getItem(0).as("cell")).cache()
    val truth = bruteEdges(data, 8)
    def recall(rounds: Int): Double = {
      val got = KnnGraph.build(cdocs, ccells, k = 8, rounds = rounds)
        .select("src", "dst").as[(Long, Long)].collect().toSet
      (got intersect truth).size.toDouble / truth.size
    }
    val r0 = recall(0); val r2 = recall(2); val r3 = recall(3)
    assert(r2 > r0, s"rounds did not improve recall: seed=$r0, 2 rounds=$r2")
    assert(r3 >= r2, s"recall regressed with a round: 2→$r2, 3→$r3")
    assert(r3 >= 0.9, s"3-round NN-descent recall@8 too low: $r3 " +
      s"(seed $r0, 2 rounds $r2)")
  }

  test("graph walk serves queries with high recall on clustered data") {
    val rng = new scala.util.Random(9)
    val data = (0 until 800).map { i =>
      val c = i % 40
      val center = Array.tabulate(16)(j => math.sin((c * 16 + j).toDouble))
      val v = center.map(x => (x + 0.08 * rng.nextGaussian()).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }
    val cdocs = data.toDF("doc_id", "vec").cache()
    val cb = RQTrainer.fit(cdocs, "vec", numLevels = 1, k = 16, seed = 1L,
      maxIter = 10)
    val ccells = CodeAssigner.assign(cdocs, cb)
      .select(col("doc_id"), col("codes").getItem(0).as("cell")).cache()
    val graph = KnnGraph.build(cdocs, ccells, k = 8, rounds = 3)
      .select("src", "dst").cache()
    val queries = data.take(30)
    val qdf = queries.toDF("query_id", "qvec")
    // per-query entries from probed cells — fixed global entries strand
    // the walk inside the entry clusters (tight-cluster k-NN graphs have
    // almost no inter-cluster edges)
    val entries = KnnGraph.probeEntries(qdf, ccells, cb, nprobe = 2,
      perCell = 4)
    val got = KnnGraph.walk(qdf, graph, cdocs, k = 10, beam = 16,
      rounds = 3, entries = entries)
      .select("query_id", "doc_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact top-10 per query (self included — queries are corpus members)
    val all = data
    var hit = 0; var total = 0
    queries.foreach { case (q, qv) =>
      val truth = all.map { case (b, vb) =>
        var s = 0.0; var j = 0
        while (j < qv.length) { s += qv(j).toDouble * vb(j).toDouble; j += 1 }
        (b, s)
      }.sortBy { case (b, s) => (-s, b) }.take(10).map(_._1).toSet
      hit += (truth intersect got(q)).size
      total += truth.size
    }
    val recall = hit.toDouble / total
    assert(recall >= 0.8, s"graph-walk recall@10 too low: $recall")
  }

  test("incremental insert: new docs get high-recall edges, old graph intact") {
    val rng = new scala.util.Random(13)
    def mk(i: Int): (Long, Array[Float]) = {
      val c = i % 40
      val center = Array.tabulate(16)(j => math.sin((c * 16 + j).toDouble))
      val v = center.map(x => (x + 0.08 * rng.nextGaussian()).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }
    val base = (0 until 700).map(mk)
    val arrivals = (700 until 800).map(mk)
    val bdocs = base.toDF("doc_id", "vec").cache()
    val ndocs = arrivals.toDF("doc_id", "vec").cache()
    val cb = RQTrainer.fit(bdocs, "vec", numLevels = 1, k = 16, seed = 1L,
      maxIter = 10)
    val bcells = CodeAssigner.assign(bdocs, cb)
      .select(col("doc_id"), col("codes").getItem(0).as("cell")).cache()
    val graph = KnnGraph.build(bdocs, bcells, k = 8, rounds = 3).cache()
    val merged = KnnGraph.insert(graph, ndocs, bdocs, bcells, cb, k = 8,
      rounds = 3).cache()
    // every node (old + new) keeps ≤ k edges, no self loops
    assert(merged.groupBy("src").count().where(col("count") > 8).count() == 0)
    assert(merged.where(col("src") === col("dst")).count() == 0)
    assert(merged.select("src").distinct().count() == 800)
    // new docs' edge recall vs brute force over the FULL 800-doc corpus
    val all = base ++ arrivals
    val truth = arrivals.flatMap { case (a, va) =>
      all.filter(_._1 != a).map { case (b, vb) =>
        var s = 0.0; var j = 0
        while (j < va.length) { s += va(j).toDouble * vb(j).toDouble; j += 1 }
        (b, s)
      }.sortBy { case (b, s) => (-s, b) }.take(8).map(b => (a, b._1))
    }.toSet
    val got = merged.where(col("src") >= 700)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.75, s"inserted-doc edge recall too low: $recall")
    // an old node far from every arrival keeps its list bit-identically
    val touched = merged.where(col("dst") >= 700)
      .select("src").distinct().as[Long].collect().toSet
    val keep = graph.where(!col("src").isin(touched.toSeq: _*) &&
      col("src") < 700)
    val after = merged.join(keep.select("src").distinct(), Seq("src"),
      "left_semi")
    assert(keep.collect().map(_.toString).sorted.toSeq ==
      after.collect().map(_.toString).sorted.toSeq)
  }

  test("insert links same-batch arrivals (correlated burst)") {
    val rng = new scala.util.Random(21)
    def mk(i: Int, c: Int): (Long, Array[Float]) = {
      val center = Array.tabulate(16)(j => math.sin((c * 16 + j).toDouble))
      val v = center.map(x => (x + 0.08 * rng.nextGaussian()).toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      (i.toLong, v.map(_ / n))
    }
    val base = (0 until 400).map(i => mk(i, i % 20))
    // the burst: 20 arrivals around a direction the base corpus does NOT
    // cover — their true neighbors are (almost) all inside the batch, so
    // walking only the existing graph cannot link them at all
    val arrivals = (400 until 420).map(i => mk(i, 77))
    val bdocs = base.toDF("doc_id", "vec").cache()
    val ndocs = arrivals.toDF("doc_id", "vec").cache()
    val cb = RQTrainer.fit(bdocs, "vec", numLevels = 1, k = 16, seed = 1L,
      maxIter = 10)
    val bcells = CodeAssigner.assign(bdocs, cb)
      .select(col("doc_id"), col("codes").getItem(0).as("cell")).cache()
    val graph = KnnGraph.build(bdocs, bcells, k = 8, rounds = 2).cache()
    val merged = KnnGraph.insert(graph, ndocs, bdocs, bcells, cb, k = 8,
      rounds = 2).cache()
    // arrival→arrival truth: each burst doc's exact 8-NN over base∪burst
    // is dominated by burst mates; count how many of those edges landed
    val all = base ++ arrivals
    val truth = arrivals.flatMap { case (a, va) =>
      all.filter(_._1 != a).map { case (b, vb) =>
        var s = 0.0; var j = 0
        while (j < va.length) { s += va(j).toDouble * vb(j).toDouble; j += 1 }
        (b, s)
      }.sortBy { case (b, s) => (-s, b) }.take(8)
        .collect { case (b, _) if b >= 400 => (a, b) }
    }.toSet
    assert(truth.size > 100, s"burst fixture degenerate: ${truth.size}")
    val got = merged.where(col("src") >= 400 && col("dst") >= 400)
      .select("src", "dst").as[(Long, Long)].collect().toSet
    val recall = (got intersect truth).size.toDouble / truth.size
    assert(recall >= 0.8, s"intra-batch edge recall too low: $recall")
  }

  test("graph build is partitioning-independent") {
    val a = KnnGraph.build(docs, cells, k = 5, rounds = 1)
      .collect().map(_.toString).sorted.toSeq
    val b = KnnGraph.build(docs.repartition(13), cells.repartition(7),
      k = 5, rounds = 1).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("every node keeps at most k edges, ranked by score") {
    val g = KnnGraph.build(docs, cells, k = 6, rounds = 1).cache()
    assert(g.groupBy("src").count().where(col("count") > 6).count() == 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("src").orderBy("rank")
    val bad = g.withColumn("prev", lag(col("score"), 1).over(w))
      .where(col("prev").isNotNull && col("prev") < col("score"))
    assert(bad.count() == 0, "scores must be non-increasing in rank")
    // no self loops, no duplicate edges
    assert(g.where(col("src") === col("dst")).count() == 0)
    assert(g.select("src", "dst").distinct().count() == g.count())
  }
}
