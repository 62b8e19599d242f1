package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Integer-deterministic PageRank: hand-replayed fold on a small graph,
  * partitioning independence (Long sums cannot reorder-drift), and the
  * no-dangler contract.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // diamond with a popular sink-ish node: 1→3, 2→3, 3→1 (cycle keeps
  // every node an emitter), 1→2
  private val edges = Seq((1L, 3L), (2L, 3L), (3L, 1L), (1L, 2L))

  private def localReplay(iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 0 until iters) {
      val contrib = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => rank(e._1) / deg(e._1)).sum
      }
      rank = nodes.map(n =>
        n -> (150000L + 85L * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    rank
  }

  test("distributed rounds equal the hand fold exactly") {
    for (iters <- Seq(0, 1, 3)) {
      val got = PageRank.run(edges.toDF("src", "dst"), "src", "dst", iters)
        .as[(Long, Long)].collect().toMap
      assert(got === localReplay(iters), s"iters=$iters")
    }
  }

  test("result is invariant under edge partitioning and order") {
    val base = PageRank.run(edges.toDF("src", "dst"), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    val shuffled = PageRank.run(
        edges.reverse.toDF("src", "dst").repartition(7), "src", "dst", 4)
      .as[(Long, Long)].collect().toMap
    assert(base === shuffled)
  }

  // asymmetric triangle-with-sink: 1 and 2 exchange mass and BOTH feed
  // sink 3 (3 never emits) — node 3 accumulates double contributions,
  // so the iteration moves every round (a symmetric fixture sits at the
  // fixed point from round 0 and tests nothing)
  private val sinkEdges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L))

  private def localDanglingReplay(iters: Int,
      epsMicro: Long): Map[Long, Long] = {
    val nodes = sinkEdges.flatMap(e => Seq(e._1, e._2)).distinct
    val deg = sinkEdges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val sinks = nodes.filterNot(deg.contains)
    val n = nodes.size.toLong
    var rank = nodes.map(_ -> 1000000L).toMap
    var i = 0
    var done = false
    while (i < iters && !done) {
      val share = sinks.map(rank).sum / n
      val contrib = sinkEdges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => rank(e._1) / deg(e._1)).sum
      }
      val next = nodes.map(node => node ->
        (150000L + 85L * (contrib.getOrElse(node, 0L) + share) / 100L)).toMap
      val delta = nodes.map(node => math.abs(next(node) - rank(node))).max
      rank = next
      if (epsMicro > 0 && delta < epsMicro) done = true
      i += 1
    }
    rank
  }

  test("dangling mass is redistributed: hand fold matches exactly") {
    for (iters <- Seq(1, 3, 5)) {
      val got = PageRank.run(sinkEdges.toDF("src", "dst"), "src", "dst", iters)
        .as[(Long, Long)].collect().toMap
      assert(got === localDanglingReplay(iters, 0L), s"iters=$iters")
    }
    // mass conservation (up to floor loss): with redistribution, total
    // rank stays near N·1e6 instead of draining through the sinks —
    // each round loses at most a few units to the three integer floors
    val total = PageRank.run(sinkEdges.toDF("src", "dst"), "src", "dst", 5)
      .as[(Long, Long)].collect().map(_._2).sum
    assert(total > 2850000L && total <= 3000000L,
      s"total rank $total drifted far from 3e6 — dangling mass leaking?")
  }

  test("epsilon stopping freezes at the hand fold's round, keeping the final update") {
    // generous iteration budget + coarse epsilon: the loop must stop
    // early at the SAME round the local replay does, with identical bits
    val eps = 40000L
    val got = PageRank.run(sinkEdges.toDF("src", "dst"), "src", "dst",
        iters = 50, epsilonMicro = eps)
      .as[(Long, Long)].collect().toMap
    val local = localDanglingReplay(50, eps)
    assert(got === local)
    // the replay must have actually stopped early (else eps is vacuous)
    val unstopped = localDanglingReplay(50, 0L)
    assert(local !== unstopped, "fixture should converge before 50 rounds")
  }

  private def localPersonalizedReplay(iters: Int, epsMicro: Long,
      seedNodes: Set[Long]): Map[Long, Long] = {
    val nodes = sinkEdges.flatMap(e => Seq(e._1, e._2)).distinct
    val deg = sinkEdges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val sinks = nodes.filterNot(deg.contains)
    val n = nodes.size.toLong
    val ns = nodes.count(seedNodes).toLong
    val basePerSeed = 15L * 10000L * n / ns
    var rank = nodes.map(_ -> 1000000L).toMap
    var i = 0
    var done = false
    while (i < iters && !done) {
      val share = sinks.map(rank).sum / ns
      val contrib = sinkEdges.groupBy(_._2).map { case (d, es) =>
        d -> es.map(e => rank(e._1) / deg(e._1)).sum
      }
      val next = nodes.map { node =>
        val seed = seedNodes(node)
        node -> ((if (seed) basePerSeed else 0L) +
          85L * (contrib.getOrElse(node, 0L) +
            (if (seed) share else 0L)) / 100L)
      }.toMap
      val delta = nodes.map(node => math.abs(next(node) - rank(node))).max
      rank = next
      if (epsMicro > 0 && delta < epsMicro) done = true
      i += 1
    }
    rank
  }

  test("personalized ranks: teleport + dangling mass flow only to the seeds") {
    val seeds = Set(1L)
    val seedDf = Seq(1L).toDF("node")
    for (iters <- Seq(1, 3, 5)) {
      val got = PageRank.runPersonalized(sinkEdges.toDF("src", "dst"),
          "src", "dst", seedDf, iters)
        .as[(Long, Long)].collect().toMap
      assert(got === localPersonalizedReplay(iters, 0L, seeds), s"iters=$iters")
    }
    // the non-seed emitter (2) and sink (3) hold only damped flow-through
    // mass; the seed dominates after a few rounds
    val r = PageRank.runPersonalized(sinkEdges.toDF("src", "dst"),
        "src", "dst", seedDf, 5)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L) && r(1L) > r(3L),
      s"seed must outrank non-seeds: $r")
    // epsilon stopping replays too
    val eps = PageRank.runPersonalized(sinkEdges.toDF("src", "dst"),
        "src", "dst", seedDf, 50, epsilonMicro = 40000L)
      .as[(Long, Long)].collect().toMap
    assert(eps === localPersonalizedReplay(50, 40000L, seeds))
  }

  test("bipartite both-direction fixture graph concentrates rank on hubs") {
    val li = graft.io.Tables.load(spark, sf("0.001"), "lineitem")
      .select(col("l_suppkey").cast("long").as("sk"),
        col("l_partkey").cast("long").as("pk"))
    val fwd = li.select((col("sk") + 1000000L).as("src"), col("pk").as("dst"))
    val rev = li.select(col("pk").as("src"), (col("sk") + 1000000L).as("dst"))
    val ranks = PageRank.run(fwd.union(rev), "src", "dst", iters = 5)
      .as[(Long, Long)].collect()
    assert(ranks.nonEmpty)
    // suppliers (few, highly connected) must outrank parts on average
    val (sup, part) = ranks.partition(_._1 >= 1000000L)
    val supAvg = sup.map(_._2).sum.toDouble / sup.length
    val partAvg = part.map(_._2).sum.toDouble / part.length
    assert(supAvg > partAvg * 2,
      s"supplier avg $supAvg should dominate part avg $partAvg")
  }

  test("empty edge list degrades to an empty frame in BOTH eps paths") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.run(empty, "src", "dst", iters = 3).count() == 0L)
    // eps>0 used to NPE on the null max-delta row (round-8 advice)
    assert(PageRank.run(empty, "src", "dst", iters = 3,
      epsilonMicro = 10L).count() == 0L)
    val allNull = Seq((Option.empty[Long], Option.empty[Long]))
      .toDF("src", "dst")
    assert(PageRank.run(allNull, "src", "dst", iters = 3,
      epsilonMicro = 10L).count() == 0L)
  }
}
