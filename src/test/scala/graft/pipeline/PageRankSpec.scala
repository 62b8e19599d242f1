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
}
