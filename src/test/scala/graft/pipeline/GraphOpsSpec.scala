package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Triangle counting pinned on hand-countable graphs plus a brute-force
  * cross-check, and the orientation property that makes it scale.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hand-countable fixtures: triangle, square, K4, dangling tail") {
    // K3 {1,2,3} + tail 3-4; square {10,11,12,13} (no triangle);
    // K4 {20..23} = 4 triangles, 3 per node
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L)) ++
      (for (a <- 20L to 23L; b <- 20L to 23L if a < b) yield (a, b))
    val got = GraphOps.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      20L -> 3L, 21L -> 3L, 22L -> 3L, 23L -> 3L))
  }

  test("direction, duplicates, and self-loops are ignored") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (1L, 1L), (2L, 3L)).toDF("src", "dst")
    val got = GraphOps.triangleCounts(messy).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches brute-force enumeration on a seeded random graph") {
    val rng = new scala.util.Random(17)
    val edges = (0 until 300).map(_ =>
      (rng.nextInt(30).toLong, rng.nextInt(30).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = GraphOps.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val adj = edges.flatMap(e => Seq(e, e.swap)).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if adj((i, j)) && adj((j, k)) && adj((i, k))
    } { brute(i) += 1; brute(j) += 1; brute(k) += 1 }
    assert(got == brute.toMap)
  }

  test("k-core peels the hand-built onion layer by layer") {
    // K4 core {1,2,3,4}; node 5 hangs off 1,2,3 (degree 3 — survives
    // k=3 only via the first round, then check cascade); chain 6-7
    val edges = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)) ++
      Seq((1L, 5L), (2L, 5L), (3L, 5L), (5L, 6L), (6L, 7L))
    val df = edges.toDF("src", "dst")
    // k=3: 6 (deg 2) and 7 (deg 1) peel in cascade; 5 keeps deg 3 via
    // 1,2,3 → the 3-core is {1,2,3,4,5}
    val c3 = GraphOps.kCore(df, "src", "dst", k = 3)
      .as[(Long, Long)].collect().toMap
    assert(c3 == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 3L, 5L -> 3L))
    // k=4: only the K4 could qualify, but inside it every node has
    // degree 3 → no 4-core at all
    val c4 = GraphOps.kCore(df, "src", "dst", k = 4)
    assert(c4.count() == 0L)
    // k=2: everything but the chain tail survives
    val c2 = GraphOps.kCore(df, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(c2.keySet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("k-core: a truncated peel throws instead of returning a non-core") {
    // chain 1-2-3-...-8: k=2 peels one endpoint pair per round (deep
    // cascade); maxRounds=1 leaves nodes with degree < 2 — that is NOT
    // a 2-core, and round-8 advice requires refusing to return it
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      GraphOps.kCore(chain, "src", "dst", k = 2, maxRounds = 1).count()
    }
    assert(e.getMessage.contains("converge"), e.getMessage)
    // with enough rounds the same graph converges (to the empty core)
    assert(GraphOps.kCore(chain, "src", "dst", k = 2).count() == 0L)
  }

  test("k-core: extra rounds past convergence are a no-op (the oracle contract)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val a = GraphOps.kCore(edges, "src", "dst", k = 2, maxRounds = 2)
      .as[(Long, Long)].collect().toSet
    val b = GraphOps.kCore(edges, "src", "dst", k = 2, maxRounds = 8)
      .as[(Long, Long)].collect().toSet
    assert(a == b && a == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("oriented out-degree stays bounded on a star (hub never owns the wedges)") {
    // star: hub 0 connected to 1..200, plus a few rim edges — the hub's
    // UNDIRECTED degree is 200 but its oriented OUT-degree must be ~0
    // (every rim node has lower (degree, id) rank than the hub)
    val star = (1L to 200L).map(i => (0L, i)) ++
      Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val e = GraphOps.canonicalEdges(star.toDF("src", "dst"), "src", "dst")
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // replicate the orientation and check the hub's out-degree
    val oriented = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
        .otherwise(col("v")).as("src"))
    val hubOut = oriented.where(col("src") === 0L).count()
    assert(hubOut == 0L, s"hub emitted $hubOut oriented edges")
    // and the counts are still right: rim triangle (1,2,3) plus the
    // hub closing (0,1,2), (0,2,3), (0,1,3) → every participant in 3
    val got = GraphOps.triangleCounts(star.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }
}
