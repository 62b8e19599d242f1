package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-deterministic PageRank — the iterative-graph-computation
  * pattern (centrality for corpus sampling, authority weighting for
  * dedup canonical-copy choice) built so a SQL oracle can replay it
  * EXACTLY: ranks live in Long micro-units of the per-node average
  * (init 1e6 each), contributions are integer division `rank div deg`,
  * and the damped update is `(100-d)·1e4 + (d · Σcontrib) div 100` —
  * all-Long arithmetic, so partial-aggregation order cannot perturb a
  * bit and five distributed iterations equal five unrolled SQL CTEs.
  *
  * Scale shape: one equi-join (ranks ⨝ out-degree-annotated edges on
  * src) plus one hash aggregation (sum by dst) per iteration — the
  * standard edge-partitioned PageRank round, shuffle ∝ edges, state ∝
  * nodes. No driver-side graph, no per-iteration collect; the loop
  * only grows the plan linearly (each iteration consumes the previous
  * ranks frame exactly once).
  */
object PageRank {

  /** `iters` damped rounds over a directed edge list; every node that
    * appears as src or dst participates (this formulation assumes no
    * dangling nodes — give sinks a self-loop or reverse edge first, as
    * a bipartite both-directions edge set does by construction).
    * Output: (node, rank_micro). */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      dampingPct: Int = 85): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).na.drop().distinct()
    // every iteration re-reads the degree-annotated edges and the node
    // list — materialize them ONCE (localCheckpoint truncates lineage;
    // without it iteration i re-runs the distinct+join i times and the
    // loop goes quadratic in rounds), PRE-PARTITIONED on their join
    // keys: localCheckpoint preserves partitioning, so every round's
    // contrib join reuses hash(src) and only the nodes-sized ranks side
    // exchanges — the edge set (the big side; never broadcast it)
    // shuffles zero times after the build
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src").repartition(col("src")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(col("node")).localCheckpoint()
    val basePart = (100 - dampingPct) * 10000L

    var ranks = nodes.withColumn("rank", lit(1000000L))
    for (_ <- 0 until iters) {
      // shuffle-hash with RANKS as build side: ranks is nodes-sized (the
      // small side of any real graph round) while ed is edges-sized —
      // without the hint the planner broadcasts the checkpointed edge
      // table, which is exactly the side that cannot be broadcast at
      // scale; ed's hash(src) partitioning is reused, so the edge set
      // never re-shuffles across rounds
      val contrib = ed.join(ranks.hint("shuffle_hash"),
          col("src") === col("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = nodes.join(contrib, col("node") === col("dst"), "left")
        .select(col("node"),
          (lit(basePart) +
            expr(s"($dampingPct * coalesce(s, 0L)) div 100").as("d"))
            .as("rank"))
    }
    ranks.withColumnRenamed("rank", "rank_micro")
  }
}
