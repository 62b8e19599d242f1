package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-deterministic PageRank — the iterative-graph-computation
  * pattern (centrality for corpus sampling, authority weighting for
  * dedup canonical-copy choice) built so a SQL oracle can replay it
  * EXACTLY: ranks live in Long micro-units of the per-node average
  * (init 1e6 each), contributions are integer division `rank div deg`,
  * dangling (sink) mass is redistributed as the same floor share
  * `Σ_sink rank div N` to every node, and the damped update is
  * `(100-d)·1e4 + (d · (Σcontrib + share)) div 100` — all-Long
  * arithmetic, so partial-aggregation order cannot perturb a bit and
  * distributed iterations equal unrolled SQL CTEs bit-for-bit.
  *
  * Scale shape: one equi-join (ranks ⨝ out-degree-annotated edges on
  * src) plus one hash aggregation (sum by dst) per iteration — the
  * standard edge-partitioned PageRank round, shuffle ∝ edges, state ∝
  * nodes — plus, on sink-bearing graphs, one nodes-sized semi-join +
  * scalar aggregate for the dangling sum (broadcast back as a 1-row
  * frame; never a driver-side loop over the graph). No driver-side
  * graph, no per-iteration collect of node state; with ε-stopping each
  * round additionally runs one nodes-sized max-|Δ| aggregate (the
  * scalar the loop-termination decision inherently needs).
  */
object PageRank {

  /** Damped rounds over a directed edge list; every node that appears
    * as src or dst participates. Nodes with no out-edges (sinks) are
    * handled by per-round dangling-mass redistribution: their rank is
    * summed, floor-divided by N, and added to every node's incoming
    * contribution BEFORE damping — no silent mass leak on web/citation
    * graphs, no self-loop preprocessing required. Sink detection runs
    * once; a sink-free graph (e.g. a bipartite both-directions edge
    * set) skips the redistribution machinery entirely and plans the
    * identical rounds as before.
    *
    * Stopping: runs `iters` rounds, or stops early once
    * `max_node |Δrank_micro| < epsilonMicro` (ε = 0 disables the
    * check and the per-round action it needs). The update that
    * triggered the stop is kept — the SQL replay mirrors this with a
    * cumulative freeze flag, so unrolling MORE rounds than the engine
    * executed still lands on identical bits.
    * Output: (node, rank_micro). */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      dampingPct: Int = 85, epsilonMicro: Long = 0L): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    require(epsilonMicro >= 0L)
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
    // sinks: nodes that never appear as src. Computed once; empty for
    // any graph whose edge set is closed under reversal.
    val sinks = nodes.join(ed.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .localCheckpoint()
    val hasSinks = sinks.limit(1).count() > 0
    val nNodes = if (hasSinks) nodes.count() else 0L
    val basePart = (100 - dampingPct) * 10000L

    var ranks = nodes.withColumn("rank", lit(1000000L))
    var i = 0
    var done = false
    while (i < iters && !done) {
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
      val base = nodes.join(contrib, col("node") === col("dst"), "left")
      val joined =
        if (!hasSinks) base
        else {
          // dangling mass → equal floor share per node, attached as a
          // broadcast 1-row frame (stays in-plan; no driver collect)
          val share = ranks.join(sinks, Seq("node"), "left_semi")
            .agg(coalesce(sum("rank"), lit(0L)).as("dsum"))
            .select(expr(s"dsum div ${nNodes}L").as("share"))
          base.crossJoin(broadcast(share))
        }
      val updated = joined
        .select(col("node"),
          (lit(basePart) +
            expr(s"($dampingPct * (${
              if (hasSinks) "coalesce(s, 0L) + share" else "coalesce(s, 0L)"
            })) div 100"))
            .as("rank"))
      if (epsilonMicro > 0L) {
        // materialize the round so the delta action and the next round
        // share one computation (and lineage stays linear in rounds).
        // EAGER deliberately: the lazy form (delta action materializes
        // the round) measured 3.4 -> 4.2-5.1 s on graph_pagerank —
        // fusing the round plan into the delta job loses the dedicated
        // full-parallelism round pass
        val u = updated.localCheckpoint()
        // coalesce: max over an EMPTY node set (empty/all-null edge
        // list) is null — treat as converged so the empty graph falls
        // through to an empty frame like the eps=0 path
        val delta = u.join(
            ranks.select(col("node"), col("rank").as("__prev")), "node")
          .agg(coalesce(max(abs(col("rank") - col("__prev"))), lit(0L))
            .as("d"))
          .head().getLong(0)
        ranks = u
        done = delta < epsilonMicro
      } else {
        ranks = updated
      }
      i += 1
    }
    ranks.withColumnRenamed("rank", "rank_micro")
  }

  /** PERSONALIZED (topic-sensitive) PageRank: the teleport mass — and
    * any dangling mass — goes only to the `seeds` set instead of
    * uniformly to all nodes: r ← (1−d)·p + d·(Aᵀr + D·p) with p uniform
    * over seeds. Same all-Long arithmetic as [[run]]: each seed's
    * teleport is `(100−d)·10⁴·N div |S|` micro-units (the same total
    * teleport mass as the uniform walk, concentrated), the dangling
    * share is `D div |S|` per seed per round, and ε-stopping works
    * identically — so unrolled SQL CTEs with a seed CASE replay every
    * bit. The restart-set ranking used for topic-conditioned corpus
    * curation (seed docs of a domain → domain-affinity scores for
    * everything else). */
  def runPersonalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int, dampingPct: Int = 85,
      epsilonMicro: Long = 0L): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    require(epsilonMicro >= 0L)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).na.drop().distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, "src").repartition(col("src")).localCheckpoint()
    val seedSet = seeds.select(col(seeds.columns.head).cast("long")
      .as("node")).na.drop().distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .join(seedSet.withColumn("__s", lit(true)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__s"), lit(false)).as("is_seed"))
      .repartition(col("node")).localCheckpoint()
    val sinks = nodes.select("node")
      .join(ed.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .localCheckpoint()
    val hasSinks = sinks.limit(1).count() > 0
    val nNodes = nodes.count()
    val nSeeds = nodes.where(col("is_seed")).count()
    require(nSeeds > 0, "personalized PageRank needs >= 1 seed IN the graph")
    val basePerSeed = ((100 - dampingPct) * 10000L * nNodes) / nSeeds

    var ranks = nodes.select("node").withColumn("rank", lit(1000000L))
    var i = 0
    var done = false
    while (i < iters && !done) {
      val contrib = ed.join(ranks.hint("shuffle_hash"),
          col("src") === col("node"))
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      val base = nodes.join(contrib, col("node") === col("dst"), "left")
      val joined =
        if (!hasSinks) base.withColumn("share", lit(0L))
        else {
          val share = ranks.join(sinks, Seq("node"), "left_semi")
            .agg(coalesce(sum("rank"), lit(0L)).as("dsum"))
            .select(expr(s"dsum div ${nSeeds}L").as("share"))
          base.crossJoin(broadcast(share))
        }
      val updated = joined
        .select(col("node"),
          (when(col("is_seed"), lit(basePerSeed)).otherwise(lit(0L)) +
            expr(s"($dampingPct * (coalesce(s, 0L) + " +
              "(CASE WHEN is_seed THEN share ELSE 0L END))) div 100"))
            .as("rank"))
      if (epsilonMicro > 0L) {
        val u = updated.localCheckpoint()
        // coalesce: see [[run]] — empty node set yields null max
        val delta = u.join(
            ranks.select(col("node"), col("rank").as("__prev")), "node")
          .agg(coalesce(max(abs(col("rank") - col("__prev"))), lit(0L))
            .as("d"))
          .head().getLong(0)
        ranks = u
        done = delta < epsilonMicro
      } else {
        ranks = updated
      }
      i += 1
    }
    ranks.withColumnRenamed("rank", "rank_micro")
  }
}
