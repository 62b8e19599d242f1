package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale shape (reworked r17, guide §2.4/§2.2): one equi-join (ranks ⨝
  * degree-annotated edges on src) plus one hash aggregation (sum by
  * dst) per iteration — shuffle ∝ nodes, state ∝ nodes, the edge set
  * crossing the network exactly ONCE at build. The r16 plan silently
  * re-shuffled the edge table every round: under AQE,
  * `localCheckpoint` records UnknownPartitioning, so the build's
  * repartition("src") was discarded and 5 of the 6 edge-table
  * exchanges in graph_pagerank's physical plan were that loss. Now the
  * build checkpoints under a brief AQE-off window
  * ([[ckptKeepPartitioning]]) so the recorded `hashpartitioning(src,p)`
  * / `hashpartitioning(node,p)` layouts make every round's two joins
  * exchange-free — the only per-round exchange is the contribution
  * scatter, which map-side-combines to ≤ nodes rows per map partition.
  * The round width `p` is derived from the edge count (capped at
  * `spark.sql.shuffle.partitions`) so fixture-scale graphs do not run
  * as stacks of near-empty tasks while production widths keep full
  * parallelism; `spark.sql.shuffle.partitions` is scoped to `p` for
  * the rounds so the scatter exchange co-partitions with the pinned
  * layout instead of cascading everything back to the session width.
  * Dangling mass and the ε-stopping delta are read off ONE per-round
  * aggregate action over carried columns (is_sink, __prev) — no
  * per-round semi-join, broadcast, or ranks-to-ranks join. No
  * driver-side graph; the only per-round driver traffic is that
  * 2-column scalar row.
  *
  * PRECONDITION: the public entry points scope session conf via
  * [[graft.core.RoundLayout]] — don't plan unrelated queries on the
  * same SparkSession concurrently with a PageRank call (see
  * RoundLayout's scaladoc).
  */
object PageRank {

  private def ckptKeepPartitioning(df: DataFrame): DataFrame =
    graft.core.RoundLayout.ckptKeepPartitioning(df)

  private def roundPartitions(df: DataFrame, nRows: Long): Int =
    graft.core.RoundLayout.roundPartitions(df, nRows)

  private def withShufflePartitions[T](df: DataFrame, p: Int)(body: => T): T =
    graft.core.RoundLayout.withShufflePartitions(df, p)(body)

  /** Damped rounds over a directed edge list; every node that appears
    * as src or dst participates. Nodes with no out-edges (sinks) are
    * handled by per-round dangling-mass redistribution: their rank is
    * summed, floor-divided by N, and added to every node's incoming
    * contribution BEFORE damping — no silent mass leak on web/citation
    * graphs, no self-loop preprocessing required. Sink detection runs
    * once; a sink-free graph (e.g. a bipartite both-directions edge
    * set) skips the redistribution machinery entirely.
    *
    * Stopping: runs `iters` rounds, or stops early once
    * `max_node |Δrank_micro| < epsilonMicro` (ε = 0 disables the
    * check). The update that triggered the stop is kept — the SQL
    * replay mirrors this with a cumulative freeze flag, so unrolling
    * MORE rounds than the engine executed still lands on identical
    * bits.
    * Output: (node, rank_micro). */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int,
      dampingPct: Int = 85, epsilonMicro: Long = 0L): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    require(epsilonMicro >= 0L)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).na.drop().distinct()
    // every iteration re-reads the degree-annotated edges and the node
    // list — materialize them ONCE, partitioning preserved. Two-phase
    // build: the joined edge table lands once under stock AQE (ed0 —
    // also the row count the round width derives from), then is laid
    // out hash(src) at that width from the in-memory copy. The
    // explicit repartition matters: deg auto-broadcasts, so the join
    // output would otherwise keep e's (src, dst) distinct-layout —
    // useless to the rounds. `nodes` derives from the checkpointed
    // ed0, not a second corpus pass.
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ed0 = e.join(deg, "src").localCheckpoint()
    val p = roundPartitions(ed0, ed0.count())
    withShufflePartitions(ed0, p) {
      val ed = ckptKeepPartitioning(ed0.repartition(p, col("src")))
      val nodes = ckptKeepPartitioning(
        ed0.select(col("src").as("node"))
          .union(ed0.select(col("dst").as("node"))).distinct()
          .repartition(p, col("node")))
      // sinks: nodes that never appear as src. Computed once; empty
      // for any graph whose edge set is closed under reversal.
      val sinks = ckptKeepPartitioning(
        nodes.join(ed.select(col("src").as("node")).distinct(),
          Seq("node"), "left_anti"))
      val nSinks = sinks.count()
      val hasSinks = nSinks > 0
      val nNodes = if (hasSinks) nodes.count() else 0L
      val basePart = (100 - dampingPct) * 10000L
      val needsDelta = epsilonMicro > 0L

      // carried columns: __prev feeds the ε delta, is_sink the next
      // round's dangling sum — both read off the round's ONE aggregate
      // action (the r16 form instead paid a per-round ranks⨝sinks
      // semi-join + broadcast for the share and a u⨝ranks join for
      // the delta). The share enters the update as a Scala Long
      // literal: identical arithmetic (`dsum div N` = floor division
      // of non-negative Longs), zero plan nodes. A sink-free ε=0 run
      // carries nothing and takes no per-round action at all — each
      // round is exactly its checkpoint job.
      var ranks =
        if (hasSinks)
          nodes.join(sinks.withColumn("__snk", lit(true)), Seq("node"), "left")
            .select(col("node"), lit(1000000L).as("rank"),
              coalesce(col("__snk"), lit(false)).as("is_sink"))
        else nodes.withColumn("rank", lit(1000000L))
      var dsum = 1000000L * nSinks // init ranks are 1e6 each
      var i = 0
      var done = false
      while (i < iters && !done) {
        val share = if (hasSinks) dsum / nNodes else 0L
        val contrib = ed.join(
            ranks.select("node", "rank").hint("shuffle_hash"),
            col("src") === col("node"))
          .select(col("dst"), expr("rank div deg").as("c"))
          .groupBy("dst").agg(sum("c").as("s"))
        val newRank = (lit(basePart) +
          expr(s"($dampingPct * (coalesce(s, 0L) + ${share}L)) div 100"))
          .as("rank")
        val carryLeft: Seq[Column] = Seq(col("node")) ++
          (if (needsDelta) Seq(col("rank").as("__prev")) else Nil) ++
          (if (hasSinks) Seq(col("is_sink")) else Nil)
        val carryOut: Seq[Column] = Seq(col("node"), newRank) ++
          (if (needsDelta) Seq(col("__prev")) else Nil) ++
          (if (hasSinks) Seq(col("is_sink")) else Nil)
        val updated = ranks.select(carryLeft: _*)
          .join(contrib, col("node") === col("dst"), "left")
          .select(carryOut: _*)
        // EAGER round materialization: linear lineage, preserved
        // layout, and (measured r15) a dedicated full-parallelism
        // round pass instead of fusing into the delta job
        val u = ckptKeepPartitioning(updated)
        if (needsDelta || hasSinks) {
          // one action: max |Δ| for the stop check + the sink-rank sum
          // the next round's share needs. coalesce: agg over an EMPTY
          // node set (empty/all-null edge list) is null — treat as
          // converged so the empty graph falls through like ε=0.
          val aggs: Seq[Column] =
            (if (needsDelta)
              Seq(coalesce(max(abs(col("rank") - col("__prev"))), lit(0L)))
            else Nil) ++
            (if (hasSinks)
              Seq(coalesce(sum(when(col("is_sink"), col("rank"))), lit(0L)))
            else Nil)
          val row = u.agg(aggs.head, aggs.tail: _*).head()
          if (hasSinks) dsum = row.getLong(row.length - 1)
          done = needsDelta && row.getLong(0) < epsilonMicro
        }
        ranks = u
        i += 1
      }
      ranks.select(col("node"), col("rank").as("rank_micro"))
    }
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
    * everything else). Same round shape and carried-column machinery
    * as [[run]], plus the is_seed flag every update reads. */
  def runPersonalized(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int, dampingPct: Int = 85,
      epsilonMicro: Long = 0L): DataFrame = {
    require(iters >= 0 && dampingPct >= 0 && dampingPct <= 100)
    require(epsilonMicro >= 0L)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).na.drop().distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    // two-phase build + derived round width — see [[run]]
    val ed0 = e.join(deg, "src").localCheckpoint()
    val p = roundPartitions(ed0, ed0.count())
    withShufflePartitions(ed0, p) {
      val ed = ckptKeepPartitioning(ed0.repartition(p, col("src")))
      val seedSet = seeds.select(col(seeds.columns.head).cast("long")
        .as("node")).na.drop().distinct()
      val nodes = ckptKeepPartitioning(
        ed0.select(col("src").as("node"))
          .union(ed0.select(col("dst").as("node"))).distinct()
          .join(seedSet.withColumn("__s", lit(true)), Seq("node"), "left")
          .select(col("node"), coalesce(col("__s"), lit(false)).as("is_seed"))
          .repartition(p, col("node")))
      val sinks = ckptKeepPartitioning(
        nodes.select("node")
          .join(ed.select(col("src").as("node")).distinct(),
            Seq("node"), "left_anti"))
      val nSinks = sinks.count()
      val hasSinks = nSinks > 0
      val nNodes = nodes.count()
      val nSeeds = nodes.where(col("is_seed")).count()
      require(nSeeds > 0, "personalized PageRank needs >= 1 seed IN the graph")
      val basePerSeed = ((100 - dampingPct) * 10000L * nNodes) / nSeeds
      val needsDelta = epsilonMicro > 0L

      var ranks =
        if (hasSinks)
          nodes.join(sinks.withColumn("__snk", lit(true)), Seq("node"), "left")
            .select(col("node"), lit(1000000L).as("rank"), col("is_seed"),
              coalesce(col("__snk"), lit(false)).as("is_sink"))
        else nodes.select(col("node"), lit(1000000L).as("rank"),
          col("is_seed"))
      var dsum = 1000000L * nSinks
      var i = 0
      var done = false
      while (i < iters && !done) {
        val share = if (hasSinks) dsum / nSeeds else 0L
        val contrib = ed.join(
            ranks.select("node", "rank").hint("shuffle_hash"),
            col("src") === col("node"))
          .select(col("dst"), expr("rank div deg").as("c"))
          .groupBy("dst").agg(sum("c").as("s"))
        val newRank =
          (when(col("is_seed"), lit(basePerSeed)).otherwise(lit(0L)) +
            expr(s"($dampingPct * (coalesce(s, 0L) + " +
              s"(CASE WHEN is_seed THEN ${share}L ELSE 0L END))) div 100"))
            .as("rank")
        val carryLeft: Seq[Column] = Seq(col("node")) ++
          (if (needsDelta) Seq(col("rank").as("__prev")) else Nil) ++
          Seq(col("is_seed")) ++
          (if (hasSinks) Seq(col("is_sink")) else Nil)
        val carryOut: Seq[Column] = Seq(col("node"), newRank) ++
          (if (needsDelta) Seq(col("__prev")) else Nil) ++
          Seq(col("is_seed")) ++
          (if (hasSinks) Seq(col("is_sink")) else Nil)
        val updated = ranks.select(carryLeft: _*)
          .join(contrib, col("node") === col("dst"), "left")
          .select(carryOut: _*)
        val u = ckptKeepPartitioning(updated)
        if (needsDelta || hasSinks) {
          val aggs: Seq[Column] =
            (if (needsDelta)
              Seq(coalesce(max(abs(col("rank") - col("__prev"))), lit(0L)))
            else Nil) ++
            (if (hasSinks)
              Seq(coalesce(sum(when(col("is_sink"), col("rank"))), lit(0L)))
            else Nil)
          val row = u.agg(aggs.head, aggs.tail: _*).head()
          if (hasSinks) dsum = row.getLong(row.length - 1)
          done = needsDelta && row.getLong(0) < epsilonMicro
        }
        ranks = u
        i += 1
      }
      ranks.select(col("node"), col("rank").as("rank_micro"))
    }
  }
}
