package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Non-iterative graph analytics over edge lists — the join-and-count
  * family (triangles, co-occurrence density) that complements
  * [[PageRank]]'s iterative rounds. Everything integer-deterministic:
  * the operations are joins and counts over Long node ids, so a SQL
  * oracle replays them row-for-row.
  */
object GraphOps {

  /** Canonical undirected edge set from any directed/multi edge list:
    * self-loops dropped, endpoints ordered u < v, duplicates collapsed. */
  def canonicalEdges(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val s = col(srcCol).cast("long")
    val d = col(dstCol).cast("long")
    edges.where(s.isNotNull && d.isNotNull && s =!= d)
      .select(least(s, d).as("u"), greatest(s, d).as("v"))
      .distinct()
  }

  /** Per-node triangle participation counts via the DEGREE-ORDERED
    * orientation (the standard distributed-triangle trick, e.g. Suri &
    * Vassilvitskii, WWW 2011): orient every undirected edge from the
    * (degree, id)-lexicographically smaller endpoint to the larger, so
    * each triangle materializes as exactly ONE wedge join — and, the
    * actual scale point, every node's OUT-degree is O(√m) no matter how
    * hub-skewed the in-degrees are, which bounds the wedge self-join at
    * O(m^1.5) total instead of Σd² (a single celebrity node would
    * otherwise own a quadratic wedge set). Three hash joins + one
    * count; no iteration, no driver graph. Input: any edge list
    * (direction/duplicates/self-loops ignored). Output:
    * (node, n_tri > 0). */
  def triangleCounts(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    val e = canonicalEdges(edges, srcCol, dstCol)
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient by (degree, id): rank(u) < rank(v) ⇒ u→v
    val oriented = e
      .join(deg.select(col("node").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"),
            col("du").as("ds"), col("dv").as("dt")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"),
            col("dv").as("ds"), col("du").as("dt")))
          .as("o"))
      .select(col("o.s").as("src"), col("o.t").as("dst"),
        col("o.dt").as("ddst"))
    // wedges (src; a, b) with rank(a) < rank(b), closed by oriented a→b
    val e1 = oriented.select(col("src"), col("dst").as("a"),
      col("ddst").as("da"))
    val e2 = oriented.select(col("src"), col("dst").as("b"),
      col("ddst").as("db"))
    val wedges = e1.join(e2, Seq("src"))
      .where(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
    val tris = wedges.join(
      oriented.select(col("src").as("a"), col("dst").as("b")),
      Seq("a", "b"))
    tris.select(col("src").as("node"))
      .unionAll(tris.select(col("a").as("node")))
      .unionAll(tris.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  /** The k-core: the maximal subgraph in which every node keeps degree
    * ≥ k, by synchronous peeling — each round drops ALL nodes whose
    * current degree is < k at once (deterministic round boundary), then
    * filters edges to survivors. The loop stops as soon as a round
    * removes nothing; crucially, peeling a stable core is a NO-OP, so
    * an oracle that unrolls MORE rounds than the engine executed lands
    * on identical rows with no freeze machinery (unlike PageRank, where
    * every extra round moves the values). Per round: one degree
    * aggregation + two semi-joins, survivors checkpointed (linear
    * lineage). Output: (node, core_deg) over the surviving subgraph —
    * empty when no k-core exists.
    *
    * PRECONDITION: scopes session conf via [[graft.core.RoundLayout]] —
    * don't plan unrelated queries on the same SparkSession concurrently
    * with this call (see RoundLayout's scaladoc). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 8): DataFrame = {
    require(k >= 1 && maxRounds >= 1)
    val e0 = canonicalEdges(edges, srcCol, dstCol).localCheckpoint()
    // derived round width + two actions per round (r17): the survivor
    // checkpoint is lazy and materialized by the stability count, and
    // the previous round's edge count is carried in `cnt` — the r16
    // form paid an eager e2 checkpoint + a separate count + a re-count
    // of the previous round's edges, all at the full session width.
    // `keep` STAYS an eager checkpoint: the r17 sweep measured the
    // un-materialized form (deg feeding both semi-joins in-plan) at
    // 22.6 s vs 13.4 s for the staged form at the 100× corpus — the
    // nodes-sized materialization is cheaper than re-deriving the
    // degree aggregate under both probe joins at scale.
    var cnt = e0.count()
    val p = graft.core.RoundLayout.roundPartitions(e0, cnt)
    graft.core.RoundLayout.withShufflePartitions(e0, p) {
      var e = e0
      var done = false
      var i = 0
      while (i < maxRounds && !done) {
        val deg = e.select(col("u").as("node"))
          .unionAll(e.select(col("v").as("node")))
          .groupBy("node").agg(count(lit(1)).as("d"))
        val keep = deg.where(col("d") >= k).select("node").localCheckpoint()
        val e2 = e
          .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
          .select("u", "v").localCheckpoint(false)
        // stability check on edge count — peeling only ever removes
        val c2 = e2.count()
        done = c2 == cnt
        cnt = c2
        e = e2
        i += 1
      }
      // a truncated peel is NOT a k-core (nodes with degree < k remain);
      // refuse to return one rather than let the caller mistake it for
      // the maximal subgraph the docstring promises
      require(done, s"kCore(k=$k) did not converge within $maxRounds " +
        s"rounds — deep-peeling graph; raise maxRounds")
      // NOTE (ADVICE r17): only the LOOP is width-scoped. This final
      // aggregate is returned lazily and plans at whatever width is
      // active when the caller runs it (normally session width) — that
      // is deliberate: the survivor edge set is checkpointed, its
      // degree aggregation parallelizes better at the session width,
      // and materializing it here was measured SLOWER (r18 probe:
      // +0.7 s wall, +2 CPU-s from the narrow-width agg + extra job).
      e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("core_deg"))
    }
  }
}
