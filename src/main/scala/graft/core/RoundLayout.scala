package graft.core

import org.apache.spark.sql.DataFrame

/** Layout helpers for ITERATIVE operators (PageRank, k-core, label
  * propagation): keep per-round state pinned to one hash layout so the
  * round joins are exchange-free, at a width derived from the data
  * instead of the session constant. Extracted r17 after measuring that
  * the designed layout reuse never fired (see
  * [[ckptKeepPartitioning]]).
  */
object RoundLayout {

  /** localCheckpoint that actually PRESERVES hash partitioning: under
    * AQE, `Dataset.localCheckpoint` records `UnknownPartitioning` (the
    * adaptive plan's final partitioning is not known at checkpoint
    * time), so a checkpointed pre-partitioned table silently
    * re-exchanges at every downstream join keyed on its layout —
    * measured r17: every PageRank round re-shuffled the edge table the
    * build had just partitioned (5 of the 6 edge-table exchanges in
    * graph_pagerank's plan). Disabling AQE for just the checkpoint
    * materialization makes the captured LogicalRDD carry the real
    * `hashpartitioning(k, n)`; joins against it — under AQE or not —
    * then elide the exchange. Verified against Spark 4.1.2. Session-
    * conf toggle: assumes the single-threaded driver loop every
    * bench/verify path uses. */
  def ckptKeepPartitioning(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.localCheckpoint()
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** SCALE-ADAPTIVE round width: pinning the per-round layout also pins
    * its WIDTH — AQE can no longer coalesce the rounds' stages, so a
    * fixed `spark.sql.shuffle.partitions` width runs fixture-scale
    * graphs as stacks of near-empty tasks (measured r17: 32-wide
    * rounds at sf0.1 = 500+ tasks of a few ms compute and ~50-150 ms
    * scheduling overhead each). Derive the width from the row count —
    * `spark.graft.graph.rowsPerPartition` rows per partition (default
    * 256k ≈ 10 MB of edge rows; production sessions tune the target or
    * raise shuffle.partitions, which caps the result) — so small
    * inputs get compute-bearing tasks and large inputs get the full
    * configured parallelism AND the exchange elision. */
  def roundPartitions(df: DataFrame, nRows: Long): Int = {
    val conf = df.sparkSession.conf
    val target = conf.getOption("spark.graft.graph.rowsPerPartition")
      .map(_.toLong).getOrElse(262144L)
    val cap = conf.get("spark.sql.shuffle.partitions", "200").toInt
    math.max(1L, math.min((nRows + target - 1) / target, cap.toLong)).toInt
  }

  /** Run `body` with `spark.sql.shuffle.partitions` scoped to `p`: a
    * NEW exchange planned at the session width (e.g. a per-round
    * aggregation's) would otherwise cascade every downstream join back
    * to that width, re-shuffling the very tables the pinned layout
    * exists to keep in place. */
  def withShufflePartitions[T](df: DataFrame, p: Int)(body: => T): T = {
    val spark = df.sparkSession
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", p.toString)
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }
}
