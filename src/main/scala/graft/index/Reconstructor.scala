package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** V10's precomputed reconstruct-all table — every code tuple's
  * reconstructed vector (MEVI/main_models.py:3272-3309
  * `gen_all_reconstruct`: all K^M centroid sums). Kept as a DataFrame and
  * JOINED, never broadcast: at the reference geometry (32⁴ ≈ 1.05M tuples ×
  * 768 floats ≈ 3 GB) it is cluster-resident state (SURVEY §7.4.4).
  *
  * Built by iterative explode over levels: level m's K centroids cross the
  * accumulated prefix table, vectors summed per step — M−1 narrow joins of
  * a table that grows K× per level, no driver materialization.
  */
object Reconstructor {

  /** (codes ARRAY<INT>, vec ARRAY<FLOAT>) — one row per code tuple. */
  def reconstructAll(spark: SparkSession, cb: Codebook): DataFrame = {
    import graft.core.VectorOps.vecAdd
    val levelDfs = cb.levels.zipWithIndex.map { case (cents, m) =>
      import spark.implicits._
      cents.zipWithIndex.map { case (c, code) => (code, c.toSeq) }.toSeq
        .toDF(s"code_$m", s"cent_$m")
    }
    val first = levelDfs.head
      .select(array(col("code_0")).as("codes"), col("cent_0").as("vec"))
    levelDfs.zipWithIndex.tail.foldLeft(first) { case (acc, (lvl, m)) =>
      acc.crossJoin(lvl)
        .select(
          concat(col("codes"), array(col(s"code_$m"))).as("codes"),
          vecAdd(col("vec"), col(s"cent_$m")).as("vec"))
    }
  }
}
