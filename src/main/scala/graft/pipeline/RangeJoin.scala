package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join: match each left POINT row to every right
  * INTERVAL row whose `[lo, hi]` contains it, per equi key — the
  * attribution / windowed-enrichment join ("events inside a purchase's
  * follow-up hour", "reads overlapping a maintenance window").
  *
  * Spark has no native range join; the naive formulation is an equi join
  * on the key with a `BETWEEN` residual, which Catalyst executes as the
  * full per-key cross product filtered late — quadratic per key, and a
  * single hot key (one user, one tenant) becomes the straggler that
  * kills the stage at 100 TB.
  *
  * This is the bucketed formulation: quantize the domain into
  * fixed-width bins, explode each interval into the bins it covers
  * (points map to exactly ONE bin), equi-join on (key, bin), then apply
  * the exact `BETWEEN` residual. Work is proportional to
  * `matches + interval-span/binWidth`, not to per-key row products; the
  * join is a plain hash/SMJ equi join so AQE skew splitting still
  * applies on top. Each (point, interval) pair meets in exactly one bin
  * — the point's — so no post-join dedup is needed.
  *
  * Choose `binWidth` near the typical interval length: much smaller
  * wastes rows on interval replication, much larger degrades toward the
  * per-key cross product (everything lands in one bucket). The
  * `maxBinsPerInterval` guard fails fast on pathological intervals
  * (an interval spanning the whole domain would otherwise silently
  * replicate across every bin).
  */
object RangeJoin {

  /** Left rows joined to the right rows whose `[loCol, hiCol]` interval
    * contains `pointCol` (inclusive both ends), equi on `on`. Output:
    * all left columns plus the right row as a `range` struct column —
    * one output row per (point, containing interval) pair; points in no
    * interval drop (inner semantics). Point and bound columns must be
    * numeric (cast timestamps with `unix_micros` first).
    */
  def pointInInterval(left: DataFrame, right: DataFrame, on: Seq[String],
      pointCol: String, loCol: String, hiCol: String, binWidth: Long,
      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth")
    require(maxBinsPerInterval > 0, s"maxBinsPerInterval=$maxBinsPerInterval")

    val rPayload = struct(right.columns.map(col): _*)
    // floor-division bin that is correct for negative values too
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / binWidth).cast("long")

    // fail fast (at execution time, distributed) on a pathological span
    // rather than silently replicating it across the domain; empty
    // intervals (hi < lo) simply match nothing. The error lives INSIDE
    // the explode input — a guard on a later projection would be pruned
    // by the inner join's null-filter pushdown before it ever evaluated
    val guard = bin(col(hiCol)) - bin(col(loCol)) < maxBinsPerInterval
    val rBinned = right
      .where(col(hiCol) >= col(loCol))
      .withColumn("__bin",
        explode(when(guard, sequence(bin(col(loCol)), bin(col(hiCol))))
          .otherwise(raise_error(concat(
            lit(s"RangeJoin: interval wider than $maxBinsPerInterval bins of $binWidth at key "),
            concat_ws(",", on.map(col): _*))).cast("array<long>"))))
      .select(on.map(col) ++ Seq(col("__bin"),
        col(loCol).as("__lo"), col(hiCol).as("__hi"),
        rPayload.as("__r")): _*)

    val lBinned = left.withColumn("__bin", bin(col(pointCol)))
    lBinned.join(rBinned,
        on :+ "__bin",
        "inner")
      .where(col(pointCol) >= col("__lo") && col(pointCol) <= col("__hi"))
      .drop("__bin", "__lo", "__hi")
      .withColumnRenamed("__r", "range")
  }

  /** Interval × interval OVERLAP join: left `[lLo, lHi]` rows matched to
    * right `[rLo, rHi]` rows with `lLo <= rHi && rLo <= lHi`, equi on
    * `on`. Same bucketed scheme, with the duplicate problem intervals
    * introduce (a pair shares every bin both cover) solved WITHOUT a
    * dedup shuffle: a pair is emitted only in its canonical bin — the
    * bin of `greatest(lLo, rLo)`, the overlap's start, which both sides
    * cover by definition. Output: left columns + the right row as a
    * `range` struct.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, on: Seq[String],
      lLoCol: String, lHiCol: String, rLoCol: String, rHiCol: String,
      binWidth: Long, maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth=$binWidth")
    require(maxBinsPerInterval > 0, s"maxBinsPerInterval=$maxBinsPerInterval")

    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast("double") / binWidth).cast("long")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame = {
      val guard = bin(col(hi)) - bin(col(lo)) < maxBinsPerInterval
      df.where(col(hi) >= col(lo))
        .withColumn("__bin",
          explode(when(guard, sequence(bin(col(lo)), bin(col(hi))))
            .otherwise(raise_error(concat(
              lit(s"RangeJoin: interval wider than $maxBinsPerInterval bins of $binWidth at key "),
              concat_ws(",", on.map(col): _*))).cast("array<long>"))))
    }

    val rPayload = struct(right.columns.map(col): _*)
    val rBinned = binned(right, rLoCol, rHiCol)
      .select(on.map(col) ++ Seq(col("__bin"),
        col(rLoCol).as("__rlo"), col(rHiCol).as("__rhi"),
        rPayload.as("__r")): _*)
    binned(left, lLoCol, lHiCol)
      .join(rBinned, on :+ "__bin", "inner")
      .where(col(lLoCol) <= col("__rhi") && col("__rlo") <= col(lHiCol) &&
        col("__bin") === bin(greatest(col(lLoCol), col("__rlo"))))
      .drop("__bin", "__rlo", "__rhi")
      .withColumnRenamed("__r", "range")
  }
}
