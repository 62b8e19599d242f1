package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-key time-series operators over an event table: the running
  * exponential moving average (the batch form of online "EMA stats"
  * maintenance — cf. MEVI's EMA cluster-statistics updates during
  * training, reference `MEVI/` trainer) and ordered funnel analysis.
  *
  * Both are one-shuffle-per-key shapes: EWMA is a per-key sorted fold
  * (sequential by construction — each step needs the previous), funnel
  * is a chain of per-key MIN aggregates. Neither materializes per-key
  * cross products.
  */
object TimeSeries {

  /** Running EWMA per key, one output row per event:
    * `ewma_0 = v_0`, `ewma_i = alpha * v_i + (1 - alpha) * ewma_{i-1}`
    * in per-key `(orderCol, tieCol)` order. The recurrence is inherently
    * sequential, so it runs as a per-key sorted fold inside
    * `flatMapGroups` — ONE shuffle on the key, state O(1) per key,
    * rows of one key streamed in sorted order by the secondary sort.
    * The fold is plain Double arithmetic in a fixed order, so an oracle
    * replaying the same fold (DuckDB `list_reduce`) lands on identical
    * bits; emit through `floor(x * 1e6 + 0.5)` micro-units for hashing.
    *
    * At 100 TB the shuffle partitions by key; a single pathological key
    * streams through one task but only holds O(1) state — the sort is
    * Spark's spillable secondary sort, not an in-memory buffer.
    */
  def ewma(events: DataFrame, keyCol: String, orderCol: String,
      tieCol: String, valueCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha=$alpha")
    val spark = events.sparkSession
    val outSchema = StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("tie", LongType, nullable = false),
      StructField("ewma_micro", LongType, nullable = false)))
    val a = alpha
    // TIMESTAMP→LONG casts truncate to whole seconds; order on exact
    // micros (NTZ already normalized by Tables.load upstream)
    val ord = events.schema(orderCol).dataType match {
      case TimestampType => unix_micros(col(orderCol))
      case _             => col(orderCol).cast("long")
    }
    val src = events.select(
      col(keyCol).cast("long").as("k"),
      ord.as("o"),
      col(tieCol).cast("long").as("t"),
      col(valueCol).cast("double").as("v"))
      .na.drop() // a null key/time/value row has no place in the fold
    // repartition by key + within-partition sort = the classic secondary
    // sort; the per-partition pass then folds each key's run in order
    val sorted = src.repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o"), col("t"))
    val rdd = sorted.rdd.mapPartitions { it =>
      var curKey = Long.MinValue
      var haveAcc = false
      var acc = 0.0
      it.map { r =>
        val k = r.getLong(0)
        if (k != curKey) { curKey = k; haveAcc = false }
        val v = r.getDouble(3)
        acc = if (!haveAcc) { haveAcc = true; v } else a * v + (1 - a) * acc
        Row(k, r.getLong(2), math.floor(acc * 1000000 + 0.5).toLong)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Merge overlapping/touching intervals per key into coverage islands
    * (gaps-and-islands): sort per key by `lo`, flag starts that clear
    * the running max of `hi` seen so far, cumulative-sum the flags into
    * island ids, aggregate. Two window passes + one aggregation over
    * the SAME per-key partitioning — one shuffle total. The building
    * block under span-dedup trimming, redaction-span coalescing, and
    * session coverage; intervals touching end-to-end (next.lo ≤ prev.hi)
    * merge, a gap of ≥1 unit splits. Output: (key, island, lo, hi, n).
    */
  def mergeIntervals(intervals: DataFrame, keyCol: String,
      loCol: String, hiCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(keyCol)
      .orderBy(col(loCol), col(hiCol))
    val runningMaxPrev = max(col(hiCol))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    intervals
      .withColumn("__new",
        when(runningMaxPrev.isNull || col(loCol) > runningMaxPrev, 1)
          .otherwise(0))
      .withColumn("island",
        sum(col("__new")).over(byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(loCol)).as("lo"), max(col(hiCol)).as("hi"),
        count(lit(1)).as("n"))
  }

  /** Ordered funnel: for each key, the earliest time of step 1, then the
    * earliest step-2 event AT OR AFTER it, then the earliest step 3
    * after that, etc. Output one row per key that completed at least
    * step 1: the per-step times (null once the funnel stalls) and
    * `steps_completed`. Each stage is a per-key MIN aggregate (tiny —
    * one row per key) joined back; N-stage funnel = N aggregates + N-1
    * joins of aggregate-sized frames, never a per-key event blowup.
    */
  def funnel(events: DataFrame, keyCol: String, timeCol: String,
      stepCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepTime = (i: Int) => s"step${i + 1}_ts"
    var acc: DataFrame = events.where(col(stepCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(timeCol)).as(stepTime(0)))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val next = events.where(col(stepCol) === s)
        .select(col(keyCol).as("__k"), col(timeCol).as("__t"))
      acc = acc.join(next,
          acc(keyCol) === col("__k") && col("__t") >= acc(stepTime(i - 1)),
          "left")
        .groupBy((keyCol +: (0 until i).map(stepTime)).map(col): _*)
        .agg(min(col("__t")).as(stepTime(i)))
    }
    val completed = steps.indices.map(i =>
      when(col(stepTime(i)).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc.withColumn("steps_completed", completed)
  }
}
