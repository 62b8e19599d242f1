package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.pipeline.Packing

/** Streaming whole-document next-fit packing (the [[Packing.nextFit]]
  * twin, and the door-side half of the `pipeline_export_train` story):
  * documents arriving on a stream are dealt into their deterministic
  * hash group (`doc_id % groups`) and appended to that group's OPEN bin,
  * closing it exactly when the batch walk would — so a continuously
  * ingesting pipeline packs training bins as data lands instead of
  * re-packing the corpus per sweep.
  *
  * Per micro-batch (foreachBatch — state is read and rewritten within
  * one batch):
  *   1. Load the per-group open-bin state — (grp, bin, fill) — from the
  *      latest store snapshot (each batch writes a FULL snapshot, so
  *      "latest surviving partition" IS the state).
  *   2. Walk each group's batch docs through the SHARED
  *      [[Packing.nextFitWalk]] starting from the carried (bin, fill) —
  *      one definition of "when does a bin close" for both worlds.
  *   3. Assignments append to `outDir`; the new snapshot (walked groups
  *      updated, untouched groups carried forward) replaces the state.
  *
  * Stream ≡ batch parity: when arrivals respect doc_id order (each
  * batch's ids ≥ every earlier batch's, per group), concatenating the
  * per-batch walks IS the batch walk over the union, so the emitted
  * (doc_id, grp, bin, n_tokens) set is bit-identical to
  * [[Packing.nextFit]] — StreamingSpec pins this across batches and a
  * restart hand-off. Out-of-order arrival keeps bins budget-respecting
  * but assigns by arrival order, not id order.
  *
  * `budget` and `groups` must be CONSTANT across a door's lifetime —
  * bin numbering continues from the stored state, which is only
  * meaningful under the same dealing and the same budget.
  *
  * Scale shape: state is one row per GROUP (≤ `groups` — thousands, not
  * corpus-sized), so it rides the driver as a broadcast map; the batch
  * walk is the same per-group `flatMapGroups` as the batch packer.
  *
  * IDEMPOTENT under at-least-once replays, the IncrementalDedup
  * discipline: both sinks are `batch=<id>` partition directories in
  * OVERWRITE mode, the state view excludes this batch's own partition
  * (a retry must not chain onto its own half-written snapshot), and the
  * store schema is explicit.
  */
object IncrementalPacking {

  private val StoreSchema = StructType(Seq(
    StructField("grp", LongType),
    StructField("bin", LongType),
    StructField("fill", LongType),
    StructField("batch", LongType)))

  /** One micro-batch step. Exposed for tests; [[start]] wires it into
    * foreachBatch. */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      storeDir: String, outDir: String, budget: Long,
      groups: Int): Unit = {
    require(budget > 0 && groups > 0)
    import spark.implicits._
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev: Map[Long, (Long, Long)] =
      if (fs.exists(storePath)) {
        val st = spark.read.schema(StoreSchema).parquet(storeDir)
          .where(col("batch") =!= batchId)
        val mb = st.agg(max("batch")).head()
        if (mb.isNullAt(0)) Map.empty
        else st.where(col("batch") === mb.getLong(0))
          .select("grp", "bin", "fill").as[(Long, Long, Long)]
          .collect().map { case (g, b, f) => g -> ((b, f)) }.toMap
      } else Map.empty
    val bc = spark.sparkContext.broadcast((prev, budget))
    val assigned = batch
      .select(col("doc_id").cast("long"), col("n_tokens").cast("long"))
      .as[(Long, Long)]
      .groupByKey { case (id, _) => id % groups }
      .flatMapGroups { (g: Long, it: Iterator[(Long, Long)]) =>
        val (pm, bud) = bc.value
        val (b0, f0) = pm.getOrElse(g, (0L, 0L))
        Packing.nextFitWalk(g, it, bud, b0, f0)
      }
      .toDF("doc_id", "grp", "bin", "n_tokens")
      .localCheckpoint() // feeds the sink AND the snapshot aggregation
    assigned.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    // new snapshot: a walked group's open bin is its MAX emitted bin;
    // its fill is the Σ n landed there, plus the carried fill when the
    // open bin CONTINUED (max bin == stored bin — nextFitWalk's state
    // is recoverable from output exactly this way, see its scaladoc)
    val mx = assigned.groupBy("grp").agg(max("bin").as("bin"))
    val sums = assigned.join(mx, Seq("grp", "bin"))
      .groupBy("grp", "bin").agg(sum("n_tokens").as("__s"))
    val prevDf = prev.toSeq.map { case (g, (b, f)) => (g, b, f) }
      .toDF("grp", "__b0", "__f0")
    val updated = sums.join(prevDf, Seq("grp"), "left")
      .select(col("grp"), col("bin"),
        (col("__s") + when(col("bin") === col("__b0"), col("__f0"))
          .otherwise(0L)).as("fill"))
    val carried = prevDf
      .join(sums.select("grp"), Seq("grp"), "left_anti")
      .select(col("grp"), col("__b0").as("bin"), col("__f0").as("fill"))
    updated.unionByName(carried)
      .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
  }

  /** Start the stream: parquet (doc_id, n_tokens) arrivals under
    * `inputDir`, bin assignments under `outDir`, the per-group open-bin
    * state at `storeDir`. */
  def start(spark: SparkSession, inputDir: String, storeDir: String,
      outDir: String, checkpointDir: String, schema: StructType,
      budget: Long, groups: Int): StreamingQuery = {
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, storeDir, outDir, budget, groups)
      }
      .start()
  }
}
