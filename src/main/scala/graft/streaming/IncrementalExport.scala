package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming curate→pack composition (VERDICT r14 #6) — the door-side
  * twin of `pipeline_curate_export`: every micro-batch runs the FULL
  * curation door ([[IncrementalCuration]]: gate → frozen-LM tail drop →
  * exact dedup → fuzzy dedup → decontamination → per-source budget) and
  * feeds the batch's ADMITTED rows straight into the packing door
  * ([[IncrementalPacking]]), so a continuously-ingesting pipeline
  * reaches the same artifact the batch composition materializes — the
  * curated corpus laid out into training bins — without ever re-packing
  * the corpus per sweep.
  *
  * One foreachBatch chain: curation's admitted `batch=<id>` partition is
  * read back (it is the idempotent handoff surface — a retried batch
  * re-reads its own OVERWRITE-replaced partition, never a stale one) and
  * walked through the packing twin under the SAME batchId, so the two
  * doors' versioned stores advance in lockstep and a replay is
  * idempotent end-to-end.
  *
  * Stream ≡ batch parity (IncrementalExportSpec): when arrivals respect
  * doc_id order, the packed output is bit-identical to
  * [[graft.pipeline.Packing.nextFit]] over the door's admitted union —
  * the admitted set is itself batching-dependent only through the
  * budget door (a folded batch admits in one rank walk, sequential
  * batches in several), so parity is stated against the door's OWN
  * admitted output, exactly like the batch composition states it
  * against the batch chain's admitted frame.
  *
  * Token counts: the gate's n_words (the curation chain's accounting
  * unit) — the same choice the batch `pipeline_curate_export` makes.
  */
object IncrementalExport {

  private val AdmittedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("n_words", LongType)))

  /** One micro-batch step over (doc_id, source, text) arrivals.
    * Admitted rows land at `outDir/admitted/batch=<id>`, bin
    * assignments at `outDir/packed/batch=<id>`; both doors' stores live
    * under `storeDir`. Exposed for the parity spec; [[start]] wires it
    * into foreachBatch. */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      storeDir: String, outDir: String, budget: Long, packBudget: Long,
      groups: Int, numPerms: Int = 8, rowsPerBand: Int = 4,
      simThreshold: Double = 0.75, maxBucket: Int = 1000,
      frozen: Option[IncrementalCuration.FrozenArtifacts] = None): Unit = {
    IncrementalCuration.processBatch(spark, batch, batchId,
      s"$storeDir/curation", s"$outDir/admitted", budget,
      numPerms, rowsPerBand, simThreshold, maxBucket, frozen)
    val admitted = spark.read.schema(AdmittedSchema)
      .parquet(s"$outDir/admitted/batch=$batchId")
      .select(col("doc_id"), col("n_words").as("n_tokens"))
    IncrementalPacking.processBatch(spark, admitted, batchId,
      s"$storeDir/packing", s"$outDir/packed", packBudget, groups): Unit
  }

  /** Start the composed door: parquet (doc_id, source, text) arrivals
    * under `inputDir`, curated admissions under `outDir/admitted`, bin
    * assignments under `outDir/packed`. */
  def start(spark: SparkSession, inputDir: String, storeDir: String,
      outDir: String, checkpointDir: String, schema: StructType,
      budget: Long, packBudget: Long, groups: Int,
      numPerms: Int = 8, rowsPerBand: Int = 4,
      simThreshold: Double = 0.75, maxBucket: Int = 1000,
      maxFilesPerTrigger: Option[Int] = None,
      frozen: Option[IncrementalCuration.FrozenArtifacts] = None)
      : StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val src = maxFilesPerTrigger
      .map(n => reader.option("maxFilesPerTrigger", n)).getOrElse(reader)
      .parquet(inputDir)
    src.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, storeDir, outDir, budget,
          packBudget, groups, numPerms, rowsPerBand, simThreshold,
          maxBucket, frozen)
      }
      .start()
  }
}
