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
  * Token counts: by default the gate's n_words (the curation chain's
  * accounting unit); with a `tokenizer` supplied (r16, mirroring the
  * batch export's tokenizer-true turn), each batch's ADMITTED docs are
  * tokenized with the FROZEN trained unigram-LM model
  * ([[graft.pipeline.Unigram.tokenizeIds]]) and the bins fill by
  * ACTUAL token counts — the frozen-artifact convention of
  * [[IncrementalCuration.FrozenArtifacts]]: the model is a batch-
  * trained constant the door applies, never re-fits (re-training per
  * micro-batch would make a doc's token count depend on what arrived
  * alongside it). Text for the admitted rows comes from the batch
  * itself (the admitted partition stores only accounting columns); a
  * replayed batch re-supplies the same rows, so the handoff stays
  * idempotent.
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
      frozen: Option[IncrementalCuration.FrozenArtifacts] = None,
      tokenizer: Option[graft.pipeline.Unigram.Model] = None): Unit = {
    IncrementalCuration.processBatch(spark, batch, batchId,
      s"$storeDir/curation", s"$outDir/admitted", budget,
      numPerms, rowsPerBand, simThreshold, maxBucket, frozen)
    val admitted = spark.read.schema(AdmittedSchema)
      .parquet(s"$outDir/admitted/batch=$batchId")
    val counted = tokenizer match {
      case Some(model) =>
        // tokenizer-true bin mass: admitted ids pull their text from
        // THIS batch (admission is always within-batch, so the semi
        // join is complete), then the frozen model counts real tokens
        val admTexts = batch
          .select(col("doc_id").cast("long").as("doc_id"), col("text"))
          .join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
        graft.pipeline.Unigram.tokenizeIds(admTexts, model)
          .select(col("doc_id"), col("n_tokens"))
      case None =>
        admitted.select(col("doc_id"), col("n_words").as("n_tokens"))
    }
    IncrementalPacking.processBatch(spark, counted, batchId,
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
      frozen: Option[IncrementalCuration.FrozenArtifacts] = None,
      tokenizer: Option[graft.pipeline.Unigram.Model] = None)
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
          maxBucket, frozen, tokenizer)
      }
      .start()
  }
}
