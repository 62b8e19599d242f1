package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import graft.pipeline.Dedup

/** Streaming CCNet paragraph dedup (the [[graft.pipeline.Dedup
  * .paragraphDedup]] twin): documents arriving on a stream are stripped
  * of every paragraph block already admitted — in the accumulated hash
  * store OR earlier in the same micro-batch — and reassembled from their
  * surviving blocks before they join the corpus. Dedup-at-the-door for
  * a continuously-ingesting pipeline, instead of periodic full sweeps.
  *
  * Per micro-batch (foreachBatch — the store is read and appended within
  * one batch):
  *   1. Block + hash the batch with the SAME `Dedup` primitives as the
  *      batch path (a paragraph hashes identically in both worlds).
  *   2. Within-batch first occurrences (the shared min-(doc_id,
  *      block_idx) rule) minus hashes already in the store → kept blocks.
  *   3. Reassembled docs append to `outDir`; the batch's NEW hashes
  *      append to the store so later batches dedup against them.
  *
  * Stream ≡ batch parity: when arrivals respect doc_id order (each
  * batch's ids ≥ every earlier batch's), first-arrival coincides with
  * the batch path's global min-(doc_id, block_idx) rule, so the admitted
  * text per doc is bit-identical to `paragraphDedup` over the union —
  * StreamingSpec pins this. Out-of-order arrival keeps the set semantics
  * (one copy of every paragraph survives) but the surviving OWNER is
  * first-arrival, not min-id.
  *
  * The store carries one row per distinct paragraph hash ever admitted:
  * linear in the DISTINCT paragraph count, not the corpus; at scale it
  * lives bucketed by hash (graft.io.Bucketing) so step 2's anti-join is
  * co-located.
  */
object IncrementalParagraphDedup {

  private val StoreSchema = StructType(Seq(
    StructField("__h", LongType),
    StructField("batch", LongType)))

  /** One micro-batch step. Exposed for tests; [[start]] wires it into
    * foreachBatch.
    *
    * IDEMPOTENT under at-least-once replays, the IncrementalDedup
    * discipline: both sinks are `batch=<id>` partition directories in
    * OVERWRITE mode (a retry replaces its own partial output), the store
    * view excludes this batch's own partition (a retry must not dedup
    * the batch against its own half-written hashes), and the store
    * schema is explicit (inference would open a torn footer in the
    * partition the filter only prunes at planning time).
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      storeDir: String, outDir: String, blockWords: Int = 8,
      newline: Boolean = false): Unit = {
    // newline = the real CCNet unit ('\n\n' paragraphs, trimmed) for
    // corpora with structure; token blocks for flat text — the SAME
    // first-occurrence rule and store either way
    val blocks = (if (newline) Dedup.paragraphBlocksNewline(batch)
      else Dedup.paragraphBlocks(batch, blockWords = blockWords))
      .withColumn("__h", Dedup.md5Hash60(col("block")))
      .localCheckpoint()
    val batchFirst = Dedup.firstBlockOccurrences(blocks)
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val kept = if (fs.exists(storePath)) {
      val seen = spark.read.schema(StoreSchema).parquet(storeDir)
        .where(col("batch") =!= batchId).select("__h")
      batchFirst.join(seen, Seq("__h"), "left_anti")
    } else batchFirst
    // materialize once: kept feeds both the reassembly and the store
    val keptC = kept.localCheckpoint()
    Dedup.assembleKeptBlocks(
        batch.select(col("doc_id").cast("long").as("doc_id")),
        blocks, keptC, sep = if (newline) "\n\n" else " ")
      .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
    // one row per hash by construction (batchFirst is unique per __h)
    keptC.select(col("__h"))
      .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
  }

  /** Start the stream: parquet (doc_id, text) arrivals under `inputDir`,
    * deduplicated docs under `outDir`, the admitted-paragraph hash store
    * at `storeDir`. */
  def start(spark: SparkSession, inputDir: String, storeDir: String,
      outDir: String, checkpointDir: String, schema: StructType,
      blockWords: Int = 8, newline: Boolean = false): StreamingQuery = {
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, storeDir, outDir, blockWords,
          newline)
      }
      .start()
  }
}
