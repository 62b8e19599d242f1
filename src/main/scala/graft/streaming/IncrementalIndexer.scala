package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.index.Codebook

/** Structured-Streaming incremental index maintenance (SURVEY §2.10): the
  * reference's drop-rate replay — assign held-out docs to a *frozen*
  * codebook without re-clustering (gen_sampled_to_full.py:61-88) — becomes
  * a micro-batch stream: new (doc_id, vec) rows → broadcast-codebook
  * assignment → foreachBatch append to the cluster-index store. Assignment
  * is stateless given the frozen codebook, so the stream needs no
  * aggregation state; codebook *refresh* stays a batch job with
  * [[graft.index.CodebookAligner]] keeping ids stable.
  */
object IncrementalIndexer {

  /** Attach code assignment to a streaming (doc_id, vec) DataFrame —
    * shares [[graft.index.CodeAssigner.withCodes]] with the batch path. */
  def assignStream(stream: DataFrame, codebook: Codebook): DataFrame =
    graft.index.CodeAssigner.withCodes(stream, codebook)

  /** Run the stream, appending per-batch assignments to a parquet dir
    * (the incremental side of the cluster index; readers union it with the
    * base index — `MemmapList`-style concat, SURVEY §2.1 S6).
    *
    * Small-file hygiene: every `compactEvery` batches the sink rewrites
    * the store through [[graft.io.Layout.compactInPlace]] (doc_id-
    * clustered, ~`targetRecordsPerFile` rows per file) — an append-only
    * micro-batch sink otherwise grows one file set per trigger forever,
    * and at streaming cadence that is the classic millions-of-tiny-files
    * failure. Compaction runs inside `foreachBatch`, where Structured
    * Streaming serializes batches, so the store has a single writer.
    * `compactEvery <= 0` keeps the plain always-append sink.
    */
  def start(spark: SparkSession, inputDir: String, outputDir: String,
      checkpointDir: String, codebook: Codebook,
      schema: org.apache.spark.sql.types.StructType,
      compactEvery: Int = 0,
      targetRecordsPerFile: Long = 1L << 20): StreamingQuery = {
    val stream = spark.readStream.schema(schema).parquet(inputDir)
    val writer = assignStream(stream, codebook)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
    if (compactEvery <= 0)
      // plain file sink: keeps the _spark_metadata exactly-once log
      writer.format("parquet").option("path", outputDir).start()
    else
      writer.foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("append").parquet(outputDir)
        if (batchId % compactEvery == (compactEvery - 1)) {
          graft.io.Layout.compactInPlace(spark, outputDir, "doc_id",
            targetRecordsPerFile)
          ()
        }
      }.start()
  }

  /** Event-time windowed aggregation with watermark over the events stream
    * (the streaming analog of the `events_window` batch query).
    */
  def windowedEventCounts(stream: DataFrame,
      window: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
}
