package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.pipeline.Dedup

/** Streaming near-duplicate screening: new documents arriving on a stream
  * are checked against the ACCUMULATED corpus before admission — the
  * shape a continuously-ingesting training-data pipeline needs
  * (dedup-at-the-door instead of periodic full-corpus sweeps).
  *
  * Per micro-batch (foreachBatch — the store is both read and appended
  * within one batch, which a pure stream-stream join cannot express):
  *   1. MinHash signatures + LSH band keys for the batch (the same
  *      `Dedup` primitives and constants as the batch path, so a document
  *      hashes identically in both worlds).
  *   2. Band keys joined against the persisted signature store →
  *      candidate (new, existing) pairs, with the batch path's band-bucket
  *      cap so a degenerate stored band can't make later batches
  *      quadratic.
  *   3. Pairs whose signature agreement ≥ `simThreshold` (the MinHash
  *      Jaccard estimate — the store holds signatures, not text; exact
  *      confirmation of flagged pairs is a downstream batch join) are
  *      appended to `matchesDir`; the batch's signatures are appended to
  *      the store so later batches dedup against them.
  *
  * The store carries one row per (doc, band): linear in corpus size; at
  * scale it lives bucketed by `band_key` (graft.io.Bucketing) so step 2
  * is a co-located join.
  */
object IncrementalDedup {

  /** (doc_id, band_key, sig) rows for one batch of (doc_id, text) — the
    * banding is Dedup.bandKeys, the SAME definition the batch path uses. */
  private[streaming] def bandedSignatures(docs: DataFrame,
      numPerms: Int, rowsPerBand: Int): DataFrame = {
    val sigs = Dedup.minhashSignatures(docs, numPerms = numPerms)
    sigs.select(col("doc_id"),
      Dedup.bandKeys(col("sig"), rowsPerBand).as("band_key"),
      col("sig"))
  }

  /** Matches of `banded` (a batch's banded signatures) against the stored
    * signatures: (a = new doc, b = stored doc, sim = fraction of agreeing
    * signature components, the MinHash Jaccard estimate).
    */
  private[streaming] def matchesAgainst(banded: DataFrame, store: DataFrame,
      simThreshold: Double, maxBucket: Int): DataFrame = {
    val ok = store.groupBy("band_key").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucket).select("band_key")
    val capped = store.join(ok, Seq("band_key"))
    val cands = banded.select(col("doc_id").as("a"), col("band_key"))
      .join(capped.select(col("doc_id").as("b"), col("band_key")),
        Seq("band_key"))
      .select("a", "b").distinct()
    val sa = banded.select(col("doc_id").as("a"), col("sig").as("sig_a"))
      .distinct()
    val sb = store.select(col("doc_id").as("b"), col("sig").as("sig_b"))
      .distinct()
    val agree = size(filter(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
    cands.join(sa, Seq("a")).join(sb, Seq("b"))
      .select(col("a"), col("b"),
        (agree.cast("double") / size(col("sig_a"))).as("sim"))
      .where(col("sim") >= simThreshold)
  }

  /** Matches WITHIN one batch (a < b): two near-dups arriving in the same
    * micro-batch — or the whole backlog in batch 0 — would never meet
    * through the store (both are appended after matching), so the batch
    * must also be banded against itself. */
  private[streaming] def intraBatchMatches(banded: DataFrame,
      simThreshold: Double, maxBucket: Int): DataFrame = {
    val ok = banded.groupBy("band_key").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucket).select("band_key")
    val capped = banded.select(col("doc_id"), col("band_key"))
      .join(ok, Seq("band_key"))
    val cands = capped.select(col("doc_id").as("a"), col("band_key"))
      .join(capped.select(col("doc_id").as("b"), col("band_key")),
        Seq("band_key"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
    val s = banded.select(col("doc_id"), col("sig")).distinct()
    val agree = size(filter(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
    cands
      .join(s.select(col("doc_id").as("a"), col("sig").as("sig_a")), Seq("a"))
      .join(s.select(col("doc_id").as("b"), col("sig").as("sig_b")), Seq("b"))
      .select(col("a"), col("b"),
        (agree.cast("double") / size(col("sig_a"))).as("sim"))
      .where(col("sim") >= simThreshold)
  }

  /** One micro-batch step: emit matches (vs the store AND within the
    * batch), then add the batch's signatures to the store. Exposed for
    * tests; [[start]] wires it into foreachBatch.
    *
    * IDEMPOTENT under foreachBatch's at-least-once replays: both sinks
    * are written as `batch=<id>` partition directories in OVERWRITE mode,
    * so a retried batch replaces its own previous (possibly partial)
    * output instead of appending it twice — a duplicated store would
    * double every band bucket (pushing hot bands over `maxBucket`) and
    * re-emit every later match.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      storeDir: String, matchesDir: String, numPerms: Int = 8,
      rowsPerBand: Int = 4, simThreshold: Double = 0.75,
      maxBucket: Int = 1000): Unit = {
    // localCheckpoint: the banded frame feeds the two match joins and the
    // store write — compute the signature pipeline once
    val banded = bandedSignatures(batch, numPerms, rowsPerBand)
      .localCheckpoint()
    // Hadoop FS, not java.io.File: the store lives on HDFS/S3 at scale
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val intra = intraBatchMatches(banded, simThreshold, maxBucket)
    val matches = if (fs.exists(storePath)) {
      // exclude this batch's own partition from the store view: a RETRY
      // must not match the batch against its own half-written signatures.
      // The schema is given EXPLICITLY (the banded frame's + the batch
      // partition column): schema inference would open parquet footers —
      // including a torn file in this batch's own half-written partition,
      // which the batch filter prunes only at planning time.
      val storeSchema = banded.schema
        .add(org.apache.spark.sql.types.StructField("batch",
          org.apache.spark.sql.types.LongType, nullable = true))
      val store = spark.read.schema(storeSchema).parquet(storeDir)
        .where(col("batch") =!= batchId)
      matchesAgainst(banded, store, simThreshold, maxBucket).unionByName(intra)
    } else intra
    matches.write.mode("overwrite").parquet(s"$matchesDir/batch=$batchId")
    banded.write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
  }

  /** Start the stream: parquet (doc_id, text) arrivals under `inputDir`,
    * near-dup matches appended to `matchesDir`, signatures accumulated at
    * `storeDir`. */
  def start(spark: SparkSession, inputDir: String, storeDir: String,
      matchesDir: String, checkpointDir: String,
      schema: org.apache.spark.sql.types.StructType,
      numPerms: Int = 8, rowsPerBand: Int = 4,
      simThreshold: Double = 0.75, maxBucket: Int = 1000): StreamingQuery = {
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, storeDir, matchesDir,
          numPerms, rowsPerBand, simThreshold, maxBucket)
      }
      .start()
  }
}
