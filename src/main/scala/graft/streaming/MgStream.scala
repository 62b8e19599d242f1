package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.pipeline.Sketches

/** Structured-Streaming Misra-Gries maintenance: arriving batches fold
  * into a persisted heavy-hitter store by the MG offset merge — "which
  * tokens are trending" that never re-reads history. Each micro-batch
  * costs one scan of the batch plus a merge against ≤ k store rows; the
  * error ledger (`mg_err`) accumulates exactly as the batch-mode
  * [[Sketches.mgMerge]] fold documents, so
  * `mg_cnt ≤ true ≤ mg_cnt + mg_err` keeps holding across any number of
  * micro-batches.
  *
  * Store discipline is [[SketchStream]]'s versioned-snapshot rule: each
  * batch OVERWRITES `version=<batchId>`, readers take the max version
  * written BEFORE their batch, and stale versions are vacuumed — a
  * retried batch replaces its own output instead of double-merging
  * (unlike HLL max-merge, the MG fold is NOT idempotent, so this
  * discipline is load-bearing here, not just tidy).
  */
object MgStream {

  /** One micro-batch step, exposed for tests: the batch's own MG sketch
    * merged into the store. Store and batch carry identical group
    * columns, so each side is tagged as its own input sketch for the
    * merge's per-sketch error ledger. */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      keyCol: String, groupCols: Seq[String], k: Int): Unit = {
    val spark = batch.sparkSession
    val bs = Sketches.mgSketch(batch, keyCol, groupCols, k)
      .withColumn("__src", lit("batch"))
    val prev = latest(spark, storeDir, bs.schema, batchId)
      .withColumn("__src", lit("store"))
    val merged = Sketches.mgMerge(bs.unionByName(prev), keyCol, groupCols, k)
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/version=$batchId")
    vacuum(spark, storeDir, batchId)
  }

  /** Run the stream: file-source micro-batches → per-batch MG merge
    * (AvailableNow; the store is readable between and after runs via
    * [[sketch]]). */
  def start(spark: SparkSession, inputDir: String, storeDir: String,
      checkpointDir: String, schema: StructType, keyCol: String,
      groupCols: Seq[String], k: Int,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, keyCol, groupCols, k)
      }.start()

  /** The current heavy-hitter table (max version on disk; empty with
    * the right schema when the store doesn't exist yet). */
  def sketch(spark: SparkSession, storeDir: String,
      schema: StructType): DataFrame =
    latest(spark, storeDir, schema, Long.MaxValue)

  private def latest(spark: SparkSession, dir: String, schema: StructType,
      beforeBatch: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val noSrc = StructType(schema.fields.filterNot(_.name == "__src"))
    val versions =
      if (!fs.exists(path)) Array.empty[Long]
      else fs.listStatus(path).map(_.getPath.getName)
        .filter(_.startsWith("version="))
        .map(_.stripPrefix("version=").toLong)
        .filter(_ < beforeBatch)
    if (versions.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], noSrc)
    else spark.read.parquet(s"$dir/version=${versions.max}")
  }

  private def vacuum(spark: SparkSession, dir: String,
      currentBatch: Long): Unit = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      fs.listStatus(path).map(_.getPath)
        .filter(_.getName.startsWith("version="))
        .filter(_.getName.stripPrefix("version=").toLong < currentBatch - 1)
        .foreach(p => fs.delete(p, true))
  }
}
