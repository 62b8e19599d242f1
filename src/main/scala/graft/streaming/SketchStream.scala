package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.pipeline.Sketches

/** Structured-Streaming sketch maintenance: arriving batches fold into a
  * persisted HLL register store by MAX-merge — cardinality monitoring
  * that never re-reads history (the whole point of a mergeable sketch:
  * the store is the sketch, a few rows per grain, and a micro-batch
  * costs one scan of the batch plus a merge against those rows).
  *
  * Store discipline is [[IncrementalGraph]]'s versioned-snapshot rule:
  * each batch OVERWRITES `version=<batchId>`, readers take the max
  * version written BEFORE their batch, and versions behind the retry
  * horizon are vacuumed — a retried batch replaces its own output
  * instead of double-merging (max-merge is idempotent anyway, but the
  * discipline keeps torn writes unreadable).
  */
object SketchStream {

  /** One micro-batch step, exposed for tests: registers of `batch`
    * max-merged into the store. */
  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      keyCol: String, groupCols: Seq[String], m: Int): Unit = {
    val spark = batch.sparkSession
    val regs = Sketches.hllRegisters(batch, keyCol, groupCols, m)
    val prev = latest(spark, storeDir, regs.schema, batchId)
    val merged = Sketches.hllMerge(regs.unionByName(prev),
      groupCols :+ "bucket")
    // a register store is tiny (grains × m rows) — one file per version
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/version=$batchId")
    vacuum(spark, storeDir, batchId)
  }

  /** Run the stream: file-source micro-batches → per-batch register
    * merge (AvailableNow; the store is readable between and after runs
    * via [[registers]]). */
  def start(spark: SparkSession, inputDir: String, storeDir: String,
      checkpointDir: String, schema: StructType, keyCol: String,
      groupCols: Seq[String], m: Int,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, keyCol, groupCols, m)
      }.start()

  /** The current register table (max version on disk; empty with the
    * right schema when the store doesn't exist yet). */
  def registers(spark: SparkSession, storeDir: String,
      schema: StructType): DataFrame =
    latest(spark, storeDir, schema, Long.MaxValue)

  private def latest(spark: SparkSession, dir: String, schema: StructType,
      beforeBatch: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions =
      if (!fs.exists(path)) Array.empty[Long]
      else fs.listStatus(path).map(_.getPath.getName)
        .filter(_.startsWith("version="))
        .map(_.stripPrefix("version=").toLong)
        .filter(_ < beforeBatch)
    if (versions.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema)
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
