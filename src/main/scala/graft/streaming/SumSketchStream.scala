package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming maintenance for the SUM-merged sketch family —
  * count-min counter tables and HDR quantile histograms share one merge
  * law (cell-wise count addition), so one stream twin serves both: each
  * micro-batch builds its own sketch and ADDS it into the store.
  * Addition is exact and associative, which makes the maintained store
  * bit-identical to a batch build over the union — the strongest parity
  * class (HLL shares it via max; MG does not and gets its own
  * order-sensitive fold in [[MgStream]]).
  *
  * Sum-merge is NOT idempotent, so [[SketchStream]]'s versioned-snapshot
  * discipline is load-bearing: a retried batch overwrites its own
  * version instead of double-adding.
  *
  * `build` maps a raw micro-batch to sketch rows (e.g.
  * `Sketches.cmsCounters(_, "token", 4, 256)` or
  * `Sketches.hdrHistogram(_, "cents", Seq("flag"), 5)`); `keyCols` are
  * the sketch's cell coordinates (`row`,`col` / group cols + `bucket`);
  * `countCol` is the summed count column. */
object SumSketchStream {

  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      build: DataFrame => DataFrame, keyCols: Seq[String],
      countCol: String): Unit = {
    val spark = batch.sparkSession
    val bs = build(batch)
    val prev = latest(spark, storeDir, bs.schema, batchId)
    val merged = bs.unionByName(prev)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(countCol)).as(countCol))
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/version=$batchId")
    vacuum(spark, storeDir, batchId)
  }

  def start(spark: SparkSession, inputDir: String, storeDir: String,
      checkpointDir: String, schema: StructType,
      build: DataFrame => DataFrame, keyCols: Seq[String],
      countCol: String, maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, build, keyCols, countCol)
      }.start()

  /** The current sketch table (max version on disk; empty with the
    * right schema when the store doesn't exist yet). */
  def sketch(spark: SparkSession, storeDir: String,
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
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
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
