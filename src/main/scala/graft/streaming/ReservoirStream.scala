package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.pipeline.Sampling

/** Structured-Streaming reservoir maintenance: a uniform k-sample per
  * group, kept current as batches arrive, WITHOUT re-reading history —
  * the store holds each group's k smallest md5 ranks and a micro-batch
  * merges its own k-min rows in (min-k over a fixed total order is
  * associative AND idempotent, the strongest merge law in the sketch
  * family: even a double-applied batch cannot corrupt the store —
  * the version discipline here is belt-and-braces, not load-bearing
  * as it is for the sum/fold sketches).
  */
object ReservoirStream {

  def processBatch(batch: DataFrame, batchId: Long, storeDir: String,
      k: Int, groupCols: Seq[String], idCol: String, seed: Long): Unit = {
    val spark = batch.sparkSession
    val bs = Sampling.hashReservoir(batch, k, groupCols, idCol, seed)
    val prev = latest(spark, storeDir, bs.schema, batchId)
    // merge = k-min of the union; ranks ride along so no re-hash
    import org.apache.spark.sql.expressions.Window
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(groupCols.map(col): _*))
      .orderBy(col("h").asc, col(idCol).asc)
    val merged = bs.unionByName(prev).distinct()
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k).drop("__rn")
    merged.coalesce(1).write.mode("overwrite")
      .parquet(s"$storeDir/version=$batchId")
    vacuum(spark, storeDir, batchId)
  }

  def start(spark: SparkSession, inputDir: String, storeDir: String,
      checkpointDir: String, schema: StructType, k: Int,
      groupCols: Seq[String], idCol: String = "doc_id", seed: Long = 42L,
      maxFilesPerTrigger: Int = 1): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, storeDir, k, groupCols, idCol, seed)
      }.start()

  /** The current reservoir (max version on disk; empty with the right
    * schema when the store doesn't exist yet). */
  def reservoir(spark: SparkSession, storeDir: String,
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
