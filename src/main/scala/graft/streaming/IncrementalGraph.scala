package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.index.Codebook
import graft.search.KnnGraph

/** Structured-Streaming k-NN-graph maintenance: arriving (doc_id, vec)
  * batches are inserted into the persisted graph with
  * [[graft.search.KnnGraph.insert]] — each arrival walks the current
  * graph for its edges, touched nodes re-rank, untouched lists carry
  * bit-identically. The graph and the growing corpus live as parquet
  * stores, rewritten per batch through the same idempotent
  * `batch=<id>`-partition discipline as [[IncrementalDedup]]: a retried
  * batch replaces its own output instead of double-inserting.
  *
  * The IVF cells that seed each walk stay FROZEN (the incremental-index
  * posture of [[IncrementalIndexer]]): arrivals are assigned to the
  * existing coarse codebook; codebook refresh remains a batch job.
  */
object IncrementalGraph {

  /** One micro-batch step, exposed for tests. Reads the current graph +
    * corpus + cell stores, inserts the batch, and OVERWRITES all three
    * with versioned snapshots (`version=<batchId>`); readers take the max
    * version — torn writes from a crashed attempt are superseded, never
    * unioned.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
      graphDir: String, corpusDir: String, cellsDir: String,
      codebook: Codebook, k: Int, beam: Int = 16, rounds: Int = 2,
      nprobe: Int = 2, perCell: Int = 4, compactEvery: Int = 0,
      targetRecordsPerFile: Long = 1L << 20): Unit = {
    import org.apache.spark.sql.types.{StructType, StructField, LongType, IntegerType}
    val arrivals = batch.select(col("doc_id"), col("vec")).localCheckpoint()
    if (arrivals.isEmpty) return
    // read only snapshots written BEFORE this batch: a RETRY must not
    // consume (or lazily read under the overwrite of) its own previous
    // half-written version — the IncrementalDedup store discipline
    val docs = latest(spark, corpusDir, arrivals.schema, batchId)
    val graph = latest(spark, graphDir, null, batchId)
    val cellSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("cell", IntegerType)))
    val prevCells = latest(spark, cellsDir, cellSchema, batchId)
    val bc = spark.sparkContext.broadcast(codebook)
    val cellUdf = udf { (vec: Array[Float]) => bc.value.assign(vec)(0) }
    // only ARRIVALS pay the assignment scan: the coarse codebook is
    // frozen, so existing assignments never change — they persist as
    // their own versioned store instead of being recomputed O(corpus)
    // every micro-batch
    val newCells = arrivals
      .select(col("doc_id"), cellUdf(col("vec")).as("cell"))
    val allCells = prevCells.unionByName(newCells)
    val merged =
      if (graph == null || graph.isEmpty) {
        // cold start — including graph-empty-but-corpus-NONEMPTY (an
        // earlier batch of singleton-cell docs yields a legitimately
        // empty graph): build over everything known, not the arrivals
        // alone, or the existing corpus would be excluded permanently
        KnnGraph.build(docs.unionByName(arrivals), allCells, k, rounds)
      } else {
        KnnGraph.insert(graph, arrivals, docs, prevCells, codebook, k,
          beam, rounds, nprobe, perCell)
      }
    // every `compactEvery` batches the fresh snapshots are written
    // key-clustered with a bounded file count (Layout.compact's write
    // shape) and versions older than the retry horizon are vacuumed —
    // without this the store grows one ~shuffle-partition-sized file set
    // per micro-batch forever
    val compactThis = compactEvery > 0 &&
      batchId % compactEvery == (compactEvery - 1)
    def snap(df: DataFrame, dir: String, sortKey: String): Unit = {
      val target = s"$dir/version=$batchId"
      if (compactThis) {
        val rows = df.count()
        val nFiles = math.max(1,
          math.ceil(rows.toDouble / targetRecordsPerFile).toInt)
        df.repartitionByRange(nFiles, col(sortKey))
          .sortWithinPartitions(sortKey)
          .write.mode("overwrite")
          .option("maxRecordsPerFile", targetRecordsPerFile)
          .parquet(target)
      } else df.write.mode("overwrite").parquet(target)
    }
    snap(merged, graphDir, "src")
    snap(docs.unionByName(arrivals), corpusDir, "doc_id")
    snap(allCells, cellsDir, "doc_id")
    if (compactThis)
      Seq(graphDir, corpusDir, cellsDir).foreach(d =>
        vacuum(spark, d, batchId))
  }

  /** Drop `version=<n>` snapshots with n < `currentBatch − 1`. The
    * previous version stays: a RETRY of batch B (or of B+1 before its
    * write lands) reads only versions `< B`, so the newest superseded
    * snapshot is still inside the retry horizon — everything older is
    * unreachable by the `latest` rule and safe to delete. */
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

  /** Read the highest `version=<n>` snapshot under `dir` with
    * n < `beforeBatch` (empty frame with `schema` when none exist; null
    * when no schema fallback is available and the dir is empty). */
  private def latest(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType,
      beforeBatch: Long): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions =
      if (!fs.exists(path)) Array.empty[Long]
      else fs.listStatus(path).map(_.getPath.getName)
        .filter(_.startsWith("version="))
        .map(_.stripPrefix("version=").toLong)
        .filter(_ < beforeBatch)
    if (versions.isEmpty) {
      if (schema == null) null
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else spark.read.parquet(s"$dir/version=${versions.max}")
  }

  /** Wire the stream: parquet (doc_id, vec) arrivals under `inputDir`,
    * graph snapshots under `graphDir`, corpus snapshots under
    * `corpusDir`, frozen-codebook cell assignments under `cellsDir`. */
  def start(spark: SparkSession, inputDir: String, graphDir: String,
      corpusDir: String, cellsDir: String, checkpointDir: String,
      codebook: Codebook, schema: org.apache.spark.sql.types.StructType,
      k: Int, beam: Int = 16, rounds: Int = 2, nprobe: Int = 2,
      perCell: Int = 4, compactEvery: Int = 0,
      targetRecordsPerFile: Long = 1L << 20): StreamingQuery = {
    spark.readStream.schema(schema).parquet(inputDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, graphDir, corpusDir, cellsDir,
          codebook, k, beam, rounds, nprobe, perCell, compactEvery,
          targetRecordsPerFile)
      }
      .start()
  }
}
