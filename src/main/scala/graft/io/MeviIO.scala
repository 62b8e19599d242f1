package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.{ByteBuffer, ByteOrder}

/** Readers/writers for every external format the reference consumes or
  * emits (SURVEY §2.1). TSV artifacts become schema-explicit csv reads;
  * sharded write + rank-0 merge (MEVI/main_models.py:190-329 `LogFile`
  * family) is native `df.write` (Spark shards) — no merge step exists here
  * by construction.
  */
object MeviIO {

  /** The reference reads/writes raw `'\t'.join(...)` TSV with NO quoting
    * (pandas `sep='\t'` + naive split consumers): a field starting with a
    * quote char must pass through literally, and embedded tabs/newlines are
    * simply not representable in the format. CSV-quote handling must be
    * DISABLED on both sides or Spark would (a) mis-parse reference files
    * whose fields start with '"' and (b) emit quoted fields the reference's
    * split-based parsers can't read. NUL as the quote char ⇒ never matches.
    */
  private val NoQuote = "\u0000"

  private def tsvReader(spark: SparkSession) =
    spark.read.option("sep", "\t").option("quote", NoQuote)

  private def tsvWriter(df: DataFrame) =
    df.write.option("sep", "\t").option("quote", NoQuote)
      .option("escape", NoQuote).option("emptyValue", "")

  /** S1: corpus TSV `(oldid, title, content)` — MEVI/main_utils.py:190-198;
    * missing title/content → '' (fillna semantics). */
  val corpusSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("content", StringType, nullable = true)))

  def readCorpusTsv(spark: SparkSession, path: String): DataFrame =
    tsvReader(spark).schema(corpusSchema).csv(path)
      .na.fill("", Seq("title", "content"))

  def writeCorpusTsv(df: DataFrame, path: String): Unit =
    tsvWriter(df.select(col("doc_id"), col("title"), col("content")))
      .mode("overwrite").csv(path)

  /** S2: query–doc pair TSV `(query, oldid)` — MEVI/main_utils.py:119-126. */
  val pairSchema: StructType = StructType(Seq(
    StructField("query", StringType, nullable = false),
    StructField("doc_id", LongType, nullable = false)))

  def readPairsTsv(spark: SparkSession, path: String): DataFrame =
    tsvReader(spark).schema(pairSchema).csv(path).na.drop()

  def writePairsTsv(df: DataFrame, path: String): Unit =
    tsvWriter(df.select(col("query"), col("doc_id")))
      .mode("overwrite").csv(path)

  /** Empty/null csv field → empty ARRAY, never [null] (split("") yields
    * [""] which a long-cast turns into [null] — a spurious element). */
  private def csvToLongArray(c: Column): Column =
    when(c.isNull || length(c) === 0, array().cast("array<long>"))
      .otherwise(split(c, ",").cast("array<long>"))

  private def csvToFloatArray(c: Column): Column =
    when(c.isNull || length(c) === 0, array().cast("array<float>"))
      .otherwise(split(c, ",").cast("array<float>"))

  /** S3: multi-label dev TSV `(query, "id1,id2,...")` with the comma-split
    * converter — MEVI/main_utils.py:237,271-278. */
  def readDevTsv(spark: SparkSession, path: String): DataFrame =
    tsvReader(spark)
      .schema(StructType(Seq(
        StructField("query", StringType, nullable = false),
        StructField("raw_ids", StringType, nullable = true))))
      .csv(path)
      .select(col("query"), csvToLongArray(col("raw_ids")).as("doc_ids"))

  /** S5: NQ biencoder JSON — list of `{question, positive_ctxs:
    * [{passage_id, …}]}` (dataprocess/NQ_dpr/preprocess.py:38-48). One
    * (query, doc_id) row per positive context, with the reference's
    * `passage_id − 1` re-base (J9, preprocess.py:42-48).
    */
  def readBiencoderJson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(col("question").as("query"),
        explode(col("positive_ctxs")).as("ctx"))
      .select(col("query"),
        (col("ctx.passage_id").cast("long") - 1).as("doc_id"))

  /** S10/S11: ranked-result TSV `query \t \t preds_csv \t scores_csv` —
    * writer MEVI/main_models.py:4227-4235, parser template
    * MEVI/ensemble_marco.py:85-111 `{query:0, pred:2, score:3}`. */
  def readRankedTsv(spark: SparkSession, path: String): DataFrame =
    tsvReader(spark)
      .schema(StructType(Seq(
        StructField("query", StringType, nullable = false),
        StructField("_unused", StringType, nullable = true),
        StructField("preds_csv", StringType, nullable = true),
        StructField("scores_csv", StringType, nullable = true))))
      .csv(path)
      .select(col("query"),
        csvToLongArray(col("preds_csv")).as("preds"),
        csvToFloatArray(col("scores_csv")).as("scores"))

  def writeRankedTsv(df: DataFrame, path: String): Unit =
    tsvWriter(df.select(col("query"), lit("").as("_pad"),
        concat_ws(",", col("preds")).as("preds_csv"),
        concat_ws(",", col("scores")).as("scores_csv")))
      .mode("overwrite").csv(path)

  /** S6: fixed-record binary float32 matrix (docemb.bin / query_emb.bin,
    * row-major little-endian — MEVI/generate.py:87-88, np.memmap layout).
    * Row ids are the file-order positions, matching the reference's
    * implicit row-index = doc-id contract. `binaryRecords` keeps records
    * aligned to `4*dim` bytes; zipWithIndex is deterministic per file order.
    */
  def readFloatMatrix(spark: SparkSession, path: String, dim: Int): DataFrame = {
    val rdd = spark.sparkContext.binaryRecords(path, 4 * dim)
      .zipWithIndex()
      .map { case (bytes, idx) =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val arr = new Array[Float](dim)
        var i = 0
        while (i < dim) { arr(i) = buf.getFloat(i * 4); i += 1 }
        org.apache.spark.sql.Row(idx, arr.toSeq)
      }
    spark.createDataFrame(rdd,
      StructType(Seq(
        StructField("row_id", LongType, nullable = false),
        StructField("vec", ArrayType(FloatType, containsNull = false), nullable = false))))
  }

  /** S6 writer: one row-major little-endian float32 file in the input's
    * current row order (callers sort first — row index IS the id). This is
    * a driver-side EXPORT for np.memmap interop (the reference writes the
    * file single-node too, MEVI/generate.py:87-88); the scale-path tensor
    * sink is Parquet (S9, by design). Streams row batches — never holds
    * the matrix in driver memory.
    */
  def writeFloatMatrix(df: DataFrame, path: String, dim: Int,
      vecCol: String = "vec"): Unit = {
    val out = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(path))
    try {
      val it = df.select(col(vecCol)).toLocalIterator()
      val buf = ByteBuffer.allocate(4 * dim).order(ByteOrder.LITTLE_ENDIAN)
      while (it.hasNext) {
        val vec = it.next().getSeq[Float](0)
        require(vec.length == dim, s"row width ${vec.length} != $dim")
        buf.clear()
        vec.foreach(buf.putFloat)
        out.write(buf.array())
      }
    } finally out.close()
  }

  /** Int64 variant (token matrices — prepare_passage_tokenized.py:83-86). */
  def readLongMatrix(spark: SparkSession, path: String, width: Int): DataFrame = {
    val rdd = spark.sparkContext.binaryRecords(path, 8 * width)
      .zipWithIndex()
      .map { case (bytes, idx) =>
        val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        val arr = new Array[Long](width)
        var i = 0
        while (i < width) { arr(i) = buf.getLong(i * 8); i += 1 }
        org.apache.spark.sql.Row(idx, arr.toSeq)
      }
    spark.createDataFrame(rdd,
      StructType(Seq(
        StructField("row_id", LongType, nullable = false),
        StructField("tokens", ArrayType(LongType, containsNull = false), nullable = false))))
  }
}
