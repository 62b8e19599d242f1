package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `BINARY` payloads with typed
  * metadata, processed in batch-shaped `mapPartitions` stages (the JVM
  * analog of Arrow-batched pandas UDFs).
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs in this
  * container): `decodeStub` derives a deterministic fake feature vector and
  * fake dimensions from the payload bytes. Everything around it — schema,
  * batch iteration, partitioning, output shape — is the real scale path: on
  * a cluster the stub body is replaced by a codec call, nothing else moves.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("media_type", StringType, nullable = false)))

  /** Wrap a text corpus into fake media rows (payload = utf-8 bytes).
    * `mediaType` is any Column expression over the input (defaults to a
    * constant, so any (idCol, textCol) frame works — no hidden column
    * dependencies). */
  def asMedia(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      mediaType: org.apache.spark.sql.Column = lit("raw/text")): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      mediaType.as("media_type"))

  /** Metadata extraction — pure column expressions (no decode needed):
    * payload size + content hash. */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"),
      col("media_type"))

  private val featureDim = 16

  /** STUB decode + feature extraction: a real implementation calls an image
    * codec per batch here; the stub derives `featureDim` floats and fake
    * (width, height) deterministically from payload bytes so the plumbing
    * is testable end-to-end. Batch shape: one partition = one iterator
    * pass, no per-row JNI/codec setup — the layout a codec needs.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        // ??? real codec goes here; deterministic fake below
        val width = 1 + (math.abs(payload.length * 31 + 7) % 1024)
        val height = 1 + (math.abs(payload.length * 17 + 3) % 1024)
        val feats = Array.tabulate(featureDim) { i =>
          var acc = 0L
          var j = i
          while (j < payload.length) { acc = acc * 131 + (payload(j) & 0xff); j += featureDim }
          ((acc % 1000).toFloat) / 1000.0f
        }
        Row(id, width, height, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB frame sampling: every `stride`-th chunk of the payload becomes a
    * "frame" row — the explode shape of real video frame-sampling. A real
    * pipeline materializes `substring(payload, i·stride+1, stride)` as the
    * frame bytes; the stub emits only per-frame metadata, computed
    * arithmetically so no payload bytes are copied per frame (the explode
    * over frame indices — the part that matters for the plan shape — is
    * real). A payload yields ceil(len/stride) frames: the last one is the
    * partial tail (frame_len < stride) — truncating to full frames would
    * silently drop up to stride−1 trailing bytes per payload.
    */
  def frameSample(media: DataFrame, stride: Int = 64): DataFrame =
    media.where(length(col("payload")) > 0)
      .select(col("doc_id"), length(col("payload")).as("__len"),
        explode(sequence(lit(0),
          ((length(col("payload")) + lit(stride - 1)) / stride).cast("int") - 1))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        least(lit(stride.toLong),
          col("__len").cast("long") - col("frame_idx") * stride).as("frame_len"))
}
