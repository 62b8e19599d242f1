package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQ8 scalar quantization — faiss's `SQ8` index family (the third
  * compression mode next to PQ/RQ, `index_factory("SQ8")`): each dimension
  * is linearly mapped to an 8-bit code against per-dimension [min, max]
  * trained on the corpus. 4× smaller than float32 with near-lossless
  * recall for well-spread dims — the cheapest way to keep 100 TB of
  * embeddings scannable.
  *
  * Everything here is plain DataFrame algebra (posexplode + per-dim
  * min/max + a broadcast stats join), so the oracle is fully static SQL —
  * no trained literals needed. Per-dim min/max are order-insensitive
  * (exact regardless of aggregation order), and the quantize/dequantize
  * arithmetic is mirrored expression-for-expression in the oracle.
  *
  * Scale: stats are one map-side-combined aggregation to `dim` rows;
  * quantization is a broadcast join + per-row arithmetic, zero shuffle
  * beyond the explode/reassemble pair (and an engine embedding vectors at
  * scale would fuse this into its write path).
  */
object ScalarQuantizer {

  /** Per-dimension corpus stats: (pos, mn, mx) — `dim` rows. */
  def fitStats(df: DataFrame, vecCol: String): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))

  private def codeExpr(x: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0.0))
      .otherwise(least(lit(255.0), greatest(lit(0.0),
        floor((x - mn) * 255.0 / (mx - mn) + lit(0.5)))))
      .cast("int")

  /** (idCol, codes ARRAY<INT>, err DOUBLE): quantize each dim to its
    * 8-bit code, dequantize, and report the round-trip L2 error — the
    * quantization-quality diagnostic, computed as a sequential
    * position-ordered fold (engine-replayable).
    */
  def roundtrip(df: DataFrame, stats: DataFrame,
      idCol: String = "doc_id", vecCol: String = "vec"): DataFrame = {
    val pe = df
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("pos", "xf")))
      .withColumn("x", col("xf").cast("double"))
      .join(broadcast(stats), Seq("pos"))
      .withColumn("code", codeExpr(col("x"), col("mn"), col("mx")))
      .withColumn("deq",
        col("mn") + col("code") * (col("mx") - col("mn")) / lit(255.0))
    pe.groupBy(col(idCol))
      .agg(array_sort(collect_list(
        struct(col("pos"), col("code"), col("x"), col("deq")))).as("a"))
      .select(col(idCol),
        transform(col("a"), s => s.getField("code")).as("codes"),
        sqrt(aggregate(col("a"), lit(0.0), (acc, s) => {
          val d = s.getField("x") - s.getField("deq")
          acc + d * d
        })).as("err"))
  }
}
