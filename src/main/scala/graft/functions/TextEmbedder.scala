package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** V1 stand-in encoder: deterministic hashing bag-of-words embedding.
  *
  * The reference's document/query encoder is an opaque trained T5/BERT
  * tower (MEVI/document_encoder.py:104-126) that the engine treats as a
  * pluggable `text → ARRAY<FLOAT>` stage (SURVEY §2.8 V1). This is the
  * self-contained default plug: token → md5 bucket → counts → L2-normalized
  * dense vector. Fully relational (explode → count → dense assemble), so it
  * scales like a word-count and is oracle-reproducible; a real encoder
  * replaces it via the same mapPartitions contract without touching
  * downstream operators.
  */
object TextEmbedder {

  /** (idCol, vec ARRAY<FLOAT> of length dim, L2-normalized). */
  def hashEmbed(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dim: Int = 64): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("__t"))
      .select(col(idCol), pmod(Dedup.md5Hash32(col("__t")), lit(dim.toLong)).as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val dense = counts
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__c")))).as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("double")).as("__raw"))
    dense.select(col(idCol),
      transform(col("__raw"), x =>
        (x / sqrt(aggregate(col("__raw"), lit(0.0), (acc, v) => acc + v * v)))
          .cast("float")).as("vec"))
  }
}
