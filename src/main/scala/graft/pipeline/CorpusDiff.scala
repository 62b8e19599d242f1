package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diffing for incremental re-indexing — the step a 100 TB
  * pipeline runs between corpus versions so only CHANGED documents are
  * re-tokenized/re-embedded/re-assigned. The reference's drop-rate
  * experiments rebuild everything and then incrementally assign the
  * held-out docs against the frozen codebook
  * (dataprocess/msmarco_passage/gen_sampled_to_full.py:61-88); this
  * operator supplies the other half: deciding WHICH docs need that
  * treatment at all.
  *
  * Comparison is by content fingerprint (md5 of the text), not text
  * equality, so the join ships 16-byte digests instead of document
  * bodies. One full outer hash join on the id — the minimal shuffle for
  * an arbitrary-order snapshot pair; with both snapshots bucketed by id
  * (io.Bucketing) it runs shuffle-free.
  */
object CorpusDiff {

  /** (idCol, change) for every id whose state differs between snapshots:
    * `added` (only in `current`), `removed` (only in `previous`),
    * `changed` (both, different fingerprint). Unchanged ids are dropped —
    * the output is work-list-sized, not corpus-sized.
    */
  def diff(previous: DataFrame, current: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val prev = previous.select(col(idCol).as("__id"),
      md5(col(textCol).cast("binary")).as("__h_prev"))
    val cur = current.select(col(idCol).as("__id"),
      md5(col(textCol).cast("binary")).as("__h_cur"))
    prev.join(cur, Seq("__id"), "full_outer")
      .withColumn("change",
        when(col("__h_prev").isNull, lit("added"))
          .when(col("__h_cur").isNull, lit("removed"))
          .when(col("__h_prev") =!= col("__h_cur"), lit("changed")))
      .where(col("change").isNotNull)
      .select(col("__id").as(idCol), col("change"))
  }
}
