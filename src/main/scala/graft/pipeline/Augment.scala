package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data augmentation, deterministic re-expression of the
  * reference's seeded random variants:
  *
  * P5 — query char-span augmentation (MEVI/main_utils.py:89-101): random
  * substrings of the query text.
  * P6 — doc window augmentation (prepare_origin.py:99-112): N random
  * 64-word windows per doc, N scaled by doc length.
  * P10 — corpus subsampling + contiguous re-id + artifact propagation
  * (sampled_corpus.py:8-152).
  *
  * Randomness = md5 rank hashes, so every row's augmentation is a pure
  * function of its content — reproducible across engines and partitionings.
  */
object Augment {

  private def h(parts: Column*): Column =
    Dedup.md5Hash60(concat_ws("|", parts: _*))

  /** P5: k deterministic char spans per query, span length in
    * [minLen, maxLen], clipped to the text. */
  def querySpans(queries: DataFrame, queryCol: String = "query",
      k: Int = 2, minLen: Int = 8, maxLen: Int = 24): DataFrame = {
    val q = col(queryCol)
    val spans = transform(sequence(lit(0), lit(k - 1)), i => {
      val len = least(length(q),
        lit(minLen) + pmod(h(q, i, lit("len")), lit((maxLen - minLen + 1).toLong)).cast("int"))
      val maxStart = greatest(length(q) - len, lit(0))
      val start = pmod(h(q, i, lit("start")), (maxStart + 1).cast("long")).cast("int")
      q.substr(start + 1, len)
    })
    // alias via a temp name: re-using the input column name would make the
    // span expressions resolve as lateral references to the new alias
    queries.select(q.as("__q"), explode(spans).as("span"))
      .withColumnRenamed("__q", "query")
      .where(length(col("span")) > 0)
  }

  /** P6: word windows — ceil(n_tokens / windowSize) windows (≥1, ≤ maxW),
    * each a deterministic offset slice of `windowSize` tokens. */
  def docWindows(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", windowSize: Int = 64, maxW: Int = 4): DataFrame = {
    // __toks materialized in its own projection first (HOF no-CSE
    // discipline, r17): the split was inlined into the transform
    // lambda and re-ran once per window
    val toks = col("__toks")
    val nW = least(greatest(ceil(size(toks) / lit(windowSize.toDouble)), lit(1)),
      lit(maxW)).cast("int")
    val windows = transform(sequence(lit(0), nW - 1), w => {
      val maxStart = greatest(size(toks) - windowSize, lit(0))
      val start = pmod(h(col(idCol).cast("string"), w), (maxStart + 1).cast("long")).cast("int")
      concat_ws(" ", slice(toks, start + 1, lit(windowSize)))
    })
    docs.select(col(idCol), split(col(textCol), "\\s+").as("__toks"))
      .select(col(idCol), posexplode(windows).as(Seq("window_idx", "window_text")))
  }

  /** P10: deterministic subsample (keep md5(doc_id) mod 100 ≥ dropPct),
    * re-id contiguously by old order, return (old_id → new_id) mapping.
    *
    * Distributed re-id: range-partition + sort by old_id, then
    * zipWithIndex (per-partition counts + offsets under the hood) — a
    * global `row_number() OVER (ORDER BY …)` window would pull the whole
    * kept corpus into ONE task at 100 TB.
    */
  def subsampleMapping(docs: DataFrame, idCol: String = "doc_id",
      dropPct: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    val kept = docs.select(col(idCol).as("old_id"))
      .where(pmod(Dedup.md5Hash60(col("old_id").cast("string")), lit(100L)) >= dropPct)
      .repartitionByRange(col("old_id"))
      .sortWithinPartitions("old_id")
    val rdd = kept.rdd.map(_.getLong(0)).zipWithIndex()
      .map { case (oldId, idx) => org.apache.spark.sql.Row(oldId, idx) }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("old_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("new_id",
        org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** P7: per-digit deterministic shuffle of a numeric id, every output
    * digit guaranteed ≠ its input digit (main_utils.py:78-86 — used for
    * NCI hard-negative id corruption). new_d = (d + 1 + h % 9) mod 10.
    */
  def digitShuffle(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val idStr = col(idCol).cast("string")
    val digits = transform(sequence(lit(1), length(idStr)), i => {
      val d = idStr.substr(i, lit(1)).cast("int")
      pmod(d + 1 + pmod(h(idStr, lit("#"), i), lit(9L)).cast("int"), lit(10))
        .cast("string")
    })
    df.select(col(idCol), concat_ws("", digits).as("shuffled_id"))
  }

  /** P8/J8: propagate a re-id mapping through an artifact table. */
  def remapIds(table: DataFrame, mapping: DataFrame, idCol: String): DataFrame =
    table.join(mapping, table(idCol) === mapping("old_id"))
      .drop(idCol, "old_id")
      .withColumnRenamed("new_id", idCol)
}
