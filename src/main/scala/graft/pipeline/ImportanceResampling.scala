package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): pick
  * raw-corpus documents whose hashed-feature distribution looks like a
  * small TARGET corpus — the standard recipe for domain-targeted
  * pretraining-data curation (the reference curates its corpora with
  * static scripts, dataprocess/msmarco_passage/sampled_corpus.py; this is
  * the distribution-matching upgrade a 100 TB pipeline actually runs).
  *
  * Model: tokens hash into `buckets` features (the same md5-bucket family
  * as the V1 hash encoder); target and raw corpora each induce a
  * Laplace-smoothed unigram distribution over buckets; a document's
  * importance log-weight is Σ_b n_b · [ln p̂_target(b) − ln p̂_raw(b)].
  * Selection is Gumbel-top-k over the log-weights — an EXACT sample
  * without replacement proportional to exp(logw), the paper's resampling
  * step — with the Gumbel noise derived from the library's deterministic
  * md5 uniform, so the same documents are chosen on any engine, any
  * partitioning, any run.
  *
  * Determinism contract: the per-bucket log-ratio is snapped ONCE to the
  * Long micro-grid (`floor(ln(·)·1e6 + 0.5)`, the only transcendental —
  * a cross-engine 1-ulp `ln` wobble sits ~9 orders of magnitude under
  * the grid), and everything downstream — the per-doc Σ n_b·lr_b fold,
  * the Gumbel key, the top-k ranking — is ALL-Long arithmetic, immune to
  * aggregation order. A SQL oracle replays the selection bit-for-bit.
  *
  * Scale shape: two bucket-sized hash aggregations (≤ `buckets` rows)
  * fit the model; scoring is one broadcast join of the per-doc bucket
  * counts (map-side-combined) against the `buckets`-row ratio table plus
  * one Long-sum groupBy; selection is a TakeOrdered (per-partition top-k
  * + driver merge), never a global sort. No driver-side state beyond the
  * k selected rows.
  */
object ImportanceResampling {

  private val M = 1000000L

  /** floor(ln(x)·1e6 + 0.5) as Long — the micro-grid snap. */
  private def lnMicro(x: Column): Column =
    floor(log(x) * M + lit(0.5)).cast("long")

  /** Per-doc hashed-bucket counts (idCol, b, n) — empty tokens dropped,
    * docs with no tokens absent (no features → no evidence either way;
    * a length gate runs before a selection gate in any real pipeline).
    * Shared with [[QualityClassifier]] — the two canonical selection
    * methods run over the SAME hashed feature space. */
  private[pipeline] def docBuckets(docs: DataFrame, buckets: Int, idCol: String,
      textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(filter(
        split(lower(col(textCol)), "\\s+"), t => length(t) > 0)).as("__w"))
      .select(col(idCol),
        pmod(Dedup.md5Hash32(col("__w")), lit(buckets.toLong)).as("b"))
      .groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("n"))

  /** The fitted model: per-bucket Laplace-smoothed log-ratio table
    * (b, lr_micro LONG), one row for EVERY bucket in [0, buckets) so
    * unseen-in-either-corpus buckets score their smoothed prior ratio.
    * `buckets` rows — broadcast it. */
  def fitLogRatios(target: DataFrame, raw: DataFrame, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = raw.sparkSession
    def bucketCounts(df: DataFrame, cName: String, tName: String) = {
      val bc = docBuckets(df, buckets, idCol, textCol)
        .groupBy("b").agg(sum("n").as(cName))
      // total token count as a 1-row frame (stays in-plan; no collect)
      val tot = bc.agg(coalesce(sum(cName), lit(0L)).as(tName))
      (bc, tot)
    }
    val (tc, tt) = bucketCounts(target, "tc", "ttot")
    val (rc, rt) = bucketCounts(raw, "rc", "rtot")
    val all = spark.range(buckets).select(col("id").as("b"))
    all
      .join(tc, Seq("b"), "left")
      .join(rc, Seq("b"), "left")
      .crossJoin(broadcast(tt))
      .crossJoin(broadcast(rt))
      .select(col("b"),
        (lnMicro((coalesce(col("tc"), lit(0L)) + lit(1.0)) /
            (col("ttot").cast("double") + lit(buckets.toDouble))) -
          lnMicro((coalesce(col("rc"), lit(0L)) + lit(1.0)) /
            (col("rtot").cast("double") + lit(buckets.toDouble))))
          .as("lr_micro"))
  }

  /** Score documents against a fitted ratio table:
    * (idCol, logw_micro LONG) — logw_micro = Σ_b n_b · lr_micro(b), the
    * document's importance log-weight in micro-units. The ratio table is
    * `buckets` rows: broadcast join, then one map-side-combined Long sum
    * per doc. */
  def score(docs: DataFrame, logRatios: DataFrame, buckets: Int = 64,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docBuckets(docs, buckets, idCol, textCol)
      .join(broadcast(logRatios), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("n") * col("lr_micro")).as("logw_micro"))

  /** Gumbel-top-k resample over scored docs: key = logw_micro + g_micro
    * with g = −ln(−ln(u)) and u the deterministic md5 uniform of
    * (seed, id) — the k largest keys are an exact without-replacement
    * draw with P(doc) ∝ exp(logw) (Gumbel-max), the DSIR resampling
    * step. Returns (idCol, logw_micro, key_micro) — TakeOrdered plan,
    * ties (same key) break by id ascending. */
  def resample(scored: DataFrame, k: Int, seed: Long = 42L,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0)
    val u = (pmod(graft.functions.HashFunctions.md5_prefix(
        concat(lit(seed.toString), lit(":"), col(idCol).cast("string")), 15),
      lit(M)).cast("double") + lit(1.0)) / lit((M + 1).toDouble)
    val gMicro = floor(-log(-log(u)) * M + lit(0.5)).cast("long")
    scored
      .withColumn("key_micro", col("logw_micro") + gMicro)
      .orderBy(col("key_micro").desc, col(idCol).asc)
      .limit(k)
  }
}
