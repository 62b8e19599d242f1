package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination screening: find corpus documents that share
  * long n-grams with an evaluation set — the standard decontamination
  * step of a training-data pipeline (n-gram collision against held-out
  * benchmarks; 13-grams in the GPT-3 appendix formulation).
  *
  * Scale shape: both sides explode to (id, ngram-hash60) rows — the
  * benchmark side is tiny by definition and broadcasts, so the corpus
  * side never shuffles for the probe; the only shuffle is the
  * (doc, bench) match aggregation, bounded by the number of collisions.
  * Hashing is the engine's md5-prefix convention, so the whole screen is
  * oracle-replayable.
  */
object Contamination {

  // pre-split projection: materialize the token array in its own
  // Project so the gram lambda's element_at calls read it instead of
  // re-running split(lower(text)) per gram position (measured 20× —
  // the fused expression loses common-subexpression elimination)
  private def grams(df: DataFrame, id: String, text: String,
      n: Int): DataFrame =
    df.select(col(id), Dedup.tokens(col(text)).as("__toks"))
      .select(col(id),
        explode(array_distinct(Dedup.shingles(col("__toks"), n))).as("__g"))
      .select(col(id), Dedup.md5Hash60(col("__g")).as("h"))

  /** The benchmark side's DISTINCT n-gram hashes, (benchIdCol, h) — the
    * FROZEN artifact form: a batch job computes this once per held-out
    * set and the streaming curation door reads it as a constant
    * ([[screenHashed]]), the frozen-codebook convention of
    * [[graft.streaming.IncrementalIndexer]]. */
  def hashedGrams(benchmark: DataFrame, n: Int = 13,
      benchIdCol: String = "bench_id", benchTextCol: String = "text")
      : DataFrame =
    grams(benchmark, benchIdCol, benchTextCol, n)

  /** (idCol, benchIdCol, n_shared): corpus docs sharing ≥ `minShared`
    * DISTINCT n-gram hashes with a benchmark item. */
  def screen(corpus: DataFrame, benchmark: DataFrame, n: Int = 13,
      minShared: Int = 1, idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "bench_id", benchTextCol: String = "text")
      : DataFrame =
    screenHashed(corpus, hashedGrams(benchmark, n, benchIdCol, benchTextCol),
      n, minShared, idCol, textCol, benchIdCol)

  /** [[screen]] against a PRE-HASHED benchmark gram table
    * ([[hashedGrams]] output) — `n` must match the value the grams were
    * built with. */
  def screenHashed(corpus: DataFrame, benchGrams: DataFrame, n: Int = 13,
      minShared: Int = 1, idCol: String = "doc_id", textCol: String = "text",
      benchIdCol: String = "bench_id"): DataFrame =
    grams(Dedup.ensureParallelism(corpus), idCol, textCol, n)
      .join(broadcast(benchGrams), Seq("h"))
      .groupBy(col(idCol), col(benchIdCol))
      .agg(count(lit(1)).as("n_shared")) // hashes are distinct per side
      .where(col("n_shared") >= minShared)
}
