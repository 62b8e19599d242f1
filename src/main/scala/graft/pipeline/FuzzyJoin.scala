package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance-1) similarity self-join over a string column —
  * the typo/variant clustering step of query-log and entity cleaning
  * (fold "colour"/"color", "src1"/"src10" before dedup or aggregation).
  *
  * The naive formulation is the all-pairs levenshtein cross join —
  * quadratic in vocabulary, dead at corpus scale. This is the
  * deletion-neighborhood (SymSpell) formulation: two strings within
  * edit distance 1 (insert/delete/substitute) necessarily share a
  * member of each other's {identity + single-character-deletion}
  * variant set, so candidates come from an equi-join on the variant —
  * work ∝ vocabulary · avg-length + candidate pairs — and an exact
  * `levenshtein == 1` residual confirms (variant collisions at
  * distance 2, e.g. "ab"/"ba", are filtered, not emitted).
  *
  * `maxBucket` guards the one quadratic pocket: a variant shared by B
  * strings yields C(B,2) candidates, so degenerate buckets (the empty
  * string under every single-character token) are capped, mirroring
  * [[graft.search.LSHSearch]]'s bucket discipline.
  */
object FuzzyJoin {

  /** Distinct unordered pairs (a < b) of `strCol` values at edit
    * distance exactly 1. Strings longer than `maxLen` are excluded
    * (their variant sets would dominate the explode; real token/entity
    * vocabularies sit far below it). */
  def distance1Pairs(strings: DataFrame, strCol: String,
      maxLen: Int = 40, maxBucket: Int = 1000): DataFrame = {
    val t = strings.select(col(strCol).cast("string").as("tok"))
      .where(col("tok").isNotNull && length(col("tok")) <= maxLen &&
        length(col("tok")) > 0)
      .distinct()
    // {identity} ∪ {delete char i}: distance-1 neighbors share a variant
    val variants = t.select(col("tok"), explode(array_union(
        array(col("tok")),
        expr("transform(sequence(1, length(tok)), i -> " +
          "concat(substring(tok, 1, i - 1), " +
          "substring(tok, i + 1, length(tok))))"))).as("var"))
      .distinct()
    val cold = variants.groupBy("var").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucket).select("var")
    val v = variants.join(cold, "var")
    v.as("a").join(v.as("b"),
        col("a.var") === col("b.var") && col("a.tok") < col("b.tok"))
      .select(col("a.tok").as("t1"), col("b.tok").as("t2"))
      .distinct()
      .where(levenshtein(col("t1"), col("t2")) === 1)
  }
}
