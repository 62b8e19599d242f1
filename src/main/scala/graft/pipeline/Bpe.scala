package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer induction over a corpus — the classic
  * Sennrich et al. greedy merge loop, distributed the way every BPE
  * trainer actually runs at scale: statistics are computed over the
  * DISTINCT-WORD table (vocab ≪ corpus; each word carries its corpus
  * frequency), so one merge iteration is an aggregation over at most
  * |vocab| rows regardless of corpus size.
  *
  * Beyond-reference operator (builder mandate: text analysis for training
  * pipelines). The reference consumes a finished HF tokenizer
  * (prepare_passage_tokenized.py:49-60); this is the operator that
  * produces one.
  *
  * Scale: [[wordCounts]] is the only corpus-wide pass (explode + hash
  * agg, map-side partial). The merge loop then iterates on the vocab
  * table — per iteration one explode of within-word adjacent pairs, one
  * hash agg, one ordered head(1) (TakeOrdered, no global sort), and one
  * map-side merge application. No driver-side corpus state; only the
  * (pair, count) winner crosses to the driver each round.
  */
object Bpe {

  /** Lower-cased `[a-z0-9]+` word frequencies — the vocab table every
    * other step works from. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit("[a-z0-9]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Vocab table with the word split into its current symbol sequence
    * (initially one character per symbol). */
  def initSymbols(words: DataFrame): DataFrame =
    words.withColumn("syms", split(col("word"), ""))

  /** Corpus-frequency-weighted counts of ADJACENT symbol pairs within
    * words, `(lhs, rhs, pair_count)` — one zip of the symbol list with
    * its own tail (no positional self-join, stays in codegen);
    * single-symbol words contribute nothing. */
  def pairs(vocab: DataFrame): DataFrame =
    vocab
      .where(size(col("syms")) >= 2)
      .select(col("cnt"),
        explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (l, r) => struct(l.as("lhs"), r.as("rhs")))).as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum("cnt").as("pair_count"))

  /** Apply one merge `(l, r) → l+r` to every symbol sequence: a
    * left-to-right single pass, exactly the reference BPE semantics
    * (overlapping occurrences like "aaa" with merge (a,a) merge the
    * leftmost pair first → ["aa", "a"]).
    */
  def applyMerge(vocab: DataFrame, left: String, right: String): DataFrame = {
    // aggregate-based left-to-right scan: fold each symbol into the
    // accumulator list, merging with the previous element when (prev, cur)
    // equals the merge pair. A just-merged token can never immediately
    // re-merge as `prev`: it equals left+right, and right is non-empty, so
    // it never compares equal to `left` — leftmost-first semantics hold
    // with a plain accumulator (BpeSpec's overlap tests pin this down).
    val merged = lit(left + right)
    vocab.withColumn("syms",
      aggregate(
        col("syms"),
        array().cast("array<string>"),
        (acc, s) => {
          val canMerge = (size(acc) > 0) &&
            (element_at(acc, -1) === lit(left)) && (s === lit(right))
          when(canMerge,
            concat(slice(acc, lit(1), size(acc) - 1), array(merged)))
            .otherwise(concat(acc, array(s)))
        }))
  }

  /** Encode one word with a learned merge list: chars → one left-to-right
    * merge pass PER MERGE IN RANK ORDER — the Sennrich apply_bpe loop,
    * identical pass semantics to [[applyMerge]]'s fold (a just-merged
    * token never immediately re-merges as `prev`: it equals l+r and r is
    * non-empty, so it can't compare equal to `l`). */
  private[pipeline] def tokenizeWord(word: String,
      merges: Seq[(String, String)]): Array[String] = {
    var syms: Array[String] = word.map(_.toString).toArray
    merges.foreach { case (l, r) =>
      if (syms.length >= 2) {
        val acc = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var i = 0
        while (i < syms.length) {
          if (acc.nonEmpty && acc.last == l && syms(i) == r)
            acc(acc.length - 1) = l + r
          else acc += syms(i)
          i += 1
        }
        syms = acc.toArray
      }
    }
    syms
  }

  /** The TOKENIZER the trainer exists for: apply a learned merge table to
    * a corpus — `(idCol, tokens)` with every word's subword tokens
    * flattened in document order, comma-joined. The merge list broadcasts
    * (it is vocabulary-sized, never corpus-sized) and each partition
    * memoizes word → tokens, so the per-row cost is a hash probe for all
    * but the first sighting of a word — the same distinct-word leverage
    * the trainer uses, without a join against a materialized vocab table.
    */
  def applyMerges(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges.toArray.toSeq)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        val pat = java.util.regex.Pattern.compile("[a-z0-9]+")
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        it.map { case (id, text) =>
          val m = pat.matcher(
            if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT))
          val toks = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find())
            toks ++= memo.getOrElseUpdate(m.group(), tokenizeWord(m.group(), ms))
          (id, toks.mkString(","))
        }
      }.toDF(idCol, "tokens")
  }

  /** Greedy BPE training: `nMerges` rounds of count → pick max (ties by
    * (left, right) ascending for engine-portable determinism) → merge.
    * Returns the learned merge list in order. The vocab table is
    * re-persisted each round (its lineage otherwise grows one aggregate
    * HOF per merge).
    */
  def train(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): Seq[(String, String)] = {
    var vocab = initSymbols(wordCounts(docs, textCol)).localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var exhausted = false
    while (i < nMerges && !exhausted) {
      val top = pairs(vocab)
        .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
        .head(1)
      if (top.isEmpty) exhausted = true
      else {
        val (l, r) = (top(0).getAs[String]("lhs"), top(0).getAs[String]("rhs"))
        out += ((l, r))
        vocab = applyMerge(vocab, l, r).localCheckpoint()
      }
      i += 1
    }
    out.toSeq
  }
}
