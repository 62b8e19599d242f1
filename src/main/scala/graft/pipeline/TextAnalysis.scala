package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: language ID
  * (stopword-ratio heuristic), quality scoring, token counting, and
  * document fingerprinting (rolling hash). All per-row column expressions —
  * shuffle-free, codegen'd, oracle-expressible.
  */
object TextAnalysis {

  val EnStopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "for", "on", "with",
    "as", "by", "at", "an", "or", "it", "this", "that", "be", "are")

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(EnStopwords: _*))).cast("double") /
      greatest(size(toks), lit(1))
  }

  /** Heuristic language ID: stopword-ratio over threshold → "en".
    * (The reference corpus is English-only; the operator exists for the
    * pipeline surface — an n-gram profile per language plugs in the same
    * column shape.)
    */
  def langId(text: Column, threshold: Double = 0.03): Column =
    when(stopwordRatio(text) >= threshold, "en").otherwise("unknown")

  /** (doc_id, n_tokens, n_chars, avg_token_len, punct_ratio,
    * stopword_ratio, quality_score) — length/punct/stopword quality
    * heuristics on one pass.
    */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val input = Dedup.ensureParallelism(docs)
    val text = col(textCol)
    val toks = tokens(text)
    val nTokens = size(toks).cast("double")
    val nChars = length(text).cast("double")
    val punct = length(regexp_replace(text, "[a-zA-Z0-9\\s]", "")).cast("double")
    val avgTokLen = (nChars - (nTokens - 1)) / greatest(nTokens, lit(1.0))
    val swr = stopwordRatio(text)
    // quality in [0,1]: reward mid-length docs and prose-like stopword
    // ratios, penalize punctuation soup
    val lenScore = least(nTokens / lit(64.0), lit(1.0))
    val punctScore = greatest(lit(1.0) - punct / greatest(nChars, lit(1.0)) * 10, lit(0.0))
    val swScore = least(swr * 10, lit(1.0))
    val q = lenScore * 0.4 + punctScore * 0.3 + swScore * 0.3
    input.select(col(idCol),
      nTokens.cast("long").as("n_tokens"),
      nChars.cast("long").as("n_chars"),
      avgTokLen.as("avg_token_len"),
      (punct / greatest(nChars, lit(1.0))).as("punct_ratio"),
      swr.as("stopword_ratio"),
      q.as("quality_score"))
  }

  /** Within-document repetition signals (the Gopher/C4 duplicate-text
    * filters): fraction of n-gram occurrences that are repeats of an
    * earlier n-gram in the same doc. A boilerplate- or loop-generated doc
    * scores high and gets filtered before training. Per-row expression —
    * shuffle-free, exact, oracle-expressible.
    *
    * @return (idCol, n_ngrams, dup_ngram_ratio, top_ngram_frac) where
    *         top_ngram_frac is the most frequent n-gram's share of all
    *         n-gram slots (the Gopher "top n-gram fraction" signal).
    */
  def repetition(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 2): DataFrame = {
    // relational shape, not per-row HOFs: a nested filter-inside-transform
    // count is O(total·distinct) per doc AND drops out of codegen (the
    // MinHash 400× trap); explode → (doc, gram) counts → per-doc aggregate
    // is linear with map-side combine
    val grams = Dedup.ensureParallelism(docs)
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), explode(Dedup.shingles(col("__toks"), n)).as("__g"))
    val perGram = grams.groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
    val agg = perGram.groupBy(col(idCol)).agg(
      sum("__c").as("__total"), count(lit(1)).as("__nd"), max("__c").as("__mx"))
    // left join keeps docs too short for any n-gram (all-zero row)
    docs.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__total"), lit(0L)).as("n_ngrams"),
        when(coalesce(col("__total"), lit(0L)) === 0, 0.0)
          .otherwise((col("__total") - col("__nd")).cast("double") / col("__total"))
          .as("dup_ngram_ratio"),
        when(coalesce(col("__total"), lit(0L)) === 0, 0.0)
          .otherwise(col("__mx").cast("double") / col("__total"))
          .as("top_ngram_frac"))
  }

  /** PII scrubbing (the standard pretraining redaction pass): replace
    * emails, phone-like numbers, and IPv4 addresses with typed tags,
    * reporting per-kind hit counts. Pure regexp_replace — codegen'd,
    * shuffle-free, and the same regexes replay in the oracle.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def piiScrub(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    def hits(c: Column, re: String): Column =
      size(regexp_extract_all(c, lit(re), lit(0)))
    // counts follow the replacement CASCADE (each kind counted on the
    // text after the previous kinds were redacted): counting every kind
    // on the original would double-book overlaps — e.g. the digit-heavy
    // local part of "12345678901@example.com" also matches the phone
    // regex, but only one <EMAIL> token ends up in `scrubbed`
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    Dedup.ensureParallelism(docs).select(col(idCol),
      hits(text, EmailRe).cast("long").as("n_emails"),
      hits(afterEmail, Ipv4Re).cast("long").as("n_ips"),
      hits(afterIp, PhoneRe).cast("long").as("n_phones"),
      regexp_replace(afterIp, PhoneRe, "<PHONE>").as("scrubbed"))
  }

  /** PMI collocation mining (word2phrase-style phrase detection): score
    * adjacent token pairs by pointwise mutual information
    * ln(P(ab) / (P(a)·P(b))) and keep the top k — the phrase-vocabulary
    * step of tokenizer/corpus preparation. Engine-replayable by
    * construction: each count is cast to double BEFORE multiplying
    * (a Long product n_ab·Nuni·Nuni would wrap past ~3e9 corpus
    * tokens), and both engines evaluate the identical left-associated
    * IEEE-754 product/division, so `ln` sees the identical double in
    * SQL and the micro-rounded score hashes — at ANY corpus size, not
    * just below the 2^63 product ceiling. Work ∝ corpus tokens (explode + two
    * hash-aggs + vocab joins); top-k is TakeOrdered, never a global
    * sort. Pairs below `minCount` drop (PMI of rare pairs is noise).
    */
  def phrasePmi(docs: DataFrame, k: Int = 30, minCount: Int = 5,
      textCol: String = "text"): DataFrame = {
    val toks = Dedup.ensureParallelism(docs)
      .select(tokens(col(textCol)).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val biAll = toks.where(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS a, t[i] AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val bi = biAll.where(col("n_ab") >= minCount)
    // totals over the UNFILTERED distributions — minCount prunes the
    // candidate list, not the probability space
    val totals = uni.agg(sum("n_w").as("n_uni"))
      .crossJoin(biAll.agg(sum("n_ab").as("n_bi")))
    bi.join(uni.select(col("w").as("a"), col("n_w").as("n_a")), "a")
      .join(uni.select(col("w").as("b"), col("n_w").as("n_b")), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("n_ab"),
        floor(log((col("n_ab").cast("double") * col("n_uni").cast("double") *
            col("n_uni").cast("double")) /
          (col("n_bi").cast("double") * col("n_a").cast("double") *
            col("n_b").cast("double"))) * 1000000
          + 0.5).cast("long").as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("a").asc, col("b").asc)
      .limit(k)
  }

  /** Compression-ratio quality signal (the Gopher-family "entropy"
    * gate): deflate each document with a fixed level and report
    * compressed/original size — highly compressible text is boilerplate
    * or repetition, incompressible text is noise/binary soup; prose
    * sits in a mid band. Runs as a per-partition pass with ONE reused
    * Deflater (codec setup amortized across the batch, the same
    * batch-shape discipline as the media codecs); no shuffle. This is
    * the one text signal that is deliberately NOT SQL-replayable — the
    * deflate bitstream has no oracle twin — so it carries a
    * TWO-IMPLEMENTATION check instead: `InflateCodecSpec` decodes every
    * fixture document's stream with [[InflateCodec]] (an independent
    * RFC 1950/1951 decoder sharing nothing with zlib) and requires a
    * byte-exact round-trip, Adler-32 agreement, and `comp_len` equal to
    * the verified stream's length; determinism/monotonicity are pinned
    * in TextAnalysisSpec. The catalog entry stays rows-only at the SQL
    * gate by necessity, not for lack of verification.
    */
  def compressionRatio(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", level: Int = 6): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = docs.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("orig_len", LongType, nullable = false),
      StructField("comp_len", LongType, nullable = false),
      StructField("ratio_micro", LongType, nullable = false)))
    val rdd = docs.select(col(idCol).cast("long"), col(textCol))
      .na.drop().rdd.mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(level)
        val buf = new Array[Byte](64 * 1024)
        it.map { r =>
          val bytes = r.getString(1).getBytes("UTF-8")
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var comp = 0L
          while (!deflater.finished()) comp += deflater.deflate(buf)
          val orig = math.max(bytes.length.toLong, 1L)
          Row(r.getLong(0), bytes.length.toLong, comp,
            comp * 1000000L / orig)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Corpus vocabulary heavy hitters: top-k tokens by frequency.
    * explode → hash-agg with map-side combine → TakeOrdered (Spark's
    * `orderBy.limit` never sorts the full vocab globally — each partition
    * keeps k, the driver merges k·P rows). The exact form;
    * [[vocabTopKSketched]] is the Misra-Gries scale path for when the
    * vocab itself is too wide for a hash-agg.
    */
  def vocabTopK(docs: DataFrame, k: Int = 50,
      textCol: String = "text"): DataFrame =
    Dedup.ensureParallelism(docs)
      .select(explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  /** The sketched scale path behind [[vocabTopK]]: a Misra-Gries summary
    * ([[Sketches.mgSketch]]) with `sketchK` counters bounds state at
    * `sketchK` rows regardless of vocabulary width, then reports the
    * top `k` by stored count. Each freq is an UNDERCOUNT within `err`
    * of exact (`freq ≤ true ≤ freq + err`, err ≤ tokens/(sketchK+1));
    * any token with true frequency > err is guaranteed present. Use
    * when the distinct-token set itself (URLs, hashes, code) outgrows a
    * hash aggregation — the classic reason web-corpus vocab scans fall
    * over. */
  def vocabTopKSketched(docs: DataFrame, k: Int = 50, sketchK: Int = 1024,
      textCol: String = "text"): DataFrame = {
    require(k <= sketchK, s"k=$k must fit in sketchK=$sketchK counters")
    Sketches.mgSketch(
        Dedup.ensureParallelism(docs)
          .select(explode(tokens(col(textCol))).as("token"))
          .where(length(col("token")) > 0),
        "token", Seq.empty, sketchK)
      .select(col("token"), col("mg_cnt").as("freq"), col("mg_err").as("err"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)
  }

  /** Order-sensitive rolling-hash fingerprint over token hashes:
    * h ← (h·1000003 + h32(token)) mod (2^31−1). Exact integer arithmetic →
    * reproducible in the oracle via list_reduce.
    */
  def fingerprint(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val htoks = transform(tokens(col(textCol)), t => Dedup.md5Hash32(t))
    val fp = aggregate(htoks, lit(0L),
      (acc, h) => pmod(acc * 1000003L + h, lit(Dedup.P)))
    docs.select(col(idCol), fp.as("fingerprint"))
  }

  /** One-row approximate corpus survey — the sketch pass a 100 TB corpus
    * gets instead of exact distinct counts (an exact count-distinct
    * shuffles every key; the sketches here are fixed-size and merge
    * associatively, so the whole survey is one map-side-combined pass
    * per grain):
    *
    *   - `approx_distinct_texts` / `approx_distinct_tokens`: HLL++
    *     (`approx_count_distinct`, relative error `rsd`). Register-max
    *     merging is order- AND partition-independent, so the estimate is
    *     reproducible across cluster layouts (pinned by spec).
    *   - `len_p50/p90/p99`: GK quantile sketch over char lengths
    *     (`percentile_approx`, accuracy 1/eps) — merge-order sensitive in
    *     general, hence bounded-error asserted, not hash-pinned.
    *   - exact cheap moments (`n_docs`, `n_tokens`, `avg_len`) ride along.
    *
    * Doc-grain sketches and the token-grain sketch run at different
    * cardinalities, so they aggregate separately and join on a literal —
    * two single-row frames, no data movement beyond the two passes.
    */
  def corpusStats(docs: DataFrame, textCol: String = "text",
      rsd: Double = 0.01, quantileAccuracy: Int = 1000): DataFrame = {
    val input = Dedup.ensureParallelism(docs)
    val docGrain = input.agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(col(textCol), rsd).as("approx_distinct_texts"),
      sum(size(tokens(col(textCol)))).as("n_tokens"),
      round(avg(length(col(textCol))), 2).as("avg_len"),
      percentile_approx(length(col(textCol)), lit(0.5),
        lit(quantileAccuracy)).as("len_p50"),
      percentile_approx(length(col(textCol)), lit(0.9),
        lit(quantileAccuracy)).as("len_p90"),
      percentile_approx(length(col(textCol)), lit(0.99),
        lit(quantileAccuracy)).as("len_p99"))
    val tokenGrain = input
      .select(explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .agg(approx_count_distinct(col("token"), rsd)
        .as("approx_distinct_tokens"))
    docGrain.withColumn("_j", lit(1))
      .join(tokenGrain.withColumn("_j", lit(1)), "_j").drop("_j")
  }

  /** The Gopher stop-word presence set (Rae et al. 2021 App. A1.1 —
    * distinct from [[EnStopwords]], which drives the langid ratio). */
  val GopherStopSet: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The full Gopher rule-set quality gate (Rae et al. 2021, App. A1.1)
    * — the named filter battery pretraining pipelines apply verbatim:
    *
    *   1. 50 ≤ word count ≤ 100,000
    *   2. 3 ≤ mean word length ≤ 10
    *   3. symbol-to-word ratio ≤ 0.1 (symbols: `#`, `...`, `…`)
    *   4. ≤ 90% of lines start with a bullet (`-`, `*`, `•`)
    *   5. ≤ 30% of lines end with an ellipsis
    *   6. ≥ 80% of words contain ≥ 1 alphabetic character
    *   7. ≥ 2 distinct Gopher stop words present
    *
    * Emits the RAW integer counts plus one flag per rule and the
    * conjunction — auditable (a user can re-derive any flag from the
    * counts) and engine-exact: every threshold is compared
    * cross-multiplied in Longs (`10·n_sym ≤ n_words`, `5·n_alpha ≥
    * 4·n_words`, …) so no ratio ever exists as a float in either
    * engine. Pure per-row expressions — shuffle-free, codegen'd.
    */
  def gopherRules(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    // pre-materialized arrays (the repo's established HOF discipline):
    // higher-order functions get NO codegen subexpression elimination,
    // so word/line expressions built directly on split(text) re-run the
    // regex split once per OUTPUT COLUMN — materializing __words/__lines
    // in their own projection runs each split once per row (measured
    // 1.07 → 0.84 s at sf0.1)
    val pre = Dedup.ensureParallelism(docs)
      .select(col(idCol), col(textCol).as("__text"),
      filter(split(col(textCol), "\\s+"), w => length(w) > 0).as("__words"),
      split(col(textCol), "\n").as("__lines"))
    val text = col("__text")
    val words = col("__words")
    val nWords = size(words).cast("long")
    val sumWordLen = aggregate(words, lit(0L), (acc, w) => acc + length(w))
    def countOf(c: Column, ch: String): Column =
      (length(c) - length(regexp_replace(c, java.util.regex.Pattern.quote(ch),
        ""))).cast("long")
    // non-overlapping left-to-right '...' occurrences: split-count in both
    // engines walks the same greedy scan, so '....' counts once in each
    val nSymbols = countOf(text, "#") + countOf(text, "…") +
      (size(split(text, "\\.\\.\\.")) - 1).cast("long")
    val lines = col("__lines")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val nEllipsis = size(filter(lines,
      l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val lowered = transform(words, w => lower(w))
    val nStop = size(filter(
      array(GopherStopSet.map(lit): _*),
      sw => array_contains(lowered, sw))).cast("long")
    pre.select(col(idCol),
        nWords.as("n_words"), sumWordLen.as("sum_word_len"),
        nSymbols.as("n_symbols"), nLines.as("n_lines"),
        nBullet.as("n_bullet_lines"), nEllipsis.as("n_ellipsis_lines"),
        nAlpha.as("n_alpha_words"), nStop.as("n_stop_present"))
      .withColumn("pass_words",
        col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("pass_mwl",
        lit(3L) * col("n_words") <= col("sum_word_len") &&
        col("sum_word_len") <= lit(10L) * col("n_words"))
      .withColumn("pass_symbol",
        lit(10L) * col("n_symbols") <= col("n_words"))
      .withColumn("pass_bullet",
        lit(10L) * col("n_bullet_lines") <= lit(9L) * col("n_lines"))
      .withColumn("pass_ellipsis",
        lit(10L) * col("n_ellipsis_lines") <= lit(3L) * col("n_lines"))
      .withColumn("pass_alpha",
        lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
      .withColumn("pass_stop", col("n_stop_present") >= 2L)
      .withColumn("pass_all",
        col("pass_words") && col("pass_mwl") && col("pass_symbol") &&
        col("pass_bullet") && col("pass_ellipsis") && col("pass_alpha") &&
        col("pass_stop"))
  }

  /** C4/RefinedWeb-style blocklist screen (Raffel et al. 2020 §2.2:
    * any page containing a banned term is removed): WORD-BOUNDARY term
    * matching over the lowercased token stream, multi-word phrases
    * included. `terms` is a one-column (`term`) table of space-joined
    * words (case- and surrounding/inner-whitespace-insensitive — terms
    * re-tokenize through the same `tokens` normalization as documents,
    * with empty tokens dropped, so a CSV blocklist's ' fast ' matches
    * 'fast'). Output one row per input doc, keyed `doc_id` (the idCol
    * values cast to long): (doc_id, n_hits — matching (position, term)
    * pairs, so one position hit by two terms counts twice, hit_terms —
    * sorted distinct matched terms comma-joined, pass — no term
    * matched).
    *
    * Spark-first shape: the distinct term WIDTHS (a config-table-sized
    * collect — a blocklist is thousands of rows, never corpus-sized)
    * pick which n-gram generators to run; each width is one narrow
    * explode joined against the BROADCAST term table, so the corpus
    * never shuffles — only hit rows (output-proportional) reach the
    * per-doc aggregation. The right structure for 10k+ terms, where a
    * single `rlike` alternation would re-scan each row once per
    * pattern branch instead of hash-probing a set. */
  def blocklistScreen(docs: DataFrame, terms: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val normTerms = terms
      .select(concat_ws(" ",
        filter(tokens(col("term")), t => length(t) > 0)).as("term"))
      .where(col("term") =!= "").distinct()
    val widths: Seq[Int] = normTerms
      .select(size(split(col("term"), " ")).as("k"))
      .distinct().as[Int].collect().toSeq.sorted
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      tokens(col(textCol)).as("__toks"))
    val hits = widths.map { k =>
      base.select(col("doc_id"),
          explode(Dedup.shingles(col("__toks"), k)).as("gram"))
        .join(broadcast(normTerms
            .where(size(split(col("term"), " ")) === k)),
          col("gram") === col("term"))
        .select(col("doc_id"), col("term"))
    }.reduceOption(_ unionByName _)
      .getOrElse(base.select(col("doc_id"), lit("").as("term"))
        .where(lit(false)))
    val agg = hits.groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        concat_ws(",", array_sort(collect_set(col("term"))))
          .as("hit_terms"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("hit_terms"), lit("")).as("hit_terms"),
        col("n_hits").isNull.as("pass"))
  }
}
