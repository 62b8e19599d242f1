package graft

import org.apache.spark.sql.{SparkSession, DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.io.Tables
import graft.core.VectorOps._
import graft.functions.VectorFunctions._
import graft.search.{BruteForceKNN, TopK, CoarseFineRetriever, CodebookBeamSearch}
import graft.index.{RQTrainer, CodeAssigner, ClusterIndexBuilder, ArtifactCache, Codebook}
import graft.eval.{Metrics, Ensemble}
import graft.pipeline.{Dedup, TextAnalysis, AnswerIndex, Augment, Multimodal, NegativeSampling}
import graft.io.MeviIO

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every `queries` entry is an operator from SURVEY.md §2 (id in the name),
  * runs on the driver fixtures (TESTDATA.md), and — where SQL-expressible —
  * has a DuckDB oracle in `oracleSql` with identical column names/ordering.
  * Non-SQL-expressible entries (MLlib KMeans-derived) get rows-only checks.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Float comparison projection: integer units of 10^-digits, via pure
    * IEEE arithmetic (floor(x·scale + 0.5)) — NOT %.Nf strings, whose
    * decimal tie-rounding differs between Java (HALF_UP) and DuckDB's C
    * printf (ties-to-even). The oracle twin is
    * `CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)`; this one
    * definition keeps every float-bearing query's projection in lockstep
    * with its SQL. */
  private def microUnits(x: Column, digits: Int): Column = {
    val scale = math.pow(10, digits).toLong
    floor(x.cast("double") * scale + lit(0.5)).cast("long")
  }

  /** Shared CTE prefix for the suffix-LCP oracles (dedup_suffix_lens /
    * _spans / _trim): capped 24-token suffixes at every position, sorted
    * by their space-joined string (the exact order the engine
    * range-partitions on), neighbor rows via lag/lead, token-LCP =
    * (index of the first element-wise mismatch − 1), clamped by both
    * lengths — element-wise `IS NOT DISTINCT FROM` runs true past BOTH
    * list ends, which the length clamp corrects, matching the engine's
    * loop bound exactly. Parameterized by source CTE and name prefix so
    * the curation chain can replay the trim over its fuzzy survivors
    * (prefix x, src surv) with the SAME generator the standalone
    * oracles use; `m` wraps a CTE name (`AS` vs `AS MATERIALIZED` — the
    * chain materializes `${p}t`, read by both the suffix explode and
    * the token cut, so the survivor chain upstream evaluates once). */
  private def suffixLcpCtes(src: String, p: String,
      m: String => String): String = {
    def side(o: String): String =
      // list_position returns 0 (NOT NULL) when no element mismatches —
      // nullif routes the all-equal case to 25-1 = 24, the full cap
      s"""CASE WHEN $o IS NULL THEN 0 ELSE least(
         |      coalesce(nullif(list_position(list_transform(range(1, 25),
         |        i -> s[i] IS NOT DISTINCT FROM $o[i]), false), 0), 25) - 1,
         |      len(s), len($o)) END""".stripMargin
    s"""${m(s"${p}t")} (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
       |  FROM $src),
       |${p}sfx AS (SELECT doc_id, i - 1 AS pos, toks[i : i + 23] AS s
       |  FROM ${p}t, LATERAL unnest(range(1, len(toks) + 1)) AS u(i)),
       |${p}ord AS (SELECT doc_id, pos, s, lag(s) OVER w AS ps, lead(s) OVER w AS ns
       |  FROM ${p}sfx WINDOW w AS (ORDER BY array_to_string(s, ' '), doc_id, pos)),
       |${p}lcp AS (SELECT doc_id, pos, s,
       |    greatest(${side("ps")},
       |      ${side("ns")}) AS dup_len
       |  FROM ${p}ord)""".stripMargin
  }

  private def suffixLcpSql(tail: String, withFlagged: Boolean = false): String =
    s"""WITH ${suffixLcpCtes("documents", "", n => s"$n AS")}${if (withFlagged) "," else ""}
       |$tail""".stripMargin

  /** The TRIM tail of the suffix-LCP chain (first-occurrence canonical
    * per duplicated content → NOT-the-canonical occurrences merged into
    * variable spans → surviving tokens re-joined), prefixed like
    * [[suffixLcpCtes]]; ends at `${p}agg`(doc_id, n_kept, text) holding
    * docs with ≥1 kept token. ONE definition shared by the standalone
    * dedup_suffix_trim oracle and the curation chain's span_trimmed
    * stage replay (VERDICT r15 #2). `${p}flagged` is read twice (the
    * canonical pick and the cut), so the chain materializes it. */
  private def suffixTrimCtes(p: String, minLen: Int,
      m: String => String): String =
    s"""${m(s"${p}flagged")} (SELECT doc_id, pos, dup_len,
       |        array_to_string(s[1 : dup_len], ' ') AS content
       |      FROM ${p}lcp WHERE dup_len >= $minLen),
       |${p}fo AS (SELECT content, doc_id, pos FROM ${p}flagged
       |      QUALIFY row_number() OVER (PARTITION BY content
       |        ORDER BY doc_id, pos) = 1),
       |${p}cut AS (SELECT f.doc_id, f.pos, f.dup_len
       |      FROM ${p}flagged f JOIN ${p}fo fo ON fo.content = f.content
       |      WHERE NOT (f.doc_id = fo.doc_id AND f.pos = fo.pos)),
       |${p}mm AS (SELECT doc_id, pos, dup_len,
       |        CASE WHEN pos > coalesce(max(pos + dup_len) OVER (
       |               PARTITION BY doc_id ORDER BY pos
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
       |             THEN 1 ELSE 0 END AS is_new
       |      FROM ${p}cut),
       |${p}spn AS (SELECT doc_id, min(pos) AS span_start, max(pos + dup_len) AS span_end
       |       FROM (SELECT doc_id, pos, dup_len, sum(is_new) OVER (
       |               PARTITION BY doc_id ORDER BY pos) AS span_id FROM ${p}mm)
       |       GROUP BY doc_id, span_id),
       |${p}tok AS (SELECT doc_id, i - 1 AS p, toks[i] AS tk
       |        FROM ${p}t, LATERAL unnest(range(1, len(toks) + 1)) AS u(i)),
       |${p}kept AS (SELECT k.doc_id, k.p, k.tk FROM ${p}tok k
       |         WHERE NOT EXISTS (SELECT 1 FROM ${p}spn s2
       |           WHERE s2.doc_id = k.doc_id
       |             AND k.p >= s2.span_start AND k.p < s2.span_end)),
       |${p}agg AS (SELECT doc_id, count(*) AS n_kept,
       |          string_agg(tk, ' ' ORDER BY p) AS text
       |        FROM ${p}kept GROUP BY doc_id)""".stripMargin

  /** The FULL curation recipe's stage chain — ONE definition consumed by
    * `pipeline_curate_corpus_full` (the admitted rows),
    * `pipeline_curate_funnel` (per-stage survivor accounting) and
    * `pipeline_curate_export` (the packed/sharded training artifact).
    * Returns (ord, stage, survivors-so-far); the LAST frame is the
    * budget-admitted output. Checkpoint decisions are measured — see
    * the flagship entry's comment.
    *
    * Session-memoized per dir (VERDICT r14 #3): the chain's staged
    * localCheckpoints materialize at CONSTRUCTION time, so without the
    * memo every consumer re-paid the full gate→LM→dedup→screen→budget
    * build (~9 s at sf0.1 — the funnel was the slowest catalog entry
    * purely from re-running the flagship's chain). With it the first
    * consumer in a session pays the build and the rest reuse the
    * checkpointed frames; each query stays independently
    * oracle-checkable because the frames (and hashes) are identical
    * either way.
    */
  private def curateFullStages(s: SparkSession,
      dir: String): Seq[(Int, String, DataFrame)] =
    ArtifactCache.sessionValue(s.sparkContext, s"$dir/curate/stages") {
      buildCurateStages(s, dir)
    }

  /** Eager localCheckpoint with a construction-time trace
    * (`SPARK_GRAFT_CHAIN_TRACE=1`): the chain's staged writes
    * materialize at construction, so per-stage attribution of
    * `curate_chain_build_sec` is exactly the wall-clock inside each
    * checkpoint call. Dev aid (see [[ChainProbe]]); free when unset. */
  private[graft] def ckTraced(name: String, df: => DataFrame): DataFrame =
    traced(name)(df.localCheckpoint())

  /** Time any eager construction under the chain trace flag — by-name,
    * so internal checkpoints/actions of the wrapped expression are
    * attributed to its line. */
  private[graft] def traced[T](name: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val out = body
    if (sys.env.contains("SPARK_GRAFT_CHAIN_TRACE"))
      System.err.println(f"[chain] $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    out
  }

  private def buildCurateStages(s: SparkSession,
      dir: String): Seq[(Int, String, DataFrame)] = {
      val docs = t(s, dir, "documents")
      // with the chain session-memoized (one build per dir), EVERY
      // returned stage frame is a staged write (localCheckpoint): the
      // flagship reads stage 7, the funnel counts all of them twice
      // (best-of-2), the export chunks stage 7 — un-materialized
      // tails would re-run the gate/LM/fuzzy/screen subplans per
      // consumer action, which is exactly what the memoization exists
      // to stop. gate is (doc_id, n_words)-narrow; the text-bearing
      // frames are the post-gate corpus a real pipeline stages anyway.
      val gate = ckTraced("gopher_gate", TextAnalysis.gopherRules(docs)
        .where(col("pass_words") && col("pass_mwl") &&
          col("pass_alpha") && col("pass_symbol"))
        .select(col("doc_id"), col("n_words")))
      val lm = traced("ngram_lm_train")(lmOf(s, dir))
      val buckets = graft.pipeline.NgramLM.ccnetBucketsOf(docs, lm,
          sampleK = 300)
        .where(col("bucket") =!= "tail")
        .select(col("doc_id"), col("bucket"))
      // staged write #0 (r15): the gated+LM-bucketed corpus is the
      // chain's first expensive product (the LM scoring pass lives
      // under `buckets`), and with the chain session-memoized it is
      // built ONCE — materializing it makes the funnel's stage-2/3
      // counts (and the dedup stage's read) pure accounting over staged
      // data instead of re-running gate + LM per count action
      val kept = ckTraced("lm_headmid", docs.select("doc_id", "source", "text")
        .join(gate, Seq("doc_id")).join(buckets, Seq("doc_id")))
      // staged write: the exact-dedup survivor set feeds FIVE downstream
      // consumers (signatures, the Jaccard confirm's doc side, quality
      // scoring, the contamination screen, the budget), and the fuzzy
      // stage's internal localCheckpoints force separate actions — so
      // each consumer would re-run gate + LM scoring + dedup from the
      // parquet scan. A real pipeline writes the post-dedup corpus
      // between stages; localCheckpoint is that staged write (measured
      // at sf0.1: 27.0 s without it, 7.6 s with).
      val canon = ckTraced("exact_dedup", graft.pipeline.Dedup.exactDedup(kept))
      // fuzzy near-dup among the exact-dedup survivors. The cands
      // checkpoint is MEASURED load-bearing (r14, VERDICT #5 asked to
      // try dropping it — JobProbe, sf0.1/local[32], steady-state,
      // interleaved A/B): with it 63 jobs / 7.9-10.6 s; without it 57
      // jobs but 9.7-12.3 s — the candidate list feeds FOUR subplans
      // inside jaccardPairsByHash (the id semi-join side and three pair
      // joins) and the band-self-join+distinct recompute past
      // ReusedExchange coverage costs more than the one saved
      // materialization; a persist()+unpersist() middle form measured
      // 79 jobs / 8.5-8.9 s (InMemoryRelation splits the confirm into
      // more jobs). Fewer jobs ≠ faster here; the eager checkpoint
      // stays.
      val sigs = Dedup.minhashSignatures(canon, numPerms = 8)
      val cands = ckTraced("lsh_cands", Dedup.lshCandidatePairs(sigs, rowsPerBand = 4))
      val confirmed = ckTraced("jaccard_confirm", Dedup.jaccardPairsByHash(canon, cands)
        .where(col("jaccard") >= 0.5).select("a", "b"))
      // size-gated components: the checkpointed confirm list is tiny at
      // fixture scale (driver union-find, ~2 s of per-round scheduling
      // saved) and falls back to the distributed propagation past 100k
      // pairs — dedup_components keeps certifying the distributed path
      val comp = traced("components")(Dedup.connectedComponentsAuto(confirmed))
        .select(col("v").as("doc_id"), col("comp").as("component"))
      val withComp = canon.select("doc_id")
        .join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
      val q = TextAnalysis.qualityScore(canon)
        .select(col("doc_id"), microUnits(col("quality_score"), 6).as("score"))
      val surv = Dedup.canonicalByScore(withComp, q)
        .where(col("kept")).select("doc_id")
      val canonSurv = ckTraced("fuzzy_canonical", canon.join(surv, Seq("doc_id"), "left_semi"))
      // VARIABLE-LENGTH exact-substring trim WITHIN the fuzzy survivors
      // (VERDICT r15 #2): Lee et al. 2022 runs ExactSubstr removal as a
      // curation stage AFTER doc-level dedup — doc counts stay flat
      // while token mass drops, the first stage to exercise that
      // distinction in the funnel. n_words becomes the TRIMMED token
      // count (the budget then admits by post-trim mass) and text the
      // re-joined survivors, which is what downstream decontamination
      // and the tokenizer-true export consume. minLen is FIXTURE-SCALED
      // to 5 (the knob discipline of vocab 48 / seqLen 128 / budget
      // 400): the jaccard-0.5 fuzzy stage leaves no ≥6-token shared
      // span in the synthetic corpus (probed: post-fuzzy dup_len maxes
      // at 5), while Lee et al.'s published 50-BPE-token threshold
      // assumes real-web partial overlaps; the standalone
      // dedup_suffix_trim keeps the operator default 8 on raw docs.
      val trimRes = traced("suffix_trim_lcp")(
        Dedup.suffixDupTrim(canonSurv, minLen = 5, cap = 24))
      val trimmed = ckTraced("span_trimmed", canonSurv
        .select("doc_id", "source", "bucket")
        .join(trimRes.select(col("doc_id"),
          col("n_kept").cast("long").as("n_words"), col("text")),
          Seq("doc_id")))
      // decontamination: the held-out set is excerpts of the first 10
      // raw docs (the contamination_screen fixture) — an EXTERNAL
      // benchmark, screened against the post-dedup TRIMMED survivors
      val bench = docs.where(col("doc_id") < 10)
        .select(col("doc_id").as("bench_id"),
          substring(col("text"), 21, 80).as("text"))
      val contaminated = graft.pipeline.Contamination
        .screen(trimmed, bench, n = 5, minShared = 3)
        .select("doc_id").distinct()
      val clean = ckTraced("decontaminated", trimmed.join(contaminated, Seq("doc_id"), "left_anti"))
      // PER-SOURCE budgets (VERDICT r13 #2): the recipe's real users
      // write "100B web / 20B code / 5B books", so the composition ends
      // in tokenBudgetPerGroup — budgets derive from the source name
      // (src<k> → 400 + (k%5)·200, the sample_token_budget_per_source
      // convention) and every fifth source is deliberately UNBUDGETED,
      // exercising the missing-stratum drop inside the composition
      // (reference analog: the per-dataset qg/doc/gtq mixture weights,
      // MEVI/main.py:374-376)
      val srcNum = substring(col("source"), 4, 10).cast("long")
      val budgets = clean.select("source").distinct()
        .where(pmod(srcNum, lit(5L)) =!= 4L)
        .withColumn("budget", lit(400L) + pmod(srcNum, lit(5L)) * 200L)
      val admitted = ckTraced("budget_admitted", graft.pipeline.Sampling
        .tokenBudgetPerGroup(
          clean.drop("text"), "source", budgets, nTokCol = "n_words"))
    Seq(
      (1, "raw", docs),
      (2, "gopher_gate", gate),
      (3, "lm_headmid", kept),
      (4, "exact_dedup", canon),
      (5, "fuzzy_canonical", canonSurv),
      (6, "span_trimmed", trimmed),
      (7, "decontaminated", clean),
      (8, "budget_admitted", admitted))
  }

  /** Shard sizing for the tokenizer-true export (VERDICT r15 #8): the
    * shard COUNT derives from the packed token mass — ceil(total
    * tokens / this) — instead of a hard-coded 8, the way a real run
    * sizes shards; the md5-rank deal keeps the ±1 balance property at
    * any count (ExportSpec pins it at a non-power-of-two). Integer
    * formula on both sides (a double ceil would round differently past
    * 2^53 at real corpus scale). */
  private[graft] val TokensPerShard = 4096L

  /** Trained unigram-LM tokenizer for a fixture dir — ONE cache key
    * shared by text_unigram_tokenize, the curated export and the pack
    * witness, and the registration point for their generated oracles
    * (dirUnigram feeds oracleSql's dynamic section). */
  private def unigramOf(s: SparkSession,
      dir: String): graft.pipeline.Unigram.Model = {
    val model = ArtifactCache.value(s"$dir/unigram48") {
      traced("unigram_train")(
        graft.pipeline.Unigram.train(t(s, dir, "documents"),
          vocabSize = 48, maxPieceLen = 4, seedSize = 200, nIters = 4))
    }
    dirUnigram.put(dir, model)
    lastDir = Some(dir)
    model
  }

  /** Token-id stream → training artifact: pack a tokenized corpus
    * (doc_id, n_tokens, ids) into fixed `seqLen`-token sequences
    * carrying their TOKEN-ID payload, md5-rank shuffled and dealt into
    * ceil(total/[[TokensPerShard]]) shards. The concat-and-chunk layout
    * is [[graft.pipeline.Packing.chunkSpans]] (two-level prefix scan,
    * no global window); the payload is assembled by slicing each doc's
    * id array into its spans ((seq·L + off_in_seq) − start, a per-row
    * arithmetic slice — no token-level join) and re-concatenating per
    * sequence (bounded agg: ≤ seqLen ids per group). Output one row per
    * sequence: (shard, shard_pos, seq_id, n_tokens, token_ids). Shared
    * by the session-memoized curated export and the un-memoized
    * pipeline_curate_pack scaling witness. */
  private[graft] def packTokenStream(idsIn: DataFrame,
      seqLen: Int = 128, materialized: Boolean = false,
      orderCol: Option[String] = None): DataFrame = {
    // staged write: the id table feeds the span layout, the total-mass
    // count and the payload join — without it the tokenize pass would
    // re-run per consumer. Callers that already hold a checkpointed id
    // frame (the session-memoized export) pass materialized=true and
    // skip the redundant re-checkpoint job.
    val ids = if (materialized) idsIn else idsIn.localCheckpoint()
    val L = seqLen.toLong
    // orderCol: a UNIQUE alternative stream order (e.g. the in-context
    // export's (cell, doc_id) dense rank) — the chunk layout ranks by
    // it, then maps back to doc_id for the payload join
    val orderKey = orderCol.getOrElse("doc_id")
    // total token mass read off the chunk layout's own prefix-scan
    // collect (r17) — the previous separate ids-sum aggregate action is
    // gone; identical value (the scan's bucket sums cover every row)
    val (packedRaw, totalTokens) = graft.pipeline.Packing.chunkSpansWithTotal(
      ids.select(orderKey, "n_tokens"), seqLen, idCol = orderKey,
      keepStart = true)
    val packed =
      if (orderKey == "doc_id") packedRaw
      else packedRaw.join(ids.select(orderKey, "doc_id"), Seq(orderKey))
        .drop(orderKey)
    val numShards = math.max(1L,
      (totalTokens + TokensPerShard - 1) / TokensPerShard)
    val slices = packed.join(ids.select("doc_id", "ids"), Seq("doc_id"))
      .select(col("seq_id"), col("off_in_seq"),
        slice(col("ids"),
          (col("seq_id") * L + col("off_in_seq") - col("start") + 1L)
            .cast("int"),
          col("n_tok").cast("int")).as("piece_ids"))
    // staged write (r17): the assembled per-sequence payload feeds BOTH
    // the shard-position scan (via `seqs`) and the final join — without
    // it the sort_array/flatten/concat assembly ran twice per
    // materialization (once inside the position scan's checkpoint, once
    // in the output join)
    val seqPayload = slices.groupBy("seq_id")
      .agg(sort_array(collect_list(
        struct(col("off_in_seq"), col("piece_ids")))).as("__sl"))
      .select(col("seq_id"),
        flatten(expr("transform(__sl, x -> x.piece_ids)")).as("__ids"))
      .select(col("seq_id"),
        size(col("__ids")).cast("long").as("n_tokens"),
        concat_ws(",", col("__ids").cast("array<string>")).as("token_ids"))
      .localCheckpoint()
    // shuffled global position = count of smaller (hash, seq_id) keys,
    // scan-built; seq_id tiebreak matches the oracle's row_number
    val seqs = seqPayload.select("seq_id")
      .withColumn("__hk", Dedup.md5Hash60(col("seq_id").cast("string")))
      .withColumn("__one", lit(1L))
    val positioned = graft.pipeline.Packing
      .exclusivePrefixSum(seqs, "__hk", "__one", outCol = "pos",
        tieCol = Some("seq_id"))
      .select(col("seq_id"),
        pmod(col("pos"), lit(numShards)).as("shard"),
        expr(s"pos div $numShards").as("shard_pos"))
    seqPayload.join(positioned, Seq("seq_id"))
      .select("shard", "shard_pos", "seq_id", "n_tokens", "token_ids")
  }

  /** TOKENIZER-TRUE curated-corpus export (VERDICT r15 #1): the chain's
    * budget-admitted survivors tokenized with the dir's trained
    * unigram-LM model and packed by ACTUAL token counts, each 128-token
    * sequence carrying its token-ID payload — the int64 token matrix a
    * training run memmaps (prepare_passage_tokenized.py:83-86), where
    * the r15 export stopped at layout metadata keyed by whitespace
    * n_words. Returns (ids, sharded): `ids` the per-doc token streams
    * (funnel stage 9 counts them), `sharded` the per-sequence artifact
    * rows (stage 10). Session-memoized like the stage chain it extends;
    * no dedup stage is repeated here — exact, fuzzy AND span-level
    * dedup already ran inside the chain. */
  private[graft] def curateExportFrames(s: SparkSession,
      dir: String): (DataFrame, DataFrame) =
    ArtifactCache.sessionValue(s.sparkContext, s"$dir/curate/export") {
      val stages = curateFullStages(s, dir)
      val trimmedText = stages.find(_._2 == "span_trimmed").get._3
        .select("doc_id", "text")
      val admitted = stages.last._3
      val model = unigramOf(s, dir)
      val admDocs = trimmedText
        .join(admitted.select("doc_id"), Seq("doc_id"), "left_semi")
      val ids = ckTraced("tokenize_ids",
        graft.pipeline.Unigram.tokenizeIds(admDocs, model))
      val sharded = ckTraced("pack_shards",
        packTokenStream(ids, seqLen = 128, materialized = true))
      (ids, sharded)
    }

  /** IN-CONTEXT curated export (r16): the SAME tokenizer-true export,
    * but the document stream is laid out in (embedding k-means cell,
    * doc_id) order before chunking — related documents share training
    * windows (Shi et al. 2024; the standalone `pack_semantic` is the
    * operator, this is the composition users run: curate → tokenize →
    * semantic order → pack → shard). The md5 shard deal is unchanged —
    * shards are a parallel-read surface; in-window locality is what the
    * ordering buys. Reuses the session-memoized token streams; the
    * dense (cell, doc_id) rank comes from the same exclusivePrefixSum
    * scan as every other layout op. */
  private[graft] def curateExportCtxFrame(s: SparkSession,
      dir: String): DataFrame =
    ArtifactCache.sessionValue(s.sparkContext, s"$dir/curate/exportCtx") {
      val (ids, _) = curateExportFrames(s, dir)
      val cells = ivfOf(s, dir).cells
        .select(col("doc_id"), col("cell").cast("long").as("cell"))
      // LEFT join + sentinel cell −1: an admitted doc with no embedding
      // row still exports (it sorts ahead of every real cell) — the ctx
      // layout must never DROP training data the plain export carries.
      // The rank runs over a NARROW (doc_id, cell) projection (ADVICE
      // r16): the prefix-sum's internal checkpoint and window sort then
      // never carry the token-id payload — the payload-bearing joined
      // frame is materialized exactly ONCE, inside packTokenStream
      // (before: three payload materializations — the prefix sum's, a
      // redundant re-checkpoint in packTokenStream, and the outer one).
      val rank = graft.pipeline.Packing.exclusivePrefixSum(
        ids.select("doc_id")
          .join(cells, Seq("doc_id"), "left")
          .withColumn("cell", coalesce(col("cell"), lit(-1L)))
          .withColumn("__one", lit(1L)),
        "cell", "__one", outCol = "dpos", tieCol = Some("doc_id"))
        .select("doc_id", "dpos")
      packTokenStream(ids.join(rank, Seq("doc_id")), seqLen = 128,
          orderCol = Some("dpos"))
        .localCheckpoint()
    }

  /** Tokenizer-true export CTE chain (VERDICT r15 #1), appended after
    * the curation oracle's `cum` CTE: admitted doc ids → trimmed text
    * (`admt`, from trimdoc) → unigram Viterbi replay with token ids
    * carried through the DP (GeneratedOracles.unigramDpCtes, prefix z)
    * → per-doc exclusive prefix sum in doc_id order → global token
    * stream positions → 128-token sequences → md5-rank row_number →
    * shard deal with the count derived from the token mass
    * (ceil(total/[[TokensPerShard]]), integer form). `m` is the
    * caller's MATERIALIZED wrapper — `zsq` is read by the shard-count
    * scalar and the payload agg, `zpay` by the rank and the final
    * join, exactly where DuckDB's single-reference CTE inlining
    * re-evaluates the upstream chain (the funnel OOM lesson). */
  private def tokenExportCtesSql(model: graft.pipeline.Unigram.Model,
      m: String => String, admWhere: String = "cum <= budget",
      ctxCb: Option[graft.index.Codebook] = None): String = {
    // ctx (in-context export): the stream prefix sum orders by
    // (embedding cell, doc_id) — cells from the inlined-centroid
    // nearest-neighbor assignment (prefix y; assign1Ctes is the same
    // generator every codebook oracle uses)
    val cellCtes = ctxCb.map(cb =>
      s"""${graft.oracle.GeneratedOracles.assign1Ctes(cb, "embeddings", "y")},
         |${m("zcell")} (SELECT doc_id, CAST(k0 AS BIGINT) AS cell FROM ya0),
         |""".stripMargin).getOrElse("")
    val zecOrder = if (ctxCb.isDefined) "cell, doc_id" else "doc_id"
    // LEFT join + COALESCE(-1): the engine's missing-embedding sentinel
    val zecSrc =
      if (ctxCb.isDefined)
        "(SELECT zn.doc_id, zn.n, COALESCE(zcell.cell, -1) AS cell " +
          "FROM zn LEFT JOIN zcell USING (doc_id))"
      else "zn"
    s"""adm AS (SELECT doc_id FROM cum WHERE $admWhere),
       |${m("admt")} (SELECT trimdoc.doc_id, trimdoc.text
       |  FROM trimdoc JOIN adm USING (doc_id)),
       |${graft.oracle.GeneratedOracles.unigramDpCtes(model, "admt", "z")},
       |${m("zwx")} (SELECT doc_id, unnest(words) AS w,
       |    generate_subscripts(words, 1) AS i FROM zd),
       |${m("zn")} (SELECT zwx.doc_id,
       |    CAST(sum(len(string_split(b.ids, ','))) AS BIGINT) AS n
       |  FROM zwx JOIN zbest b ON b.w = zwx.w GROUP BY zwx.doc_id),
       |$cellCtes${m("zec")} (SELECT doc_id, n,
       |    CAST(COALESCE(SUM(n) OVER (ORDER BY $zecOrder
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
       |  FROM $zecSrc WHERE n > 0),
       |zil AS (SELECT zwx.doc_id, zwx.i, string_split(b.ids, ',') AS tl
       |  FROM zwx JOIN zbest b ON b.w = zwx.w),
       |ztk AS (SELECT doc_id, i, u.j, CAST(tl[u.j] AS BIGINT) AS tid
       |  FROM zil, LATERAL unnest(range(1, len(tl) + 1)) AS u(j)),
       |zpos AS (SELECT z.doc_id, z.tid,
       |    e.st + row_number() OVER (PARTITION BY z.doc_id
       |      ORDER BY z.i, z.j) - 1 AS gpos
       |  FROM ztk z JOIN zec e ON e.doc_id = z.doc_id),
       |${m("zsq")} (SELECT gpos // 128 AS seq_id, gpos, tid FROM zpos),
       |zsn AS (SELECT GREATEST(CAST(1 AS BIGINT),
       |    (count(*) + ${TokensPerShard - 1}) // $TokensPerShard) AS ns
       |  FROM zsq),
       |${m("zpay")} (SELECT seq_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    string_agg(CAST(tid AS VARCHAR), ',' ORDER BY gpos) AS token_ids
       |  FROM zsq GROUP BY seq_id),
       |zps AS (SELECT seq_id,
       |    row_number() OVER (ORDER BY
       |      CAST('0x' || substr(md5(CAST(seq_id AS VARCHAR)), 1, 15) AS BIGINT),
       |      seq_id) - 1 AS pos
       |  FROM zpay)""".stripMargin
  }

  /** The flagship curation recipe oracle's CTE chain (gate, LM
    * buckets, exact dedup, banding, recursive components, survivor
    * policy, decontamination grams, budget walk), shared by the
    * admitted-rows oracle, the funnel accounting oracle and the export
    * oracle — one SQL definition for all three, mirroring
    * curateFullStages. `withExport` appends [[exportCtesSql]]. */
  private def curateFullSql(finalSelect: String,
      materializeStages: Boolean = false,
      exportModel: Option[graft.pipeline.Unigram.Model] = None,
      exportCtxCb: Option[graft.index.Codebook] = None): String = {
    // the funnel's final select counts SEVEN stage CTEs via scalar
    // subqueries; DuckDB inlines single-reference CTEs, so without
    // materialization each count re-evaluates the whole upstream chain
    // concurrently — OOM at sf0.1 (observed). MATERIALIZED pins each
    // counted stage to one evaluation; the admitted-rows oracle keeps
    // the default inlining (hash-green at all sfs as-is).
    def m(name: String) =
      if (materializeStages) s"$name AS MATERIALIZED" else s"$name AS"
    val sql =
      s"""WITH RECURSIVE ${m("w")} (SELECT doc_id, text,
         |    list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0) AS words
         |  FROM documents),
         |c AS (SELECT doc_id,
         |    CAST(len(words) AS BIGINT) AS n_words,
         |    CAST(coalesce(list_sum(list_transform(words, x -> length(x))), 0) AS BIGINT) AS sum_word_len,
         |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
         |      + CAST(length(text) - length(replace(text, '…', '')) AS BIGINT)
         |      + CAST(len(string_split(text, '...')) - 1 AS BIGINT) AS n_symbols,
         |    CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words
         |  FROM w),
         |${m("gt")} (SELECT doc_id, n_words FROM c
         |      WHERE n_words >= 50 AND n_words <= 100000
         |        AND 3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words
         |        AND 10 * n_symbols <= n_words
         |        AND 5 * n_alpha_words >= 4 * n_words),
         |t AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) - 1 AS pos
         |  FROM (SELECT doc_id,
         |          list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0) AS l
         |        FROM documents)),
         |b AS (SELECT doc_id, pos, w AS w1,
         |        lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM t),
         |bg AS (SELECT doc_id, pos, w1, w2 FROM b WHERE w2 IS NOT NULL),
         |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY w1, w2),
         |uc AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS cw FROM bc GROUP BY w1),
         |v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM t),
         |lp AS (SELECT bg.doc_id, bg.pos,
         |        ln((COALESCE(bc.cnt, 0) + 1.0) / (COALESCE(uc.cw, 0) + v.v)) AS lp
         |      FROM bg LEFT JOIN bc USING (w1, w2) LEFT JOIN uc USING (w1) CROSS JOIN v),
         |sc AS (SELECT doc_id,
         |        CAST(floor(list_sum(list(lp ORDER BY pos)) / count(*) * 1000000 + 0.5) AS BIGINT) AS lm_micro
         |      FROM lp GROUP BY doc_id),
         |sm AS (SELECT doc_id, lm_micro
         |      FROM sc
         |      ORDER BY CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT), doc_id
         |      LIMIT 300),
         |rk AS (SELECT lm_micro,
         |        row_number() OVER (ORDER BY lm_micro DESC, doc_id ASC) AS rn,
         |        count(*) OVER () AS n
         |      FROM sm),
         |ct AS (SELECT max(CASE WHEN rn = (n + 2) // 3 THEN lm_micro END) AS t1,
         |              max(CASE WHEN rn = (n * 2 + 2) // 3 THEN lm_micro END) AS t2
         |       FROM rk),
         |bkt AS (SELECT sc.doc_id,
         |        CASE WHEN sc.lm_micro >= ct.t1 THEN 'head'
         |             WHEN sc.lm_micro >= ct.t2 THEN 'middle'
         |             ELSE 'tail' END AS bucket
         |       FROM sc CROSS JOIN ct),
         |${m("keep")} (SELECT d.doc_id, d.source, d.text, gt.n_words, bkt.bucket
         |        FROM documents d JOIN gt USING (doc_id) JOIN bkt USING (doc_id)
         |        WHERE bkt.bucket <> 'tail'),
         |${m("canon")} (SELECT doc_id, source, bucket, n_words, text FROM (
         |        SELECT keep.*, row_number() OVER (PARTITION BY md5(text)
         |          ORDER BY doc_id ASC) AS rn FROM keep)
         |      WHERE rn = 1),
         |${minhashPairsCteFrom("canon", "m")},
         |pairs AS (SELECT a, b FROM mjac WHERE jaccard >= 0.5),
         |e AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         |reach(vv, l) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, r.l FROM e JOIN reach r ON r.vv = e.dst),
         |${m("comp")} (SELECT vv AS doc_id, min(l) AS component FROM reach GROUP BY vv),
         |allc AS (SELECT canon.doc_id, coalesce(comp.component, canon.doc_id) AS component
         |         FROM canon LEFT JOIN comp USING (doc_id)),
         |qm AS (SELECT doc_id,
         |        CAST(len(toks) AS DOUBLE) AS nt,
         |        CAST(length(text) AS DOUBLE) AS nc,
         |        CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS np,
         |        len(list_filter(toks, x -> x IN ($stopwordListSql))) / greatest(len(toks), 1) AS swr
         |      FROM (SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS toks FROM canon)),
         |q AS (SELECT doc_id,
         |        CAST(floor((least(nt / 64.0, 1.0) * 0.4
         |          + greatest(1.0 - np / greatest(nc, 1.0) * 10, 0.0) * 0.3
         |          + least(swr * 10, 1.0) * 0.3) * 1000000 + 0.5) AS BIGINT) AS q_micro
         |      FROM qm),
         |scq AS (SELECT a.doc_id, a.component, q.q_micro FROM allc a JOIN q USING (doc_id)),
         |best AS (SELECT component, doc_id AS canonical_id FROM scq
         |      QUALIFY row_number() OVER (PARTITION BY component
         |        ORDER BY q_micro DESC, doc_id ASC) = 1),
         |${m("surv")} (SELECT canon.* FROM canon JOIN best ON canon.doc_id = best.canonical_id),
         |${suffixLcpCtes("surv", "x", n => s"$n AS MATERIALIZED")},
         |${suffixTrimCtes("x", 5, n => s"$n AS MATERIALIZED")},
         |trimdoc AS MATERIALIZED (SELECT surv.doc_id, surv.source, surv.bucket,
         |        CAST(coalesce(xagg.n_kept, 0) AS BIGINT) AS n_words,
         |        coalesce(xagg.text, '') AS text
         |      FROM surv LEFT JOIN xagg USING (doc_id)),
         |sg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
         |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g
         |      FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM trimdoc)),
         |sgh AS (SELECT doc_id, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS hh FROM sg),
         |b0 AS (SELECT doc_id AS bench_id, substr(text, 21, 80) AS text FROM documents WHERE doc_id < 10),
         |bgr AS (SELECT bench_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
         |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g
         |      FROM (SELECT bench_id, string_split_regex(lower(text), '\\s+') AS toks FROM b0)),
         |bgh AS (SELECT bench_id, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS hh FROM bgr),
         |contam AS (SELECT DISTINCT doc_id FROM (
         |        SELECT sgh.doc_id, bgh.bench_id FROM sgh JOIN bgh USING (hh)
         |        GROUP BY sgh.doc_id, bgh.bench_id HAVING count(*) >= 3)),
         |${m("clean")} (SELECT trimdoc.doc_id, trimdoc.source, trimdoc.bucket, trimdoc.n_words
         |        FROM trimdoc LEFT JOIN contam ON trimdoc.doc_id = contam.doc_id
         |        WHERE contam.doc_id IS NULL),
         |bud AS (SELECT source,
         |        400 + (TRY_CAST(substr(source, 4, 10) AS BIGINT) % 5) * 200 AS budget
         |      FROM (SELECT DISTINCT source FROM clean)
         |      WHERE TRY_CAST(substr(source, 4, 10) AS BIGINT) % 5 <> 4),
         |${m("cum")} (SELECT doc_id, source, bucket, n_words, budget,
         |        SUM(n_words) OVER (PARTITION BY source
         |          ORDER BY CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT) % 1000000 ASC,
         |                   doc_id ASC
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM clean JOIN bud USING (source))${
             exportModel.map(mm => ",\n" +
                 tokenExportCtesSql(mm, m, ctxCb = exportCtxCb))
               .getOrElse("")}
         |$finalSelect""".stripMargin
    sql
  }

  /** The single-pass curation WITNESS oracle (gate → LM buckets → exact
    * dedup → suffix trim → budget-400 walk), shared by
    * pipeline_curate_corpus and — with `exportModel` — pipeline_curate
    * _pack, mirroring [[curateWitnessAdmitted]] the way [[curateFullSql]]
    * mirrors curateFullStages. The trim CTEs are the same
    * suffixLcpCtes/suffixTrimCtes generators the standalone
    * dedup_suffix_trim oracle uses, here over `canon`. */
  private def curateWitnessSql(finalSelect: String,
      exportModel: Option[graft.pipeline.Unigram.Model] = None): String = {
    def mat(n: String) = s"$n AS MATERIALIZED"
    s"""WITH w AS (SELECT doc_id, text,
       |    list_filter(string_split_regex(text, '\\s+'), x -> length(x) > 0) AS words
       |  FROM documents),
       |c AS (SELECT doc_id,
       |    CAST(len(words) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(words, x -> length(x))), 0) AS BIGINT) AS sum_word_len,
       |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
       |      + CAST(length(text) - length(replace(text, '…', '')) AS BIGINT)
       |      + CAST(len(string_split(text, '...')) - 1 AS BIGINT) AS n_symbols,
       |    CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words
       |  FROM w),
       |gt AS (SELECT doc_id FROM c
       |      WHERE n_words >= 50 AND n_words <= 100000
       |        AND 3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words
       |        AND 10 * n_symbols <= n_words
       |        AND 5 * n_alpha_words >= 4 * n_words),
       |t AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) - 1 AS pos
       |  FROM (SELECT doc_id,
       |          list_filter(string_split_regex(lower(text), '\\s+'), x -> length(x) > 0) AS l
       |        FROM documents)),
       |b AS (SELECT doc_id, pos, w AS w1,
       |        lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM t),
       |bg AS (SELECT doc_id, pos, w1, w2 FROM b WHERE w2 IS NOT NULL),
       |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt FROM bg GROUP BY w1, w2),
       |uc AS (SELECT w1, CAST(sum(cnt) AS BIGINT) AS cw FROM bc GROUP BY w1),
       |v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM t),
       |lp AS (SELECT bg.doc_id, bg.pos,
       |        ln((COALESCE(bc.cnt, 0) + 1.0) / (COALESCE(uc.cw, 0) + v.v)) AS lp
       |      FROM bg LEFT JOIN bc USING (w1, w2) LEFT JOIN uc USING (w1) CROSS JOIN v),
       |sc AS (SELECT doc_id,
       |        CAST(floor(list_sum(list(lp ORDER BY pos)) / count(*) * 1000000 + 0.5) AS BIGINT) AS lm_micro
       |      FROM lp GROUP BY doc_id),
       |sm AS (SELECT doc_id, lm_micro
       |      FROM sc
       |      ORDER BY CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT), doc_id
       |      LIMIT 300),
       |rk AS (SELECT lm_micro,
       |        row_number() OVER (ORDER BY lm_micro DESC, doc_id ASC) AS rn,
       |        count(*) OVER () AS n
       |      FROM sm),
       |ct AS (SELECT max(CASE WHEN rn = (n + 2) // 3 THEN lm_micro END) AS t1,
       |              max(CASE WHEN rn = (n * 2 + 2) // 3 THEN lm_micro END) AS t2
       |       FROM rk),
       |bkt AS (SELECT sc.doc_id,
       |        CASE WHEN sc.lm_micro >= ct.t1 THEN 'head'
       |             WHEN sc.lm_micro >= ct.t2 THEN 'middle'
       |             ELSE 'tail' END AS bucket
       |       FROM sc CROSS JOIN ct),
       |keep AS (SELECT d.doc_id, d.source, d.text, bkt.bucket
       |        FROM documents d JOIN gt USING (doc_id) JOIN bkt USING (doc_id)
       |        WHERE bkt.bucket <> 'tail'),
       |${mat("canon")} (SELECT doc_id, source, bucket, text FROM (
       |        SELECT keep.*, row_number() OVER (PARTITION BY md5(text)
       |          ORDER BY doc_id ASC) AS rn FROM keep)
       |      WHERE rn = 1),
       |${suffixLcpCtes("canon", "x", mat)},
       |${suffixTrimCtes("x", 5, mat)},
       |${mat("trimdoc")} (SELECT canon.doc_id, canon.source, canon.bucket,
       |        CAST(coalesce(xagg.n_kept, 0) AS BIGINT) AS n_words,
       |        coalesce(xagg.text, '') AS text
       |      FROM canon LEFT JOIN xagg USING (doc_id)),
       |${mat("cum")} (SELECT doc_id, source, bucket, n_words,
       |        SUM(n_words) OVER (PARTITION BY source
       |          ORDER BY CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT) % 1000000 ASC,
       |                   doc_id ASC
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |      FROM trimdoc)${
           exportModel.map(mm => ",\n" +
             tokenExportCtesSql(mm, mat, admWhere = "cum <= 400"))
             .getOrElse("")}
       |$finalSelect""".stripMargin
  }

  /** Final select of the tokenizer-true export oracles (the curated
    * export and the pack witness): one row per packed sequence with its
    * token-id payload, shard-dealt by the derived count. */
  private def tokenExportSelectSql: String =
    """SELECT CAST(zps.pos % (SELECT ns FROM zsn) AS BIGINT) AS shard,
      |  CAST(zps.pos // (SELECT ns FROM zsn) AS BIGINT) AS shard_pos,
      |  zpay.seq_id, zpay.n_tokens, zpay.token_ids
      |FROM zpay JOIN zps ON zps.seq_id = zpay.seq_id
      |ORDER BY shard, shard_pos""".stripMargin

  /** Funnel final select over the full-chain CTEs (10 stages, r16):
    * stage 6 is the span trim (n_docs flat, n_tokens drops), stages
    * 9/10 restate the tail in TOKENIZER mass — their n_tokens equality
    * is the built-in conservation check. */
  private def funnelSelectSql: String =
    """SELECT * FROM (
      |  SELECT 1 AS stage_ord, 'raw' AS stage,
      |    (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
      |    (SELECT CAST(coalesce(sum(len(words)), 0) AS BIGINT) FROM w) AS n_tokens
      |  UNION ALL SELECT 2, 'gopher_gate', (SELECT CAST(count(*) AS BIGINT) FROM gt),
      |    (SELECT CAST(coalesce(sum(n_words), 0) AS BIGINT) FROM gt)
      |  UNION ALL SELECT 3, 'lm_headmid', (SELECT CAST(count(*) AS BIGINT) FROM keep),
      |    (SELECT CAST(coalesce(sum(n_words), 0) AS BIGINT) FROM keep)
      |  UNION ALL SELECT 4, 'exact_dedup', (SELECT CAST(count(*) AS BIGINT) FROM canon),
      |    (SELECT CAST(coalesce(sum(n_words), 0) AS BIGINT) FROM canon)
      |  UNION ALL SELECT 5, 'fuzzy_canonical', (SELECT CAST(count(*) AS BIGINT) FROM surv),
      |    (SELECT CAST(coalesce(sum(n_words), 0) AS BIGINT) FROM surv)
      |  UNION ALL SELECT 6, 'span_trimmed', (SELECT CAST(count(*) AS BIGINT) FROM trimdoc),
      |    (SELECT CAST(coalesce(sum(n_words), 0) AS BIGINT) FROM trimdoc)
      |  UNION ALL SELECT 7, 'decontaminated', (SELECT CAST(count(*) AS BIGINT) FROM clean),
      |    (SELECT CAST(coalesce(sum(n_words), 0) AS BIGINT) FROM clean)
      |  UNION ALL SELECT 8, 'budget_admitted',
      |    (SELECT CAST(count(*) AS BIGINT) FROM cum WHERE cum <= budget),
      |    (SELECT CAST(coalesce(sum(n_words), 0) AS BIGINT) FROM cum WHERE cum <= budget)
      |  UNION ALL SELECT 9, 'tokenized', (SELECT CAST(count(*) AS BIGINT) FROM zec),
      |    (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM zec)
      |  UNION ALL SELECT 10, 'packed_sequences',
      |    (SELECT CAST(count(DISTINCT seq_id) AS BIGINT) FROM zsq),
      |    (SELECT CAST(count(*) AS BIGINT) FROM zsq)
      |) ORDER BY stage_ord""".stripMargin

  /** The UN-memoized single-pass curation witness shared by
    * pipeline_curate_corpus (admitted rows) and pipeline_curate_pack
    * (its tokenize→pack extension): Gopher gate → CCNet tail drop →
    * exact dedup → variable-length exact-substring trim → per-source
    * token budget over the TRIMMED counts. Deliberately NOT
    * session-memoized — these entries are the scaling sweep's witnesses
    * for the chain (SCALING.md names this division of labor), and a
    * memo would blind the 100× sweep. Returns the admitted rows WITH
    * trimmed text (doc_id, source, bucket, n_words, text).
    *
    * Cost note (r12, measured at sf0.1): the min-struct dedup agg +
    * histogram budget is the fastest hot-key-immune form — the probed
    * window-dedup and id-semi-join shapes both lost (1.4→3.3 s was the
    * mega-group-safety trade, named by the bench drift flag the round
    * it landed). The trim stage (r16) adds the suffix sort + LCP pass;
    * its output IS a staged write (localCheckpoint): the trim doubles
    * the canon subplan's appearances (the token side and the metadata
    * join) and the budget's histogram selection reads the result three
    * ways, which together re-ran the gate→LM→dedup chain ~6× past
    * ReusedExchange coverage (measured at sf0.1: 9.7 s un-staged vs
    * ~4 s staged — the same measured trade as the full chain's staged
    * writes). PlanSpec's shape pins read [[curateWitnessTrimmed]], the
    * pre-stage frame, since the submitted plan is checkpoint-truncated
    * (the documented pipeline_curate_corpus_full precedent). */
  private def curateWitnessAdmitted(s: SparkSession, dir: String): DataFrame =
    graft.pipeline.Sampling.tokenBudget(
      curateWitnessTrimmed(s, dir).localCheckpoint(),
      "source", budget = 400L, nTokCol = "n_words")

  /** The witness composition UP TO the budget stage, checkpoint-free —
    * the frame whose plan PlanSpec pins (min-struct dedup agg, bounded
    * ccnet sample window). */
  private[graft] def curateWitnessTrimmed(s: SparkSession,
      dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val gate = TextAnalysis.gopherRules(docs)
      .where(col("pass_words") && col("pass_mwl") &&
        col("pass_alpha") && col("pass_symbol"))
      .select(col("doc_id"))
    val buckets = graft.pipeline.NgramLM.ccnetBucketsOf(docs,
        lmOf(s, dir), sampleK = 300)
      .where(col("bucket") =!= "tail")
      .select(col("doc_id"), col("bucket"))
    val kept = docs.select("doc_id", "source", "text")
      .join(gate, Seq("doc_id")).join(buckets, Seq("doc_id"))
    val canon = graft.pipeline.Dedup.exactDedup(kept)
    // same fixture-scaled threshold as the flagship chain's stage 6
    val trimRes = Dedup.suffixDupTrim(canon, minLen = 5, cap = 24)
    canon.select("doc_id", "source", "bucket")
      .join(trimRes.select(col("doc_id"),
        col("n_kept").cast("long").as("n_words"), col("text")),
        Seq("doc_id"))
  }

  /** Query-side of the embeddings table: first 20 vectors play "queries"
    * (the fixtures carry no separate query table; deterministic + SQL-
    * expressible so oracles can reproduce it).
    */
  private[graft] def queryVecs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").where(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
        col("label"))

  private[graft] def docVecs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding").as("vec"),
        col("label"))

  /** Trained artifacts for the oracle generator, keyed by fixture dir.
    * `oracleSql` has no dir parameter (fixed driver contract), so the dump
    * targets `lastDir` — the dir the most recent query ran against. Verify
    * runs every query on ONE dir then dumps, so lastDir is always right
    * there; keying by dir (rather than keeping bare "last trained" values)
    * ensures the three artifact kinds can never mix fixture dirs even if a
    * caller interleaves dirs before dumping. */
  private val dirCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Codebook]
  private val dirIvfCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Codebook]
  // SemDeDup refinement sub-codebook: None = the refined query RAN at
  // this dir and found no over-cap cell (oracle replays the base-only
  // branch); Some(cb) = the trained sub artifact to inline
  private val dirSemSubCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Option[Codebook]]
  // derived-k SemDeDup codebook (k = autoCells(n)): the headline
  // dedup_semdedup entry trains THIS, not the fixed ivf16
  private val dirSemScaledCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, Codebook]
  private val dirRerankers =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Double], Double)]
  private val dirRotations =
    new java.util.concurrent.ConcurrentHashMap[String, graft.index.PcaRotation.Rotation]
  private val dirPqCodebooks =
    new java.util.concurrent.ConcurrentHashMap[String, graft.index.PQCodebook]
  private val dirIvfPq =
    new java.util.concurrent.ConcurrentHashMap[String, (Codebook, graft.index.PQCodebook)]
  private val dirHkmTrees =
    new java.util.concurrent.ConcurrentHashMap[String, graft.index.HierarchicalKMeans.Tree]
  private val dirSwapArtifacts =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Seq[(String, Array[Float])], Codebook)]
  private val dirAlignments =
    new java.util.concurrent.ConcurrentHashMap[String, (Codebook, Codebook, Array[Array[Int]])]
  private val dirBpeMerges =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, String)]]
  private val dirUnigram =
    new java.util.concurrent.ConcurrentHashMap[String, graft.pipeline.Unigram.Model]
  private val dirLifecycle =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Seq[(String, String)], Codebook)]
  private val dirQualityLR =
    new java.util.concurrent.ConcurrentHashMap[String, (Array[Double], Double)]
  @volatile private var lastDir: Option[String] = None

  /** Session-memoized RQ artifacts per fixture dir (path-keyed caching,
    * mirroring MEVI/main_models.py:2944-2978). */
  private def rqCodebook(s: SparkSession, dir: String): Codebook = {
    val cb = ArtifactCache.codebook(s"$dir/rq2x3") {
      // maxIter 10 suffices at the fixture geometry (2×8 over ≤5k vecs
      // converges in <10 iters); the library default stays 20
      RQTrainer.fit(docVecs(s, dir).select("doc_id", "vec"),
        "vec", numLevels = 2, k = 8, seed = 42L, maxIter = 10)
    }
    dirCodebooks.put(dir, cb)
    lastDir = Some(dir)
    cb
  }

  private def rqAssignments(s: SparkSession, dir: String): DataFrame =
    // frame cache is validity-checked per live context; the codebook is a
    // plain object and stays dir-keyed
    ArtifactCache.frame(s, s"$dir/rq2x3/assign") {
      CodeAssigner.assign(docVecs(s, dir).select("doc_id", "vec"),
        rqCodebook(s, dir))
    }

  private def rqIndex(s: SparkSession, dir: String): DataFrame =
    ArtifactCache.frame(s, s"$dir/rq2x3/index") {
      ClusterIndexBuilder.build(rqAssignments(s, dir))
    }

  /** Second-encoder artifacts (V1 pluggability): a trained Word2Vec
    * word-vector table + an RQ codebook fit on the SWAPPED doc vectors —
    * the whole retrieval stack rebuilt behind a different encoder. */
  private def swapWordVecs(s: SparkSession,
      dir: String): Seq[(String, Array[Float])] =
    ArtifactCache.value(s"$dir/w2v16") {
      graft.functions.TextEmbedder.word2vecTrain(
        t(s, dir, "documents"), dim = 16, seed = 42L)
    }

  private def swapDocVecs(s: SparkSession, dir: String): DataFrame =
    ArtifactCache.frame(s, s"$dir/w2v16/vecs") {
      graft.functions.TextEmbedder.word2vecApply(
        t(s, dir, "documents"), swapWordVecs(s, dir))
    }

  private def swapCodebook(s: SparkSession, dir: String): Codebook =
    ArtifactCache.codebook(s"$dir/w2v16/rq2x8") {
      RQTrainer.fit(swapDocVecs(s, dir).select("doc_id", "vec"), "vec",
        numLevels = 2, k = 8, seed = 42L, maxIter = 10)
    }

  /** doc_multiclus=T top-T assignments (doc beam search) — T rows/doc. */
  private def rqMulticlusAssignments(s: SparkSession, dir: String,
      t: Int = 2): DataFrame =
    ArtifactCache.frame(s, s"$dir/rq2x3/multiclus$t") {
      CodeAssigner.assignTopK(docVecs(s, dir).select("doc_id", "vec"),
        rqCodebook(s, dir), t = t)
    }

  /** Multicluster inverted index (main_models.py:3246-3266): a doc is a
    * member of each of its top-T tuples' clusters. */
  private def rqMulticlusIndex(s: SparkSession, dir: String,
      t: Int = 2): DataFrame =
    ArtifactCache.frame(s, s"$dir/rq2x3/multiclus$t/index") {
      ClusterIndexBuilder.build(
        rqMulticlusAssignments(s, dir, t).select("doc_id", "codes"))
    }

  /** Token-containment matches (J5), dir-memoized — j5 reports them and
    * a9 inverts them; without sharing, each pays the corpus tokenization
    * + window scan separately. */
  private def answerMatches(s: SparkSession, dir: String): DataFrame =
    ArtifactCache.frame(s, s"$dir/answers/token_matches") {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val answers = t(s, dir, "documents").where(col("doc_id") < 10)
        .select(col("doc_id").as("query_idx"),
          concat_ws(" ", slice(split(col("text"), "\\s+"), 5, 2)).as("answer"))
      AnswerIndex.tokenContainmentJoin(docs, answers)
    }

  /** NN-descent k-NN graph over the fixture corpus (dir-memoized; the
    * build localCheckpoints itself, so no extra persist). */
  private def knnGraphOf(s: SparkSession, dir: String): DataFrame =
    ArtifactCache.frame(s, s"$dir/knn_graph8x2", persist = false) {
      graft.search.KnnGraph.build(docVecs(s, dir).select("doc_id", "vec"),
        ivfOf(s, dir).cells, k = 8, rounds = 2)
    }

  /** Shared body of the topic-mix queries (r = topic_score_ratio; dedup =
    * the reference's multiclus_score_aggr, "max" or "sum"). */
  private def coarseFineTopic(s: SparkSession, dir: String, r: Double,
      dedup: String = "max", t: Int = 2): DataFrame = {
    val docs = docVecs(s, dir).select("doc_id", "vec")
    val queries = queryVecs(s, dir).select("query_id", "qvec")
    val proba = ArtifactCache.frame(s, s"$dir/rq2x3/multiclus$t/proba") {
      CoarseFineRetriever.docClusterProba(
        rqMulticlusAssignments(s, dir, t), docs, rqCodebook(s, dir))
    }
    CoarseFineRetriever.retrieve(queries, rqMulticlusIndex(s, dir, t), docs,
      rqCodebook(s, dir), beams = 4, k = 10, dedup = dedup,
      topicMix = Some(proba), topicRatio = r)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("doc_id"), round(col("score"), 6).as("score"))
      .orderBy("query_id", "rank")
  }

  /** Dir-memoized corpus bigram LM (three catalog queries — lm_score,
    * ccnet buckets, the curate pipeline — train the identical model;
    * the count tables persist once per live context). */
  private def lmOf(s: SparkSession, dir: String): graft.pipeline.NgramLM.Model = {
    val docs = t(s, dir, "documents")
    // ONE corpus pass per model build (r18, VERDICT r17 #2): the
    // nullable-next pair table is the only corpus-sized job; bigrams
    // are a filter over the persisted pairs, unigrams a table-sized
    // agg, and vocab a table-sized distinct count — the r16/r17 form
    // paid a SECOND full tokenize pass for vocabCount
    val pairs = ArtifactCache.frame(s, s"$dir/lm/pairs")(
      graft.pipeline.NgramLM.pairCounts(docs))
    val big = graft.pipeline.NgramLM.bigramsFrom(pairs)
    graft.pipeline.NgramLM.Model(
      big,
      ArtifactCache.frame(s, s"$dir/lm/unigrams")(
        graft.pipeline.NgramLM.unigramsFrom(big)),
      ArtifactCache.value(s"$dir/lm/vocab")(
        graft.pipeline.NgramLM.vocabCountFrom(pairs)))
  }

  /** 16-cell IVF structure over the fixture embeddings (dir-memoized). */
  private[graft] def ivfOf(s: SparkSession, dir: String): graft.search.IVFIndex.IVF = {
    val cb = ArtifactCache.codebook(s"$dir/ivf16") {
      RQTrainer.fit(docVecs(s, dir).select("doc_id", "vec"), "vec",
        numLevels = 1, k = 16, seed = 42L, maxIter = 10)
    }
    dirIvfCodebooks.put(dir, cb)
    lastDir = Some(dir)
    val cells = ArtifactCache.frame(s, s"$dir/ivf16/cells",
        layout = Seq(col("cell"))) {
      CodeAssigner.assign(docVecs(s, dir).select("doc_id", "vec"), cb)
        .select(col("doc_id"), col("codes").getItem(0).as("cell"))
        .repartition(col("cell"))
    }
    graft.search.IVFIndex.IVF(cb, cells)
  }

  /** Derived-k IVF for the headline SemDeDup entry: k = autoCells(n,
    * targetCell=256) — the cluster count production derives from the
    * corpus so expected cell size stays flat as it grows (VERDICT r12
    * #4: the first SemDeDup shape a reader meets must be the one a
    * 100 TB corpus runs; fixed k=16 lives on as the
    * dedup_semdedup_fixedk oracle fixture). Dir-memoized like ivfOf;
    * at sf0.01 autoCells floors to the same k=16, at sf0.1 it derives
    * k=20. */
  private def semScaledIvfOf(s: SparkSession, dir: String)
      : graft.search.IVFIndex.IVF = {
    val n = ArtifactCache.value(s"$dir/semscaled/n") {
      t(s, dir, "embeddings").count()
    }
    val k = graft.pipeline.Dedup.autoCells(n, targetCell = 256)
    val cb = ArtifactCache.codebook(s"$dir/semscaled$k") {
      RQTrainer.fit(docVecs(s, dir).select("doc_id", "vec"), "vec",
        numLevels = 1, k = k, seed = 42L, maxIter = 10)
    }
    dirSemScaledCodebooks.put(dir, cb)
    lastDir = Some(dir)
    val cells = ArtifactCache.frame(s, s"$dir/semscaled$k/cells",
        layout = Seq(col("cell"))) {
      CodeAssigner.assign(docVecs(s, dir).select("doc_id", "vec"), cb)
        .select(col("doc_id"), col("codes").getItem(0).as("cell"))
        .repartition(col("cell"))
    }
    graft.search.IVFIndex.IVF(cb, cells)
  }

  /** Plain-PQ codebook over the fixture embeddings: 4 slices × 8 cents
    * (dim 64 → 16-wide sub-vectors), dir-memoized like the RQ artifacts. */
  private def pqCodebookOf(s: SparkSession, dir: String): graft.index.PQCodebook = {
    val cb = ArtifactCache.value(s"$dir/pq4x8") {
      graft.index.PQTrainer.fit(docVecs(s, dir).select("doc_id", "vec"),
        "vec", numSub = 4, k = 8, seed = 42L, maxIter = 10)
    }
    dirPqCodebooks.put(dir, cb)
    lastDir = Some(dir)
    cb
  }

  /** IVF-PQ composite index over the fixture embeddings: 16 coarse cells,
    * 4×8 residual PQ. Codebooks cache across sessions; the (cheap,
    * train-free) code table is re-encoded per live session. */
  private def ivfPqOf(s: SparkSession, dir: String): graft.search.IVFPQ.Index = {
    val codesKey = s"$dir/ivfpq16_4x8/codes"
    val (coarse, pq) = ArtifactCache.value(s"$dir/ivfpq16_4x8") {
      val idx = graft.search.IVFPQ.build(docVecs(s, dir).select("doc_id", "vec"),
        coarseK = 16, numSub = 4, k = 8, seed = 42L, maxIter = 10)
      // seed the frame cache with build's (already materialized) code
      // table so the cold path doesn't re-encode the corpus right after
      ArtifactCache.frame(s, codesKey, persist = false)(idx.codes): Unit
      (idx.coarse, idx.pq)
    }
    dirIvfPq.put(dir, (coarse, pq))
    lastDir = Some(dir)
    // warm path (fresh session, cached codebooks): one train-free encode
    val codes = ArtifactCache.frame(s, codesKey, persist = false) {
      graft.search.IVFPQ.encode(docVecs(s, dir).select("doc_id", "vec"),
        coarse, pq).localCheckpoint()
    }
    graft.search.IVFPQ.Index(coarse, pq, codes)
  }

  /** Force-build the per-dir trained artifacts: RQ codebook fit +
    * assignment + cluster index, IVF cells, ensemble candidate tables, and
    * the reranker LR fit. Benchmarks call this before their timing loop so
    * one-time builds don't land on whichever consumer query runs first. */
  def warmArtifacts(s: SparkSession, dir: String): Unit = {
    rqIndex(s, dir).count()
    ivfOf(s, dir).cells.count()
    semScaledIvfOf(s, dir).cells.count()
    pqCodebookOf(s, dir): Unit
    ivfPqOf(s, dir).codes.count()
    // constructing the v15/PCA frames materializes the candidate frames,
    // the one-time LR fit, and the PCA rotation fit (ArtifactCache-backed,
    // all eager at frame-construction time); the plans themselves stay lazy
    queries("v15_rerank")(s, dir)
    queries("sample_quality_pareto")(s, dir)
    queries("v_opq_rotate")(s, dir)
    queries("hkm_assign")(s, dir)
    queries("hkm_assign_dist")(s, dir)
    // multiclus assignments + index + doc-proba frames (T=2 and T=3), the
    // v11 refresh codebook, the NN-descent graph and the token-containment
    // matches — all ArtifactCache-backed, eager at construction
    queries("coarse_fine_topic")(s, dir)
    queries("coarse_fine_topic_add_t3")(s, dir)
    queries("v11_align")(s, dir)
    knnGraphOf(s, dir): Unit
    answerMatches(s, dir): Unit
    ArtifactCache.frame(s, s"$dir/dedup/sig8", persist = false) {
      Dedup.minhashSignatures(t(s, dir, "documents"), numPerms = 8)
        .localCheckpoint()
    }: Unit
  }

  /** Force-build the session-memoized curation stage chain + export
    * frames (r15). Separated from [[warmArtifacts]] so Bench can TIME
    * it as its own named line: with the chain memoized, best-of-N
    * per-query timings would otherwise silently exclude the one-time
    * build (iteration 2 reuses the checkpoints), and the cost would
    * vanish from the record instead of being reported like
    * index_build_sec is. */
  def warmCurateChain(s: SparkSession, dir: String): Unit = {
    curateFullStages(s, dir): Unit
    curateExportFrames(s, dir): Unit
  }

  /** LSH-banded + exact-Jaccard-confirmed near-dup pairs (≥ 0.5) over the
    * documents table — shared by `dedup_minhash_pairs` (reports them) and
    * `dedup_components` (clusters them). The 8-perm signature store is a
    * dir-memoized localCheckpoint (a dedup pipeline keeps signatures as a
    * persistent artifact — the same store the streaming IncrementalDedup
    * accumulates); raw signature computation is timed by `dedup_minhash`.
    */
  private def confirmedNearDupPairs(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sigs = ArtifactCache.frame(s, s"$dir/dedup/sig8", persist = false) {
      Dedup.minhashSignatures(docs, numPerms = 8).localCheckpoint()
    }
    // the candidate table feeds four consumers inside the confirm join
    // (id-restriction union ×2, intersection join, final join) — one
    // localCheckpoint of the tiny pair list beats re-running the banding
    // self-join per consumer
    val cands = Dedup.lshCandidatePairs(sigs, rowsPerBand = 4)
      .localCheckpoint()
    Dedup.jaccardPairsByHash(docs, cands).where(col("jaccard") >= 0.5)
  }

  /** Candidate tables shared by the ensemble family (ensemble_fuse /
    * ensemble_grid / v15_rerank): ip-ANN top-10 `(query_id, doc_id,
    * score)` and the cosine coarse top-5 `(…, crank)`. The SQL twin is
    * `GeneratedOracles.ensembleBaseSql` — one definition per side, every
    * consumer references it.
    *
    * Dir-memoized + persisted: the reference's ensemble stage reads rank
    * files precomputed by the retrieval runs (ensemble_marco.py:142-168
    * loads them from disk), so candidate generation is an upstream product
    * here too — fusion/rerank consumers must not re-pay the two KNN scans
    * per query. */
  private def annCoarseCandidates(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    lazy val queries = queryVecs(s, dir).select("query_id", "qvec")
    lazy val docs = docVecs(s, dir).select("doc_id", "vec")
    val ann = ArtifactCache.frame(s, s"$dir/ens/ann") {
      BruteForceKNN.topK(queries, docs, k = 10, metric = "ip",
        excludeSelf = true).select("query_id", "doc_id", "score")
    }
    val coarse = ArtifactCache.frame(s, s"$dir/ens/coarse") {
      BruteForceKNN.topK(queries, docs, k = 5, metric = "cos",
        excludeSelf = true)
        .select(col("query_id"), col("doc_id"), col("rank").as("crank"))
    }
    (ann, coarse)
  }

  // ---------------------------------------------------------------------
  // Flagship: full MEVI shape on sf0.001 — RQ train → assign → cluster
  // index → coarse beam search → fine re-rank → retrieval metrics.
  // ---------------------------------------------------------------------
  def entry(spark: SparkSession): DataFrame = {
    // overridable fixture dir (kept distinct from Bench's SF var so a
    // bench run never silently re-points the smoke-check)
    val dir = sys.env.getOrElse("SPARK_GRAFT_ENTRY_DIR",
      "/root/testdata/sf0.001")
    val docs = docVecs(spark, dir).cache()
    val queries = queryVecs(spark, dir)
    val cb = rqCodebook(spark, dir)
    val index = rqIndex(spark, dir)
    val retrieved = CoarseFineRetriever.retrieve(
      queries.select("query_id", "qvec"), index, docs, cb, beams = 4, k = 10)
    Metrics.ranking(
      Metrics.rankedToPreds(retrieved),
      Metrics.labelGroundTruth(docs, queries),
      ks = Seq(1, 5, 10))
  }

  // ---------------------------------------------------------------------
  // Query catalog
  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1/A5-family: grouped aggregation with map-side combine (TPC-H Q1 shape)
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // J1-family: 3-way join + group + top-10 (TPC-H Q3 shape)
    "q3_top_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem")
      c.join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // J-family + broadcast dims: 5-way star join (TPC-H Q5 shape)
    "q5_region_revenue" -> ((s, dir) => {
      // fact-first, aggregate-early: the dim-first chain
      // (r⨝n⨝c⨝o⨝lineitem) made AQE broadcast the 10×-replicated ORDERS
      // table as a build side and went 1.55-exponent super-linear in the
      // scale probe (1.0 s → 36 s at 10×); summing revenue per customer
      // BEFORE the dimension joins cuts the post-join shuffles from
      // |lineitem| to |customer| rows (47 s → 5.7 s at 10×) — the
      // group-then-join shape that survives 100×. Nation totals are a
      // partition of customer totals, so the re-aggregation is exact
      // (double noise ≪ the round(2) margin, as with any join order).
      val perCust = t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      perCust
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(round(sum(col("rev")), 2).as("revenue"))
        .orderBy("n_name")
    }),

    // P-family: selective filter → scan-level pushdown (TPC-H Q6 shape)
    "q6_filter_sum" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("cnt"))
    }),

    // Distinct aggregates (A-family: exact count-distinct with map-side
    // partial dedup)
    "q_count_distinct" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey"), col("l_partkey")).as("n_supp_part"))
        .orderBy("l_returnflag")),

    // T1/W1: per-group ranking window, top-3 per order
    "w1_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy("l_orderkey")
        .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
      t(s, dir, "lineitem")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 3)
        .select(col("l_orderkey"), col("rnk"), col("l_linenumber"),
          round(col("l_extendedprice"), 2).as("price"))
        .orderBy("l_orderkey", "rnk")
    }),

    // P9: semi join (EXISTS)
    "p9_semi_join" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    // P9 at 100 TB: bloom-pre-filtered membership (map-side lossy filter +
    // exact confirm semi join — identical result, shuffle ∝ matches)
    "p9_bloom_semi" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val l = t(s, dir, "lineitem").where(col("l_returnflag") === "R")
      graft.pipeline.Membership.bloomSemiJoin(o, l,
        factKeyCol = "o_orderkey", keyCol = "l_orderkey",
        expectedItems = 100000L)
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),

    // Anti join (negative-sampling `notclus` shape, main_models.py:1841-1852)
    "a7_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // §2.6 set ops: UNION / INTERSECT / EXCEPT between derived sets
    "set_ops" -> ((s, dir) => {
      import s.implicits._
      val p = t(s, dir, "part")
      val small = p.where(col("p_size") < 10).select("p_brand").distinct()
      val typed = p.where(col("p_type").contains("a")).select("p_brand").distinct()
      // ONE distributed plan (no driver-side count() loop): tag each set
      // op's rows, count per tag, left-join the op universe so an empty
      // result still yields n=0 like the oracle's scalar subqueries
      val tagged = small.union(typed).distinct().select(lit("union").as("op"))
        .union(small.intersect(typed).select(lit("intersect").as("op")))
        .union(small.except(typed).select(lit("except").as("op")))
      Seq("except", "intersect", "union").toDF("op")
        .join(tagged.groupBy("op").agg(count(lit(1)).as("n")), Seq("op"), "left")
        .select(col("op"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("op")
    }),

    // J2: invert pairs → group + collect_set (main_utils.py:128-131).
    // Array outputs are stringified in the final projection (driver's
    // pandas-sort compare can't hash ndarray cells) — same convention for
    // every query below.
    "j2_group_collect" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy("user_id")
        .agg(concat_ws(",", sort_array(collect_set(col("event_type")))).as("event_types"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // S3: multi-label csv parse → ARRAY<LONG> (main_utils.py:271-278)
    "s3_multilabel_parse" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("doc_id"), lit(","), col("doc_id") + 1, lit(","), col("doc_id") + 2).as("raw"))
        .select(col("doc_id"), split(col("raw"), ",").cast("array<long>").as("parsed"))
        .select(col("doc_id"), concat_ws(",", col("parsed").cast("array<string>")).as("doc_ids"))
        .orderBy("doc_id")
    }),

    // P2: explicit null handling — drop/fill/coalesce semantics
    "p2_null_handling" -> ((s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("pri_null"))
        .select(col("o_orderkey"),
          coalesce(col("pri_null"), lit("(default)")).as("priority"),
          when(col("pri_null").isNull, 1L).otherwise(0L).as("was_null"))
        .orderBy("o_orderkey")),

    // P1: doc text formatting (main_utils.py:199-211)
    "p1_doc_format" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("Title: "), col("source"), lit(" Text: "),
            substring(col("text"), 1, 40)).as("formatted"))
        .orderBy("doc_id")
    }),

    // V2+T2: brute-force exact KNN by inner product (the oracle scorer)
    "knn_ip" -> ((s, dir) => {
      BruteForceKNN.topK(
        queryVecs(s, dir).select("query_id", "qvec"),
        docVecs(s, dir).select("doc_id", "vec"),
        k = 10, metric = "ip", excludeSelf = true)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "rank")
    }),

    // T4/V9: IVF probe ANN — nprobe closest cells per query, exact IP
    // re-rank inside them (oracle replays the probe with inlined trained
    // cell centroids)
    "ivf_knn" -> ((s, dir) => {
      graft.search.IVFIndex.search(
        queryVecs(s, dir).select("query_id", "qvec"),
        ivfOf(s, dir),
        docVecs(s, dir).select("doc_id", "vec"),
        nprobe = 4, k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "rank")
    }),

    // V2 cosine variant
    "knn_cos" -> ((s, dir) => {
      BruteForceKNN.topK(
        queryVecs(s, dir).select("query_id", "qvec"),
        docVecs(s, dir).select("doc_id", "vec"),
        k = 10, metric = "cos", excludeSelf = true)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "rank")
    }),

    // A5/W1/W2: retrieval metrics of KNN preds vs label ground truth
    "metrics_ranking" -> ((s, dir) => {
      val preds = BruteForceKNN.topKLists(
        queryVecs(s, dir).select("query_id", "qvec"),
        docVecs(s, dir).select("doc_id", "vec"),
        k = 10, metric = "ip", excludeSelf = true)
      val docs = docVecs(s, dir)
      val gt = docs.as("d")
        .join(queryVecs(s, dir).as("q"), col("d.label") === col("q.label"))
        .where(col("d.doc_id") =!= col("q.query_id"))
        .groupBy(col("q.query_id"))
        .agg(sort_array(collect_list(col("d.doc_id"))).as("gt"))
      Metrics.ranking(preds, gt, ks = Seq(1, 5, 10))
        .select(col("k"), round(col("recall"), 6).as("recall"),
          round(col("mrr"), 6).as("mrr"),
          round(col("hitrate"), 6).as("hitrate"), col("n_queries"))
        .orderBy("k")
    }),

    // Dedup #1: exact duplicate groups by content hash. The membership
    // column is a BOUNDED sample (8 smallest ids via the bounded-buffer
    // MinK aggregator) — the full doc_ids collect_list this replaced
    // was the report's one scale hazard: a 10⁸× boilerplate dup would
    // materialize a 10⁸-element array in a single agg buffer. Full
    // membership stays available as the exploded (text_hash, doc_id)
    // projection; the report only ever carries bounded cells.
    "dedup_exact" -> ((s, dir) => {
      graft.pipeline.Dedup.exactGroups(t(s, dir, "documents"))
        .select(col("text_hash"), col("n_docs"), col("canonical_id"),
          concat_ws(",", col("sample_ids").cast("array<string>"))
            .as("sample_ids"))
        .orderBy("text_hash")
    }),

    // Text analysis #1: token counting (whitespace tokenizer)
    "text_tokens" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), "\\s+")).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("len_chars"))
        .orderBy("doc_id")
    }),

    // Sessionization (batch form; stateful-streaming twin in
    // streaming.Sessionize + StreamingSpec)
    "events_sessionize" -> ((s, dir) =>
      graft.streaming.Sessionize.batch(t(s, dir, "events"), gapMinutes = 30)
        .select(col("user_id"), col("session_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"), round(col("sum_value"), 2).as("sum_value"))
        .orderBy("user_id", "session_id")),

    // As-of (temporal) join: each purchase attached to the user's most
    // recent prior click — union+window formulation (one shuffle, no
    // range-join blowup); the oracle replays it with DuckDB's native
    // ASOF JOIN, so the hash match certifies the formulation
    "events_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      // right side unique per (user, ts): greatest event_id wins, the
      // same tie rule the operator applies
      val wDedup = Window.partitionBy("user_id", "ts")
        .orderBy(col("event_id").desc)
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
        .withColumn("__rn", row_number().over(wDedup))
        .where(col("__rn") === 1).drop("__rn")
      graft.pipeline.AsOfJoin.backward(purchases, clicks,
        on = Seq("user_id"), timeCol = "ts", tieCol = "event_id")
        .where(col("asof").isNotNull)
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
          col("asof.event_id").as("click_id"),
          (unix_micros(col("ts")) - unix_micros(col("asof.ts"))).as("gap_us"),
          round(col("value"), 2).as("value"))
        .orderBy("event_id")
    }),

    // Streaming-analog batch: tumbling-window event aggregation
    "events_window" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // Range (interval) join: clicks/views landing inside the hour after
    // a same-user purchase — the attribution join. Bucketed formulation
    // (pipeline.RangeJoin): bin the time axis at the interval width,
    // explode intervals to covered bins (≤2 here), equi-join on
    // (user, bin), exact BETWEEN residual — work ∝ matches, not per-key
    // cross products. Oracle states the naive BETWEEN theta join; the
    // hash match certifies the bucketing is lossless
    "events_range_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val hourUs = 3600L * 1000000L
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) + hourUs).as("hi"))
      val points = ev.where(col("event_type").isin("click", "view"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("pt"))
      graft.pipeline.RangeJoin.pointInInterval(points, purchases,
          on = Seq("user_id"), pointCol = "pt", loCol = "lo", hiCol = "hi",
          binWidth = hourUs)
        .select(col("range.purchase_id").as("purchase_id"), col("event_id"),
          col("user_id"), col("event_type"),
          (col("pt") - col("range.lo")).as("delta_us"))
        .orderBy("purchase_id", "event_id")
    }),

    // Interval×interval overlap join: purchase follow-up hours crossed
    // with same-user error half-hours. The bucketed scheme emits each
    // pair only in its canonical bin (the overlap's start) — no dedup
    // shuffle; the oracle is the naive overlap theta join
    "events_overlap_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val hourUs = 3600L * 1000000L
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("p_lo"),
          (unix_micros(col("ts")) + hourUs).as("p_hi"))
      val errors = ev.where(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          unix_micros(col("ts")).as("e_lo"),
          (unix_micros(col("ts")) + hourUs / 2).as("e_hi"))
      graft.pipeline.RangeJoin.intervalOverlap(purchases, errors,
          on = Seq("user_id"), lLoCol = "p_lo", lHiCol = "p_hi",
          rLoCol = "e_lo", rHiCol = "e_hi", binWidth = hourUs)
        .select(col("purchase_id"), col("range.error_id").as("error_id"),
          col("user_id"),
          (least(col("p_hi"), col("range.e_hi")) -
            greatest(col("p_lo"), col("range.e_lo"))).as("overlap_us"))
        .orderBy("purchase_id", "error_id")
    }),

    // Per-key running EWMA (the batch form of online EMA-stats
    // maintenance, A4 family): inherently sequential recurrence as a
    // per-key sorted fold — one shuffle, O(1) state per key. The oracle
    // replays the identical Double fold with DuckDB list_reduce, so the
    // hash certifies order and arithmetic bit-for-bit
    "events_ewma" -> ((s, dir) =>
      graft.pipeline.TimeSeries.ewma(t(s, dir, "events"),
          keyCol = "user_id", orderCol = "ts", tieCol = "event_id",
          valueCol = "value", alpha = 0.25)
        .orderBy("key", "tie")),

    // Ordered funnel: signup → view → click → purchase per user, each
    // step's earliest event at-or-after the previous step's time; a
    // chain of per-key MIN aggregates, never a per-key event blowup
    "events_funnel" -> ((s, dir) =>
      graft.pipeline.TimeSeries.funnel(t(s, dir, "events"),
          keyCol = "user_id", timeCol = "ts", stepCol = "event_type",
          steps = Seq("signup", "view", "click", "purchase"))
        .select(col("user_id"),
          date_format(col("step1_ts"), "yyyy-MM-dd HH:mm:ss").as("step1_ts"),
          date_format(col("step2_ts"), "yyyy-MM-dd HH:mm:ss").as("step2_ts"),
          date_format(col("step3_ts"), "yyyy-MM-dd HH:mm:ss").as("step3_ts"),
          date_format(col("step4_ts"), "yyyy-MM-dd HH:mm:ss").as("step4_ts"),
          col("steps_completed"))
        .orderBy("user_id")),

    // Mergeable-sketch family (Sketches): the 100 TB pre-aggregation
    // pattern — scan once, keep a tiny sketch per grain, merge sketches
    // instead of re-reading raw data. Everything integer-deterministic
    // (md5-prefix hash + trailing-zero ranks), so plain SQL replays the
    // whole sketch pipeline and the hash match certifies it.

    // Per-source HLL registers over document tokens
    "sketch_hll_registers" -> ((s, dir) =>
      graft.pipeline.Sketches.hllRegisters(
          t(s, dir, "documents").select(col("source"),
            explode(graft.pipeline.Dedup.tokens(col("text"))).as("token")),
          keyCol = "token", groupCols = Seq("source"), m = 64)
        .orderBy("source", "bucket")),

    // Per-source estimates + the mergeability certificate: the global
    // estimate from MERGED per-source registers (max per bucket) must
    // equal the estimate from directly-built global registers
    "sketch_hll_merge" -> ((s, dir) => {
      val items = t(s, dir, "documents").select(col("source"),
        explode(graft.pipeline.Dedup.tokens(col("text"))).as("token"))
      val perSrc = graft.pipeline.Sketches.hllRegisters(
        items, "token", Seq("source"), m = 64)
      val ests = graft.pipeline.Sketches.hllEstimate(
        perSrc, Seq("source"), m = 64, alphaM = 0.709)
      val merged = graft.pipeline.Sketches.hllEstimate(
        graft.pipeline.Sketches.hllMerge(perSrc, Seq("bucket")),
        Seq.empty, m = 64, alphaM = 0.709)
        .select(lit("__merged__").as("source"), col("est_micro"))
      val direct = graft.pipeline.Sketches.hllEstimate(
        graft.pipeline.Sketches.hllRegisters(items, "token", Seq.empty, m = 64),
        Seq.empty, m = 64, alphaM = 0.709)
        .select(lit("__direct__").as("source"), col("est_micro"))
      ests.unionByName(merged).unionByName(direct).orderBy("source")
    }),

    // Count-min heavy hitters: CMS estimates next to exact counts for
    // the top-20 tokens (estimate ≥ exact by construction; the oracle
    // replays counters and lookups, certifying the salt-hash rows)
    "sketch_cms_topk" -> ((s, dir) => {
      val items = t(s, dir, "documents")
        .select(explode(graft.pipeline.Dedup.tokens(col("text"))).as("token"))
      val counters = graft.pipeline.Sketches.cmsCounters(
        items, "token", depth = 4, width = 256)
      val top = items.groupBy("token").agg(count(lit(1)).as("exact_n"))
        .orderBy(col("exact_n").desc, col("token").asc).limit(20)
      graft.pipeline.Sketches.cmsLookup(counters, top, "token",
          depth = 4, width = 256)
        .join(top, Seq("token"))
        .select(col("token"), col("exact_n"), col("cms_n"))
        .orderBy("token")
    }),

    // Misra-Gries heavy hitters (offset form, Agarwal et al. 2012): the
    // mergeable "which tokens are frequent" sketch. Per-source sketches
    // fold into a global one (sum + re-truncate); both the merged and
    // the directly-built global sketch are emitted next to exact counts
    // with the mg_cnt <= exact <= mg_cnt + mg_err bracket certified as
    // an in-query boolean — the whole pipeline is count arithmetic, so
    // SQL replays every row
    "sketch_topk_merge" -> ((s, dir) => {
      val items = t(s, dir, "documents").select(col("source"),
        explode(graft.pipeline.Dedup.tokens(col("text"))).as("token"))
      val perSrc = graft.pipeline.Sketches.mgSketch(
        items, "token", Seq("source"), k = 16)
      val merged = graft.pipeline.Sketches.mgMerge(
          perSrc, "token", Seq.empty, k = 16)
        .withColumn("variant", lit("__merged__"))
      val direct = graft.pipeline.Sketches.mgSketch(
          items, "token", Seq.empty, k = 16)
        .withColumn("variant", lit("__direct__"))
      val exact = items.groupBy("token").agg(count(lit(1)).as("exact_n"))
      merged.unionByName(direct).join(exact, Seq("token"))
        .select(col("variant"), col("token"), col("mg_cnt"), col("mg_err"),
          col("exact_n"),
          (col("exact_n") >= col("mg_cnt") &&
            col("exact_n") <= col("mg_cnt") + col("mg_err")).as("ok"))
        .orderBy("variant", "token")
    }),

    // HDR-style quantile histogram — the fourth mergeable leg: per-flag
    // price quantiles from log-bucketed counts (floor(log2) computed as
    // binary-string length, NO floating log), per-shard histograms
    // merged by plain SUM; merged == direct is exact equality (count
    // addition is associative — no MG-style bracket needed), certified
    // as an in-query boolean and replayed row-for-row in SQL
    "sketch_quantiles" -> ((s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag").as("flag"), col("l_linestatus").as("shard"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("cents"))
      val sk = graft.pipeline.Sketches
      val perShard = sk.hdrHistogram(li, "cents", Seq("flag", "shard"),
        subBits = 5)
      val qs = Seq((1, 2), (9, 10), (99, 100))
      val qm = sk.hdrQuantiles(sk.hdrMerge(perShard, Seq("flag")),
          Seq("flag"), 5, qs)
        .withColumnRenamed("est", "est_merged")
      val qd = sk.hdrQuantiles(sk.hdrHistogram(li, "cents", Seq("flag"), 5),
          Seq("flag"), 5, qs)
        .withColumnRenamed("est", "est_direct")
      qm.join(qd, Seq("flag", "q_num", "q_den"))
        .select(col("flag"), col("q_num"), col("q_den"),
          col("est_direct"), col("est_merged"),
          (col("est_merged") === col("est_direct")).as("ok"))
        .orderBy("flag", "q_den", "q_num")
    }),

    // Iterative graph computation: integer-deterministic PageRank over
    // the part↔supplier bipartite graph (both directions, so no
    // danglers). All-Long arithmetic → five distributed rounds equal
    // five unrolled SQL CTEs bit-for-bit; the hash certifies the
    // join+agg iteration machinery itself
    "graph_pagerank" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_suppkey").cast("long").as("sk"),
          col("l_partkey").cast("long").as("pk"))
      val fwd = li.select((col("sk") + 1000000L).as("src"), col("pk").as("dst"))
      val rev = li.select(col("pk").as("src"), (col("sk") + 1000000L).as("dst"))
      graft.pipeline.PageRank.run(fwd.union(rev), "src", "dst", iters = 5)
        .orderBy("node")
    }),

    // Triangle counting with the degree-ordered orientation (Suri &
    // Vassilvitskii 2011): every triangle materializes as ONE wedge,
    // and out-degrees are O(√m) so the wedge self-join never goes
    // quadratic on a hub. Graph: parts co-ordered in the same order,
    // DOULION-thinned (Tsourakakis et al. 2009 — keep each edge with
    // the deterministic md5 coin at p = 1/4, count exactly on the
    // thinned graph, scale by 1/p³ for the unbiased full-graph
    // estimate): the triangle census a 100 TB co-occurrence graph
    // actually runs, with both the sampled truth and the estimator
    // replayed row-for-row in SQL
    "graph_triangles" -> ((s, dir) => {
      val lo = t(s, dir, "lineitem")
        .select(col("l_orderkey").cast("long").as("o"),
          col("l_partkey").cast("long").as("p"))
        .distinct()
      // NOT memoized via ArtifactCache: persisting the pair frame blocks
      // both the thinning-filter pushdown below the distinct AND AQE's
      // runtime broadcast conversions downstream — measured 4x slower
      // from cache (17-24 s vs 5.2 s) even with
      // canChangeCachedPlanOutputPartitioning=true
      val edges = lo.select(col("o"), col("p").as("src"))
        .join(lo.select(col("o"), col("p").as("dst")), "o")
        .where(col("src") < col("dst"))
        .select("src", "dst").distinct()
        .where(pmod(graft.functions.HashFunctions.md5_prefix(
          concat(lit("tri:"), col("src"), lit(":"), col("dst")), 15),
          lit(1000000L)) < 250000L)
      graft.pipeline.GraphOps.triangleCounts(edges)
        .withColumn("est_full", col("n_tri") * 64L)
        .orderBy("node")
    }),

    // k-core peeling: synchronous rounds dropping every degree-<k node
    // at once — extra rounds past convergence are no-ops, so the
    // fixed-unroll oracle replays the early-stopping engine exactly.
    // Graph: parts co-ordered in the same order (sparse — the supplier
    // co-supply graph is complete at fixture cardinalities); k = 68
    // sits between the min and median degree, so the peel cascades for
    // multiple real rounds while leaving a NON-EMPTY core at every sf
    // (k = 80 peeled sf0.001 to nothing, tripping the rows>0 smoke pin)
    "graph_kcore" -> ((s, dir) => {
      val lo = t(s, dir, "lineitem")
        .select(col("l_orderkey").cast("long").as("o"),
          col("l_partkey").cast("long").as("p"))
        .distinct()
      val edges = lo.select(col("o"), col("p").as("src"))
        .join(lo.select(col("o"), col("p").as("dst")), "o")
        .where(col("src") < col("dst"))
        .select("src", "dst")
      graft.pipeline.GraphOps.kCore(edges, "src", "dst", k = 68,
          maxRounds = 8)
        .orderBy("node")
    }),

    // Sink-bearing PageRank: forward-only supplier→part edges make every
    // part node dangling — per-round mass redistribution (Long floor
    // share) plus ε-stopping, both replayed in the oracle's unrolled
    // CTEs with a cumulative freeze flag, so the early-stop machinery
    // itself is hash-certified
    "graph_pagerank_dangling" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select((col("l_suppkey").cast("long") + 1000000L).as("src"),
          col("l_partkey").cast("long").as("dst"))
      graft.pipeline.PageRank.run(li, "src", "dst", iters = 5,
          epsilonMicro = 1000L)
        .orderBy("node")
    }),

    // Personalized (topic-sensitive) PageRank: teleport AND dangling
    // mass concentrated on the supplier seed set — the restart-set
    // ranking topic-conditioned corpus curation uses; same Long
    // arithmetic + freeze-flag ε machinery, seed-gated by a CASE
    "graph_pagerank_personalized" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select((col("l_suppkey").cast("long") + 1000000L).as("src"),
          col("l_partkey").cast("long").as("dst"))
      graft.pipeline.PageRank.runPersonalized(li, "src", "dst",
          seeds = li.select("src").distinct(), iters = 5,
          epsilonMicro = 1000L)
        .orderBy("node")
    }),

    // Fuzzy similarity self-join: edit-distance-1 pairs over the token
    // + source vocabulary via deletion-neighborhood (SymSpell)
    // bucketing — candidates from a variant equi-join, exact
    // levenshtein confirm; never the all-pairs cross join
    "fuzzy_token_pairs" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val strs = docs
        .select(explode(graft.pipeline.Dedup.tokens(col("text"))).as("s"))
        .unionByName(docs.select(col("source").as("s")))
      graft.pipeline.FuzzyJoin.distance1Pairs(strs, "s")
        .orderBy("t1", "t2")
    }),

    // PMI collocation mining (word2phrase phrase detection): top-30
    // adjacent pairs by pointwise mutual information — one double
    // division of exact Long products feeds ln, so the score replays
    "text_phrase_pmi" -> ((s, dir) =>
      graft.pipeline.TextAnalysis.phrasePmi(t(s, dir, "documents"),
          k = 30, minCount = 5)
        .orderBy(col("pmi_micro").desc, col("a").asc, col("b").asc)),

    // Weighted sampling without replacement (Efraimidis–Spirakis):
    // 100 docs drawn ∝ length; rounded ES keys make the selection
    // itself SQL-replayable
    "sample_weighted" -> ((s, dir) =>
      graft.pipeline.Sampling.weightedTopK(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          k = 100, weightCol = "n_chars")
        .orderBy(col("es_key_micro").desc, col("doc_id").asc)),

    // Deterministic distributed reservoir: the k smallest md5 ranks per
    // source — uniform without-replacement, no sequential reservoir
    // walk, and min-k is associative+idempotent so shard/stream
    // reservoirs merge into the union's exactly (ReservoirStream)
    "sample_reservoir" -> ((s, dir) =>
      graft.pipeline.Sampling.hashReservoir(
          t(s, dir, "documents").select(col("source"), col("doc_id")),
          k = 20, groupCols = Seq("source"))
        .orderBy("source", "h", "doc_id")),

    // Log-domain ES keys (ln(u)/w instead of u^(1/w)): the wide-weight
    // scale path — no micro-grid compression at large w; the exact-Long
    // ln(u) numerator + one IEEE division make the selection replayable
    "sample_weighted_log" -> ((s, dir) =>
      graft.pipeline.Sampling.weightedTopKLog(
          t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
          k = 100, weightCol = "n_chars")
        .orderBy(col("doc_id").asc)),

    // DSIR importance resampling (Xie et al. 2023): hashed-unigram
    // bucket distributions of a small target slice vs the raw corpus →
    // per-doc importance log-weight (all-Long micro-units after ONE
    // ln-grid snap per bucket) → Gumbel-top-k draw ∝ exp(logw). The
    // distribution-matching selection a domain-targeted pretraining
    // pipeline runs; the md5 Gumbel makes the DRAW itself replayable
    "sample_dsir" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val target = docs.where(pmod(col("doc_id"), lit(7L)) === 0L)
      val lr = graft.pipeline.ImportanceResampling.fitLogRatios(
        target, docs, buckets = 64)
      val scored = graft.pipeline.ImportanceResampling.score(
        docs, lr, buckets = 64)
      graft.pipeline.ImportanceResampling.resample(scored, k = 200, seed = 42L)
        .select(col("doc_id"), col("logw_micro"), col("key_micro"))
        .orderBy(col("key_micro").desc, col("doc_id").asc)
    }),

    // GPT-3-style quality-classifier selection (Brown et al. 2020 App. A):
    // LR trained target-slice-vs-corpus over the SAME md5-bucket features
    // as sample_dsir, then keep iff σ(w·x+c) > 1 − Pareto(9) draw off the
    // md5 uniform. The trained weights inline into the generated oracle
    // (the V15 reranker discipline); scoring is a bucket-ordered fold, so
    // the kept SET replays bit-for-bit
    "sample_quality_pareto" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val target = docs.where(pmod(col("doc_id"), lit(7L)) === 0L)
      val (coefs, icpt) = ArtifactCache.value(s"$dir/qualitylr") {
        graft.pipeline.QualityClassifier.train(docs, target, buckets = 64)
      }
      dirQualityLR.put(dir, (coefs, icpt))
      lastDir = Some(dir)
      val scored = graft.pipeline.QualityClassifier.score(
        docs, coefs, icpt, buckets = 64)
      graft.pipeline.QualityClassifier.paretoDecide(
          scored, alpha = 9.0, seed = 42L)
        .select(col("doc_id"), col("prob_micro"), col("thr_micro"),
          col("kept"))
        .orderBy(col("doc_id"))
    }),

    // Gaps-and-islands interval coalescing: per-user 30-minute activity
    // windows merged into coverage islands — two window passes + one
    // agg on one per-key shuffle
    "events_interval_merge" -> ((s, dir) => {
      val iv = t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("lo"),
          (unix_micros(col("ts")) + 1800000000L).as("hi"))
      graft.pipeline.TimeSeries.mergeIntervals(iv, "user_id", "lo", "hi")
        .orderBy("user_id", "island")
    }),

    // Compression-ratio quality gate (Gopher-family entropy signal) —
    // deliberately no SQL oracle (a deflate bitstream has no SQL twin):
    // the driver records the rows-only check; determinism and
    // monotonicity are spec-pinned in TextAnalysisSpec
    "text_compress_ratio" -> ((s, dir) =>
      graft.pipeline.TextAnalysis.compressionRatio(t(s, dir, "documents"))
        .orderBy("doc_id")),

    // V5: RQ assignments partition the corpus (oracle replays the greedy
    // argmin with trained centroid literals inlined — see rqOracles)
    "rq_assign" -> ((s, dir) =>
      rqAssignments(s, dir)
        .select(col("doc_id"), concat_ws(",", col("codes").cast("array<string>")).as("codes"))
        .orderBy("doc_id")),

    // The reference's NON-RQ id scheme: hierarchical-k-means trie ids
    // (NCI semantic ids — per-node child codebooks, variable-depth paths;
    // the structure the reference's decode trie walks). Oracle replays
    // the trained tree with per-path-prefix centroid tables
    "hkm_assign" -> ((s, dir) => {
      val tree = ArtifactCache.value(s"$dir/hkm4x2") {
        graft.index.HierarchicalKMeans.fit(
          docVecs(s, dir).select("doc_id", "vec"), "vec",
          k = 4, depth = 2, seed = 42L, maxIter = 10)
      }
      dirHkmTrees.put(dir, tree)
      lastDir = Some(dir)
      graft.index.HierarchicalKMeans.assign(docVecs(s, dir), tree)
        .select(col("doc_id"),
          concat_ws(",", col("path").cast("array<string>")).as("path"))
        .orderBy("doc_id")
    }),

    // ...and the same assignment through the DISTRIBUTED path
    // (fitLevels/assignByLevels: per-level codebook frames + prefix-join
    // descent, no driver tree) — levelFit is bit-equal to fit, so the
    // TREE oracle replays this too; its own hash row guards the parity
    // in production, not just in the spec
    "hkm_assign_dist" -> ((s, dir) => {
      val tree = ArtifactCache.value(s"$dir/hkm4x2") {
        graft.index.HierarchicalKMeans.fit(
          docVecs(s, dir).select("doc_id", "vec"), "vec",
          k = 4, depth = 2, seed = 42L, maxIter = 10)
      }
      dirHkmTrees.put(dir, tree)
      lastDir = Some(dir)
      val levels = ArtifactCache.frame(s, s"$dir/hkm4x2/levels") {
        graft.index.HierarchicalKMeans.fitLevels(
          docVecs(s, dir).select("doc_id", "vec"), "vec",
          k = 4, depth = 2, seed = 42L, maxIter = 10)
      }
      graft.index.HierarchicalKMeans.assignByLevels(
        docVecs(s, dir), levels, depth = 2)
        .select(col("doc_id"),
          concat_ws(",", col("path").cast("array<string>")).as("path"))
        .orderBy("doc_id")
    }),

    // V7's generation side over the real trie: beam search with per-node
    // log-softmax scores and structural trie masking (only existing
    // children expand; leaf beams carry) — top-4 id paths per query
    "hkm_beam" -> ((s, dir) => {
      val tree = ArtifactCache.value(s"$dir/hkm4x2") {
        graft.index.HierarchicalKMeans.fit(
          docVecs(s, dir).select("doc_id", "vec"), "vec",
          k = 4, depth = 2, seed = 42L, maxIter = 10)
      }
      dirHkmTrees.put(dir, tree)
      lastDir = Some(dir)
      graft.index.HierarchicalKMeans.beamSearchDf(
        queryVecs(s, dir).select("query_id", "qvec"), tree, beams = 4)
        .select(col("query_id"), col("rank"),
          concat_ws(",", col("path").cast("array<string>")).as("path"),
          microUnits(col("score"), 6).as("score"))
        .orderBy("query_id", "rank")
    }),

    // ...and the same beam through the DISTRIBUTED serving path
    // (beamSearchByLevels: per-level codebook frames + prefix-join
    // expansion, no driver tree / no whole-tree broadcast — the path
    // that survives the reference's K=32/depth-4/768-d ≈ 3 GB codebook
    // geometry). levelFit is shared, so the TREE beam oracle replays
    // this bit-exactly too; its own hash row guards the parity in
    // production, not just in StressSpec
    "hkm_beam_dist" -> ((s, dir) => {
      val tree = ArtifactCache.value(s"$dir/hkm4x2") {
        graft.index.HierarchicalKMeans.fit(
          docVecs(s, dir).select("doc_id", "vec"), "vec",
          k = 4, depth = 2, seed = 42L, maxIter = 10)
      }
      dirHkmTrees.put(dir, tree)
      lastDir = Some(dir)
      val levels = ArtifactCache.frame(s, s"$dir/hkm4x2/levels") {
        graft.index.HierarchicalKMeans.fitLevels(
          docVecs(s, dir).select("doc_id", "vec"), "vec",
          k = 4, depth = 2, seed = 42L, maxIter = 10)
      }
      graft.index.HierarchicalKMeans.beamSearchByLevels(
        queryVecs(s, dir).select("query_id", "qvec"), levels,
        depth = 2, beams = 4)
        .select(col("query_id"), col("rank"),
          concat_ws(",", col("path").cast("array<string>")).as("path"),
          microUnits(col("score"), 6).as("score"))
        .orderBy("query_id", "rank")
    }),

    // V5, pq_type=pq: plain product quantization — per-SLICE independent
    // argmin (MEVI/pq.py:249-279), no residual chain; the other half of
    // the reference's --pq_type switch (rq is the shipped default)
    "pq_assign" -> ((s, dir) =>
      graft.index.PQAssigner.assign(
        docVecs(s, dir).select("doc_id", "vec"), pqCodebookOf(s, dir))
        .select(col("doc_id"),
          concat_ws(",", col("codes").cast("array<string>")).as("codes"))
        .orderBy("doc_id")),

    // V9 composite: IVF-PQ ADC search — coarse cell probe + per-cell
    // lookup-table scoring over residual PQ codes (faiss "IVFx,PQy", the
    // billion-scale shape; docs stored as numSub bytes of codes)
    "ivfpq_knn" -> ((s, dir) =>
      graft.search.IVFPQ.search(queryVecs(s, dir).select("query_id", "qvec"),
        ivfPqOf(s, dir), nprobe = 4, k = 10)
        .select(col("query_id"), col("rank"), col("doc_id"),
          microUnits(col("dist"), 6).as("dist"))
        .orderBy("query_id", "rank")),

    // V-family compression #3: SQ8 scalar quantization (faiss "SQ8") —
    // per-dim 8-bit codes against corpus [min,max], with round-trip error;
    // stats + arithmetic are plain algebra, so the oracle is static SQL
    "sq8_roundtrip" -> ((s, dir) => {
      val docs = docVecs(s, dir).select("doc_id", "vec")
      graft.index.ScalarQuantizer.roundtrip(docs,
        graft.index.ScalarQuantizer.fitStats(docs, "vec"))
        .select(col("doc_id"),
          concat_ws(",", col("codes").cast("array<string>")).as("codes"),
          microUnits(col("err"), 6).as("err"))
        .orderBy("doc_id")
    }),

    // V10, pq branch: reconstruction = concatenation of slice centroids +
    // per-row quantization error
    "pq_reconstruct" -> ((s, dir) =>
      graft.index.PQAssigner.reconstructWithError(
        docVecs(s, dir).select("doc_id", "vec"), pqCodebookOf(s, dir))
        .select(col("doc_id"),
          concat_ws(",", transform(col("rec"),
            x => microUnits(x, 6)).cast("array<string>")).as("rec"),
          microUnits(col("recon_error"), 6).as("recon_error"))
        .orderBy("doc_id")),

    // A1: cluster inverted index over RQ codes
    "rq_cluster_index" -> ((s, dir) =>
      rqIndex(s, dir)
        .select(concat_ws(",", col("codes").cast("array<string>")).as("codes"),
          col("c0"), col("chunk"),
          concat_ws(",", col("doc_ids").cast("array<string>")).as("doc_ids"),
          col("csize"))
        .orderBy("codes", "chunk")),

    // V12/J3/J4: full coarse→fine retrieval (oracle replays beam search +
    // candidate join + exact re-rank with inlined centroids)
    "coarse_fine" -> ((s, dir) => {
      val docs = docVecs(s, dir).select("doc_id", "vec")
      val queries = queryVecs(s, dir).select("query_id", "qvec")
      val index = rqIndex(s, dir)
      CoarseFineRetriever.retrieve(queries, index, docs, rqCodebook(s, dir),
        beams = 4, k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "rank")
    }),

    // V1 pluggability, certified end to end: the SAME index-build +
    // coarse-fine retrieval stack rebuilt behind a SECOND encoder — a
    // trained MLlib Word2Vec routed through the word2vecApply
    // mapPartitions contract (the seam a real ONNX/JNI encoder uses,
    // document_encoder.py:104-126). The oracle inlines the trained word
    // vectors (like v15_rerank inlines LR weights), re-derives every doc
    // vector from documents.text, and replays assign/beam/coarse-fine
    // unchanged on the swapped source — hash-proof the downstream never
    // cared which encoder made the vectors
    "encoder_swap" -> ((s, dir) => {
      val wv = swapWordVecs(s, dir)
      val cb = swapCodebook(s, dir)
      val docs = swapDocVecs(s, dir)
      dirSwapArtifacts.put(dir, (wv, cb))
      lastDir = Some(dir)
      val index = ArtifactCache.frame(s, s"$dir/w2v16/rq2x8/index") {
        ClusterIndexBuilder.build(
          CodeAssigner.assign(docs.select("doc_id", "vec"), cb))
      }
      val queries = docs.where(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"), col("vec").as("qvec"))
      CoarseFineRetriever.retrieve(queries, index,
          docs.select("doc_id", "vec"), cb, beams = 4, k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "rank")
    }),

    // Per-query ROC-AUC of the raw ip score as a relevance predictor
    // (label-match ground truth): Mann-Whitney rank-sum with tie
    // correction in exact integers — micro-rounded scores rank with
    // min-rank ties, r2p folds 2·rmin + tc − 1, one integer division
    // emits micro-units; the eval-layer A5/J7 companion the reranker
    // grid reads
    "metrics_auc" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val q = emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"),
          col("label").as("qlab"))
      val d = emb.select(col("vec_id").as("doc_id"),
        col("embedding").as("vec"), col("label").as("dlab"))
      val scored = d.crossJoin(broadcast(q))
        .where(col("doc_id") =!= col("query_id"))
        .select(col("query_id"), col("doc_id"),
          floor(graft.search.BruteForceKNN.score("ip")(
            col("qvec"), col("vec")) * 1000000 + 0.5)
            .cast("long").as("score_micro"),
          when(col("qlab") === col("dlab"), 1).otherwise(0).as("label"))
      graft.eval.Metrics.aucMicro(scored).orderBy("query_id")
    }),

    // doc_multiclus=2 (main_models.py:3222-3245): each doc's top-2 code
    // tuples by the query-side beam search — the multi-membership the
    // multicluster inverted index is built from
    "rq_multiclus" -> ((s, dir) =>
      rqMulticlusAssignments(s, dir)
        .select(col("doc_id"), col("crank").cast("long").as("crank"),
          concat_ws(",", col("codes").cast("array<string>")).as("codes"),
          round(col("logprob"), 6).as("logprob"))
        .orderBy("doc_id", "crank")),

    // V12 over the MULTIcluster index (doc_multiclus=2,
    // main_models.py:3246-3266): candidates from every doc's top-2
    // tuples; A10's max-dedup absorbs the double memberships
    "coarse_fine_multiclus" -> ((s, dir) => {
      val docs = docVecs(s, dir).select("doc_id", "vec")
      val queries = queryVecs(s, dir).select("query_id", "qvec")
      CoarseFineRetriever.retrieve(queries, rqMulticlusIndex(s, dir), docs,
        rqCodebook(s, dir), beams = 4, k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "rank")
    }),

    // Graph ANN (the batch answer to the reference's faiss HNSW256,
    // faiss_search.py:87-89): k-NN graph by NN-descent, seeded from IVF
    // cells — 2 unrolled rounds, oracle replays every join and cap
    "knn_graph" -> ((s, dir) =>
      knnGraphOf(s, dir)
        .select(col("src"), col("rank").cast("long").as("rank"),
          col("dst"), round(col("score"), 6).as("score"))
        .orderBy("src", "rank")),

    // ...and its SERVING side: per-query entries from probed IVF cells
    // (the IVF+graph hybrid — fixed entries strand the walk in the entry
    // clusters), then a frontier-beam walk over the graph edges — the
    // distributed form of HNSW's greedy search
    "knn_graph_search" -> ((s, dir) => {
      val ivf = ivfOf(s, dir)
      val queries = queryVecs(s, dir).select("query_id", "qvec")
      graft.search.KnnGraph.walk(
        queries,
        knnGraphOf(s, dir).select("src", "dst"),
        docVecs(s, dir).select("doc_id", "vec"),
        k = 10, beam = 16, rounds = 2,
        entries = graft.search.KnnGraph.probeEntries(
          queries, ivf.cells, ivf.codebook, nprobe = 4, perCell = 4))
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "rank")
    }),

    // use_topic_model (main_models.py:3539-3552): per-membership score
    // q_proba·(r·doc_proba + (1−r)·qd) over the multicluster index,
    // max-aggregated across memberships; r = topic_score_ratio = 0.5
    "coarse_fine_topic" -> ((s, dir) => coarseFineTopic(s, dir, r = 0.5)),

    // the r=0 end of the mix: score collapses to q_proba·qd (the doc
    // proba term drops out) — the formula's reduction sanity point
    "coarse_fine_topic_r0" -> ((s, dir) => coarseFineTopic(s, dir, r = 0.0)),

    // multiclus_score_aggr='add' (main.py:675, main_models.py:4003-4009):
    // a doc reached through BOTH its memberships sums the two mixed
    // scores instead of keeping the max
    "coarse_fine_topic_add" -> ((s, dir) =>
      coarseFineTopic(s, dir, r = 0.5, dedup = "sum")),

    // ...and at T=3 memberships, where an unordered sum() stops being
    // replay-deterministic (3-operand float addition doesn't commute
    // across partial-agg orders): exercises the membership-ordered fold
    "coarse_fine_topic_add_t3" -> ((s, dir) =>
      coarseFineTopic(s, dir, r = 0.5, dedup = "sum", t = 3)),

    // V12b: budgeted coarse→fine (reconstruction-prescored candidate
    // cut BEFORE the embedding-fetch join — the 100 TB shuffle saver)
    "coarse_fine_budgeted" -> ((s, dir) => {
      val docs = docVecs(s, dir).select("doc_id", "vec")
      val queries = queryVecs(s, dir).select("query_id", "qvec")
      val index = rqIndex(s, dir)
      CoarseFineRetriever.retrieveBudgeted(queries, index, docs,
        rqCodebook(s, dir), beams = 4, k = 10, budget = 100)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("query_id", "rank")
    }),

    // A6: ndoc@cluster-R candidate-pool diagnostic
    "rq_ndoc" -> ((s, dir) => {
      val queries = queryVecs(s, dir).select("query_id", "qvec")
      val index = rqIndex(s, dir)
      val coarse = CodebookBeamSearch.search(queries, rqCodebook(s, dir), beams = 4)
      val candidates = coarse
        .join(index.select("codes", "doc_ids"), Seq("codes"))
        .select(col("query_id"), explode(col("doc_ids")).as("doc_id"))
        .distinct()
      Metrics.ndoc(candidates, queries = Some(queries))
        .select(round(col("ndoc_per_query"), 6).as("ndoc_per_query"),
          col("n_queries"))
    }),

    // Dedup #2: per-doc MinHash signatures (portable md5 permutation family)
    "dedup_minhash" -> ((s, dir) =>
      Dedup.minhashSignatures(t(s, dir, "documents"), numPerms = 4)
        .select(col("doc_id"), col("n_shingles"),
          concat_ws(",", col("sig").cast("array<string>")).as("sig"))
        .orderBy("doc_id")),

    // Dedup #2b: LSH banding candidates + exact Jaccard confirm ≥ 0.5.
    // 8 perms × 4-row bands: band-collision probability is j⁴ per band, so
    // low-similarity noise pairs (the word-soup fixture has pairwise j≈0.1)
    // never reach the exact-Jaccard confirm join — the candidate set stays
    // O(near-dups), not O(n²·j²).
    "dedup_minhash_pairs" -> ((s, dir) => {
      confirmedNearDupPairs(s, dir)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")
    }),

    // Dedup #2c: near-dup PAIRS → duplicate CLUSTERS via distributed
    // connected components (min-label propagation + path halving); the
    // canonical doc to keep is the component id (min member). The oracle
    // replays reachability with a recursive CTE.
    "dedup_components" -> ((s, dir) => {
      // the symmetric-closure union reads the confirmed pairs twice —
      // materialize the (tiny) confirm-join output once
      val pairs = confirmedNearDupPairs(s, dir).select("a", "b")
        .localCheckpoint()
      val comp = Dedup.connectedComponents(pairs)
        .select(col("v").as("doc_id"), col("comp").as("component"))
      val sz = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      comp.join(sz, Seq("component"))
        .select(col("doc_id"), col("component"), col("cluster_size"))
        .orderBy("doc_id")
    }),

    // Dedup POLICY: keep the BEST-QUALITY copy of every near-dup cluster
    // (dedup_exact's min-id canonical is an arbitrary survivor; curation
    // keeps the copy worth training on). Connected components over the
    // confirmed MinHash pairs, singleton clusters for never-matched
    // docs, arg-max quality on the micro grid (ties -> smaller doc_id) —
    // one components pass + one quality-keyed max aggregation, both
    // replayed in SQL (recursive CTE + the inlined quality formula)
    "dedup_canonical_quality" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val pairs = confirmedNearDupPairs(s, dir).select("a", "b")
        .localCheckpoint()
      // the operator under test here is the SURVIVOR POLICY; components
      // go through the size-gated auto path (driver union-find on the
      // tiny checkpointed pair list, distributed fallback past 100k)
      val comp = Dedup.connectedComponentsAuto(pairs)
        .select(col("v").as("doc_id"), col("comp").as("component"))
      val withComp = docs.select(col("doc_id"))
        .join(comp, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("component"))
      val q = TextAnalysis.qualityScore(docs)
        .select(col("doc_id"), microUnits(col("quality_score"), 6).as("score"))
      Dedup.canonicalByScore(withComp, q)
        .withColumnRenamed("score", "q_micro")
        .orderBy("doc_id")
    }),

    // Dedup: exact-substring duplicate SPANS (the suffix-level pass of
    // published LLM-data pipelines, n-gram-anchored for the distributed
    // shape): every maximal token span whose every 8-gram repeats
    // corpus-wide, merged per doc by one windowed interval pass. The
    // oracle replays gram extraction, the corpus-wide count, and the
    // running-reach merge in plain SQL
    "dedup_spans" -> ((s, dir) =>
      Dedup.duplicateSpans(t(s, dir, "documents"), n = 8)
        .orderBy("doc_id", "span_id")),

    // Dedup: exact-substring TRIM — non-first occurrences (global
    // (doc_id, pos) order per gram content) are cut from the token
    // stream; one canonical copy of every duplicated substring survives
    "dedup_span_trim" -> ((s, dir) =>
      Dedup.trimDuplicateSpans(t(s, dir, "documents"), n = 8)
        .orderBy("doc_id")),

    // Dedup: VARIABLE-length exact-substring lengths via suffix ordering
    // + neighbor LCP (Lee et al.'s actual suffix-array method; the two
    // entries above fix n=8). Per position: the maximal duplicated
    // substring length starting there (≥ 8, capped at 24). One
    // range-partitioned sort of the capped-suffix table + a strictly
    // per-partition LCP pass (partition boundaries stitched by a
    // 2-rows-per-partition collect — no single-task global window); the
    // oracle replays the identical sort + lag/lead LCP in SQL
    "dedup_suffix_lens" -> ((s, dir) =>
      Dedup.suffixDupLengths(t(s, dir, "documents"), minLen = 8, cap = 24)
        .orderBy("doc_id", "pos")),

    // Dedup: the suffix-LCP lengths merged into maximal per-doc spans —
    // the mergeSpans interval pass with the VARIABLE per-position length
    // instead of a fixed n
    "dedup_suffix_spans" -> ((s, dir) =>
      Dedup.suffixDupSpans(t(s, dir, "documents"), minLen = 8, cap = 24)
        .orderBy("doc_id", "span_id")),

    // Dedup: variable-length exact-substring TRIM (VERDICT r14 #2) —
    // the removal half of Lee et al.'s ExactSubstr: each duplicated
    // content keeps its globally-first (doc_id, pos) occurrence, every
    // other flagged occurrence is merged into spans and cut from the
    // token stream. The oracle chains the suffix sort + neighbor LCP +
    // first-occurrence row_number + NOT-the-canonical join + interval
    // merge + token cut in one statement
    "dedup_suffix_trim" -> ((s, dir) =>
      Dedup.suffixDupTrim(t(s, dir, "documents"), minLen = 8, cap = 24)
        .orderBy("doc_id")),

    // Dedup: CCNet PARAGRAPH dedup (Wenzek et al. 2020 §3.1) — duplicate
    // paragraphs (non-overlapping 8-token blocks on this newline-free
    // fixture) keep their first corpus occurrence by (doc_id, block_idx),
    // then each doc reassembles from its surviving blocks. One
    // hash-keyed count+min agg (map-side combinable), no per-hash sort
    "dedup_paragraphs" -> ((s, dir) =>
      Dedup.paragraphDedup(t(s, dir, "documents"), blockWords = 8)
        .orderBy("doc_id")),

    // CCNet paragraph dedup over REAL '\n\n' paragraphs (the actual
    // CCNet unit; the entry above is the flat-text token-block
    // stand-in). The fixture corpus has no newlines, so the query
    // plants paragraph structure deterministically: every doc becomes
    // [its text, one SHARED boilerplate footer, its uppercased text] —
    // the footer repeats corpus-wide and must survive only at its
    // first (doc_id, idx) occurrence, while both per-doc paragraphs
    // survive everywhere. Same first-occurrence agg + reassembly code
    // as dedup_paragraphs; only the block table differs
    "dedup_paragraphs_nl" -> ((s, dir) => {
      val nl = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n\n", col("text"),
          lit("all rights reserved contact the operator for details"),
          upper(col("text"))).as("text"))
      Dedup.paragraphDedupNewline(nl).orderBy("doc_id")
    }),

    // Dedup #3: exhaustive n-gram Jaccard, top-20 most similar pairs
    // (bounded scan: the exhaustive form is the small-scale oracle; the
    // scale path is the LSH variant above)
    "dedup_jaccard_topk" -> ((s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 200)
      Dedup.jaccardPairs(docs)
        .orderBy(col("jaccard").desc, col("a").asc, col("b").asc)
        .limit(20)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // Dedup #3b: the SCALE path for jaccard top-k — the all-pairs form
    // above guards itself at 10k docs; this one draws candidates from
    // the minhash bands (shared sig artifact) and confirms with the
    // hash-join jaccard, so work is ∝ candidates at any corpus size.
    // Approximate by construction (a top pair the bands never co-bucket
    // is missed — for TOP pairs band-collision probability is highest,
    // the standard LSH argument); the oracle replays the same bands, so
    // the approximation itself is what's checked
    "dedup_jaccard_topk_banded" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sigs = ArtifactCache.frame(s, s"$dir/dedup/sig8", persist = false) {
        Dedup.minhashSignatures(docs, numPerms = 8).localCheckpoint()
      }
      val cands = Dedup.lshCandidatePairs(sigs, rowsPerBand = 4)
        .localCheckpoint()
      Dedup.jaccardPairsByHash(docs, cands)
        .orderBy(col("jaccard").desc, col("a").asc, col("b").asc)
        .limit(20)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // Dedup #4: 32-bit SimHash signatures
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhash(t(s, dir, "documents")).orderBy("doc_id")),

    // Dedup #4b: SimHash near-dup pairs — banded byte-blocks (pigeonhole:
    // hamming ≤ 3 ⇒ one of 4 blocks matches exactly) + Hamming confirm.
    // The oracle confirms ALL pairs brute-force, so a hash-match also
    // certifies the banding guarantee loses nothing.
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(Dedup.simhash(t(s, dir, "documents")),
        maxHamming = 3)
        .orderBy("a", "b")),

    // Benchmark-contamination screen: corpus docs sharing ≥ 3 distinct
    // 5-gram hashes with a held-out set (synthesized as char-span excerpts
    // of the first 10 docs, so every bench item must at least hit its
    // source document)
    "contamination_screen" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.where(col("doc_id") < 10)
        .select(col("doc_id").as("bench_id"),
          substring(col("text"), 21, 80).as("text"))
      graft.pipeline.Contamination.screen(docs, bench, n = 5, minShared = 3)
        .orderBy("doc_id", "bench_id")
    }),

    // Dedup #5: embedding-cosine near-dup pairs (label-blocked)
    "dedup_embedding" -> ((s, dir) =>
      Dedup.embeddingNearDup(t(s, dir, "embeddings"), tau = 0.35)
        .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"))
        .orderBy("a", "b")),

    // SemDeDup (Abbas et al. 2023) at the shape PRODUCTION runs: the
    // cluster count derives from the corpus (k = ⌈n/256⌉ floored at 16,
    // the autoCells discipline), so expected cell size stays flat as the
    // corpus grows and the cell-blocked pair join stays linear; maxCell
    // remains the density-skew backstop. Within each cell, τ-similar
    // groups keep only their least-centroid-similar exemplar. Oracle
    // replays assignment + keep rule (incl. the cap) from the inlined
    // TRAINED derived-k centroids.
    "dedup_semdedup" -> ((s, dir) => {
      val ivf = semScaledIvfOf(s, dir)
      graft.pipeline.Dedup.semDeDup(
          t(s, dir, "embeddings"), ivf.cells, ivf.codebook, tau = 0.35)
        .select(col("vec_id"), col("cell").cast("long").as("cell"),
          col("cent_sim_micro"), col("kept"))
        .orderBy("vec_id")
    }),

    // The FIXED-k oracle fixture (the pre-r13 dedup_semdedup): the same
    // keep rule over the shared ivf16 cells the ANN queries use — kept
    // as the known-k regression anchor; the headline entry above is the
    // derived-k shape a growing corpus runs
    "dedup_semdedup_fixedk" -> ((s, dir) => {
      val ivf = ivfOf(s, dir)
      graft.pipeline.Dedup.semDeDup(
          t(s, dir, "embeddings"), ivf.cells, ivf.codebook, tau = 0.35)
        .select(col("vec_id"), col("cell").cast("long").as("cell"),
          col("cent_sim_micro"), col("kept"))
        .orderBy("vec_id")
    }),

    // SemDeDup with the maxCell cap DELIBERATELY tripped (maxCell=64 on
    // ~125-member ivf16 cells at sf0.1) plus the refinement pass: capped
    // cells' members re-assign to a trained sub-codebook (k derived from
    // the hot count, the autoBits discipline) and get the same keep rule
    // inside sub-cells. This certifies the SCALE PATH end-to-end: the
    // oracle replays both inlined codebooks, the dynamic over-cap cell
    // detection, and the two-pass union — so "production raises k with
    // n" is a hash-checked mechanism, not a doc promise
    "dedup_semdedup_refined" -> ((s, dir) => {
      val ivf = ivfOf(s, dir)
      dirSemSubCodebooks.put(dir, None)
      val trainer = (d: DataFrame, k: Int) => {
        val cb2 = ArtifactCache.codebook(s"$dir/semsub$k") {
          graft.index.RQTrainer.fit(d.select("doc_id", "vec"), "vec",
            numLevels = 1, k = k, seed = 43L, maxIter = 10)
        }
        dirSemSubCodebooks.put(dir, Some(cb2))
        val cells2 = ArtifactCache.frame(s, s"$dir/semsub$k/cells",
            layout = Seq(col("cell"))) {
          graft.index.CodeAssigner.assign(d.select("doc_id", "vec"), cb2)
            .select(col("doc_id"), col("codes").getItem(0).as("cell"))
        }
        graft.search.IVFIndex.IVF(cb2, cells2)
      }
      graft.pipeline.Dedup.semDeDupRefined(
          t(s, dir, "embeddings"), ivf.cells, ivf.codebook, tau = 0.35,
          maxCell = 64, targetCell = 32, seed = 43L, train = Some(trainer))
        .select(col("vec_id"), col("cell").cast("long").as("cell"),
          col("cent_sim_micro"), col("kept"), col("refined"))
        .orderBy("vec_id")
    }),

    // Text analysis #2: language ID (stopword-ratio heuristic)
    "text_langid" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          round(TextAnalysis.stopwordRatio(col("text")), 6).as("stopword_ratio"),
          TextAnalysis.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id")),

    // Text analysis #3: quality scoring
    "text_quality" -> ((s, dir) =>
      TextAnalysis.qualityScore(t(s, dir, "documents"))
        .select(col("doc_id"), col("n_tokens"), col("n_chars"),
          round(col("avg_token_len"), 6).as("avg_token_len"),
          round(col("punct_ratio"), 6).as("punct_ratio"),
          round(col("stopword_ratio"), 6).as("stopword_ratio"),
          round(col("quality_score"), 6).as("quality_score"))
        .orderBy("doc_id")),

    // The full Gopher rule-set gate (Rae et al. 2021 App. A1.1): raw
    // integer counts + one flag per rule + the conjunction, every
    // threshold compared cross-multiplied in Longs (no ratio ever
    // exists as a float in either engine). The fixture corpus has no
    // newlines/bullets, so the line rules are additionally exercised on
    // planted multi-line docs in TextAnalysisSpec
    "text_gopher_rules" -> ((s, dir) =>
      TextAnalysis.gopherRules(t(s, dir, "documents")).orderBy("doc_id")),

    // Text analysis #4: rolling-hash document fingerprint
    "text_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(t(s, dir, "documents")).orderBy("doc_id")),

    // Corpus vocab heavy hitters (exact top-k via TakeOrdered)
    "text_vocab_topk" -> ((s, dir) =>
      TextAnalysis.vocabTopK(t(s, dir, "documents"), k = 50)),

    // Okapi BM25 lexical retrieval: top-20 docs for two literal queries
    // (the sparse baseline the reference's ensemble stage fuses against)
    "text_bm25" -> ((s, dir) => {
      import s.implicits._
      val qs = Seq((0L, "spark fast query join"),
        (1L, "stream window batch agg")).toDF("query_id", "qtext")
      graft.search.BM25.topK(t(s, dir, "documents"), qs, k = 20)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), microUnits(col("score"), 6).as("score_micro"))
        .orderBy("query_id", "rank")
    }),

    // Deterministic per-language stratified sampling (md5-rank — the same
    // rows survive on any engine/partitioning; sampled_corpus.py:9-16
    // semantics made reproducible)
    "sample_stratified" -> ((s, dir) =>
      graft.pipeline.Sampling.stratified(t(s, dir, "documents"), "lang",
        Map("en" -> 0.5, "zh" -> 0.25, "es" -> 0.1))
        .select("doc_id", "lang").orderBy("doc_id")),

    // Per-source document cap (web-corpus anti-spam: uniform hash-ranked
    // keep, not crawl-order keep)
    "sample_domain_cap" -> ((s, dir) =>
      graft.pipeline.Sampling.capPerGroup(t(s, dir, "documents"), "source",
        cap = 30)
        .select("doc_id", "source").orderBy("doc_id")),

    // mT5/UniMax temperature-flattened language mixing: per-lang quota
    // ∝ n^0.3 (micro-snapped once, then all-Long arithmetic), selection
    // by md5-rank — the dominant language's 44% share flattens to ~26%
    "sample_temperature_mix" -> ((s, dir) =>
      graft.pipeline.Sampling.temperatureMix(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", total = 100L, alpha = 0.3)
        .orderBy("doc_id")),

    // Mixture construction in EMBEDDING space: k-means cell assignment
    // (the shared trained ivf16 artifact) + the same UniMax n^α
    // flattening over CELL population — cluster-balanced selection
    // (the D4/DeepSeekMath recipe: over-represented semantic modes
    // flatten, rare modes keep their mass). Oracle replays the
    // nearest-centroid assignment from inlined centroids, then the
    // all-Long quota + md5-rank draw
    "sample_cluster_balanced" -> ((s, dir) => {
      val ivf = ivfOf(s, dir)
      graft.pipeline.Sampling.temperatureMix(
          ivf.cells.select(col("doc_id").as("vec_id"),
            col("cell").cast("long").as("cell")),
          "cell", total = 100L, alpha = 0.5, idCol = "vec_id")
        .select(col("vec_id"), col("cell"), col("n_docs"), col("quota"))
        .orderBy("vec_id")
    }),

    // TRUE UniMax (Chung et al. 2023 Algorithm 1, water-filling closed
    // form) + epoch expansion: a 900-doc training budget with at most 3
    // epochs per language — small languages saturate at n·3, the rest
    // share the common level, and the mixture MATERIALIZES as (doc,
    // epoch) rows: full epochs carry every doc, the partial epoch draws
    // by md5-rank through the shared grid-bounded selection.
    // (sample_temperature_mix above is the mT5 n^α recipe — a different
    // published flattening; this is the budget/epoch-capped one.)
    "sample_unimax_epochs" -> ((s, dir) =>
      graft.pipeline.Sampling.unimaxEpochs(
        t(s, dir, "documents").select(col("doc_id"), col("lang")),
        "lang", budget = 900L, epochCap = 3)
        .orderBy("doc_id", "epoch")),

    // Data-mixture construction: per-source TOKEN budget, docs chosen in
    // deterministic hash-rank order until the budget fills
    "sample_token_budget" -> ((s, dir) =>
      graft.pipeline.Sampling.tokenBudget(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          size(split(col("text"), "\\s+")).cast("long").as("n_tokens")),
        "source", budget = 800L)
        .select("doc_id", "source", "n_tokens").orderBy("doc_id")),

    // PER-SOURCE token budgets — the mixture recipe as production
    // writes it (each domain gets its OWN budget) through the same
    // grid-bounded histogram selection. Budgets derive
    // deterministically from the source name (src<k> → 400 + (k%5)·200,
    // and every fifth source is LEFT OUT of the budgets frame → its
    // docs drop, the missing-stratum convention), so the oracle
    // replays the budget table, the drop, and the per-source walk.
    // ASSUMES src<digits> source names: a non-conforming name parses to
    // NULL on the Spark side (cast → null, pmod null filter drops it)
    // and to NULL in the oracle (TRY_CAST — a plain CAST would hard
    // error in DuckDB where Spark silently drops), so both engines drop
    // it consistently.
    "sample_token_budget_per_source" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      val srcNum = substring(col("source"), 4, 10).cast("long")
      val budgets = docs.select("source").distinct()
        .where(pmod(srcNum, lit(5L)) =!= 4L)
        .withColumn("budget", lit(400L) + pmod(srcNum, lit(5L)) * 200L)
      graft.pipeline.Sampling.tokenBudgetPerGroup(docs, "source", budgets)
        .select("doc_id", "source", "n_tokens").orderBy("doc_id")
    }),

    // LLM training prep: GPT-style concat-and-chunk sequence packing —
    // the whitespace token stream in doc_id order cut every 128 tokens;
    // the exclusive prefix sum underneath is the two-level distributed
    // scan (never a single-partition global window)
    "pack_sequences" -> ((s, dir) =>
      graft.pipeline.Packing.chunkSpans(
        t(s, dir, "documents").select(col("doc_id"),
          size(split(col("text"), "\\s+")).cast("long").as("n_tokens")),
        seqLen = 128)
        .orderBy("seq_id", "doc_id")),

    // IN-CONTEXT packing (Shi et al. 2024 "In-Context Pretraining"):
    // concat-and-chunk, but the document stream is ordered by
    // (embedding cluster, doc_id) instead of raw id, so semantically
    // related documents land inside the same training window — the
    // cluster-ordered scalable approximation of the paper's
    // nearest-neighbor document chain (their §2.2 sorts by similarity;
    // k-means cells give the same locality without a sequential TSP
    // walk). Cell assignment is the trained 16-cell codebook
    // (broadcast); the ordering is the SAME two-level prefix scan as
    // every other layout op — rank docs by (cell, doc_id) with
    // exclusivePrefixSum (never a global window), then chunk by stream
    // position. Output one row per (sequence, doc) overlap with the
    // doc's cell carried for inspection.
    "pack_semantic" -> ((s, dir) => {
      val ivf = ivfOf(s, dir)
      val docs = t(s, dir, "documents").select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      val withCell = docs.join(
        ivf.cells.select(col("doc_id"), col("cell").cast("long").as("cell")),
        Seq("doc_id"))
      val ranked = graft.pipeline.Packing.exclusivePrefixSum(
        withCell.withColumn("__one", lit(1L)),
        idCol = "cell", nCol = "__one", outCol = "pos",
        tieCol = Some("doc_id"))
      val spans = graft.pipeline.Packing.chunkSpans(
        ranked.select(col("pos"), col("n_tokens")), seqLen = 128,
        idCol = "pos")
      spans.join(ranked.select("pos", "doc_id", "cell"), Seq("pos"))
        .select("seq_id", "doc_id", "cell", "off_in_seq", "n_tok")
        .orderBy("seq_id", "doc_id")
    }),

    // Whole-document next-fit bin packing (instruction-tuning layout: no
    // doc is split); bins are sequential state, so packing runs per
    // deterministic hash group
    "pack_nextfit" -> ((s, dir) =>
      graft.pipeline.Packing.nextFit(
        t(s, dir, "documents").select(col("doc_id"),
          size(split(col("text"), "\\s+")).cast("long").as("n_tokens")),
        budget = 256L, groups = 8)
        .orderBy("doc_id")),

    // EXPORT composition — the artifact a training run actually mounts:
    // the deduplicated corpus packed into fixed-length sequences and
    // dealt into SHUFFLED shards. Stages: plant 5 exact dups (doc_id +
    // 100000 — the dedup stage must be live at every sf; the fixture has
    // no exact dups below sf0.1) → exactDedup min-id survivor →
    // whitespace token counts → GPT-style concat-and-chunk at 128
    // (pack_sequences' two-level distributed prefix scan) →
    // DETERMINISTIC SHUFFLE: sequences ranked by the md5-60 hash of
    // their seq_id (a reproducible pseudorandom permutation, identical
    // on any engine) → round-robin deal into 8 equal shards. The rank
    // itself comes from the SAME exclusivePrefixSum machinery (count
    // of smaller hashes), so there is no global-order window anywhere;
    // the oracle chains the dedup QUALIFY, the running-sum chunk
    // explode, and the hash-order row_number into one statement
    "pipeline_export_train" -> ((s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val planted = docs.where(col("doc_id") < 5)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
      val uniq = Dedup.exactDedup(docs.unionByName(planted))
      val counted = uniq.select(col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      // two consumers below (the distinct seq table and the final join)
      val packed = graft.pipeline.Packing.chunkSpans(counted, seqLen = 128)
        .localCheckpoint()
      val seqs = packed.select(col("seq_id")).distinct()
        .withColumn("__hk", Dedup.md5Hash60(col("seq_id").cast("string")))
        .withColumn("__one", lit(1L))
      // pos = count of sequences with a smaller (hash, seq_id) key — the
      // shuffled global position, scan-built (no single-task window).
      // seq_id is the tie column (ADVICE r14): a 60-bit hash collision
      // (~2^30 sequences for one expected tie) now resolves exactly the
      // way the oracle's row_number(hash, seq_id) does instead of
      // leaving two sequences sharing a shard slot
      val positioned = graft.pipeline.Packing
        .exclusivePrefixSum(seqs, "__hk", "__one", outCol = "pos",
          tieCol = Some("seq_id"))
        .select(col("seq_id"), col("pos"),
          pmod(col("pos"), lit(8L)).as("shard"),
          expr("pos div 8").as("shard_pos"))
      packed.join(positioned, Seq("seq_id"))
        .select("shard", "shard_pos", "seq_id", "doc_id",
          "off_in_seq", "n_tok")
        .orderBy("shard", "shard_pos", "doc_id")
    }),

    // LM-based quality gate (CCNet-style): corpus-trained smoothed bigram
    // model, docs scored by mean log-prob in position order
    "text_lm_score" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.pipeline.NgramLM.score(docs, lmOf(s, dir))
        .select(col("doc_id"), col("n_bigrams"),
          microUnits(col("avg_logp"), 6).as("avg_logp"))
        .orderBy("doc_id")
    }),

    // C4 bad-words gate (Raffel et al. 2020 §2.2: pages containing any
    // banned term are removed) over a fixed 5-term blocklist — three
    // terms present in the fixture vocabulary, two absent (the no-hit
    // branch stays live): word-boundary token matching with multi-word
    // phrases, per-width gram explodes against the broadcast term table
    "text_blocklist" -> ((s, dir) => {
      import s.implicits._
      val terms = Seq("slow scan", "vector join", "drop",
        "merge conflict", "fast").toDF("term")
      graft.pipeline.TextAnalysis
        .blocklistScreen(t(s, dir, "documents"), terms)
        .orderBy("doc_id")
    }),

    // CCNet head/middle/tail perplexity buckets (Wenzek et al. 2020):
    // LM-score every doc, cut the corpus into fluency tertiles. Cutoffs
    // are exact order statistics of a 300-doc deterministic uniform
    // sample (the hashReservoir md5-rank rule — identical at any
    // cluster size), applied as a broadcast CASE; the only sort spans
    // the bounded sample
    "text_ccnet_buckets" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.pipeline.NgramLM.ccnetBucketsOf(docs, lmOf(s, dir),
          sampleK = 300)
        .orderBy("doc_id")
    }),

    // Incremental re-index work-list: snapshot diff by content
    // fingerprint — added / removed / changed docs between two corpus
    // versions (the docs that need re-embedding; everything else skips
    // the pipeline). Snapshots are deterministic slices of the fixture:
    // prev = ids < 450; cur = ids >= 50 with ids 100-149 text-revised
    "corpus_diff" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val prev = docs.where(col("doc_id") < 450).select("doc_id", "text")
      val cur = docs.where(col("doc_id") >= 50)
        .select(col("doc_id"),
          when(col("doc_id").between(100, 149),
            concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")).as("text"))
      graft.pipeline.CorpusDiff.diff(prev, cur).orderBy("doc_id")
    }),

    // BPE tokenizer induction, step 1: corpus-frequency-weighted adjacent
    // char-pair counts over the distinct-word table (vocab ≪ corpus — the
    // standard trick that makes BPE training corpus-size-independent);
    // the greedy merge loop on top is Bpe.train (BpeSpec)
    "bpe_top_pairs" -> ((s, dir) =>
      graft.pipeline.Bpe.pairs(graft.pipeline.Bpe.initSymbols(
        graft.pipeline.Bpe.wordCounts(t(s, dir, "documents"))))
        .orderBy(col("pair_count").desc, col("lhs").asc, col("rhs").asc)
        .limit(20)),

    // ...and step 2, the tokenizer those merges exist for: apply the
    // TRAINED merge table to the corpus (P11's upgrade from whitespace
    // stand-in to learned-subword tokenization — broadcast merge list,
    // per-partition word memo; oracle replays the same merges as nested
    // leftmost-first replaces, see GeneratedOracles.bpeTokenizeSql)
    "text_bpe_tokenize" -> ((s, dir) => {
      val merges = ArtifactCache.value(s"$dir/bpe24") {
        graft.pipeline.Bpe.train(t(s, dir, "documents"), nMerges = 24)
      }
      dirBpeMerges.put(dir, merges)
      lastDir = Some(dir)
      graft.pipeline.Bpe.applyMerges(t(s, dir, "documents"), merges)
        .orderBy("doc_id")
    }),

    // ...and the reference's ACTUAL tokenizer family (VERDICT r13 #4):
    // the T5 tokenizer MEVI loads is SentencePiece unigram-LM, not BPE
    // (prepare_passage_tokenized.py:49-156) — hard-EM piece induction
    // over the same distinct-word stats table, Viterbi segmentation as
    // a broadcast-table mapPartitions; the oracle replays the Viterbi
    // walk as an unrolled DP from the inlined trained piece table
    // (GeneratedOracles.unigramTokenizeSql, exact Long micro scores)
    "text_unigram_tokenize" -> ((s, dir) =>
      graft.pipeline.Unigram.tokenize(t(s, dir, "documents"),
          unigramOf(s, dir))
        .orderBy("doc_id")),

    // Exact per-language length quantiles (corpus monitoring; interpolated
    // type-7 percentiles match DuckDB quantile_cont)
    "text_length_quantiles" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"), length(col("text")).cast("double").as("len"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          percentile(col("len"),
            array(lit(0.25), lit(0.5), lit(0.75), lit(0.9))).as("qs"))
        .select(col("lang"), col("n"),
          microUnits(element_at(col("qs"), 1), 4).as("q25"),
          microUnits(element_at(col("qs"), 2), 4).as("q50"),
          microUnits(element_at(col("qs"), 3), 4).as("q75"),
          microUnits(element_at(col("qs"), 4), 4).as("q90"))
        .orderBy("lang")),

    // Gopher/C4-style within-doc repetition signals (bigram duplication)
    "text_repetition" -> ((s, dir) =>
      TextAnalysis.repetition(t(s, dir, "documents"), n = 2)
        .select(col("doc_id"), col("n_ngrams"),
          round(col("dup_ngram_ratio"), 6).as("dup_ngram_ratio"),
          round(col("top_ngram_frac"), 6).as("top_ngram_frac"))
        .orderBy("doc_id")),

    // PII scrubbing: typed redaction of emails/IPs/phones + hit counts
    // (PII is planted deterministically — the fixture corpus has none)
    "text_pii_scrub" -> ((s, dir) =>
      TextAnalysis.piiScrub(
        t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com from 10.0."),
            (col("doc_id") % 200).cast("string"),
            lit(".25 tel 0123456789")).as("text")))
        .orderBy("doc_id")),

    // Composed cleaning pipeline — the end-to-end entry point a
    // pretraining-data user actually runs: language gate (en) → quality
    // threshold → PII scrub → exact dedup on the scrubbed text (min-id
    // canonical). Every stage is an already-oracle-verified operator;
    // this query pins the COMPOSITION (filter thresholds compare the
    // unrounded doubles — bit-parity with the oracle's identical
    // expression, the established Double-fold discipline).
    "pipeline_clean_corpus" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val kept = docs.select(col("doc_id"), col("text"))
        .join(TextAnalysis.qualityScore(docs)
          .select(col("doc_id"), col("quality_score")), Seq("doc_id"))
        .where(TextAnalysis.langId(col("text")) === "en" &&
          col("quality_score") >= 0.75)
      val scrubbed = TextAnalysis.piiScrub(kept)
        .join(kept.select("doc_id", "quality_score"), Seq("doc_id"))
      val canon = scrubbed
        .groupBy(md5(col("scrubbed")).as("__h"))
        .agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      scrubbed.join(canon, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), round(col("quality_score"), 6).as("quality"),
          (col("n_emails") + col("n_ips") + col("n_phones"))
            .as("n_redactions"),
          length(col("scrubbed")).cast("long").as("n_chars"))
        .orderBy("doc_id")
    }),

    // Composed CURATION pipeline — the published-recipe mixture
    // construction end-to-end: structural Gopher gate (word count, mean
    // word length, symbol ratio, alpha-word ratio; the stop-word rule is
    // inapplicable to the synthetic vocabulary — zero docs contain a
    // Gopher stop word — and is deliberately excluded here, it stays
    // exercised by text_gopher_rules) → CCNet tail-bucket drop → exact
    // dedup (min-id canonical) → variable-length exact-substring trim
    // (r16, VERDICT r15 #2 — the budget then admits by the TRIMMED
    // token count) → per-source token budget in md5-rank order. Every
    // stage is an already-oracle-verified operator; this query pins the
    // COMPOSITION in one hash-compared statement. This entry is also
    // the chain's UN-memoized scaling witness (SCALING.md): the
    // flagship's session memo would otherwise blind the 100× sweep.
    "pipeline_curate_corpus" -> ((s, dir) =>
      curateWitnessAdmitted(s, dir)
        .select("doc_id", "source", "bucket", "n_words")
        .orderBy("doc_id")),

    // ...and the witness extended through tokenize→pack (VERDICT r15
    // #7): the admitted survivors' trimmed text tokenized with the
    // dir's trained unigram model, packed by actual token counts into
    // 128-token sequences with token-id payloads, md5-rank dealt into
    // mass-derived shards — the UN-memoized single-pass twin of
    // pipeline_curate_export, so the 100× sweep measures the
    // tokenize-pack path instead of memoized reads. Oracle: witness
    // CTEs + the unigram unrolled-DP replay + the pack/deal CTEs in
    // one statement.
    "pipeline_curate_pack" -> ((s, dir) => {
      val admitted = curateWitnessAdmitted(s, dir)
      val model = unigramOf(s, dir)
      val ids = graft.pipeline.Unigram.tokenizeIds(
        admitted.select("doc_id", "text"), model)
      packTokenStream(ids, seqLen = 128)
        .orderBy("shard", "shard_pos")
    }),

    // The FULL published curation recipe (CCNet/Gopher/RefinedWeb order)
    // end-to-end in ONE hash-compared statement — `pipeline_curate_corpus`
    // stops at exact dedup + budget; this entry adds the three stages a
    // production pretraining pipeline runs between them: MinHash+LSH
    // fuzzy near-dup (8 perms × 4-row bands → exact-Jaccard confirm
    // ≥ 0.5) → connected components → QUALITY-canonical survivor (keep
    // the copy worth training on, not the min id) → benchmark
    // decontamination (≥ 3 shared distinct 5-grams with the held-out
    // excerpts) → per-source token budget. Every stage is an
    // already-oracle-certified operator (dedup_minhash_pairs,
    // dedup_components, dedup_canonical_quality, contamination_screen,
    // sample_token_budget); THIS query certifies the COMPOSITION — the
    // oracle chains gate, LM buckets, exact dedup, banding, the
    // recursive-CTE components, the survivor policy, the screen, and
    // the budget walk into one statement, so a hash match is
    // end-to-end bit-parity. At sf0.01 every stage is non-vacuous:
    // 277 gate → 174 non-tail canon → 9 confirmed pairs / 7 components
    // (incl. one 3-doc triangle) → 3 contaminated docs → budget trim.
    //
    // Cost decomposition (sf0.1/local[32], best-of-2): 6.2 s total =
    // 3.7 s for the gate→LM→exact-dedup→budget spine (the measured
    // pipeline_curate_corpus cost) + ~2.5 s for the added stages
    // (sig 0.5 + band/confirm 0.8 + size-gated components + screen
    // 0.4 + the two stage checkpoints' job overhead, which dominates
    // at fixture scale and amortizes at corpus scale — 100× exponent
    // ~0.17 vs the spine's 0.27). Components route through
    // connectedComponentsAuto: the confirmed pair list is checkpointed
    // and tiny here (driver union-find), distributed past 100k pairs.
    "pipeline_curate_corpus_full" -> ((s, dir) =>
      curateFullStages(s, dir).last._3
        .select("doc_id", "source", "bucket", "n_words")
        .orderBy("doc_id")),

    // Funnel ACCOUNTING for the recipe above — the per-stage survivor
    // counts a pipeline operator actually watches (what did the gate
    // cost me? how much did fuzzy dedup remove beyond exact? how much
    // token mass did the span trim cut out of surviving docs?). One row
    // per stage, survivors-so-far semantics, from the SAME
    // curateFullStages chain as the flagship (one definition), so the
    // funnel can never drift from what the pipeline actually does; the
    // oracle reuses the flagship CTE chain with per-stage COUNTs.
    // Stage 6 (r16) is the first stage whose n_docs stays flat while
    // n_tokens drops — the span trim's signature. Stages 9/10 (r16)
    // restate the tail in TOKENIZER mass (VERDICT r15 #1): stage 9
    // counts the admitted docs' unigram token streams, stage 10 the
    // packed 128-token sequences — their n_tokens must be EQUAL (every
    // tokenized token is packed exactly once), the built-in
    // conservation check, now in the unit a training run bills in.
    "pipeline_curate_funnel" -> ((s, dir) => {
      val stageRows = curateFullStages(s, dir).map { case (ord, nm, df) =>
        // token mass per stage alongside doc counts — the trim and
        // budget stages cut TOKENS, so that is the funnel column
        // operators actually watch. Post-gate stages carry n_words
        // (Gopher's count, re-based on the trimmed stream from stage 6
        // on); the raw stage recomputes the gate's non-empty count
        val tok =
          if (df.columns.contains("n_words")) col("n_words")
          else size(filter(split(col("text"), "\\s+"),
            x => length(x) > 0)).cast("long")
        df.agg(count(lit(1)).cast("long").as("n_docs"),
            coalesce(sum(tok), lit(0L)).cast("long").as("n_tokens"))
          .select(lit(ord).as("stage_ord"), lit(nm).as("stage"),
            col("n_docs"), col("n_tokens"))
      }
      val (ids, sharded) = curateExportFrames(s, dir)
      val tokenizedRow = ids.where(col("n_tokens") > 0)
        .agg(count(lit(1)).cast("long").as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).cast("long").as("n_tokens"))
        .select(lit(9).as("stage_ord"), lit("tokenized").as("stage"),
          col("n_docs"), col("n_tokens"))
      val packedRow = sharded
        .agg(count(lit(1)).cast("long").as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).cast("long").as("n_tokens"))
        .select(lit(10).as("stage_ord"), lit("packed_sequences").as("stage"),
          col("n_docs"), col("n_tokens"))
      (stageRows :+ tokenizedRow :+ packedRow)
        .reduce(_.unionByName(_)).orderBy("stage_ord")
    }),

    // The TOKENIZER-TRUE curated export (VERDICT r15 #1) — the artifact
    // a training run actually memmaps: the flagship chain's
    // budget-admitted survivors TOKENIZED with the dir's trained
    // unigram-LM model, packed into 128-token sequences by ACTUAL token
    // counts, each sequence carrying its token-ID payload, md5-rank
    // shuffled and dealt into ceil(mass/4096) shards (count DERIVED
    // from the token mass — VERDICT r15 #8). The r15 form stopped at
    // layout metadata keyed by whitespace n_words; this closes the last
    // un-joined seam (tokenize→pack). The oracle chains curateFullSql's
    // admitted CTE through the unigram unrolled-DP replay (token ids
    // carried through the DP) into the pack/deal CTEs, so a hash match
    // is end-to-end bit-parity from raw documents to the token-id
    // matrix. No dedup stage is repeated here: exact, fuzzy AND
    // span-level dedup already ran inside the curation chain.
    "pipeline_curate_export" -> ((s, dir) =>
      curateExportFrames(s, dir)._2
        .orderBy("shard", "shard_pos")),

    // IN-CONTEXT export variant: identical artifact schema, document
    // stream ordered by (embedding cell, doc_id) before chunking — the
    // pack_semantic ordering composed into the tokenizer-true export
    // (see curateExportCtxFrame). Oracle = the full-chain replay with
    // the inlined-centroid assignment supplying the stream order.
    "pipeline_curate_export_ctx" -> ((s, dir) =>
      curateExportCtxFrame(s, dir)
        .orderBy("shard", "shard_pos")),


    // THE LIFECYCLE ENTRY — the reference's two entry points composed as
    // one query (index build, marco_generate_embedding_n_rq.sh; serve +
    // eval, MEVI/main.py:267-337): corpus → trained-BPE tokenize (P11)
    // → hash encode through the V1 seam → RQ train (V4) → assign (V5) →
    // cluster inverted index (A1) → beam (V6/T3) → coarse→fine retrieve
    // (V12/J3/J4/T2) → ensemble fusion with the exact-KNN list
    // (V13/J6/W3) → Recall/MRR/HitRate (A5/J7/W1/W2). Every stage is an
    // already-oracle-certified operator; THIS query pins the composition:
    // the oracle chains the BPE replay, the hash-embed replay, the
    // inlined trained codebook, the beam/assign/serve CTEs, the fusion
    // arithmetic, and the metric aggregation into ONE statement, so a
    // hash match certifies the end-to-end lifecycle bit-for-bit.
    // Ground truth is self-retrieval (each query IS corpus doc <20) —
    // the signal that drops below 1.0 exactly when the beam misses the
    // query's own cluster, which is what serving quality means here.
    "pipeline_index_serve" -> ((s, dir) => {
      val docsT = t(s, dir, "documents")
      // P11: learned tokenizer (trained artifact, shared with
      // text_bpe_tokenize's $dir/bpe24 cache key)
      val merges = ArtifactCache.value(s"$dir/bpe24") {
        graft.pipeline.Bpe.train(docsT, nMerges = 24)
      }
      dirBpeMerges.put(dir, merges)
      val toks = graft.pipeline.Bpe.applyMerges(docsT, merges)
        .where(col("tokens") =!= "")
        .select(col("doc_id"), split(col("tokens"), ",").as("toks"))
      // V1 seam: the tokenize stage FEEDS the encoder (pre-tokenized)
      val vecs = ArtifactCache.frame(s, s"$dir/bpe24/hash16/vecs") {
        graft.functions.TextEmbedder.hashEmbedTokens(
          toks, "doc_id", "toks", dim = 16)
      }
      // V4: RQ codebook trained on the lifecycle vectors
      val cb = ArtifactCache.codebook(s"$dir/bpe24/hash16/rq2x8") {
        RQTrainer.fit(vecs.select("doc_id", "vec"), "vec",
          numLevels = 2, k = 8, seed = 42L, maxIter = 10)
      }
      dirLifecycle.put(dir, (merges, cb))
      lastDir = Some(dir)
      // V5 + A1: assign + cluster inverted index
      val index = ArtifactCache.frame(s, s"$dir/bpe24/hash16/rq2x8/index") {
        ClusterIndexBuilder.build(
          CodeAssigner.assign(vecs.select("doc_id", "vec"), cb))
      }
      val queries = vecs.where(col("doc_id") < 20)
        .select(col("doc_id").as("query_id"), col("vec").as("qvec"))
      // V6 → V12: serve through beam + candidate fetch + exact re-rank
      val served = CoarseFineRetriever.retrieve(queries, index,
        vecs.select("doc_id", "vec"), cb, beams = 4, k = 10)
      // V13: fuse the exact-KNN list (V8, the reference's dense list)
      // with the beam's cluster ranks — docs outside every beamed
      // cluster take the sentinel + punish branch, MEVI semantics
      val ann = BruteForceKNN.topK(queries, vecs.select("doc_id", "vec"),
          k = 10, metric = "ip", excludeSelf = false)
        .select("query_id", "doc_id", "score")
      val crank = CodebookBeamSearch.search(queries, cb, beams = 4)
        .select(col("query_id"), col("codes"),
          row_number().over(Window.partitionBy("query_id")
            .orderBy(col("logprob").desc, col("codes").asc)).as("crank"))
      val coarseList = CodeAssigner.assign(vecs.select("doc_id", "vec"), cb)
        .join(crank, Seq("codes"))
        .select("query_id", "doc_id", "crank")
      val fused = Ensemble.fuse(ann, coarseList, numClusters = 4,
        alpha = 0.6, beta = 0.03, gamma = 0.02, k = 10)
      // A5/J7: Recall/MRR/HitRate of BOTH rankings vs self ground truth
      val gt = queries.select(col("query_id"),
        array(col("query_id")).as("gt"))
      val mServed = Metrics.ranking(Metrics.rankedToPreds(served), gt,
          ks = Seq(1, 5, 10))
        .withColumn("source", lit("coarse_fine"))
      val mFused = Metrics.ranking(Metrics.rankedToPreds(fused), gt,
          ks = Seq(1, 5, 10))
        .withColumn("source", lit("ensemble"))
      mServed.unionByName(mFused)
        .select(col("source"), col("k"),
          round(col("recall"), 6).as("recall"),
          round(col("mrr"), 6).as("mrr"),
          round(col("hitrate"), 6).as("hitrate"), col("n_queries"))
        .orderBy("source", "k")
    }),

    // S5-analog: JSON-ish field extraction from event props
    "events_json" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).cast("long").as("k"))
        .orderBy("event_id")),

    // J5: answer-containment theta join (broadcast nested-loop + contains)
    "j5_answer_contain" -> ((s, dir) =>
      answerMatches(s, dir).orderBy("query_idx", "doc_id")),

    // A9: inverse answer index (doc → sorted query list)
    "a9_inverse_index" -> ((s, dir) =>
      AnswerIndex.inverse(answerMatches(s, dir))
        .select(col("doc_id"),
          concat_ws(",", col("query_idx").cast("array<string>")).as("query_idx"),
          col("n_queries"))
        .orderBy("doc_id")),

    // P6: deterministic doc-window augmentation
    "p6_doc_windows" -> ((s, dir) =>
      Augment.docWindows(t(s, dir, "documents"), windowSize = 16, maxW = 3)
        .orderBy("doc_id", "window_idx")),

    // P10: corpus subsample + contiguous re-id
    "p10_subsample_reid" -> ((s, dir) =>
      Augment.subsampleMapping(t(s, dir, "documents"), dropPct = 10)
        .orderBy("old_id")),

    // P8/J8: propagate the re-id mapping through an artifact table
    "p8_id_remap" -> ((s, dir) => {
      val mapping = Augment.subsampleMapping(t(s, dir, "documents"), dropPct = 10)
      Augment.remapIds(
        t(s, dir, "documents").select("doc_id", "n_chars"), mapping, "doc_id")
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // A7 `clus`: cluster-restricted negative sampling (label as the cluster
    // key so the oracle can replay it; the RQ-code variant is the rows-only
    // neg_sample query in the scalatest suite)
    "a7_neg_sample" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = emb.where(col("vec_id") < 20)
        .select(concat(lit("q"), col("vec_id")).as("query"),
          col("vec_id").as("doc_id"))
      val assignments = emb.select(col("vec_id").as("doc_id"),
        array(col("label")).as("codes"))
      val clusterIndex = assignments
        .groupBy("codes").agg(sort_array(collect_list(col("doc_id"))).as("doc_ids"))
      NegativeSampling.clusterNegatives(pairs, assignments, clusterIndex, n = 4)
        .select(col("query"), col("doc_id"),
          concat_ws(",", col("neg_ids").cast("array<string>")).as("neg_ids"))
        .orderBy("doc_id")
    }),

    // A7 simans: score-aware negative sampling (main_models.py:1613-1616) —
    // exponential race over w = exp(−a·(s−s_pos)²), md5-rank randomness, so
    // the whole draw replays in SQL (each query's positive is itself)
    "a7_simans" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 20)
        .select(concat(lit("q"), col("vec_id")).as("query"),
          col("vec_id").as("doc_id"), col("embedding").as("qvec"))
      val cands = emb.select(col("vec_id").as("cand_id"),
        col("embedding").as("cvec"))
      // queries broadcast, corpus streams (the KNN layout — corpus-sized
      // sides are never broadcast)
      val scored = cands.crossJoin(broadcast(queries))
        .where(col("cand_id") =!= col("doc_id"))
        .select(col("query"), col("doc_id"), col("cand_id"),
          float_dot(col("qvec"), col("cvec")).as("cand_score"),
          float_dot(col("qvec"), col("qvec")).as("pos_score"))
      NegativeSampling.simansNegatives(scored, n = 5, a = 0.5, b = 0.0)
        .select(col("query"), col("doc_id"),
          concat_ws(",", col("neg_ids").cast("array<string>")).as("neg_ids"))
        .orderBy("doc_id")
    }),

    // A7 clusfile (main_models.py:1824-1829): cluster candidates from a
    // per-QUERY top-cluster file — here each query lists its positive's
    // label cluster and the next label (mod 10)
    "a7_clusfile" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = emb.where(col("vec_id") < 20)
        .select(concat(lit("q"), col("vec_id")).as("query"),
          col("vec_id").as("doc_id"))
      val clusterIndex = emb.groupBy(array(col("label")).as("codes"))
        .agg(sort_array(collect_list(col("vec_id"))).as("doc_ids"))
      val negClus = emb.where(col("vec_id") < 20)
        .select(concat(lit("q"), col("vec_id")).as("query"),
          explode(array(array(col("label")),
            array(pmod(col("label") + 1, lit(10))))).as("codes"))
      NegativeSampling.clusterFileNegatives(pairs, negClus, clusterIndex, n = 4)
        .select(col("query"), col("doc_id"),
          concat_ws(",", col("neg_ids").cast("array<string>")).as("neg_ids"))
        .orderBy("doc_id")
    }),

    // A7 interhalf (main_models.py:1893-1905): half the quota from
    // clus ∩ file, half from clus ∖ file; file list = multiples of 3
    // below 60 (so both parts are non-trivial per label cluster)
    "a7_interhalf" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val pairs = emb.where(col("vec_id") < 20)
        .select(concat(lit("q"), col("vec_id")).as("query"),
          col("vec_id").as("doc_id"))
      val assignments = emb.select(col("vec_id").as("doc_id"),
        array(col("label")).as("codes"))
      val clusterIndex = assignments.groupBy("codes")
        .agg(sort_array(collect_list(col("doc_id"))).as("doc_ids"))
      // un-capped cluster list: the reference intersects the FULL
      // per-cluster candidate list (max label cluster ≪ 1000)
      val clus = NegativeSampling.clusterNegatives(
        pairs, assignments, clusterIndex, n = 1000)
      val fileList = emb
        .where(col("vec_id") % 3 === 0 && col("vec_id") < 60)
        .agg(sort_array(collect_list(col("vec_id"))).as("neg_ids"))
      val fileNegs = pairs.select("query").crossJoin(broadcast(fileList))
      NegativeSampling.combineNegatives(clus, fileNegs, "interhalf", n = 6)
        .select(col("query"), col("doc_id"),
          concat_ws(",", sort_array(col("neg_ids")).cast("array<string>"))
            .as("neg_ids"))
        .orderBy("doc_id")
    }),

    // A7 simansinter (main_models.py:1911-1927): the SimANS draw over
    // file candidates restricted to the positive's cluster set, with the
    // reference's fallback chain; file shortlist = ids < 40
    "a7_simansinter" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.where(col("vec_id") < 20)
        .select(concat(lit("q"), col("vec_id")).as("query"),
          col("vec_id").as("doc_id"), col("label"),
          col("embedding").as("qvec"))
      val clusNegs = queries.select("query", "doc_id", "label")
        .join(emb.select(col("vec_id").as("cand_id"), col("label")),
          Seq("label"))
        .where(col("cand_id") =!= col("doc_id"))
        .groupBy("query", "doc_id")
        .agg(sort_array(collect_list(col("cand_id"))).as("neg_ids"))
      val cands = emb.where(col("vec_id") < 40)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
      val scored = cands
        .crossJoin(broadcast(queries.select("query", "doc_id", "qvec")))
        .where(col("cand_id") =!= col("doc_id"))
        .select(col("query"), col("doc_id"), col("cand_id"),
          float_dot(col("qvec"), col("cvec")).as("cand_score"),
          float_dot(col("qvec"), col("qvec")).as("pos_score"))
      NegativeSampling.simansInterNegatives(scored, clusNegs, n = 5)
        .select(col("query"), col("doc_id"),
          concat_ws(",", col("neg_ids").cast("array<string>")).as("neg_ids"))
        .orderBy("doc_id")
    }),

    // Multimodal: binary payload metadata (no decode needed)
    "multimodal_meta" -> ((s, dir) =>
      Multimodal.metadata(Multimodal.asMedia(t(s, dir, "documents"),
        mediaType = concat(lit("fake/"), col("source"))))
        .orderBy("doc_id")),

    // Multimodal: frame-sampling explode shape over binary payloads
    "multimodal_frames" -> ((s, dir) =>
      Multimodal.frameSample(Multimodal.asMedia(t(s, dir, "documents"),
        mediaType = concat(lit("fake/"), col("source"))), stride = 64)
        .orderBy("doc_id", "frame_idx")),

    // Multimodal: REAL header decode — deterministic real-format bytes
    // (valid PNG IHDR w/ CRC, JPEG SOI→APP0→SOF0→SOS, GIF89a LSD) are
    // generated per doc and parsed back by the pure-JVM codec; the
    // oracle states the generation arithmetic, so any endianness/offset
    // slip in the parser hash-fails
    "multimodal_headers" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticImageBytes(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/synthetic").as("media_type"))
      Multimodal.decode(media)
        .select(col("doc_id"), col("decoded"), col("format"), col("width"),
          col("height"), col("channels"), col("bit_depth"))
        .orderBy("doc_id")
    }),

    // Multimodal: unknown containers must surface as decoded=false with
    // NULL metadata — never fabricated dimensions (nulls stringified so
    // the hash compare is null-representation-proof)
    "multimodal_unknown" -> ((s, dir) =>
      Multimodal.decode(Multimodal.asMedia(t(s, dir, "documents")))
        .select(col("doc_id"), col("decoded"),
          coalesce(col("format"), lit("none")).as("format"),
          coalesce(col("width"), lit(-1)).as("width"),
          coalesce(col("height"), lit(-1)).as("height"),
          coalesce(col("channels"), lit(-1)).as("channels"),
          coalesce(col("bit_depth"), lit(-1)).as("bit_depth"))
        .orderBy("doc_id")),

    // Multimodal: REAL indexed-colour PNG decode — PLTE palette + filtered
    // index scanlines generated per doc, unfiltered + palette-expanded to
    // RGB by the codec; per-channel means over the expanded samples. The
    // oracle replays palette arithmetic through the index raster — any
    // slip in PLTE parsing, bpp-1 unfiltering, or index→RGB expansion
    // hash-fails
    "multimodal_palette" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticPalettePng(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/png").as("media_type"))
      Multimodal.decodePixels(media)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"))
        .orderBy("doc_id")
    }),

    // Multimodal: REAL 16-bit decode — big-endian samples unfiltered at
    // bpp = channels·2 and strip-16-reduced to the high byte; the oracle
    // states means over floor(v/256) from the generation arithmetic, so
    // an endianness or bpp slip in the 16-bit path hash-fails
    "multimodal_png16" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticPng16(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/png").as("media_type"))
      Multimodal.decodePixels(media)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"))
        .orderBy("doc_id")
    }),

    // Multimodal: Adam7 interlace decode — the same raster stored as
    // seven filtered passes; per-channel means are pixel-permutation
    // invariant so the query also emits decodePixels' ordinal-weighted
    // position moment, which a wrong scatter cannot fake
    "multimodal_interlaced" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticInterlacedPng(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/png").as("media_type"))
      Multimodal.decodePixels(media)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"),
          col("pos_moment"))
        .orderBy("doc_id")
    }),

    // Multimodal: REAL baseline JPEG decode — DC-constant blocks make
    // the lossy pipeline exact (FDCT leaves only DC; the quantizer
    // divides it), so the oracle states every decoded pixel while the
    // bytes still cross real Huffman coding, DC prediction, byte
    // stuffing, and the IDCT. Means + the position moment, as for PNG
    "multimodal_jpeg" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticJpeg(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/jpeg").as("media_type"))
      Multimodal.decodeJpegPixels(media)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"),
          col("pos_moment"))
        .orderBy("doc_id")
    }),

    // Multimodal: JPEG with DRI restart intervals — same pixels as
    // multimodal_jpeg but the scan byte-aligns at RSTm markers with DC
    // predictor resets on both encode and decode; the plain-baseline
    // oracle applies verbatim, so any restart slip (missed reset, eaten
    // marker, mis-aligned resume) hash-fails
    "multimodal_jpeg_dri" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticJpegDri(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/jpeg").as("media_type"))
      Multimodal.decodeJpegPixels(media)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"),
          col("pos_moment"))
        .orderBy("doc_id")
    }),

    // Multimodal: 4:2:0 subsampled JPEG decode — the dominant real-world
    // layout (4Y+Cb+Cr MCUs, chroma at half resolution). Constant 16×16
    // macroblocks make subsampling exact, so the oracle replays the
    // JFIF forward+inverse transform term-for-term per pixel
    "multimodal_jpeg420" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticJpeg420(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/jpeg").as("media_type"))
      Multimodal.decodeJpegPixels(media)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"),
          col("pos_moment"))
        .orderBy("doc_id")
    }),

    // Multimodal: JPEG drop accounting — non-JPEG / progressive-SOF2 /
    // truncated payloads counted by named reason next to the decodable
    // rows
    "multimodal_jpeg_skips" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticSkipJpeg(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/mixed").as("media_type"))
      Multimodal.jpegDecodeStats(media).orderBy("reason")
    }),

    // Multimodal: REAL video frame decode — a valid MJPEG AVI (RIFF
    // container walk, one `00dc` JPEG chunk per frame) is generated per
    // doc and every frame entropy-decoded back through the baseline
    // JPEG path; one row per frame with the exact per-frame mean and
    // position moment (DC-constant blocks decode exactly, so the
    // oracle replays the generation arithmetic per frame)
    "multimodal_video_frames" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticAvi(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("video/avi").as("media_type"))
      Multimodal.decodeVideoFrames(media)
        .orderBy("doc_id", "frame_idx")
    }),

    // Multimodal: frame SAMPLING over real video — keep every 2nd frame
    // (frame 0 always kept); the container walk skips the dropped
    // `00dc` chunks without JPEG-decoding them, which is the shape that
    // matters at scale (decode cost ∝ kept frames, not stored frames)
    "multimodal_video_sample" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticAvi(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("video/avi").as("media_type"))
      Multimodal.decodeVideoFrames(media, sampleStride = 2)
        .orderBy("doc_id", "frame_idx")
    }),

    // Multimodal: scene-cut detection over REAL decoded video — per-frame
    // grey means through a lag window per video; cut where the
    // consecutive-frame mean moves more than 100 grey-units. The decode
    // is the codec pass already certified by multimodal_video_frames;
    // the oracle replays the temporal lag + threshold on the generation
    // arithmetic, so the declarative scene logic is what's checked
    "multimodal_video_scenes" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticAvi(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("video/avi").as("media_type"))
      Multimodal.sceneCuts(media, thresholdMicro = 100000000L)
        .orderBy("doc_id", "frame_idx")
    }),

    // Multimodal: short-time spectrogram over REAL decoded audio — the
    // WAV corpus framed at nFft=32/hop=16 through the radix-2 FFT, one
    // row per (doc, frame) with DC / dominant-bin features. The oracle
    // replays a per-frame O(N²) DFT from the generation arithmetic —
    // any slip in the framing offsets, zero-padding, or FFT hash-fails
    "multimodal_spectrogram" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticWav(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("audio/wav").as("media_type"))
      Multimodal.spectrogram(media, nFft = 32, hop = 16)
        .orderBy("doc_id", "frame_idx")
    }),

    // Multimodal: video drop accounting — non-AVI / wrong-codec /
    // truncated containers and undecodable frames counted by named
    // reason next to the decodable rows
    "multimodal_video_skips" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticSkipAvi(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("video/mixed").as("media_type"))
      Multimodal.videoDecodeStats(media).orderBy("reason")
    }),

    // Multimodal: drop ACCOUNTING — what the pixel pass refuses, counted
    // by named reason (not_png / truncated / bad_crc / bit_depth) next
    // to the decodable "ok" rows (plain, palette, 16-bit, interlaced);
    // the refusals are correct, their invisibility wasn't. Oracle
    // restates the fixture mix arithmetic
    "multimodal_pixel_skips" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticSkipPng(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/mixed").as("media_type"))
      Multimodal.pixelDecodeStats(media).orderBy("reason")
    }),

    // Multimodal: GIF drop accounting — non-GIF / truncated / corrupt-LZW
    // payloads counted by named reason next to the decodable rows (which
    // include local-colour-table and interlaced variants: the codec owns
    // those)
    "multimodal_gif_skips" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticSkipGif(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/mixed").as("media_type"))
      Multimodal.gifDecodeStats(media).orderBy("reason")
    }),

    // Multimodal: GIF local-colour-table + interlace decode — per-frame
    // LCT palettes override the global table and interlaced frames store
    // rows in GIF89a four-pass order. Means alone are row-permutation
    // invariant, so the query also emits the row-weighted red moment —
    // a wrong de-interleave hash-fails on it while means stay green
    "multimodal_gif_lct" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticGifExt(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/gif").as("media_type"))
      Multimodal.decodeGifFrames(media)
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("delay_cs"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"),
          col("row_moment"))
        .orderBy("doc_id", "frame_idx")
    }),

    // Multimodal: REAL pixel decode — valid compressed PNGs (deflated
    // IDAT, scanline filters cycling through all five types) generated
    // per doc, inflated + unfiltered by the pure-JVM codec, per-channel
    // means over the reconstructed samples. The oracle recomputes the
    // means from the generation arithmetic — any slip in inflate,
    // unfilter, or channel interleaving hash-fails
    "multimodal_pixels" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticPixelPng(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/png").as("media_type"))
      Multimodal.decodePixels(media)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"))
        .orderBy("doc_id")
    }),

    // Image near-dup fingerprints over REAL decoded pixels: 64-bit
    // aHash (8×8 grey mean-comparison, cross-multiplied — no division)
    // + dHash (9×8 horizontal gradients), emitted as 16-bit bands that
    // double as the LSH blocking key; all-integer, so the oracle
    // replays every bit from the fixture's pixel law. The fixture is
    // MIXED-CONTAINER since r9 — PNG / baseline JPEG / GIF by doc_id%3,
    // each through its real codec via Multimodal.decodeImageAny
    "multimodal_phash" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticMixedImage(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/*").as("media_type"))
      Multimodal.perceptualHash(media).orderBy("doc_id")
    }),

    // ...and the banded near-dup join: candidates share an exact dHash
    // band (pigeonhole-complete for Hamming ≤ 3, capped buckets),
    // confirmed by the exact 128-bit combined Hamming distance —
    // cross-container pairs included (that is the point of hashing)
    "multimodal_phash_pairs" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticMixedImage(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/*").as("media_type"))
      Multimodal.perceptualHashPairs(
          Multimodal.perceptualHash(media), maxDist = 6)
        .orderBy("a", "b")
    }),

    // ...and the phash family's drop accounting: every payload counted
    // by outcome, ok:<container> or the container-prefixed refusal
    // reason — a crawl where jpeg:truncated spikes is a different
    // incident than one where unknown_container does
    "multimodal_phash_skips" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticSkipImage(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/*").as("media_type"))
      Multimodal.phashDecodeStats(media).orderBy("reason")
    }),

    // Multimodal: REAL resize — nearest-neighbor 8×8 thumbnail over the
    // decoded PNG pixels (the image-dedup normalization step), means
    // over the thumbnail; oracle replays the ⌊x'·w/tw⌋ sampling
    "multimodal_resize" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticPixelPng(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/png").as("media_type"))
      Multimodal.resizeStats(media, tw = 8, th = 8)
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"))
        .orderBy("doc_id")
    }),

    // Multimodal: REAL audio decode — valid PCM WAVs (RIFF container,
    // mono/stereo, 8-bit unsigned / 16-bit LE storage, four sample
    // rates) generated per doc, decoded by the pure-JVM codec,
    // per-channel mean / peak / zero-crossing stats over the actual
    // waveform. The oracle recomputes the stats from the generation
    // arithmetic — any slip in chunk walk, endianness, sign extension,
    // or 8-bit re-centering hash-fails
    "multimodal_audio" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticWav(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("audio/wav").as("media_type"))
      Multimodal.decodeAudio(media)
        .select(col("doc_id"), col("sample_rate"), col("channels"),
          col("bits"), col("n_frames"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"),
          concat_ws(",", col("peaks").cast("array<string>")).as("peaks"),
          concat_ws(",", col("zero_crossings").cast("array<string>"))
            .as("zcrs"))
        .orderBy("doc_id")
    }),

    // Multimodal: REAL spectral features — the same PCM WAVs decoded by
    // the codec, channel 0 through the pure-JVM radix-2 FFT; dominant
    // bin / DC / spectral centroid per doc. Cross-implementation check:
    // the oracle replays a direct O(N^2) DFT in SQL from the generation
    // arithmetic — any slip in bit-reversal, twiddle recurrence,
    // truncation, or channel de-interleave hash-fails
    "multimodal_fft" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticWav(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("audio/wav").as("media_type"))
      Multimodal.spectralFeatures(media, nFft = 64)
        .orderBy("doc_id")
    }),

    // Multimodal: REAL animated-GIF frame decode — valid GIF89a payloads
    // (global palette, GCE delays, LZW-compressed frames with genuine
    // dictionary growth) generated per doc, block-walked + LZW-decoded
    // by the pure-JVM codec, per-frame per-channel RGB means over the
    // palette-mapped pixels. The oracle recomputes frames from the
    // generation arithmetic — any slip in the bit-unpacking, dictionary
    // sync, palette indexing, or frame ordering hash-fails
    "multimodal_gif_frames" -> ((s, dir) => {
      val gen = udf { (id: Long) => Multimodal.syntheticGif(id) }
      val media = t(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id")).as("payload"),
          lit("image/gif").as("media_type"))
      Multimodal.decodeGifFrames(media)
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"),
          col("delay_cs"),
          concat_ws(",", transform(col("means"),
            m => microUnits(m, 6)).cast("array<string>")).as("means"))
        .orderBy("doc_id", "frame_idx")
    }),

    // S1: corpus TSV write→read roundtrip through the MEVI readers
    "s1_corpus_roundtrip" -> ((s, dir) => {
      val path = s"target/tmp/corpus_tsv_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val corpus = t(s, dir, "documents")
        .select(col("doc_id"), col("source").as("title"), col("text").as("content"))
      MeviIO.writeCorpusTsv(corpus, path)
      MeviIO.readCorpusTsv(s, path).orderBy("doc_id")
    }),

    // S10/S11: ranked-result TSV write→read roundtrip
    "s10_ranked_roundtrip" -> ((s, dir) => {
      val path = s"target/tmp/ranked_tsv_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val lists = BruteForceKNN.topKLists(
        queryVecs(s, dir).select("query_id", "qvec"),
        docVecs(s, dir).select("doc_id", "vec"),
        k = 10, metric = "ip", excludeSelf = true)
        .select(col("query_id").cast("string").as("query"),
          col("preds"), col("scores").cast("array<float>").as("scores"))
      MeviIO.writeRankedTsv(lists, path)
      MeviIO.readRankedTsv(s, path)
        .select(col("query"),
          concat_ws(",", col("preds").cast("array<string>")).as("preds"),
          concat_ws(",", transform(col("scores"),
            x => microUnits(x, 6))).as("scores"))
        .orderBy("query")
    }),

    // S2: query-doc pair TSV write→read roundtrip
    "s2_pair_roundtrip" -> ((s, dir) => {
      val path = s"target/tmp/pairs_tsv_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val pairs = t(s, dir, "documents").where(col("doc_id") < 200)
        .select(concat(lit("what is "), col("source"), lit(" "),
          col("doc_id")).as("query"), col("doc_id"))
      MeviIO.writePairsTsv(pairs, path)
      MeviIO.readPairsTsv(s, path).orderBy("doc_id")
    }),

    // S6: np.memmap-layout float32 matrix write→read roundtrip (row index
    // is the id — the reference's implicit contract)
    "s6_tensor_roundtrip" -> ((s, dir) => {
      val path = s"target/tmp/docemb_${dir.replaceAll("[^a-zA-Z0-9]", "_")}.bin"
      MeviIO.writeFloatMatrix(
        t(s, dir, "embeddings").where(col("vec_id") < 500).orderBy("vec_id")
          .select(col("embedding").as("vec")), path, dim = 64)
      MeviIO.readFloatMatrix(s, path, dim = 64)
        .select(col("row_id"),
          concat_ws(",", transform(col("vec"),
            x => microUnits(x, 5))).as("vec"))
        .orderBy("row_id")
    }),

    // S9: the torch-tensor sink is Parquet by design (SURVEY §2.1) —
    // ARRAY<FLOAT> columns must survive a write/read bit-exactly
    "s9_tensor_parquet" -> ((s, dir) => {
      val path = s"target/tmp/tensor_pq_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      t(s, dir, "embeddings").where(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding").as("vec"))
        .write.mode("overwrite").parquet(path)
      s.read.parquet(path)
        .select(col("vec_id"),
          concat_ws(",", transform(col("vec"),
            x => microUnits(x, 5))).as("vec"))
        .orderBy("vec_id")
    }),

    // Layout maintenance: Z-order the hot filter keys, then 2-D range
    // probe the laid-out copy. Values are layout-invariant (the oracle
    // reads the original table), while LayoutSpec pins the physical win
    // (row-group pruning on both keys). The Delta/Iceberg OPTIMIZE
    // ZORDER job, from public Spark primitives — see io/Layout.scala.
    "layout_zorder_probe" -> ((s, dir) => {
      val path = s"target/tmp/zorder_li_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      graft.io.Layout.writeZOrdered(
        t(s, dir, "lineitem").select("l_partkey", "l_suppkey",
          "l_returnflag", "l_extendedprice", "l_quantity"),
        path, "l_partkey", "l_suppkey", nFiles = 8, bits = 16)
      s.read.parquet(path)
        .where(col("l_partkey").between(50, 250) &&
          col("l_suppkey").between(5, 60))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"),
          round(sum("l_extendedprice"), 2).as("price_sum"),
          sum("l_quantity").cast("long").as("qty_sum"))
        .orderBy("l_returnflag")
    }),

    // V11: codebook alignment across re-clusterings (pq.py:600-611) —
    // refresh the codebook with a different seed, Hungarian-match new
    // centroids to old, emit (level, new_code → old_code, L2² cost); the
    // oracle recomputes each pair's cost from inlined centroid literals
    "v11_align" -> ((s, dir) => {
      val old = rqCodebook(s, dir)
      val fresh = ArtifactCache.codebook(s"$dir/rq2x3/refresh7") {
        RQTrainer.fit(docVecs(s, dir).select("doc_id", "vec"), "vec",
          numLevels = 2, k = 8, seed = 7L, maxIter = 10)
      }
      val perms = old.levels.indices.map(m =>
        graft.index.CodebookAligner.alignOptimal(
          old.levels(m), fresh.levels(m))).toArray
      dirAlignments.put(dir, (old, fresh, perms))
      lastDir = Some(dir)
      val rows = for {
        m <- old.levels.indices
        n <- perms(m).indices
      } yield {
        val o = perms(m)(n)
        val a = fresh.levels(m)(n); val b = old.levels(m)(o)
        var cst = 0.0; var j = 0
        while (j < a.length) {
          val d = a(j).toDouble - b(j).toDouble; cst += d * d; j += 1
        }
        (m, n, o, math.floor(cst * 1000000 + 0.5).toLong)
      }
      import s.implicits._
      rows.toDF("level", "new_code", "old_code", "cost")
        .orderBy("level", "new_code")
    }),

    // Salted skew join: the hot-key spreader must be row-identical to the
    // plain equi-join (oracle = the plain join, aggregated)
    "skew_join" -> ((s, dir) => {
      val fact = t(s, dir, "lineitem")
        .select(col("l_suppkey").as("suppkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val dim = t(s, dir, "supplier")
        .select(col("s_suppkey").as("suppkey"), col("s_name"))
      graft.pipeline.SkewJoin.salted(fact, dim, "suppkey", salt = 8)
        .groupBy("suppkey", "s_name")
        .agg(count(lit(1)).as("n"), round(sum(col("rev")), 2).as("revenue"))
        .orderBy("suppkey")
    }),

    // P5: deterministic query char-span augmentation (main_utils.py:89-101)
    "p5_query_spans" -> ((s, dir) =>
      Augment.querySpans(
        t(s, dir, "documents").where(col("doc_id") < 100)
          .select(substring(col("text"), 1, 80).as("query")))
        .orderBy("query", "span")),

    // A8: query-gen pool backfill loop (complement_qg10.py:86-120) with a
    // deterministic SQL-expressible stand-in generator: even docs start
    // with one seed query, odd with none; the generator fills each doc's
    // deficit in round 0
    "a8_backfill" -> ((s, dir) => {
      val universe = t(s, dir, "documents").where(col("doc_id") < 60)
      val initial = universe.select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          concat(lit("seed:"), col("doc_id"))).as("query"))
      val out = graft.pipeline.QueryGenPool.backfill(
        initial, minPerDoc = 2, maxRounds = 3) { (need, round) =>
        need.select(col("doc_id"),
          explode(transform(
            sequence(lit(0), (lit(2) - col("have")).cast("int") - 1),
            i => concat(lit(s"gen:$round:"), col("doc_id"), lit(":"), i)))
            .as("query"))
      }
      out.select(col("doc_id"), concat_ws(",", col("queries")).as("queries"),
        col("n_queries").cast("long").as("n_queries")).orderBy("doc_id")
    }),

    // V6: the coarse beam tuples themselves (pq.py:613-713, l2 + "prod")
    "v6_beam" -> ((s, dir) =>
      CodebookBeamSearch.search(queryVecs(s, dir).select("query_id", "qvec"),
        rqCodebook(s, dir), beams = 4)
        .select(col("query_id"), col("crank").cast("long").as("crank"),
          concat_ws(",", col("codes").cast("array<string>")).as("codes"),
          round(col("logprob"), 6).as("logprob"))
        .orderBy("query_id", "crank")),

    // V1 stand-in: deterministic hashing bag-of-words document encoder
    "v1_hash_embed" -> ((s, dir) =>
      graft.functions.TextEmbedder.hashEmbed(
        t(s, dir, "documents").where(col("doc_id") < 100), dim = 16)
        .select(col("doc_id"),
          concat_ws(",", transform(col("vec"),
            x => microUnits(x, 6))).as("vec"))
        .orderBy("doc_id")),

    // A3: per-cluster centroid average (codebook `avg` init, pq.py:488-524;
    // label plays the cluster so the oracle can replay it)
    "a3_centroid_avg" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(avg(col("x").cast("double")).as("m"))
        .groupBy("label")
        .agg(concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos"), col("m")))),
          s_ => microUnits(s_.getField("m"), 6))).as("centroid"))
        .orderBy("label")),

    // P3: text cleaning via regexp_replace (main_models.py:437-443)
    "p3_text_clean" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          regexp_replace(col("props"), "[{}\"]", "").as("cleaned"))
        .orderBy("event_id")),

    // P4: regex word tokenization, lowercased (DPR SimpleTokenizer shape)
    "p4_regex_tokenize" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat_ws(",", slice(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)), 1, 5)).as("first_tokens"),
          size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).cast("long").as("n_words"))
        .orderBy("doc_id")),

    // P7: deterministic per-digit id shuffle (hard-negative id corruption)
    "p7_digit_shuffle" -> ((s, dir) =>
      Augment.digitShuffle(t(s, dir, "documents").where(col("doc_id") >= 100))
        .orderBy("doc_id")),

    // S4: python-literal list parse (NQ qa.csv answers, get_answers.py:15-29)
    // — the synthesized literal carries a real apostrophe in a double-quoted
    // element and an escaped quote in a single-quoted one, the shapes
    // eval() handles and a [^']* regex cannot
    "s4_pylist_parse" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"),
          concat(lit("['"), col("source"), lit("', \"it's a "), col("lang"),
            lit("\", 'esc\\'d']")).as("raw"))
        .select(col("doc_id"),
          concat_ws(",", graft.io.PyLiteral.parse_py_string_list(col("raw")))
            .as("answers"))
        .orderBy("doc_id")),

    // V10: the precomputed K^M reconstruct-all table (gen_all_reconstruct —
    // joined at scale, never broadcast)
    "rq_reconstruct_all" -> ((s, dir) =>
      graft.index.Reconstructor.reconstructAll(s, rqCodebook(s, dir))
        .select(concat_ws(",", col("codes").cast("array<string>")).as("codes"),
          concat_ws(",", transform(col("vec"),
            x => microUnits(x, 5))).as("vec"))
        .orderBy("codes")),

    // rows-only: RQ reconstruction error (V10 diagnostic)
    "rq_reconstruct" -> ((s, dir) =>
      CodeAssigner.reconstructionError(
        docVecs(s, dir).select("doc_id", "vec"), rqCodebook(s, dir))
        .select(col("doc_id"), round(col("recon_error"), 6).as("recon_error"))
        .orderBy("doc_id")),

    // V9: seeded random-hyperplane near-dup candidates + exact confirm
    // (md5-derived plane literals — same constants in the oracle SQL; the
    // MLlib BRP variant stays in LSHSearch.nearDupPairs as library API)
    "lsh_neardup" -> ((s, dir) =>
      graft.search.LSHSearch.seededNearDupPairs(
        t(s, dir, "embeddings"), dim = 64, threshold = 1.2,
        tables = 4, bits = 8, seed = 42L)
        .select(col("a"), col("b"), round(col("dist"), 6).as("dist"))
        .orderBy("a", "b")),

    // J6+V13: ensemble fusion of IP-ANN list with a coarse ranked list
    "ensemble_fuse" -> ((s, dir) => {
      val (ann, coarse) = annCoarseCandidates(s, dir)
      Ensemble.fuse(ann, coarse, numClusters = 5,
        alpha = 0.6, beta = 0.03, gamma = 0.02, k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("fused_score"), 6).as("fused_score"))
        .orderBy("query_id", "rank")
    }),

    // NQ-style end-to-end eval (MEVI/ensemble_nqdpr.py:9-45): fuse the
    // ANN list with the coarse cluster ranks (NQ alpha=0.4,
    // ensemble_nqdpr.py:261), then walk each query's fused ranks for the
    // first doc whose TEXT token-contains the query's answer (the
    // offsets/array gt structure = the J5/A9 containment matches) —
    // HitRate@k / MRR@k over ALL answer queries
    "ensemble_nq_hitrate" -> ((s, dir) => {
      val (ann, coarse) = annCoarseCandidates(s, dir)
      val fused = Ensemble.fuse(ann, coarse, numClusters = 5,
        alpha = 0.4, beta = 0.03, gamma = 0.02, k = 10)
        .where(col("query_id") < 10)
      val gt = answerMatches(s, dir)
        .groupBy(col("query_idx").as("query_id"))
        .agg(sort_array(collect_list(col("doc_id"))).as("gt"))
      // denominator = ALL answer queries (evaluate() divides by nqueries,
      // ensemble_nqdpr.py:43-45) — a query whose answer matches nothing
      // still counts, so LEFT join from the full answer-query set
      val truth = t(s, dir, "documents").where(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"))
        .join(gt, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("gt"), array().cast("array<long>")).as("gt"))
      Metrics.ranking(Metrics.rankedToPreds(fused), truth, ks = Seq(1, 5, 10))
        .select(col("k"), round(col("recall"), 6).as("recall"),
          round(col("mrr"), 6).as("mrr"),
          round(col("hitrate"), 6).as("hitrate"), col("n_queries"))
        .orderBy("k")
    }),

    // ...and the α sweep the NQ ensemble was missing (the reference tunes
    // --alphas on MARCO but pins alpha=0.4 on NQ, ensemble_nqdpr.py:261 —
    // this is the tuned-and-checked analog of ensemble_grid against the
    // answer-containment ground truth): MRR@10 / HitRate@10 per combo,
    // fixed denominator = the 10 answer queries
    "ensemble_nq_grid" -> ((s, dir) => {
      val (ann, coarse) = annCoarseCandidates(s, dir)
      val fused = Ensemble.fuseGrid(ann, coarse, numClusters = 5,
        alphas = Seq(0.2, 0.4, 0.6, 0.8), betas = Seq(0.03),
        gammas = Seq(0.02), k = 10)
        .where(col("query_id") < 10)
      val gt = answerMatches(s, dir)
        .select(col("query_idx").as("query_id"), col("doc_id"))
      fused
        .join(gt, Seq("query_id", "doc_id"))
        .where(col("rank") <= 10)
        .groupBy("alpha", "beta", "gamma", "query_id")
        .agg(min("rank").as("hr"))
        .groupBy("alpha", "beta", "gamma")
        .agg(round(sum(lit(1.0) / col("hr")) / lit(10.0), 6).as("mrr"),
          round(count(lit(1)) / lit(10.0), 6).as("hitrate"))
        .orderBy("alpha")
    }),

    // V15/V19: learned reranker — LR over (score, 1/(1+crank), missing)
    // features of the aligned candidate table, labels from label ground
    // truth. The fit is MLlib; the trained 3-weight model is inlined into
    // the generated oracle, which replays sigmoid scoring exactly
    "v15_rerank" -> ((s, dir) => {
      val (ann, coarse) = annCoarseCandidates(s, dir)
      val aligned = ann.join(coarse, Seq("query_id", "doc_id"), "left")
      // train-once artifact (like the RQ codebook): serving reuses the
      // fitted weights; the fit itself is warmed/attributed separately
      val model = ArtifactCache.value(s"$dir/reranker") {
        val labeled = graft.eval.Reranker.features(aligned
          .join(queryVecs(s, dir).select(col("query_id"),
            col("label").as("qlab")), Seq("query_id"))
          .join(docVecs(s, dir).select(col("doc_id"),
            col("label").as("dlab")), Seq("doc_id"))
          .withColumn("label",
            when(col("qlab") === col("dlab"), 1.0).otherwise(0.0)))
        graft.eval.Reranker.train(labeled)
      }
      dirRerankers.put(dir, (model.coefficients.toArray, model.intercept))
      lastDir = Some(dir)
      graft.eval.Reranker.rerank(model, aligned, k = 10)
        .select(col("query_id"), col("rank").cast("long").as("rank"),
          col("doc_id"), round(col("prob"), 6).as("prob"))
        .orderBy("query_id", "rank")
    }),

    // V3/OPQ reinstated: PCA rotation of the embedding space (the learned
    // rotation faiss's "OPQM,PQMxB" factory applies before quantization,
    // MEVI/pq.py:186-190). MLlib fits the components once (train-once
    // artifact like the RQ codebook); projection is the deterministic
    // sequential-fold kernel, so the oracle replays it from inlined
    // component literals
    "v_opq_rotate" -> ((s, dir) => {
      val rot = ArtifactCache.value(s"$dir/pca4") {
        graft.index.PcaRotation.fit(t(s, dir, "embeddings"), "embedding",
          k = 4)
      }
      dirRotations.put(dir, rot)
      lastDir = Some(dir)
      graft.index.PcaRotation.project(
        t(s, dir, "embeddings"), "embedding", rot)
        .select(col("vec_id"),
          concat_ws(",", transform(col("proj"),
            x => microUnits(x, 6)).cast("array<string>")).as("proj"))
        .orderBy("vec_id")
    }),

    // V13 grid: α/γ hyperparameter sweep in one pass (the reference's
    // --alphas/--betas/--gammas comma lists, ensemble_marco.py:251-253) —
    // one MRR@10 metric row per combo against label ground truth
    "ensemble_grid" -> ((s, dir) => {
      val (ann, coarse) = annCoarseCandidates(s, dir)
      val fused = Ensemble.fuseGrid(ann, coarse, numClusters = 5,
        alphas = Seq(0.4, 0.6), betas = Seq(0.03),
        gammas = Seq(0.02, 0.05), k = 10)
      val lab = t(s, dir, "embeddings").select("vec_id", "label")
      fused
        .join(lab.select(col("vec_id").as("query_id"),
          col("label").as("qlab")), Seq("query_id"))
        .join(lab.select(col("vec_id").as("doc_id"),
          col("label").as("dlab")), Seq("doc_id"))
        .where(col("qlab") === col("dlab"))
        .groupBy("alpha", "beta", "gamma", "query_id")
        .agg(min("rank").as("hr"))
        .groupBy("alpha", "beta", "gamma")
        // fixed denominator 20 (the query universe): queries with no
        // labeled hit in the top-10 contribute 0 to the mean
        .agg(round(sum(lit(1.0) / col("hr")) / lit(20.0), 6).as("mrr"))
        .orderBy("alpha", "gamma")
    })
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles (column names/order must match the Spark results)
  // ---------------------------------------------------------------------

  private val dotSql =
    "list_sum(list_transform(list_zip(q.qvec, d.vec), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))"

  /** Shared phash replay: both 64-bit hashes re-derived from the
    * syntheticPixelPng law (w/h/channels and the per-pixel arithmetic),
    * nearest-neighbor grids, cross-multiplied mean bits, gradient bits,
    * 16-bit band packing — every step integer. */
  private val phashCtes = {
    // mixed-container grey law, container = d % 3 (syntheticMixedImage):
    //  0 PNG  syntheticPixelPng — this residue's channel law is exactly
    //         1 channel, so grey IS the single sample
    //  1 JPEG syntheticJpeg — constant 8×8 blocks, lossy-pipeline-exact
    //  2 GIF  syntheticGif frame 0 — palette index j = (x·3+y·5+d)%4,
    //         grey = R+G+B of palette entry j
    def grey(sx: String, sy: String) =
      s"""CASE WHEN d % 3 = 0 THEN ($sx*7 + $sy*13 + d*3) % 256
         |     WHEN d % 3 = 1 THEN
         |       (($sx // 8) * 29 + ($sy // 8) * 41 + d*13) % 256
         |     ELSE ((($sx*3 + $sy*5 + d) % 4) * 53 + d*7) % 256
         |        + ((($sx*3 + $sy*5 + d) % 4) * 101 + d*11) % 256
         |        + ((($sx*3 + $sy*5 + d) % 4) * 29 + d*13) % 256 END""".stripMargin
    s"""dd AS (SELECT doc_id AS d,
       |         CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 16
       |              WHEN doc_id % 3 = 1 THEN 16
       |              ELSE 3 + doc_id % 6 END AS w,
       |         CASE WHEN doc_id % 3 = 0 THEN 1 + doc_id % 8
       |              WHEN doc_id % 3 = 1 THEN 8 * (1 + doc_id % 2)
       |              ELSE 2 + doc_id % 5 END AS h
       |       FROM documents),
       |t8 AS (SELECT unnest(range(0, 8)) AS i),
       |ag0 AS (SELECT dd.d, ty.i AS ty, tx.i AS tx,
       |          (tx.i * dd.w) // 8 AS sx, (ty.i * dd.h) // 8 AS sy
       |        FROM dd JOIN t8 tx ON TRUE JOIN t8 ty ON TRUE),
       |agg2 AS (SELECT d, ty, tx, ${grey("sx", "sy")} AS g FROM ag0),
       |at2 AS (SELECT d, sum(g) AS tot FROM agg2 GROUP BY d),
       |ab AS (SELECT agg2.d, ty * 8 + tx AS i,
       |         CASE WHEN 64 * g > at2.tot THEN 1 ELSE 0 END AS b
       |       FROM agg2 JOIN at2 ON at2.d = agg2.d),
       |aba AS (SELECT d, i // 16 AS band,
       |          CAST(sum(b * (1 << (15 - (i % 16)))) AS INT) AS v
       |        FROM ab GROUP BY d, band),
       |dg0 AS (SELECT dd.d, ty.i AS ty, tx.i AS tx,
       |          (tx.i * dd.w) // 9 AS sx0, ((tx.i + 1) * dd.w) // 9 AS sx1,
       |          (ty.i * dd.h) // 8 AS sy
       |        FROM dd JOIN t8 tx ON TRUE JOIN t8 ty ON TRUE),
       |dgg AS (SELECT d, ty, tx, ${grey("sx0", "sy")} AS g0,
       |          ${grey("sx1", "sy")} AS g1 FROM dg0),
       |db AS (SELECT d, ty * 8 + tx AS i,
       |         CASE WHEN g1 > g0 THEN 1 ELSE 0 END AS b FROM dgg),
       |dba AS (SELECT d, i // 16 AS band,
       |          CAST(sum(b * (1 << (15 - (i % 16)))) AS INT) AS v
       |        FROM db GROUP BY d, band),
       |hx AS (SELECT u.d AS doc_id,
       |         max(CASE WHEN src = 0 AND band = 0 THEN v END) AS a0,
       |         max(CASE WHEN src = 0 AND band = 1 THEN v END) AS a1,
       |         max(CASE WHEN src = 0 AND band = 2 THEN v END) AS a2,
       |         max(CASE WHEN src = 0 AND band = 3 THEN v END) AS a3,
       |         max(CASE WHEN src = 1 AND band = 0 THEN v END) AS d0,
       |         max(CASE WHEN src = 1 AND band = 1 THEN v END) AS d1,
       |         max(CASE WHEN src = 1 AND band = 2 THEN v END) AS d2,
       |         max(CASE WHEN src = 1 AND band = 3 THEN v END) AS d3
       |       FROM (SELECT d, 0 AS src, band, v FROM aba
       |             UNION ALL SELECT d, 1 AS src, band, v FROM dba) u
       |       GROUP BY u.d)""".stripMargin
  }

  private val knnBase =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 20),
       |d AS (SELECT vec_id AS doc_id, embedding AS vec FROM embeddings),
       |s AS (SELECT q.query_id, d.doc_id, $dotSql AS score
       |      FROM q CROSS JOIN d WHERE d.doc_id <> q.query_id),
       |r AS (SELECT query_id, doc_id, score,
       |             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
       |      FROM s)""".stripMargin

  /** Static + generated oracles. The RQ entries need the trained codebook
    * (Verify evaluates this AFTER running the queries); without one (e.g. a
    * dry oracle dump) they are simply omitted. */
  def oracleSql: Map[String, String] = {
    val dir = lastDir
    staticOracleSql ++
      dir.flatMap(d => Option(dirCodebooks.get(d)))
        .map(cb => graft.oracle.GeneratedOracles.rqOracles(
          cb, beams = 4, topK = 10, budget = 100,
          maxChunk = graft.index.ClusterIndexBuilder.DefaultMaxChunk,
          maxQueryId = 20)).getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirIvfCodebooks.get(d)))
        .map(cb => Map(
          "ivf_knn" -> graft.oracle.GeneratedOracles.ivfKnnSql(
            cb, nprobe = 4, k = 10, maxQueryId = 20),
          "knn_graph" -> graft.oracle.GeneratedOracles.knnGraphSql(
            cb, k = 8, rounds = 2, maxDegree = 16),
          "knn_graph_search" -> graft.oracle.GeneratedOracles.knnGraphWalkSql(
            cb, k = 8, rounds = 2, maxDegree = 16, walkK = 10, beam = 16,
            walkRounds = 2, nprobe = 4, perCell = 4,
            maxQueryId = 20),
          "dedup_semdedup_fixedk" -> graft.oracle.GeneratedOracles
            .semDeDupSql(cb, tau = 0.35),
          "sample_cluster_balanced" -> graft.oracle.GeneratedOracles
            .clusterBalancedSql(cb, total = 100L, alpha = 0.5),
          "pack_semantic" -> graft.oracle.GeneratedOracles
            .packSemanticSql(cb, seqLen = 128)))
        .getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirSemScaledCodebooks.get(d)))
        .map(cb => Map(
          "dedup_semdedup" -> graft.oracle.GeneratedOracles.semDeDupSql(
            cb, tau = 0.35)))
        .getOrElse(Map.empty) ++
      // refined SemDeDup needs BOTH the base ivf codebook and the
      // refined query to have RUN at this dir (the sub map entry is a
      // ran-marker: None = ran, no over-cap cell; Some = trained sub) —
      // emitting it from a stale base codebook alone would claim the
      // no-hot branch for a query that never executed
      (for {
        d <- dir
        cbBase <- Option(dirIvfCodebooks.get(d))
        subOpt <- Option(dirSemSubCodebooks.get(d))
      } yield Map("dedup_semdedup_refined" ->
        graft.oracle.GeneratedOracles.semDeDupRefinedSql(
          cbBase, subOpt, tau = 0.35, maxCell = 64))).getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirRerankers.get(d)))
        .map { case (coef, intercept) => Map("v15_rerank" ->
          graft.oracle.GeneratedOracles.rerankSql(
            coef, intercept, k = 10, maxQueryId = 20)) }.getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirQualityLR.get(d)))
        .map { case (coef, intercept) => Map("sample_quality_pareto" ->
          graft.oracle.GeneratedOracles.qualityParetoSql(
            coef, intercept, alpha = 9.0, seed = 42L)) }.getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirRotations.get(d)))
        .map(rot => Map("v_opq_rotate" ->
          graft.oracle.GeneratedOracles.pcaProjectSql(rot.components)))
        .getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirSwapArtifacts.get(d)))
        .map { case (wv, cb) => Map("encoder_swap" ->
          graft.oracle.GeneratedOracles.encoderSwapSql(
            wv, cb, beams = 4, k = 10, maxQueryId = 20)) }
        .getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirPqCodebooks.get(d)))
        .map(cb => Map(
          "pq_assign" -> graft.oracle.GeneratedOracles.pqAssignSql(cb),
          "pq_reconstruct" -> graft.oracle.GeneratedOracles.pqReconstructSql(cb)))
        .getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirIvfPq.get(d)))
        .map { case (coarse, pq) => Map("ivfpq_knn" ->
          graft.oracle.GeneratedOracles.ivfPqKnnSql(
            coarse, pq, nprobe = 4, k = 10, maxQueryId = 20)) }
        .getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirHkmTrees.get(d)))
        .map(tree => Map(
          "hkm_assign" -> graft.oracle.GeneratedOracles.hkmAssignSql(tree),
          // the distributed path trains bit-identical codebooks
          // (levelFit is shared), so the TREE replay is its oracle too
          "hkm_assign_dist" -> graft.oracle.GeneratedOracles.hkmAssignSql(tree),
          "hkm_beam" -> graft.oracle.GeneratedOracles.hkmBeamSql(
            tree, beams = 4, maxQueryId = 20),
          // the distributed beam serves off fitLevels frames whose
          // codebooks are bit-identical to the Tree (shared levelFit),
          // so the TREE beam replay is its oracle too
          "hkm_beam_dist" -> graft.oracle.GeneratedOracles.hkmBeamSql(
            tree, beams = 4, maxQueryId = 20)))
        .getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirAlignments.get(d)))
        .map { case (old, fresh, perms) => Map("v11_align" ->
          graft.oracle.GeneratedOracles.alignSql(old, fresh, perms)) }
        .getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirBpeMerges.get(d)))
        .map(merges => Map("text_bpe_tokenize" ->
          graft.oracle.GeneratedOracles.bpeTokenizeSql(merges)))
        .getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirUnigram.get(d)))
        .map(model => Map(
          "text_unigram_tokenize" ->
            graft.oracle.GeneratedOracles.unigramTokenizeSql(model),
          // the tokenizer-true composition oracles chain the trained
          // model's DP replay, so they are generated per dir like the
          // tokenize oracle itself (VERDICT r15 #1)
          "pipeline_curate_funnel" -> curateFullSql(
            funnelSelectSql, materializeStages = true,
            exportModel = Some(model)),
          "pipeline_curate_export" -> curateFullSql(
            tokenExportSelectSql, materializeStages = true,
            exportModel = Some(model)),
          "pipeline_curate_pack" -> curateWitnessSql(
            tokenExportSelectSql, exportModel = Some(model))))
        .getOrElse(Map.empty) ++
      // the in-context export needs BOTH trained artifacts at this dir:
      // the unigram model (token streams) and the ivf codebook (cells)
      (for {
        d <- dir
        model <- Option(dirUnigram.get(d))
        cb <- Option(dirIvfCodebooks.get(d))
      } yield Map("pipeline_curate_export_ctx" -> curateFullSql(
        tokenExportSelectSql, materializeStages = true,
        exportModel = Some(model), exportCtxCb = Some(cb))))
        .getOrElse(Map.empty) ++
      dir.flatMap(d => Option(dirLifecycle.get(d)))
        .map { case (merges, cb) => Map("pipeline_index_serve" ->
          graft.oracle.GeneratedOracles.pipelineIndexServeSql(
            merges, cb, beams = 4, k = 10, maxQueryId = 20)) }
        .getOrElse(Map.empty)
  }

  private def staticOracleSql: Map[String, String] = Map(

    "lsh_neardup" -> graft.oracle.GeneratedOracles.lshNearDupSql(
      dim = 64, threshold = 1.2, tables = 4, bits = 8, seed = 42L),

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_revenue" ->
      """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM region JOIN nation ON r_regionkey = n_regionkey
        |JOIN customer ON n_nationkey = c_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q6_filter_sum" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, count(*) AS cnt
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q_count_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "w1_window_rank" ->
      """SELECT l_orderkey, rnk, l_linenumber, round(l_extendedprice, 2) AS price
        |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
        |        row_number() OVER (PARTITION BY l_orderkey
        |                           ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rnk
        |      FROM lineitem)
        |WHERE rnk <= 3 ORDER BY l_orderkey, rnk""".stripMargin,

    "p9_semi_join" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |ORDER BY o_orderkey""".stripMargin,

    // the bloom pre-filter is removed by the exact confirm join, so the
    // oracle is the plain EXISTS — byte-identical output is the point
    "p9_bloom_semi" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |ORDER BY o_orderkey""".stripMargin,

    "a7_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "set_ops" ->
      """WITH small AS (SELECT DISTINCT p_brand FROM part WHERE p_size < 10),
        |typed AS (SELECT DISTINCT p_brand FROM part WHERE p_type LIKE '%a%')
        |SELECT op, n FROM (
        |  SELECT 'union' AS op, (SELECT count(*) FROM (SELECT p_brand FROM small UNION SELECT p_brand FROM typed)) AS n
        |  UNION ALL
        |  SELECT 'intersect', (SELECT count(*) FROM (SELECT p_brand FROM small INTERSECT SELECT p_brand FROM typed))
        |  UNION ALL
        |  SELECT 'except', (SELECT count(*) FROM (SELECT p_brand FROM small EXCEPT SELECT p_brand FROM typed))
        |) ORDER BY op""".stripMargin,

    "j2_group_collect" ->
      """SELECT user_id, array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "s3_multilabel_parse" ->
      """SELECT doc_id,
        |  array_to_string(CAST(string_split(concat(doc_id, ',', doc_id + 1, ',', doc_id + 2), ',') AS BIGINT[]), ',') AS doc_ids
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p2_null_handling" ->
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderpriority, '3-MEDIUM'), '(default)') AS priority,
        |  CAST(CASE WHEN nullif(o_orderpriority, '3-MEDIUM') IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_null
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "p1_doc_format" ->
      """SELECT doc_id,
        |  concat('Title: ', source, ' Text: ', substr(text, 1, 40)) AS formatted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "knn_ip" ->
      s"""$knnBase
         |SELECT query_id, rank, doc_id, round(score, 6) AS score
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "knn_cos" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 20),
         |d AS (SELECT vec_id AS doc_id, embedding AS vec FROM embeddings),
         |s AS (SELECT q.query_id, d.doc_id,
         |        $dotSql
         |        / (sqrt(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         |           * sqrt(list_sum(list_transform(d.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS score
         |      FROM q CROSS JOIN d WHERE d.doc_id <> q.query_id),
         |r AS (SELECT query_id, doc_id, score,
         |             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
         |      FROM s)
         |SELECT query_id, rank, doc_id, round(score, 6) AS score
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "metrics_ranking" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec, label FROM embeddings WHERE vec_id < 20),
         |d AS (SELECT vec_id AS doc_id, embedding AS vec, label FROM embeddings),
         |s AS (SELECT q.query_id, d.doc_id, q.label AS qlabel, d.label AS dlabel, $dotSql AS score
         |      FROM q CROSS JOIN d WHERE d.doc_id <> q.query_id),
         |r AS (SELECT query_id, doc_id, qlabel, dlabel, score,
         |             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
         |      FROM s),
         |hits AS (SELECT query_id, rank FROM r WHERE dlabel = qlabel AND rank <= 10),
         |gtn AS (SELECT q.query_id, count(*) AS gt_n FROM q JOIN d ON d.label = q.label AND d.doc_id <> q.query_id GROUP BY q.query_id),
         |ks AS (SELECT unnest([1, 5, 10]) AS k),
         |perq AS (
         |  SELECT ks.k, gtn.query_id,
         |    COALESCE((SELECT count(*) FROM hits h WHERE h.query_id = gtn.query_id AND h.rank <= ks.k), 0) / gtn.gt_n AS recall,
         |    COALESCE((SELECT 1.0 / min(h.rank) FROM hits h WHERE h.query_id = gtn.query_id AND h.rank <= ks.k), 0) AS rr,
         |    CASE WHEN EXISTS (SELECT 1 FROM hits h WHERE h.query_id = gtn.query_id AND h.rank <= ks.k) THEN 1.0 ELSE 0.0 END AS hit
         |  FROM ks CROSS JOIN gtn)
         |SELECT k, round(avg(recall), 6) AS recall, round(avg(rr), 6) AS mrr,
         |  round(avg(hit), 6) AS hitrate, count(*) AS n_queries
         |FROM perq GROUP BY k ORDER BY k""".stripMargin,

    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_docs,
        |  min(doc_id) AS canonical_id,
        |  array_to_string((list_sort(list(doc_id)))[1:8], ',') AS sample_ids
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        |  len(string_split_regex(text, '\s+')) AS n_tokens,
        |  length(text) AS len_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    "events_asof" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |c0 AS (SELECT event_id, user_id, ts,
        |         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |       FROM events WHERE event_type = 'click'),
        |c AS (SELECT event_id, user_id, ts FROM c0 WHERE rn = 1)
        |SELECT p.event_id, p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  c.event_id AS click_id,
        |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us,
        |  round(p.value, 2) AS value
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL THEN 0
        |         WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
        |         ELSE 0 END AS newf
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT user_id, ts, value,
        |    sum(newf) OVER (PARTITION BY user_id ORDER BY ts
        |                    ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM g)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "events_range_join" ->
      """SELECT r.event_id AS purchase_id, l.event_id, l.user_id,
        |  l.event_type, epoch_us(l.ts) - epoch_us(r.ts) AS delta_us
        |FROM events l JOIN events r
        |  ON l.user_id = r.user_id
        | AND r.event_type = 'purchase'
        | AND l.event_type IN ('click', 'view')
        | AND epoch_us(l.ts) >= epoch_us(r.ts)
        | AND epoch_us(l.ts) <= epoch_us(r.ts) + 3600000000
        |ORDER BY purchase_id, l.event_id""".stripMargin,

    "events_overlap_join" ->
      """SELECT p.event_id AS purchase_id, e.event_id AS error_id,
        |  p.user_id,
        |  least(epoch_us(p.ts) + 3600000000, epoch_us(e.ts) + 1800000000) -
        |    greatest(epoch_us(p.ts), epoch_us(e.ts)) AS overlap_us
        |FROM events p JOIN events e
        |  ON p.user_id = e.user_id
        | AND p.event_type = 'purchase' AND e.event_type = 'error'
        | AND epoch_us(p.ts) <= epoch_us(e.ts) + 1800000000
        | AND epoch_us(e.ts) <= epoch_us(p.ts) + 3600000000
        |ORDER BY purchase_id, error_id""".stripMargin,

    "events_ewma" ->
      """WITH w AS (SELECT user_id, event_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS vs
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_id IS NOT NULL AND value IS NOT NULL)
        |SELECT user_id AS key, event_id AS tie,
        |  CAST(floor(list_reduce(vs,
        |    (acc, x) -> 0.25e0 * x + 0.75e0 * acc) * 1000000 + 0.5) AS BIGINT)
        |    AS ewma_micro
        |FROM w ORDER BY key, tie""".stripMargin,

    "events_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT s1.user_id, s1.t1, min(e.ts) AS t2 FROM s1
        |       LEFT JOIN events e ON e.user_id = s1.user_id
        |         AND e.event_type = 'view' AND e.ts >= s1.t1
        |       GROUP BY s1.user_id, s1.t1),
        |s3 AS (SELECT s2.user_id, s2.t1, s2.t2, min(e.ts) AS t3 FROM s2
        |       LEFT JOIN events e ON e.user_id = s2.user_id
        |         AND e.event_type = 'click' AND e.ts >= s2.t2
        |       GROUP BY s2.user_id, s2.t1, s2.t2),
        |s4 AS (SELECT s3.user_id, s3.t1, s3.t2, s3.t3, min(e.ts) AS t4 FROM s3
        |       LEFT JOIN events e ON e.user_id = s3.user_id
        |         AND e.event_type = 'purchase' AND e.ts >= s3.t3
        |       GROUP BY s3.user_id, s3.t1, s3.t2, s3.t3)
        |SELECT user_id,
        |  strftime(t1, '%Y-%m-%d %H:%M:%S') AS step1_ts,
        |  strftime(t2, '%Y-%m-%d %H:%M:%S') AS step2_ts,
        |  strftime(t3, '%Y-%m-%d %H:%M:%S') AS step3_ts,
        |  strftime(t4, '%Y-%m-%d %H:%M:%S') AS step4_ts,
        |  CAST((t1 IS NOT NULL) AS INT) + CAST((t2 IS NOT NULL) AS INT) +
        |    CAST((t3 IS NOT NULL) AS INT) + CAST((t4 IS NOT NULL) AS INT)
        |    AS steps_completed
        |FROM s4 ORDER BY user_id""".stripMargin,

    "graph_pagerank" ->
      """WITH e AS (
        |  SELECT DISTINCT l_suppkey + 1000000 AS src, l_partkey AS dst
        |  FROM lineitem
        |  UNION
        |  SELECT DISTINCT l_partkey AS src, l_suppkey + 1000000 AS dst
        |  FROM lineitem),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src)),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
        |c1 AS (SELECT ed.dst, sum(r.rank // ed.deg) AS s FROM ed
        |        JOIN r0 r ON r.node = ed.src GROUP BY ed.dst),
        |r1 AS (SELECT n.node, 150000 + (85 * coalesce(c.s, 0)) // 100 AS rank
        |        FROM nodes n LEFT JOIN c1 c ON c.dst = n.node),
        |c2 AS (SELECT ed.dst, sum(r.rank // ed.deg) AS s FROM ed
        |        JOIN r1 r ON r.node = ed.src GROUP BY ed.dst),
        |r2 AS (SELECT n.node, 150000 + (85 * coalesce(c.s, 0)) // 100 AS rank
        |        FROM nodes n LEFT JOIN c2 c ON c.dst = n.node),
        |c3 AS (SELECT ed.dst, sum(r.rank // ed.deg) AS s FROM ed
        |        JOIN r2 r ON r.node = ed.src GROUP BY ed.dst),
        |r3 AS (SELECT n.node, 150000 + (85 * coalesce(c.s, 0)) // 100 AS rank
        |        FROM nodes n LEFT JOIN c3 c ON c.dst = n.node),
        |c4 AS (SELECT ed.dst, sum(r.rank // ed.deg) AS s FROM ed
        |        JOIN r3 r ON r.node = ed.src GROUP BY ed.dst),
        |r4 AS (SELECT n.node, 150000 + (85 * coalesce(c.s, 0)) // 100 AS rank
        |        FROM nodes n LEFT JOIN c4 c ON c.dst = n.node),
        |c5 AS (SELECT ed.dst, sum(r.rank // ed.deg) AS s FROM ed
        |        JOIN r4 r ON r.node = ed.src GROUP BY ed.dst),
        |r5 AS (SELECT n.node, 150000 + (85 * coalesce(c.s, 0)) // 100 AS rank
        |        FROM nodes n LEFT JOIN c5 c ON c.dst = n.node),
        |fin AS (SELECT node, rank FROM r5)
        |SELECT CAST(node AS BIGINT) AS node, CAST(rank AS BIGINT) AS rank_micro
        |FROM fin ORDER BY node""".stripMargin,

    "graph_pagerank_dangling" ->
      graft.oracle.GeneratedOracles.pagerankDanglingSql(
        rounds = 5, epsMicro = 1000L),

    "graph_kcore" ->
      graft.oracle.GeneratedOracles.kcoreSql(k = 68, rounds = 8),

    "graph_pagerank_personalized" ->
      graft.oracle.GeneratedOracles.pagerankPersonalizedSql(
        rounds = 5, epsMicro = 1000L),

    "graph_triangles" ->
      """WITH lo AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |ef AS (SELECT DISTINCT a.p AS u, b.p AS v
        |       FROM lo a JOIN lo b ON a.o = b.o AND a.p < b.p),
        |e0 AS (SELECT u, v FROM ef
        |       WHERE CAST('0x' || substr(md5('tri:' || u || ':' || v), 1, 15)
        |         AS BIGINT) % 1000000 < 250000),
        |deg AS (SELECT node, count(*) AS d FROM
        |        (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        |        GROUP BY node),
        |oe AS (SELECT
        |    CASE WHEN (da.d < db.d) OR (da.d = db.d AND u < v)
        |         THEN u ELSE v END AS src,
        |    CASE WHEN (da.d < db.d) OR (da.d = db.d AND u < v)
        |         THEN v ELSE u END AS dst,
        |    CASE WHEN (da.d < db.d) OR (da.d = db.d AND u < v)
        |         THEN db.d ELSE da.d END AS ddst
        |  FROM e0 JOIN deg da ON da.node = e0.u
        |  JOIN deg db ON db.node = e0.v),
        |w AS (SELECT e1.src, e1.dst AS a, e2.dst AS b
        |      FROM oe e1 JOIN oe e2 ON e1.src = e2.src
        |      WHERE (e1.ddst < e2.ddst)
        |         OR (e1.ddst = e2.ddst AND e1.dst < e2.dst)),
        |t AS (SELECT w.src, w.a, w.b FROM w
        |      JOIN oe e3 ON e3.src = w.a AND e3.dst = w.b)
        |SELECT node, count(*) AS n_tri, count(*) * 64 AS est_full FROM (
        |  SELECT src AS node FROM t
        |  UNION ALL SELECT a FROM t
        |  UNION ALL SELECT b FROM t)
        |GROUP BY node ORDER BY node""".stripMargin,

    "sketch_quantiles" ->
      """WITH li AS (SELECT l_returnflag AS flag, l_linestatus AS shard,
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
        |  FROM lineitem),
        |b AS (SELECT flag, shard,
        |    CASE WHEN v < 32 THEN v ELSE
        |      CAST(length(printf('%b', v)) - 1 - 5 + 1 AS BIGINT) * 32
        |        + ((v >> (length(printf('%b', v)) - 1 - 5)) & 31) END AS bucket
        |  FROM li),
        |ps AS (SELECT flag, shard, bucket, count(*) AS n FROM b
        |       GROUP BY flag, shard, bucket),
        |m AS (SELECT flag, bucket, CAST(sum(n) AS BIGINT) AS n FROM ps
        |      GROUP BY flag, bucket),
        |d AS (SELECT flag, bucket, count(*) AS n FROM b
        |      GROUP BY flag, bucket),
        |qv(q_num, q_den) AS (VALUES (1, 2), (9, 10), (99, 100)),
        |mc AS (SELECT flag, bucket, n,
        |    sum(n) OVER (PARTITION BY flag ORDER BY bucket) AS cum,
        |    sum(n) OVER (PARTITION BY flag) AS tot FROM m),
        |ml AS (SELECT *, CASE WHEN bucket < 32 THEN bucket ELSE
        |    ((32 + (bucket & 31)) << (CAST(bucket // 32 AS INT) - 1)) END AS lb
        |  FROM mc),
        |mq AS (SELECT flag, q_num, q_den, CAST(min(lb) AS BIGINT)
        |         AS est_merged
        |       FROM ml CROSS JOIN qv
        |       WHERE cum >= (tot * q_num + q_den - 1) // q_den
        |       GROUP BY flag, q_num, q_den),
        |dc AS (SELECT flag, bucket, n,
        |    sum(n) OVER (PARTITION BY flag ORDER BY bucket) AS cum,
        |    sum(n) OVER (PARTITION BY flag) AS tot FROM d),
        |dl AS (SELECT *, CASE WHEN bucket < 32 THEN bucket ELSE
        |    ((32 + (bucket & 31)) << (CAST(bucket // 32 AS INT) - 1)) END AS lb
        |  FROM dc),
        |dq AS (SELECT flag, q_num, q_den, CAST(min(lb) AS BIGINT)
        |         AS est_direct
        |       FROM dl CROSS JOIN qv
        |       WHERE cum >= (tot * q_num + q_den - 1) // q_den
        |       GROUP BY flag, q_num, q_den)
        |SELECT mq.flag, mq.q_num, mq.q_den, dq.est_direct, mq.est_merged,
        |  (mq.est_merged = dq.est_direct) AS ok
        |FROM mq JOIN dq USING (flag, q_num, q_den)
        |ORDER BY flag, q_den, q_num""".stripMargin,

    "sketch_topk_merge" ->
      """WITH toks AS (SELECT source,
        |    unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents),
        |c1 AS (SELECT source, token, count(*) AS c FROM toks
        |       GROUP BY source, token),
        |h1 AS (SELECT source, c AS v, count(*) AS nit FROM c1
        |       GROUP BY source, c),
        |g1 AS (SELECT source, v,
        |         sum(nit) OVER (PARTITION BY source ORDER BY v DESC) AS ge
        |       FROM h1),
        |t1 AS (SELECT source, coalesce(max(CASE WHEN ge >= 17 THEN v END), 0)
        |         AS t FROM g1 GROUP BY source),
        |s1 AS (SELECT c1.source, c1.token, c1.c - t1.t AS mg_cnt, t1.t AS err
        |       FROM c1 JOIN t1 USING (source) WHERE c1.c > t1.t),
        |preverr AS (SELECT CAST(coalesce(sum(t), 0) AS BIGINT) AS pe FROM
        |            (SELECT DISTINCT source, err AS t FROM s1)),
        |mc AS (SELECT token, CAST(sum(mg_cnt) AS BIGINT) AS c FROM s1
        |       GROUP BY token),
        |mh AS (SELECT c AS v, count(*) AS nit FROM mc GROUP BY c),
        |mg AS (SELECT v, sum(nit) OVER (ORDER BY v DESC) AS ge FROM mh),
        |mt AS (SELECT coalesce(max(CASE WHEN ge >= 17 THEN v END), 0) AS t
        |       FROM mg),
        |ms AS (SELECT token, c - (SELECT t FROM mt) AS mg_cnt,
        |         (SELECT pe FROM preverr) + (SELECT t FROM mt) AS mg_err
        |       FROM mc WHERE c > (SELECT t FROM mt)),
        |dc AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        |dh AS (SELECT c AS v, count(*) AS nit FROM dc GROUP BY c),
        |dg AS (SELECT v, sum(nit) OVER (ORDER BY v DESC) AS ge FROM dh),
        |dt AS (SELECT coalesce(max(CASE WHEN ge >= 17 THEN v END), 0) AS t
        |       FROM dg),
        |ds AS (SELECT token, c - (SELECT t FROM dt) AS mg_cnt,
        |         (SELECT t FROM dt) AS mg_err
        |       FROM dc WHERE c > (SELECT t FROM dt)),
        |u AS (SELECT '__merged__' AS variant, token, mg_cnt, mg_err FROM ms
        |      UNION ALL
        |      SELECT '__direct__', token, mg_cnt, mg_err FROM ds)
        |SELECT u.variant, u.token, u.mg_cnt, u.mg_err, dc.c AS exact_n,
        |  (dc.c >= u.mg_cnt AND dc.c <= u.mg_cnt + u.mg_err) AS ok
        |FROM u JOIN dc ON dc.token = u.token
        |ORDER BY u.variant, u.token""".stripMargin,

    "text_phrase_pmi" ->
      """WITH toks AS (SELECT string_split_regex(lower(text), '\s+') AS t
        |              FROM documents),
        |uni AS (SELECT unnest(t) AS w FROM toks),
        |un AS (SELECT w, count(*) AS n_w FROM uni GROUP BY w),
        |bi AS (SELECT t[j - 1] AS a, t[j] AS b
        |       FROM (SELECT t, unnest(range(2, len(t) + 1)) AS j
        |             FROM toks WHERE len(t) >= 2)),
        |bn AS (SELECT a, b, count(*) AS n_ab FROM bi GROUP BY a, b),
        |tot AS (SELECT (SELECT sum(n_w) FROM un) AS n_uni,
        |               (SELECT sum(n_ab) FROM bn) AS n_bi),
        |sc AS (SELECT bn.a, bn.b, bn.n_ab,
        |         CAST(floor(ln((CAST(bn.n_ab AS DOUBLE)
        |             * CAST(tot.n_uni AS DOUBLE) * CAST(tot.n_uni AS DOUBLE))
        |           / (CAST(tot.n_bi AS DOUBLE) * CAST(ua.n_w AS DOUBLE)
        |             * CAST(ub.n_w AS DOUBLE))) * 1000000
        |           + 0.5) AS BIGINT) AS pmi_micro
        |       FROM bn JOIN un ua ON ua.w = bn.a
        |       JOIN un ub ON ub.w = bn.b CROSS JOIN tot
        |       WHERE bn.n_ab >= 5)
        |SELECT a, b, n_ab, pmi_micro FROM sc
        |ORDER BY pmi_micro DESC, a ASC, b ASC LIMIT 30""".stripMargin,

    "sample_weighted" ->
      """WITH u AS (SELECT doc_id, n_chars,
        |    (CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT)
        |      % 1000000 + 1.0e0) / 1000001.0e0 AS u
        |  FROM documents),
        |k AS (SELECT doc_id, n_chars,
        |        CAST(floor(pow(u, 1.0e0 / n_chars) * 1000000 + 0.5)
        |          AS BIGINT) AS es_key_micro
        |      FROM u)
        |SELECT doc_id, n_chars, es_key_micro FROM k
        |ORDER BY es_key_micro DESC, doc_id ASC LIMIT 100""".stripMargin,

    "metrics_auc" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec, label AS qlab
        |           FROM embeddings WHERE vec_id < 20),
        |d AS (SELECT vec_id AS doc_id, embedding AS vec, label AS dlab
        |      FROM embeddings),
        |s AS (SELECT q.query_id,
        |        CAST(floor($dotSql * 1000000 + 0.5) AS BIGINT) AS score_micro,
        |        CASE WHEN q.qlab = d.dlab THEN 1 ELSE 0 END AS label
        |      FROM q CROSS JOIN d WHERE d.doc_id <> q.query_id),
        |a AS (SELECT query_id, score_micro, label,
        |        rank() OVER (PARTITION BY query_id ORDER BY score_micro ASC)
        |          AS rmin,
        |        count(*) OVER (PARTITION BY query_id, score_micro) AS tc
        |      FROM s),
        |g AS (SELECT query_id,
        |        CAST(sum(CASE WHEN label = 1 THEN 2 * rmin + tc - 1
        |                 ELSE 0 END) AS BIGINT) AS r2p,
        |        CAST(sum(label) AS BIGINT) AS p,
        |        CAST(count(*) - sum(label) AS BIGINT) AS n
        |      FROM a GROUP BY query_id)
        |SELECT query_id,
        |  ((r2p - p * (p + 1)) * 1000000 + p * n) // (2 * p * n) AS auc_micro,
        |  p, n
        |FROM g WHERE p > 0 AND n > 0 ORDER BY query_id""".stripMargin,

    "sample_reservoir" ->
      """WITH h AS (SELECT source, doc_id,
        |    CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT) AS h
        |  FROM documents),
        |r AS (SELECT source, doc_id, h,
        |        row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
        |          AS rn
        |      FROM h)
        |SELECT source, doc_id, h FROM r WHERE rn <= 20
        |ORDER BY source, h, doc_id""".stripMargin,

    "sample_weighted_log" ->
      """WITH u AS (SELECT doc_id, n_chars,
        |    (CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT)
        |      % 1000000 + 1.0e0) / 1000001.0e0 AS u
        |  FROM documents),
        |k AS (SELECT doc_id, n_chars,
        |        CAST(floor(ln(u) * 1000000 + 0.5) AS BIGINT) AS es_lognum
        |      FROM u),
        |sel AS (SELECT doc_id, n_chars, es_lognum FROM k
        |        ORDER BY CAST(es_lognum AS DOUBLE) / CAST(n_chars AS DOUBLE)
        |          DESC, doc_id ASC LIMIT 100)
        |SELECT doc_id, n_chars, es_lognum FROM sel
        |ORDER BY doc_id ASC""".stripMargin,

    "sample_dsir" ->
      """WITH tk AS (SELECT doc_id,
        |    unnest(string_split_regex(lower(text), '\s+')) AS w
        |  FROM documents),
        |db AS (SELECT doc_id,
        |    CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 64 AS b,
        |    count(*) AS n
        |  FROM tk WHERE len(w) > 0 GROUP BY doc_id, b),
        |rawc AS (SELECT b, CAST(sum(n) AS BIGINT) AS rc FROM db GROUP BY b),
        |tgtc AS (SELECT b, CAST(sum(n) AS BIGINT) AS tc FROM db
        |         WHERE doc_id % 7 = 0 GROUP BY b),
        |tot AS (SELECT
        |    (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM db) AS rtot,
        |    (SELECT CAST(coalesce(sum(n), 0) AS BIGINT) FROM db
        |     WHERE doc_id % 7 = 0) AS ttot),
        |lr AS (SELECT g.b,
        |    CAST(floor(ln((coalesce(tc, 0) + 1.0e0) / (ttot + 64.0e0))
        |      * 1000000 + 0.5) AS BIGINT)
        |  - CAST(floor(ln((coalesce(rc, 0) + 1.0e0) / (rtot + 64.0e0))
        |      * 1000000 + 0.5) AS BIGINT) AS lrm
        |  FROM (SELECT unnest(range(0, 64)) AS b) g
        |  LEFT JOIN tgtc USING (b) LEFT JOIN rawc USING (b) CROSS JOIN tot),
        |sc AS (SELECT doc_id, CAST(sum(n * lrm) AS BIGINT) AS logw_micro
        |  FROM db JOIN lr USING (b) GROUP BY doc_id),
        |ky AS (SELECT doc_id, logw_micro,
        |    logw_micro + CAST(floor(-ln(-ln(
        |      (CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT)
        |        % 1000000 + 1.0e0) / 1000001.0e0))
        |      * 1000000 + 0.5) AS BIGINT) AS key_micro
        |  FROM sc)
        |SELECT doc_id, logw_micro, key_micro FROM ky
        |ORDER BY key_micro DESC, doc_id ASC LIMIT 200""".stripMargin,

    "events_interval_merge" ->
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS lo,
        |    epoch_us(ts) + 1800000000 AS hi FROM events),
        |f AS (SELECT user_id, lo, hi,
        |        CASE WHEN max(hi) OVER w IS NULL OR lo > max(hi) OVER w
        |          THEN 1 ELSE 0 END AS newf
        |      FROM iv WINDOW w AS (PARTITION BY user_id ORDER BY lo, hi
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |s AS (SELECT user_id, lo, hi,
        |        sum(newf) OVER (PARTITION BY user_id ORDER BY lo, hi
        |          ROWS UNBOUNDED PRECEDING) AS island
        |      FROM f)
        |SELECT user_id, CAST(island AS BIGINT) AS island,
        |  min(lo) AS lo, max(hi) AS hi, count(*) AS n
        |FROM s GROUP BY user_id, island
        |ORDER BY user_id, island""".stripMargin,

    "fuzzy_token_pairs" ->
      """WITH strs AS (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |  UNION SELECT source FROM documents),
        |t AS (SELECT DISTINCT tok FROM strs
        |      WHERE tok IS NOT NULL AND length(tok) BETWEEN 1 AND 40),
        |v0 AS (SELECT tok, tok AS var FROM t
        |       UNION
        |       SELECT tok, substr(tok, 1, i.i - 1) || substr(tok, i.i + 1)
        |         AS var
        |       FROM t JOIN (SELECT unnest(range(1, 41)) AS i) i
        |         ON i.i <= length(tok)),
        |cold AS (SELECT var FROM v0 GROUP BY var HAVING count(*) <= 1000),
        |v AS (SELECT v0.tok, v0.var FROM v0 JOIN cold USING (var)),
        |cand AS (SELECT DISTINCT a.tok AS t1, b.tok AS t2
        |         FROM v a JOIN v b ON a.var = b.var AND a.tok < b.tok)
        |SELECT t1, t2 FROM cand WHERE levenshtein(t1, t2) = 1
        |ORDER BY t1, t2""".stripMargin,

    "sketch_hll_registers" ->
      """WITH toks AS (SELECT source,
        |    unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents),
        |h AS (SELECT source,
        |        CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) AS h
        |      FROM toks),
        |r AS (SELECT source, h % 64 AS bucket,
        |        CASE WHEN h // 64 = 0 THEN 27
        |          ELSE bit_count(((h // 64) & -(h // 64)) - 1) + 1 END AS rk
        |      FROM h)
        |SELECT source, bucket, CAST(max(rk) AS BIGINT) AS register
        |FROM r GROUP BY source, bucket ORDER BY source, bucket""".stripMargin,

    "sketch_hll_merge" ->
      """WITH toks AS (SELECT source,
        |    unnest(string_split_regex(lower(text), '\s+')) AS token
        |  FROM documents),
        |h AS (SELECT source,
        |        CAST('0x' || substr(md5(token), 1, 8) AS BIGINT) AS h
        |      FROM toks),
        |r AS (SELECT source, h % 64 AS bucket,
        |        CASE WHEN h // 64 = 0 THEN 27
        |          ELSE bit_count(((h // 64) & -(h // 64)) - 1) + 1 END AS rk
        |      FROM h),
        |reg AS (SELECT source, bucket, max(rk) AS register
        |        FROM r GROUP BY source, bucket),
        |ez AS (SELECT source,
        |         sum(pow(2.0e0, -register)) + (64 - count(*)) * 1.0e0 AS z,
        |         64 - count(*) AS v
        |       FROM reg GROUP BY source),
        |est AS (SELECT source, CAST(floor(
        |          CASE WHEN 0.709e0 * 64 * 64 / z <= 160.0e0 AND v > 0
        |            THEN 64.0e0 * ln(64.0e0 / v)
        |            ELSE 0.709e0 * 64 * 64 / z END * 1000000 + 0.5)
        |          AS BIGINT) AS est_micro
        |        FROM ez),
        |mreg AS (SELECT bucket, max(register) AS register
        |         FROM reg GROUP BY bucket),
        |mz AS (SELECT sum(pow(2.0e0, -register)) + (64 - count(*)) * 1.0e0 AS z,
        |         64 - count(*) AS v FROM mreg),
        |mest AS (SELECT '__merged__' AS source, CAST(floor(
        |           CASE WHEN 0.709e0 * 64 * 64 / z <= 160.0e0 AND v > 0
        |             THEN 64.0e0 * ln(64.0e0 / v)
        |             ELSE 0.709e0 * 64 * 64 / z END * 1000000 + 0.5)
        |           AS BIGINT) AS est_micro
        |         FROM mz),
        |dreg AS (SELECT bucket, max(rk) AS register FROM r GROUP BY bucket),
        |dz AS (SELECT sum(pow(2.0e0, -register)) + (64 - count(*)) * 1.0e0 AS z,
        |         64 - count(*) AS v FROM dreg),
        |dest AS (SELECT '__direct__' AS source, CAST(floor(
        |           CASE WHEN 0.709e0 * 64 * 64 / z <= 160.0e0 AND v > 0
        |             THEN 64.0e0 * ln(64.0e0 / v)
        |             ELSE 0.709e0 * 64 * 64 / z END * 1000000 + 0.5)
        |           AS BIGINT) AS est_micro
        |         FROM dz)
        |SELECT * FROM est UNION ALL SELECT * FROM mest
        |UNION ALL SELECT * FROM dest ORDER BY source""".stripMargin,

    "sketch_cms_topk" ->
      """WITH toks AS (SELECT unnest(string_split_regex(lower(text), '\s+'))
        |    AS token FROM documents),
        |cnt AS (SELECT rw.r AS row,
        |          CAST('0x' || substr(md5(rw.r || ':' || token), 1, 8)
        |            AS BIGINT) % 256 AS col,
        |          count(*) AS n
        |        FROM toks JOIN (SELECT unnest(range(0, 4)) AS r) rw ON TRUE
        |        GROUP BY 1, 2),
        |top AS (SELECT token, count(*) AS exact_n FROM toks GROUP BY token
        |        ORDER BY exact_n DESC, token ASC LIMIT 20),
        |probe AS (SELECT t.token, t.exact_n, rw.r AS row,
        |            CAST('0x' || substr(md5(rw.r || ':' || t.token), 1, 8)
        |              AS BIGINT) % 256 AS col
        |          FROM top t JOIN (SELECT unnest(range(0, 4)) AS r) rw ON TRUE)
        |SELECT p.token, p.exact_n, min(coalesce(c.n, 0)) AS cms_n
        |FROM probe p LEFT JOIN cnt c ON p.row = c.row AND p.col = c.col
        |GROUP BY p.token, p.exact_n ORDER BY p.token""".stripMargin,

    "v1_hash_embed" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |           FROM documents WHERE doc_id < 100),
        |b AS (SELECT doc_id, CAST('0x' || substr(md5(unnest(toks)), 1, 8) AS BIGINT) % 16 AS bucket FROM t),
        |c AS (SELECT doc_id, bucket, count(*) AS n FROM b GROUP BY doc_id, bucket),
        |mp AS (SELECT doc_id, map_from_entries(list(struct_pack(k := bucket, v := n))) AS m
        |       FROM c GROUP BY doc_id),
        |dense AS (SELECT doc_id,
        |            list_transform(range(0, 16),
        |              i -> CAST(coalesce(map_extract(m, i)[1], 0) AS DOUBLE)) AS raw
        |          FROM mp)
        |SELECT doc_id,
        |  array_to_string(list_transform(raw, x -> CAST(floor(CAST(CAST(
        |    x / sqrt(list_sum(list_transform(raw, v -> v * v))) AS REAL) AS DOUBLE) * 1000000 + 0.5) AS BIGINT)), ',') AS vec
        |FROM dense ORDER BY doc_id""".stripMargin,

    "sq8_roundtrip" ->
      """WITH pe AS (SELECT vec_id AS doc_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |             generate_subscripts(embedding, 1) - 1 AS pos
        |           FROM embeddings),
        |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM pe GROUP BY pos),
        |c AS (SELECT doc_id, pos, x, mn, mx,
        |        CAST(CASE WHEN mx = mn THEN 0.0
        |             ELSE least(255.0, greatest(0.0, floor((x - mn) * 255.0 / (mx - mn) + 0.5))) END AS INT) AS code
        |      FROM pe JOIN st USING (pos)),
        |d AS (SELECT doc_id, pos, x, code, mn + code * (mx - mn) / 255.0 AS deq FROM c)
        |SELECT doc_id,
        |  array_to_string(list(code ORDER BY pos), ',') AS codes,
        |  CAST(floor(sqrt(list_sum(list((x - deq) * (x - deq) ORDER BY pos))) * 1000000 + 0.5) AS BIGINT) AS err
        |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "a3_centroid_avg" ->
      """WITH e AS (SELECT label, unnest(embedding) AS x,
        |             generate_subscripts(embedding, 1) - 1 AS pos
        |           FROM embeddings),
        |m AS (SELECT label, pos, avg(CAST(x AS DOUBLE)) AS m FROM e GROUP BY label, pos)
        |SELECT label, array_to_string(list(CAST(floor(m * 1000000 + 0.5) AS BIGINT) ORDER BY pos), ',') AS centroid
        |FROM m GROUP BY label ORDER BY label""".stripMargin,

    "p3_text_clean" ->
      """SELECT event_id, regexp_replace(props, '[{}"]', '', 'g') AS cleaned
        |FROM events ORDER BY event_id""".stripMargin,

    "p4_regex_tokenize" ->
      """SELECT doc_id,
        |  array_to_string(regexp_extract_all(lower(text), '[a-z0-9]+')[1:5], ',') AS first_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words
        |FROM documents ORDER BY doc_id""".stripMargin,

    "p7_digit_shuffle" ->
      """WITH t AS (SELECT doc_id, CAST(doc_id AS VARCHAR) AS ids FROM documents WHERE doc_id >= 100)
        |SELECT doc_id,
        |  array_to_string(list_transform(range(1, len(ids) + 1), i ->
        |    CAST((CAST(ids[i] AS INT) + 1 +
        |          CAST(CAST('0x' || substr(md5(ids || '|#|' || i), 1, 15) AS BIGINT) % 9 AS INT)) % 10
        |         AS VARCHAR)), '') AS shuffled_id
        |FROM t ORDER BY doc_id""".stripMargin,

    "s4_pylist_parse" ->
      """SELECT doc_id,
        |  source || ',it''s a ' || lang || ',esc''d' AS answers
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Token-subsequence containment (DPR semantics): tokenize both sides
    // with the SimpleTokenizer regex (alphanumeric runs | single
    // non-space/control chars) over lowercase text, then scan for a
    // contiguous token-window match. NFD normalization replays as
    // identity — the fixtures are pure ASCII (verified) — while the Spark
    // side applies the real thing.
    "j5_answer_contain" ->
      """WITH answers AS (
        |  SELECT doc_id AS query_idx,
        |    regexp_extract_all(lower(array_to_string(string_split_regex(text, '\s+')[5:6], ' ')),
        |      '[\p{L}\p{N}\p{M}]+|[^\p{Z}\p{C}]') AS atoks
        |  FROM documents WHERE doc_id < 10),
        |dt AS (
        |  SELECT doc_id,
        |    regexp_extract_all(lower(text), '[\p{L}\p{N}\p{M}]+|[^\p{Z}\p{C}]') AS dtoks
        |  FROM documents)
        |SELECT DISTINCT a.query_idx, d.doc_id
        |FROM dt d JOIN answers a
        |  ON len(a.atoks) > 0 AND len(a.atoks) <= len(d.dtoks)
        | AND len(list_filter(range(1, len(d.dtoks) - len(a.atoks) + 2),
        |       p -> list_slice(d.dtoks, p, p + len(a.atoks) - 1) = a.atoks)) > 0
        |ORDER BY query_idx, doc_id""".stripMargin,

    "a9_inverse_index" ->
      """WITH answers AS (
        |  SELECT doc_id AS query_idx,
        |    regexp_extract_all(lower(array_to_string(string_split_regex(text, '\s+')[5:6], ' ')),
        |      '[\p{L}\p{N}\p{M}]+|[^\p{Z}\p{C}]') AS atoks
        |  FROM documents WHERE doc_id < 10),
        |dt AS (
        |  SELECT doc_id,
        |    regexp_extract_all(lower(text), '[\p{L}\p{N}\p{M}]+|[^\p{Z}\p{C}]') AS dtoks
        |  FROM documents),
        |matches AS (
        |  SELECT DISTINCT a.query_idx, d.doc_id
        |  FROM dt d JOIN answers a
        |    ON len(a.atoks) > 0 AND len(a.atoks) <= len(d.dtoks)
        |   AND len(list_filter(range(1, len(d.dtoks) - len(a.atoks) + 2),
        |         p -> list_slice(d.dtoks, p, p + len(a.atoks) - 1) = a.atoks)) > 0)
        |SELECT doc_id, array_to_string(list_sort(list(DISTINCT query_idx)), ',') AS query_idx,
        |  count(DISTINCT query_idx) AS n_queries
        |FROM matches GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "p6_doc_windows" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |n AS (SELECT doc_id, toks,
        |        CAST(least(greatest(ceil(len(toks) / 16.0), 1), 3) AS INT) AS nw FROM t),
        |w AS (SELECT doc_id, toks, unnest(range(0, nw)) AS window_idx FROM n),
        |st AS (SELECT doc_id, toks, CAST(window_idx AS INT) AS window_idx,
        |         CAST(CAST('0x' || substr(md5(doc_id || '|' || window_idx), 1, 15) AS BIGINT)
        |           % (greatest(len(toks) - 16, 0) + 1) AS INT) AS start
        |       FROM w)
        |SELECT doc_id, window_idx,
        |  array_to_string(toks[start + 1 : start + 16], ' ') AS window_text
        |FROM st ORDER BY doc_id, window_idx""".stripMargin,

    "p10_subsample_reid" ->
      """WITH kept AS (
        |  SELECT doc_id AS old_id FROM documents
        |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 >= 10)
        |SELECT old_id,
        |  row_number() OVER (ORDER BY old_id) - 1 AS new_id
        |FROM kept ORDER BY old_id""".stripMargin,

    "p8_id_remap" ->
      """WITH kept AS (
        |  SELECT doc_id AS old_id FROM documents
        |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 >= 10),
        |mapping AS (SELECT old_id, row_number() OVER (ORDER BY old_id) - 1 AS new_id FROM kept)
        |SELECT m.new_id AS doc_id, d.n_chars
        |FROM documents d JOIN mapping m ON d.doc_id = m.old_id
        |ORDER BY doc_id""".stripMargin,

    "a7_neg_sample" ->
      """WITH pairs AS (SELECT 'q' || vec_id AS query, vec_id AS doc_id, label
        |               FROM embeddings WHERE vec_id < 20),
        |members AS (SELECT p.query, p.doc_id, e.vec_id AS cand
        |            FROM pairs p JOIN embeddings e
        |            ON e.label = p.label AND e.vec_id <> p.doc_id),
        |ranked AS (SELECT query, doc_id, cand,
        |             CAST('0x' || substr(md5(query || ':' || cand), 1, 15) AS BIGINT) AS h,
        |             row_number() OVER (PARTITION BY query, doc_id ORDER BY
        |               CAST('0x' || substr(md5(query || ':' || cand), 1, 15) AS BIGINT), cand) AS rn
        |           FROM members)
        |SELECT query, doc_id, array_to_string(list(cand ORDER BY h, cand), ',') AS neg_ids
        |FROM ranked WHERE rn <= 4 GROUP BY query, doc_id ORDER BY doc_id""".stripMargin,

    "a7_simans" ->
      """WITH q AS (SELECT 'q' || vec_id AS query, vec_id AS doc_id,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |c AS (SELECT vec_id AS cand_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv FROM embeddings),
        |sc AS (SELECT q.query, q.doc_id, c.cand_id,
        |         list_sum(list_transform(list_zip(q.qv, c.cv), p -> p[1] * p[2])) AS cand_score,
        |         list_sum(list_transform(q.qv, x -> x * x)) AS pos_score
        |       FROM c CROSS JOIN q WHERE c.cand_id <> q.doc_id),
        |r AS (SELECT query, doc_id, cand_id,
        |        (CAST('0x' || substr(md5(query || ':' || cand_id), 1, 15) AS BIGINT) % 2147483647 + 1)
        |          / (2147483647.0 + 2.0) AS u,
        |        exp(-0.5 * (cand_score - pos_score - 0.0) ^ 2) AS w
        |      FROM sc),
        |k AS (SELECT query, doc_id, cand_id,
        |        row_number() OVER (PARTITION BY query, doc_id ORDER BY ln(u) / w DESC, cand_id) AS rn
        |      FROM r)
        |SELECT query, doc_id, array_to_string(list_sort(list(cand_id)), ',') AS neg_ids
        |FROM k WHERE rn <= 5 GROUP BY query, doc_id ORDER BY doc_id""".stripMargin,

    "a7_clusfile" ->
      """WITH pairs AS (SELECT 'q' || vec_id AS query, vec_id AS doc_id, label
        |               FROM embeddings WHERE vec_id < 20),
        |tc AS (SELECT query, doc_id, label FROM pairs
        |       UNION ALL SELECT query, doc_id, (label + 1) % 10 FROM pairs),
        |m AS (SELECT DISTINCT t.query, t.doc_id, e.vec_id AS cand
        |      FROM tc t JOIN embeddings e ON e.label = t.label AND e.vec_id <> t.doc_id),
        |r AS (SELECT query, doc_id, cand,
        |        CAST('0x' || substr(md5(query || ':' || cand), 1, 15) AS BIGINT) AS h
        |      FROM m),
        |k AS (SELECT *, row_number() OVER (PARTITION BY query, doc_id ORDER BY h, cand) AS rn FROM r)
        |SELECT query, doc_id, array_to_string(list(cand ORDER BY h, cand), ',') AS neg_ids
        |FROM k WHERE rn <= 4 GROUP BY query, doc_id ORDER BY doc_id""".stripMargin,

    "a7_interhalf" ->
      """WITH pairs AS (SELECT 'q' || vec_id AS query, vec_id AS doc_id, label
        |               FROM embeddings WHERE vec_id < 20),
        |m AS (SELECT p.query, p.doc_id, e.vec_id AS cand,
        |        (e.vec_id % 3 = 0 AND e.vec_id < 60) AS in_file,
        |        CAST('0x' || substr(md5(p.query || ':' || e.vec_id), 1, 15) AS BIGINT) AS h
        |      FROM pairs p JOIN embeddings e ON e.label = p.label AND e.vec_id <> p.doc_id),
        |r AS (SELECT *, row_number() OVER (PARTITION BY query, doc_id, in_file ORDER BY h, cand) AS rn FROM m),
        |cnt AS (SELECT query, doc_id,
        |         count(*) FILTER (WHERE in_file) AS ni,
        |         count(*) FILTER (WHERE NOT in_file) AS nr
        |       FROM m GROUP BY query, doc_id),
        |sel AS (SELECT r.query, r.doc_id, r.cand FROM r JOIN cnt USING (query, doc_id)
        |        WHERE (ni > 0 AND nr > 0 AND rn <= 3)
        |           OR (ni = 0 AND rn <= 6) OR (nr = 0 AND rn <= 6))
        |SELECT query, doc_id, array_to_string(list_sort(list(cand)), ',') AS neg_ids
        |FROM sel GROUP BY query, doc_id ORDER BY doc_id""".stripMargin,

    "a7_simansinter" ->
      """WITH q AS (SELECT 'q' || vec_id AS query, vec_id AS doc_id, label,
        |             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        |           FROM embeddings WHERE vec_id < 20),
        |m AS (SELECT p.query, p.doc_id, e.vec_id AS cand,
        |        CAST('0x' || substr(md5(p.query || ':' || e.vec_id), 1, 15) AS BIGINT) AS h
        |      FROM q p JOIN embeddings e ON e.label = p.label AND e.vec_id <> p.doc_id),
        |cnt_c AS (SELECT query, doc_id, count(*) AS nc FROM m GROUP BY query, doc_id),
        |f AS (SELECT p.query, p.doc_id, e.vec_id AS cand,
        |        list_sum(list_transform(list_zip(p.qv,
        |          list_transform(e.embedding, x -> CAST(x AS DOUBLE))), z -> z[1] * z[2])) AS cand_score,
        |        list_sum(list_transform(p.qv, x -> x * x)) AS pos_score
        |      FROM q p JOIN embeddings e ON e.vec_id < 40 AND e.vec_id <> p.doc_id),
        |filt AS (SELECT f.* FROM f JOIN m ON m.query = f.query AND m.doc_id = f.doc_id AND m.cand = f.cand),
        |rr AS (SELECT query, doc_id, cand,
        |         row_number() OVER (PARTITION BY query, doc_id ORDER BY
        |           ln((CAST('0x' || substr(md5(query || ':' || cand), 1, 15) AS BIGINT) % 2147483647 + 1)
        |             / (2147483647.0 + 2.0))
        |           / exp(-0.5 * (cand_score - pos_score - 0.0) ^ 2) DESC, cand) AS rn
        |       FROM filt),
        |cnt_f AS (SELECT query, doc_id, count(*) AS nf FROM filt GROUP BY query, doc_id),
        |mid AS (SELECT query, doc_id, cand FROM (
        |          SELECT query, doc_id, cand,
        |            row_number() OVER (PARTITION BY query, doc_id ORDER BY h, cand) AS rn FROM m)
        |        WHERE rn <= 5),
        |u AS (SELECT DISTINCT query, doc_id, cand FROM (
        |        SELECT query, doc_id, cand FROM rr
        |        UNION ALL SELECT query, doc_id, cand FROM mid)),
        |u2 AS (SELECT query, doc_id, cand FROM (
        |         SELECT query, doc_id, cand,
        |           row_number() OVER (PARTITION BY query, doc_id ORDER BY
        |             CAST('0x' || substr(md5(query || ':' || cand), 1, 15) AS BIGINT), cand) AS rn FROM u)
        |       WHERE rn <= 5),
        |base AS (SELECT c.query, c.doc_id, c.nc, coalesce(cf.nf, 0) AS nf
        |         FROM cnt_c c LEFT JOIN cnt_f cf USING (query, doc_id)),
        |sel AS (
        |  SELECT b.query, b.doc_id, r.cand FROM base b JOIN rr r USING (query, doc_id)
        |    WHERE b.nf >= 5 AND r.rn <= 5
        |  UNION ALL
        |  SELECT b.query, b.doc_id, u2.cand FROM base b JOIN u2 USING (query, doc_id)
        |    WHERE b.nf < 5 AND b.nc >= 5
        |  UNION ALL
        |  SELECT b.query, b.doc_id, m.cand FROM base b JOIN m USING (query, doc_id)
        |    WHERE b.nf < 5 AND b.nc < 5)
        |SELECT query, doc_id, array_to_string(list_sort(list(cand)), ',') AS neg_ids
        |FROM sel GROUP BY query, doc_id ORDER BY doc_id""".stripMargin,

    "multimodal_meta" ->
      """SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_bytes,
        |  sha256(text) AS sha256, 'fake/' || source AS media_type
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_frames" ->
      """WITH t AS (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS len FROM documents
        |           WHERE octet_length(CAST(text AS BLOB)) > 0),
        |f AS (SELECT doc_id, len, CAST(unnest(range(0, CAST((len + 63) // 64 AS INT))) AS INT) AS frame_idx FROM t)
        |SELECT doc_id, frame_idx,
        |  least(CAST(64 AS BIGINT), CAST(len AS BIGINT) - frame_idx * 64) AS frame_len
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_headers" ->
      """SELECT doc_id, TRUE AS decoded,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS format,
        |  CAST(1 + (doc_id * 7) % 2000 AS INT) AS width,
        |  CAST(1 + (doc_id * 13) % 1500 AS INT) AS height,
        |  CAST(CASE doc_id % 3
        |    WHEN 0 THEN CASE doc_id % 4 WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 2 ELSE 4 END
        |    WHEN 1 THEN CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END
        |    ELSE 3 END AS INT) AS channels,
        |  CAST(8 AS INT) AS bit_depth
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_unknown" ->
      """SELECT doc_id, FALSE AS decoded, 'none' AS format,
        |  CAST(-1 AS INT) AS width, CAST(-1 AS INT) AS height,
        |  CAST(-1 AS INT) AS channels, CAST(-1 AS INT) AS bit_depth
        |FROM documents ORDER BY doc_id""".stripMargin,

    "multimodal_palette" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(2 + doc_id % 9 AS INT) AS width,
        |    CAST(1 + doc_id % 6 AS INT) AS height,
        |    CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 4 WHEN 2 THEN 8 ELSE 16 END AS entries
        |  FROM documents),
        |px AS (SELECT d.doc_id, d.width, d.height, c.c AS ch,
        |         CAST((((x.x * 3 + y.y * 7 + d.doc_id) % d.entries) * 41
        |               + c.c * 17 + d.doc_id * 5) % 256 AS DOUBLE) AS v
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 11)) AS x) x ON x.x < d.width
        |       JOIN (SELECT unnest(range(0, 6)) AS y) y ON y.y < d.height
        |       JOIN (SELECT unnest(range(0, 3)) AS c) c ON TRUE),
        |m AS (SELECT doc_id, width, height, ch, avg(v) AS mean
        |      FROM px GROUP BY doc_id, width, height, ch)
        |SELECT doc_id, width, height, CAST(3 AS INT) AS channels,
        |  array_to_string(list(CAST(floor(mean * 1000000 + 0.5) AS BIGINT) ORDER BY ch), ',') AS means
        |FROM m GROUP BY doc_id, width, height ORDER BY doc_id""".stripMargin,

    "multimodal_jpeg" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8 * (1 + doc_id % 3) AS INT) AS width,
        |    CAST(8 * (1 + doc_id % 2) AS INT) AS height
        |  FROM documents),
        |px AS (SELECT d.doc_id, d.width, d.height,
        |         y.y * d.width + x.x AS ord,
        |         CAST(((x.x // 8) * 29 + (y.y // 8) * 41 + d.doc_id * 13) % 256 AS DOUBLE) AS v
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 24)) AS x) x ON x.x < d.width
        |       JOIN (SELECT unnest(range(0, 16)) AS y) y ON y.y < d.height)
        |SELECT doc_id, width, height, CAST(1 AS INT) AS channels,
        |  CAST(CAST(floor(avg(v) * 1000000 + 0.5) AS BIGINT) AS VARCHAR) AS means,
        |  CAST(sum(ord * CAST(v AS BIGINT)) AS BIGINT) AS pos_moment
        |FROM px GROUP BY doc_id, width, height ORDER BY doc_id""".stripMargin,

    // restart markers change the BYTES, not the pixels: identical oracle
    "multimodal_jpeg_dri" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8 * (1 + doc_id % 3) AS INT) AS width,
        |    CAST(8 * (1 + doc_id % 2) AS INT) AS height
        |  FROM documents),
        |px AS (SELECT d.doc_id, d.width, d.height,
        |         y.y * d.width + x.x AS ord,
        |         CAST(((x.x // 8) * 29 + (y.y // 8) * 41 + d.doc_id * 13) % 256 AS DOUBLE) AS v
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 24)) AS x) x ON x.x < d.width
        |       JOIN (SELECT unnest(range(0, 16)) AS y) y ON y.y < d.height)
        |SELECT doc_id, width, height, CAST(1 AS INT) AS channels,
        |  CAST(CAST(floor(avg(v) * 1000000 + 0.5) AS BIGINT) AS VARCHAR) AS means,
        |  CAST(sum(ord * CAST(v AS BIGINT)) AS BIGINT) AS pos_moment
        |FROM px GROUP BY doc_id, width, height ORDER BY doc_id""".stripMargin,

    "multimodal_jpeg420" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(16 * (1 + doc_id % 2) AS INT) AS width,
        |    CAST(16 AS INT) AS height
        |  FROM documents),
        |mb AS (SELECT d.doc_id, d.width, d.height, m.m AS mx,
        |         16 + (m.m * 23 + d.doc_id * 7) % 224 AS r,
        |         16 + (m.m * 41 + d.doc_id * 3) % 224 AS g,
        |         16 + (m.m * 59 + d.doc_id * 13) % 224 AS b
        |       FROM d JOIN (SELECT unnest(range(0, 2)) AS m) m
        |         ON m.m * 16 < d.width),
        |t AS (SELECT doc_id, width, height, mx,
        |        floor(0.299*r + 0.587*g + 0.114*b + 0.5) AS yv,
        |        floor(-0.168736*r - 0.331264*g + 0.5*b + 128.0 + 0.5) AS cb,
        |        floor(0.5*r - 0.418688*g - 0.081312*b + 128.0 + 0.5) AS cr
        |      FROM mb),
        |rgb AS (SELECT doc_id, width, height, mx,
        |          floor(yv + 1.402*(cr - 128) + 0.5) AS r2,
        |          floor(yv - 0.344136*(cb - 128) - 0.714136*(cr - 128) + 0.5) AS g2,
        |          floor(yv + 1.772*(cb - 128) + 0.5) AS b2
        |        FROM t),
        |px AS (SELECT rgb.doc_id, rgb.width, rgb.height,
        |         y.y * rgb.width + x.x AS ord, r2, g2, b2
        |       FROM rgb
        |       JOIN (SELECT unnest(range(0, 32)) AS x) x
        |         ON x.x < rgb.width AND x.x // 16 = rgb.mx
        |       JOIN (SELECT unnest(range(0, 16)) AS y) y ON TRUE)
        |SELECT doc_id, width, height, CAST(3 AS INT) AS channels,
        |  CAST(floor(avg(r2) * 1000000 + 0.5) AS BIGINT) || ',' ||
        |  CAST(floor(avg(g2) * 1000000 + 0.5) AS BIGINT) || ',' ||
        |  CAST(floor(avg(b2) * 1000000 + 0.5) AS BIGINT) AS means,
        |  CAST(sum(ord * CAST(r2 AS BIGINT)) AS BIGINT) AS pos_moment
        |FROM px GROUP BY doc_id, width, height ORDER BY doc_id""".stripMargin,

    "multimodal_jpeg_skips" ->
      """SELECT CASE doc_id % 4 WHEN 0 THEN 'ok' WHEN 1 THEN 'not_jpeg'
        |    WHEN 2 THEN 'unsupported' ELSE 'truncated' END AS reason,
        |  count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY reason""".stripMargin,

    "multimodal_video_frames" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8 * (1 + doc_id % 3) AS INT) AS width,
        |    CAST(8 * (1 + doc_id % 2) AS INT) AS height,
        |    CAST(1 + doc_id % 3 AS INT) AS n_frames,
        |    CAST(33000 + (doc_id % 5) * 1000 AS INT) AS usec_per_frame
        |  FROM documents),
        |f AS (SELECT d.*, fr.f AS frame_idx FROM d
        |      JOIN (SELECT unnest(range(0, 3)) AS f) fr ON fr.f < d.n_frames),
        |px AS (SELECT f.doc_id, f.frame_idx, f.width, f.height,
        |         f.usec_per_frame, y.y * f.width + x.x AS ord,
        |         CAST(((x.x // 8) * 29 + (y.y // 8) * 41 + f.doc_id * 13
        |               + f.frame_idx * 57) % 256 AS DOUBLE) AS v
        |       FROM f
        |       JOIN (SELECT unnest(range(0, 24)) AS x) x ON x.x < f.width
        |       JOIN (SELECT unnest(range(0, 16)) AS y) y ON y.y < f.height)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, width, height,
        |  usec_per_frame,
        |  CAST(floor(avg(v) * 1000000 + 0.5) AS BIGINT) AS mean_micro,
        |  CAST(sum(ord * CAST(v AS BIGINT)) AS BIGINT) AS pos_moment
        |FROM px
        |GROUP BY doc_id, frame_idx, width, height, usec_per_frame
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_video_sample" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8 * (1 + doc_id % 3) AS INT) AS width,
        |    CAST(8 * (1 + doc_id % 2) AS INT) AS height,
        |    CAST(1 + doc_id % 3 AS INT) AS n_frames,
        |    CAST(33000 + (doc_id % 5) * 1000 AS INT) AS usec_per_frame
        |  FROM documents),
        |f AS (SELECT d.*, fr.f AS frame_idx FROM d
        |      JOIN (SELECT unnest(range(0, 3)) AS f) fr
        |      ON fr.f < d.n_frames AND fr.f % 2 = 0),
        |px AS (SELECT f.doc_id, f.frame_idx, f.width, f.height,
        |         f.usec_per_frame, y.y * f.width + x.x AS ord,
        |         CAST(((x.x // 8) * 29 + (y.y // 8) * 41 + f.doc_id * 13
        |               + f.frame_idx * 57) % 256 AS DOUBLE) AS v
        |       FROM f
        |       JOIN (SELECT unnest(range(0, 24)) AS x) x ON x.x < f.width
        |       JOIN (SELECT unnest(range(0, 16)) AS y) y ON y.y < f.height)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, width, height,
        |  usec_per_frame,
        |  CAST(floor(avg(v) * 1000000 + 0.5) AS BIGINT) AS mean_micro,
        |  CAST(sum(ord * CAST(v AS BIGINT)) AS BIGINT) AS pos_moment
        |FROM px
        |GROUP BY doc_id, frame_idx, width, height, usec_per_frame
        |ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_video_scenes" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8 * (1 + doc_id % 3) AS INT) AS width,
        |    CAST(8 * (1 + doc_id % 2) AS INT) AS height,
        |    CAST(1 + doc_id % 3 AS INT) AS n_frames
        |  FROM documents),
        |f AS (SELECT d.*, fr.f AS frame_idx FROM d
        |      JOIN (SELECT unnest(range(0, 3)) AS f) fr ON fr.f < d.n_frames),
        |px AS (SELECT f.doc_id, f.frame_idx,
        |         CAST(((x.x // 8) * 29 + (y.y // 8) * 41 + f.doc_id * 13
        |               + f.frame_idx * 57) % 256 AS DOUBLE) AS v
        |       FROM f
        |       JOIN (SELECT unnest(range(0, 24)) AS x) x ON x.x < f.width
        |       JOIN (SELECT unnest(range(0, 16)) AS y) y ON y.y < f.height),
        |m AS (SELECT doc_id, frame_idx,
        |        CAST(floor(avg(v) * 1000000 + 0.5) AS BIGINT) AS mean_micro
        |      FROM px GROUP BY doc_id, frame_idx),
        |sc AS (SELECT doc_id, frame_idx, mean_micro,
        |         abs(mean_micro - lag(mean_micro) OVER
        |           (PARTITION BY doc_id ORDER BY frame_idx)) AS score_micro
        |       FROM m)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, mean_micro,
        |  score_micro, coalesce(score_micro > 100000000, TRUE) AS is_cut
        |FROM sc ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_spectrogram" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INT) AS bits,
        |    CAST(40 + doc_id % 60 AS INT) AS n
        |  FROM documents),
        |w AS (SELECT d.*, f.f AS frame_idx FROM d
        |      JOIN (SELECT unnest(range(0, 7)) AS f) f ON f.f * 16 < d.n),
        |s AS (SELECT w.doc_id, w.frame_idx, j.j AS j,
        |        CASE WHEN w.bits = 8
        |          THEN ((w.frame_idx * 16 + j.j) * 17 + w.doc_id * 13) % 241 - 120
        |          ELSE ((w.frame_idx * 16 + j.j) * 131 + w.doc_id * 11) % 16001 - 8000
        |        END AS v
        |      FROM w JOIN (SELECT unnest(range(0, 32)) AS j) j
        |        ON w.frame_idx * 16 + j.j < w.n),
        |b AS (SELECT s.doc_id, s.frame_idx, k.k AS k,
        |        sqrt(pow(sum(s.v * cos(2 * pi() * k.k * s.j / 32)), 2) +
        |             pow(sum(s.v * sin(2 * pi() * k.k * s.j / 32)), 2)) AS mag
        |      FROM s JOIN (SELECT unnest(range(0, 17)) AS k) k ON TRUE
        |      GROUP BY s.doc_id, s.frame_idx, k.k),
        |dc AS (SELECT doc_id, frame_idx, CAST(floor(mag + 0.5) AS BIGINT) AS dc_mag
        |       FROM b WHERE k = 0),
        |dom AS (SELECT doc_id, frame_idx, k, CAST(floor(mag + 0.5) AS BIGINT) AS rmag,
        |          row_number() OVER (PARTITION BY doc_id, frame_idx
        |            ORDER BY CAST(floor(mag + 0.5) AS BIGINT) DESC, k ASC) AS rn
        |        FROM b WHERE k >= 1)
        |SELECT dc.doc_id, CAST(dc.frame_idx AS INT) AS frame_idx,
        |  CAST(32 AS INT) AS n_fft, dc.dc_mag,
        |  CAST(dom.k AS INT) AS dom_bin, dom.rmag AS dom_mag
        |FROM dc JOIN dom ON dc.doc_id = dom.doc_id
        |  AND dc.frame_idx = dom.frame_idx AND dom.rn = 1
        |ORDER BY dc.doc_id, frame_idx""".stripMargin,

    "multimodal_video_skips" ->
      """SELECT CASE doc_id % 5 WHEN 0 THEN 'ok' WHEN 1 THEN 'not_avi'
        |    WHEN 2 THEN 'unsupported_codec' WHEN 3 THEN 'truncated'
        |    ELSE 'frame_unsupported' END AS reason,
        |  count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY reason""".stripMargin,

    "multimodal_pixel_skips" ->
      """SELECT CASE doc_id % 8 WHEN 0 THEN 'ok' WHEN 1 THEN 'ok'
        |    WHEN 2 THEN 'ok' WHEN 3 THEN 'ok' WHEN 4 THEN 'not_png'
        |    WHEN 5 THEN 'truncated' WHEN 6 THEN 'bad_crc'
        |    ELSE 'bit_depth' END AS reason,
        |  count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY reason""".stripMargin,

    "multimodal_png16" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(1 + doc_id % 8 AS INT) AS width,
        |    CAST(1 + doc_id % 5 AS INT) AS height,
        |    CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS INT) AS channels
        |  FROM documents),
        |px AS (SELECT d.doc_id, d.width, d.height, d.channels, c.c AS ch,
        |         CAST(((x.x * 131 + y.y * 241 + c.c * 89 + d.doc_id * 7) % 65536)
        |              // 256 AS DOUBLE) AS v
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 8)) AS x) x ON x.x < d.width
        |       JOIN (SELECT unnest(range(0, 5)) AS y) y ON y.y < d.height
        |       JOIN (SELECT unnest(range(0, 4)) AS c) c ON c.c < d.channels),
        |m AS (SELECT doc_id, width, height, channels, ch, avg(v) AS mean
        |      FROM px GROUP BY doc_id, width, height, channels, ch)
        |SELECT doc_id, width, height, channels,
        |  array_to_string(list(CAST(floor(mean * 1000000 + 0.5) AS BIGINT) ORDER BY ch), ',') AS means
        |FROM m GROUP BY doc_id, width, height, channels ORDER BY doc_id""".stripMargin,

    "multimodal_interlaced" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(1 + doc_id % 16 AS INT) AS width,
        |    CAST(1 + doc_id % 8 AS INT) AS height,
        |    CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS INT) AS channels
        |  FROM documents),
        |px AS (SELECT d.doc_id, d.width, d.height, d.channels, c.c AS ch,
        |         y.y * d.width + x.x AS ord,
        |         CAST((x.x * 7 + y.y * 13 + d.doc_id * 3 + c.c * 31) % 256 AS DOUBLE) AS v
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 16)) AS x) x ON x.x < d.width
        |       JOIN (SELECT unnest(range(0, 8)) AS y) y ON y.y < d.height
        |       JOIN (SELECT unnest(range(0, 4)) AS c) c ON c.c < d.channels),
        |m AS (SELECT doc_id, width, height, channels, ch, avg(v) AS mean,
        |        sum(CASE WHEN ch = 0 THEN ord * CAST(v AS BIGINT) ELSE 0 END) AS pm
        |      FROM px GROUP BY doc_id, width, height, channels, ch)
        |SELECT doc_id, width, height, channels,
        |  array_to_string(list(CAST(floor(mean * 1000000 + 0.5) AS BIGINT) ORDER BY ch), ',') AS means,
        |  CAST(sum(pm) AS BIGINT) AS pos_moment
        |FROM m GROUP BY doc_id, width, height, channels ORDER BY doc_id""".stripMargin,

    "multimodal_gif_skips" ->
      """SELECT CASE doc_id % 6 WHEN 0 THEN 'ok' WHEN 1 THEN 'ok'
        |    WHEN 2 THEN 'ok' WHEN 3 THEN 'not_gif'
        |    WHEN 4 THEN 'truncated' ELSE 'bad_lzw' END AS reason,
        |  count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY reason""".stripMargin,

    "multimodal_gif_lct" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(3 + doc_id % 6 AS INT) AS width,
        |    CAST(2 + doc_id % 5 AS INT) AS height,
        |    CAST(1 + doc_id % 3 AS INT) AS n_frames
        |  FROM documents),
        |px AS (SELECT d.doc_id, d.width, d.height, f.f AS frame_idx, y.y AS y,
        |         (x.x * 3 + y.y * 5 + f.f * 7 + d.doc_id) %
        |           (CASE WHEN (d.doc_id + f.f) % 2 = 0 THEN 8 ELSE 4 END) AS idx,
        |         CASE WHEN (d.doc_id + f.f) % 2 = 0 THEN 1 ELSE 0 END AS lct
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 3)) AS f) f ON f.f < d.n_frames
        |       JOIN (SELECT unnest(range(0, 9)) AS x) x ON x.x < d.width
        |       JOIN (SELECT unnest(range(0, 7)) AS y) y ON y.y < d.height),
        |v AS (SELECT doc_id, width, height, frame_idx, y,
        |        CASE WHEN lct = 1 THEN (idx*47 + doc_id*3 + frame_idx*11) % 256
        |             ELSE (idx*53 + doc_id*7) % 256 END AS r,
        |        CASE WHEN lct = 1 THEN (idx*47 + 19 + doc_id*3 + frame_idx*11) % 256
        |             ELSE (idx*53 + 31 + doc_id*7) % 256 END AS g,
        |        CASE WHEN lct = 1 THEN (idx*47 + 38 + doc_id*3 + frame_idx*11) % 256
        |             ELSE (idx*53 + 62 + doc_id*7) % 256 END AS b
        |      FROM px),
        |m AS (SELECT doc_id, width, height, frame_idx,
        |        avg(CAST(r AS DOUBLE)) AS mr, avg(CAST(g AS DOUBLE)) AS mg,
        |        avg(CAST(b AS DOUBLE)) AS mb,
        |        sum(y * r) AS row_moment
        |      FROM v GROUP BY doc_id, width, height, frame_idx)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, width, height,
        |  CAST(4 + frame_idx * 2 + doc_id % 5 AS INT) AS delay_cs,
        |  CAST(floor(mr * 1000000 + 0.5) AS BIGINT) || ',' ||
        |  CAST(floor(mg * 1000000 + 0.5) AS BIGINT) || ',' ||
        |  CAST(floor(mb * 1000000 + 0.5) AS BIGINT) AS means,
        |  CAST(row_moment AS BIGINT) AS row_moment
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin,

    "multimodal_phash" ->
      s"""WITH $phashCtes
        |SELECT doc_id, a0, a1, a2, a3, d0, d1, d2, d3 FROM hx
        |ORDER BY doc_id""".stripMargin,

    "multimodal_phash_pairs" ->
      s"""WITH $phashCtes,
        |cn AS (SELECT band, v AS key, d FROM dba),
        |okb AS (SELECT band, key FROM cn GROUP BY band, key
        |        HAVING count(*) <= 4096),
        |cnc AS (SELECT cn.band, cn.key, cn.d FROM cn
        |        JOIN okb USING (band, key)),
        |prs AS (SELECT DISTINCT x.d AS a, y.d AS b FROM cnc x
        |        JOIN cnc y ON x.band = y.band AND x.key = y.key
        |          AND x.d < y.d),
        |hm AS (SELECT p.a, p.b, CAST(
        |    bit_count(xor(ha.a0, hb.a0)) + bit_count(xor(ha.a1, hb.a1))
        |    + bit_count(xor(ha.a2, hb.a2)) + bit_count(xor(ha.a3, hb.a3))
        |    + bit_count(xor(ha.d0, hb.d0)) + bit_count(xor(ha.d1, hb.d1))
        |    + bit_count(xor(ha.d2, hb.d2)) + bit_count(xor(ha.d3, hb.d3))
        |    AS INT) AS hamming
        |  FROM prs p JOIN hx ha ON ha.doc_id = p.a
        |  JOIN hx hb ON hb.doc_id = p.b)
        |SELECT a, b, hamming FROM hm WHERE hamming <= 6
        |ORDER BY a, b""".stripMargin,

    // syntheticSkipImage law: doc_id%5 → ok png/jpeg/gif, plain text
    // (unsniffable), or a JPEG cut mid-DQT (container-prefixed reason)
    "multimodal_phash_skips" ->
      """SELECT CASE doc_id % 5
        |    WHEN 0 THEN 'ok:png' WHEN 1 THEN 'ok:jpeg'
        |    WHEN 2 THEN 'ok:gif' WHEN 3 THEN 'unknown_container'
        |    ELSE 'jpeg:truncated' END AS reason,
        |  count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY reason""".stripMargin,

    "multimodal_pixels" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(1 + doc_id % 16 AS INT) AS width,
        |    CAST(1 + doc_id % 8 AS INT) AS height,
        |    CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS INT) AS channels
        |  FROM documents),
        |px AS (SELECT d.doc_id, d.width, d.height, d.channels, c.c AS ch,
        |         CAST((x.x * 7 + y.y * 13 + d.doc_id * 3 + c.c * 31) % 256 AS DOUBLE) AS v
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 16)) AS x) x ON x.x < d.width
        |       JOIN (SELECT unnest(range(0, 8)) AS y) y ON y.y < d.height
        |       JOIN (SELECT unnest(range(0, 4)) AS c) c ON c.c < d.channels),
        |m AS (SELECT doc_id, width, height, channels, ch, avg(v) AS mean
        |      FROM px GROUP BY doc_id, width, height, channels, ch)
        |SELECT doc_id, width, height, channels,
        |  array_to_string(list(CAST(floor(mean * 1000000 + 0.5) AS BIGINT) ORDER BY ch), ',') AS means
        |FROM m GROUP BY doc_id, width, height, channels ORDER BY doc_id""".stripMargin,

    "multimodal_resize" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(1 + doc_id % 16 AS INT) AS width,
        |    CAST(1 + doc_id % 8 AS INT) AS height,
        |    CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS INT) AS channels
        |  FROM documents),
        |px AS (SELECT d.doc_id, d.width, d.height, d.channels, c.c AS ch,
        |         CAST(((tx.x * d.width) // 8 * 7 + (ty.y * d.height) // 8 * 13
        |               + d.doc_id * 3 + c.c * 31) % 256 AS DOUBLE) AS v
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 8)) AS x) tx ON true
        |       JOIN (SELECT unnest(range(0, 8)) AS y) ty ON true
        |       JOIN (SELECT unnest(range(0, 4)) AS c) c ON c.c < d.channels),
        |m AS (SELECT doc_id, width, height, channels, ch, avg(v) AS mean
        |      FROM px GROUP BY doc_id, width, height, channels, ch)
        |SELECT doc_id, width, height, channels,
        |  array_to_string(list(CAST(floor(mean * 1000000 + 0.5) AS BIGINT) ORDER BY ch), ',') AS means
        |FROM m GROUP BY doc_id, width, height, channels ORDER BY doc_id""".stripMargin,

    "multimodal_audio" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
        |    CAST(1 + doc_id % 2 AS INT) AS channels,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INT) AS bits,
        |    CAST(40 + doc_id % 60 AS INT) AS n_frames
        |  FROM documents),
        |s AS (SELECT d.doc_id, d.sample_rate, d.channels, d.bits, d.n_frames,
        |         c.c AS ch, i.i AS i,
        |         CASE WHEN d.bits = 8
        |           THEN (i.i * 17 + c.c * 29 + d.doc_id * 13) % 241 - 120
        |           ELSE (i.i * 131 + c.c * 37 + d.doc_id * 11) % 16001 - 8000
        |         END AS v,
        |         CASE WHEN i.i = 0 THEN NULL
        |           WHEN d.bits = 8
        |           THEN ((i.i - 1) * 17 + c.c * 29 + d.doc_id * 13) % 241 - 120
        |           ELSE ((i.i - 1) * 131 + c.c * 37 + d.doc_id * 11) % 16001 - 8000
        |         END AS prev
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 100)) AS i) i ON i.i < d.n_frames
        |       JOIN (SELECT unnest(range(0, 2)) AS c) c ON c.c < d.channels),
        |m AS (SELECT doc_id, sample_rate, channels, bits, n_frames, ch,
        |        avg(CAST(v AS DOUBLE)) AS mean, max(abs(v)) AS peak,
        |        sum(CASE WHEN prev IS NOT NULL AND (prev < 0) <> (v < 0)
        |              THEN 1 ELSE 0 END) AS zcr
        |      FROM s GROUP BY doc_id, sample_rate, channels, bits, n_frames, ch)
        |SELECT doc_id, sample_rate, channels, bits, n_frames,
        |  array_to_string(list(CAST(floor(mean * 1000000 + 0.5) AS BIGINT) ORDER BY ch), ',') AS means,
        |  array_to_string(list(peak ORDER BY ch), ',') AS peaks,
        |  array_to_string(list(zcr ORDER BY ch), ',') AS zcrs
        |FROM m GROUP BY doc_id, sample_rate, channels, bits, n_frames
        |ORDER BY doc_id""".stripMargin,

    "multimodal_fft" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 16 END AS INT) AS bits,
        |    CAST(40 + doc_id % 60 AS INT) AS n_frames
        |  FROM documents),
        |s AS (SELECT d.doc_id, i.i AS i,
        |         CASE WHEN d.bits = 8
        |           THEN (i.i * 17 + d.doc_id * 13) % 241 - 120
        |           ELSE (i.i * 131 + d.doc_id * 11) % 16001 - 8000
        |         END AS v
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 64)) AS i) i
        |         ON i.i < least(d.n_frames, 64)),
        |b AS (SELECT s.doc_id, k.k AS k,
        |         sqrt(pow(sum(s.v * cos(2 * pi() * k.k * s.i / 64)), 2) +
        |              pow(sum(s.v * sin(2 * pi() * k.k * s.i / 64)), 2)) AS mag
        |       FROM s JOIN (SELECT unnest(range(0, 33)) AS k) k ON TRUE
        |       GROUP BY s.doc_id, k.k),
        |dc AS (SELECT doc_id, CAST(floor(mag + 0.5) AS BIGINT) AS dc_mag
        |       FROM b WHERE k = 0),
        |dom AS (SELECT doc_id, k, CAST(floor(mag + 0.5) AS BIGINT) AS rmag,
        |          row_number() OVER (PARTITION BY doc_id
        |            ORDER BY CAST(floor(mag + 0.5) AS BIGINT) DESC, k ASC) AS rn
        |        FROM b WHERE k >= 1),
        |cen AS (SELECT doc_id,
        |          CAST(floor(sum(k * mag) / sum(mag) * 1000 + 0.5) AS BIGINT)
        |            AS centroid_milli
        |        FROM b WHERE k >= 1 GROUP BY doc_id)
        |SELECT dc.doc_id, CAST(64 AS INT) AS n_fft, dc.dc_mag,
        |  CAST(dom.k AS INT) AS dom_bin, dom.rmag AS dom_mag,
        |  cen.centroid_milli
        |FROM dc JOIN dom ON dc.doc_id = dom.doc_id AND dom.rn = 1
        |JOIN cen ON dc.doc_id = cen.doc_id
        |ORDER BY dc.doc_id""".stripMargin,

    "multimodal_gif_frames" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(3 + doc_id % 6 AS INT) AS width,
        |    CAST(2 + doc_id % 5 AS INT) AS height,
        |    CAST(1 + doc_id % 4 AS INT) AS n_frames
        |  FROM documents),
        |px AS (SELECT d.doc_id, d.width, d.height, f.f AS frame_idx,
        |         (x.x * 3 + y.y * 5 + f.f * 7 + d.doc_id) % 4 AS idx
        |       FROM d
        |       JOIN (SELECT unnest(range(0, 4)) AS f) f ON f.f < d.n_frames
        |       JOIN (SELECT unnest(range(0, 9)) AS x) x ON x.x < d.width
        |       JOIN (SELECT unnest(range(0, 7)) AS y) y ON y.y < d.height),
        |m AS (SELECT doc_id, width, height, frame_idx,
        |        avg(CAST((idx * 53 + doc_id * 7) % 256 AS DOUBLE)) AS mr,
        |        avg(CAST((idx * 101 + doc_id * 11) % 256 AS DOUBLE)) AS mg,
        |        avg(CAST((idx * 29 + doc_id * 13) % 256 AS DOUBLE)) AS mb
        |      FROM px GROUP BY doc_id, width, height, frame_idx)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx, width, height,
        |  CAST(5 + frame_idx * 3 + doc_id % 7 AS INT) AS delay_cs,
        |  CAST(floor(mr * 1000000 + 0.5) AS BIGINT) || ',' ||
        |  CAST(floor(mg * 1000000 + 0.5) AS BIGINT) || ',' ||
        |  CAST(floor(mb * 1000000 + 0.5) AS BIGINT) AS means
        |FROM m ORDER BY doc_id, frame_idx""".stripMargin,

    "s1_corpus_roundtrip" ->
      """SELECT doc_id, source AS title, text AS content
        |FROM documents ORDER BY doc_id""".stripMargin,

    "s10_ranked_roundtrip" ->
      s"""$knnBase
         |SELECT CAST(query_id AS VARCHAR) AS query,
         |  array_to_string(list(doc_id ORDER BY rank), ',') AS preds,
         |  array_to_string(list(CAST(floor(CAST(CAST(score AS REAL) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) ORDER BY rank), ',') AS scores
         |FROM r WHERE rank <= 10 GROUP BY query_id ORDER BY query""".stripMargin,

    "s2_pair_roundtrip" ->
      """SELECT 'what is ' || source || ' ' || doc_id AS query, doc_id
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin,

    "s6_tensor_roundtrip" ->
      """SELECT row_number() OVER (ORDER BY vec_id) - 1 AS row_id,
        |  array_to_string(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 100000 + 0.5) AS BIGINT)), ',') AS vec
        |FROM embeddings WHERE vec_id < 500 ORDER BY row_id""".stripMargin,

    "s9_tensor_parquet" ->
      """SELECT vec_id,
        |  array_to_string(list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 100000 + 0.5) AS BIGINT)), ',') AS vec
        |FROM embeddings WHERE vec_id < 500 ORDER BY vec_id""".stripMargin,

    "layout_zorder_probe" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  round(sum(l_extendedprice), 2) AS price_sum,
        |  CAST(sum(l_quantity) AS BIGINT) AS qty_sum
        |FROM lineitem
        |WHERE l_partkey BETWEEN 50 AND 250 AND l_suppkey BETWEEN 5 AND 60
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "skew_join" ->
      """SELECT l_suppkey AS suppkey, s_name, count(*) AS n,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY suppkey, s_name ORDER BY suppkey""".stripMargin,

    "p5_query_spans" ->
      """WITH q AS (SELECT substr(text, 1, 80) AS query FROM documents WHERE doc_id < 100),
        |e AS (SELECT query, unnest(range(0, 2)) AS i FROM q),
        |l AS (SELECT query, i,
        |  least(length(query),
        |    8 + CAST('0x' || substr(md5(query || '|' || i || '|len'), 1, 15) AS BIGINT) % 17) AS len
        |  FROM e),
        |st AS (SELECT query, len,
        |  CAST('0x' || substr(md5(query || '|' || i || '|start'), 1, 15) AS BIGINT)
        |    % (greatest(length(query) - len, 0) + 1) AS start FROM l),
        |sp AS (SELECT query, substr(query, CAST(start + 1 AS INT), CAST(len AS INT)) AS span FROM st)
        |SELECT query, span FROM sp WHERE length(span) > 0 ORDER BY query, span""".stripMargin,

    "a8_backfill" ->
      """WITH u AS (SELECT doc_id FROM documents WHERE doc_id < 60),
        |init AS (SELECT doc_id, 'seed:' || doc_id AS query FROM u WHERE doc_id % 2 = 0),
        |gen0 AS (SELECT doc_id,
        |  unnest(range(0, CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END)) AS i FROM u),
        |gen AS (SELECT doc_id, 'gen:0:' || doc_id || ':' || i AS query FROM gen0),
        |pool AS (SELECT doc_id, query FROM init UNION SELECT doc_id, query FROM gen)
        |SELECT doc_id, array_to_string(list_sort(list(query)), ',') AS queries,
        |  count(*) AS n_queries
        |FROM pool GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_minhash" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
         |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
         |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles FROM t),
         |h AS (SELECT doc_id, len(shingles) AS n_shingles,
         |        list_transform(shingles, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647) AS hs
         |      FROM sh)
         |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
         |  array_to_string([$minhashSigSql], ',') AS sig
         |FROM h ORDER BY doc_id""".stripMargin,

    "dedup_minhash_pairs" ->
      s"""WITH $minhashPairsCte
         |SELECT a, b, round(jaccard, 6) AS jaccard FROM jac
         |WHERE jaccard >= 0.5 ORDER BY a, b""".stripMargin,

    "dedup_components" ->
      s"""WITH RECURSIVE $minhashPairsCte,
         |pairs AS (SELECT a, b FROM jac WHERE jaccard >= 0.5),
         |e AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         |reach(v, l) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, r.l FROM e JOIN reach r ON r.v = e.dst),
         |comp AS (SELECT v AS doc_id, min(l) AS component FROM reach GROUP BY v),
         |sz AS (SELECT component, count(*) AS cluster_size FROM comp GROUP BY component)
         |SELECT c.doc_id, c.component, s.cluster_size
         |FROM comp c JOIN sz s USING (component) ORDER BY doc_id""".stripMargin,

    "dedup_canonical_quality" ->
      s"""WITH RECURSIVE $minhashPairsCte,
         |pairs AS (SELECT a, b FROM jac WHERE jaccard >= 0.5),
         |e AS (SELECT a AS src, b AS dst FROM pairs UNION SELECT b, a FROM pairs),
         |reach(v, l) AS (
         |  SELECT src, src FROM e
         |  UNION
         |  SELECT e.src, r.l FROM e JOIN reach r ON r.v = e.dst),
         |comp AS (SELECT v AS doc_id, min(l) AS component FROM reach GROUP BY v),
         |allc AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS component
         |         FROM documents d LEFT JOIN comp c USING (doc_id)),
         |qt AS (SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
         |qm AS (SELECT doc_id,
         |        CAST(len(toks) AS DOUBLE) AS nt,
         |        CAST(length(text) AS DOUBLE) AS nc,
         |        CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS np,
         |        len(list_filter(toks, x -> x IN ($stopwordListSql))) / greatest(len(toks), 1) AS swr
         |      FROM qt),
         |q AS (SELECT doc_id,
         |        CAST(floor((least(nt / 64.0, 1.0) * 0.4
         |          + greatest(1.0 - np / greatest(nc, 1.0) * 10, 0.0) * 0.3
         |          + least(swr * 10, 1.0) * 0.3) * 1000000 + 0.5) AS BIGINT) AS q_micro
         |      FROM qm),
         |sc AS (SELECT a.doc_id, a.component, q.q_micro FROM allc a JOIN q USING (doc_id)),
         |b AS (SELECT component, doc_id AS canonical_id FROM sc
         |      QUALIFY row_number() OVER (PARTITION BY component
         |        ORDER BY q_micro DESC, doc_id ASC) = 1)
         |SELECT sc.doc_id, sc.component, sc.q_micro, b.canonical_id,
         |  sc.doc_id = b.canonical_id AS kept
         |FROM sc JOIN b USING (component) ORDER BY sc.doc_id""".stripMargin,

    "dedup_spans" -> {
      val gram8 = (0 until 8).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
         |g AS (SELECT doc_id, i - 1 AS pos, $gram8 AS gram
         |      FROM t, LATERAL unnest(range(1, len(toks) - 6)) AS u(i)),
         |f AS (SELECT doc_id, pos FROM g
         |      QUALIFY count(*) OVER (PARTITION BY gram) >= 2),
         |m AS (SELECT doc_id, pos,
         |        CASE WHEN pos > coalesce(max(pos + 8) OVER (
         |               PARTITION BY doc_id ORDER BY pos
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |             THEN 1 ELSE 0 END AS is_new
         |      FROM f),
         |s AS (SELECT doc_id, pos,
         |        sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
         |      FROM m)
         |SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
         |  CAST(min(pos) AS INT) AS span_start,
         |  CAST(max(pos) + 8 AS INT) AS span_end,
         |  CAST(count(*) AS BIGINT) AS n_dup_grams,
         |  CAST(max(pos) + 8 - min(pos) AS INT) AS span_tokens
         |FROM s GROUP BY doc_id, span_id ORDER BY doc_id, span_id""".stripMargin
    },

    "dedup_span_trim" -> {
      val gram8 = (0 until 8).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
         |g AS (SELECT doc_id, i - 1 AS pos, $gram8 AS gram
         |      FROM t, LATERAL unnest(range(1, len(toks) - 6)) AS u(i)),
         |f AS (SELECT doc_id, pos FROM g
         |      QUALIFY row_number() OVER (PARTITION BY gram
         |        ORDER BY doc_id, pos) >= 2),
         |m AS (SELECT doc_id, pos,
         |        CASE WHEN pos > coalesce(max(pos + 8) OVER (
         |               PARTITION BY doc_id ORDER BY pos
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |             THEN 1 ELSE 0 END AS is_new
         |      FROM f),
         |sp AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 8 AS span_end
         |       FROM (SELECT doc_id, pos, sum(is_new) OVER (
         |               PARTITION BY doc_id ORDER BY pos) AS span_id FROM m)
         |       GROUP BY doc_id, span_id),
         |tok AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok
         |        FROM t, LATERAL unnest(range(1, len(toks) + 1)) AS u(i)),
         |kept AS (SELECT k.doc_id, k.pos, k.tok FROM tok k
         |         WHERE NOT EXISTS (SELECT 1 FROM sp s
         |           WHERE s.doc_id = k.doc_id
         |             AND k.pos >= s.span_start AND k.pos < s.span_end)),
         |agg AS (SELECT doc_id, count(*) AS n_kept,
         |          string_agg(tok, ' ' ORDER BY pos) AS text
         |        FROM kept GROUP BY doc_id)
         |SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
         |  CAST(coalesce(a.n_kept, 0) AS INT) AS n_kept,
         |  coalesce(a.text, '') AS text
         |FROM t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""".stripMargin
    },

    // suffix-LCP dedup: the neighbor-LCP definition replayed exactly —
    // sort the capped suffixes by their space-joined string (the same
    // order Spark range-partitions on), lag/lead one row, LCP = index of
    // the first element-wise token mismatch clamped by both lengths
    "dedup_suffix_lens" -> suffixLcpSql(
      """SELECT doc_id, CAST(pos AS INT) AS pos, CAST(dup_len AS INT) AS dup_len
        |FROM lcp WHERE dup_len >= 8 ORDER BY doc_id, pos""".stripMargin),

    "dedup_suffix_spans" -> suffixLcpSql(
      """flagged AS (SELECT doc_id, pos, dup_len FROM lcp WHERE dup_len >= 8),
        |m AS (SELECT doc_id, pos, dup_len,
        |        CASE WHEN pos > coalesce(max(pos + dup_len) OVER (
        |               PARTITION BY doc_id ORDER BY pos
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
        |             THEN 1 ELSE 0 END AS is_new
        |      FROM flagged),
        |sp AS (SELECT doc_id, pos, dup_len,
        |        sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
        |      FROM m)
        |SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
        |  CAST(min(pos) AS INT) AS span_start,
        |  CAST(max(pos + dup_len) AS INT) AS span_end,
        |  CAST(max(dup_len) AS INT) AS max_dup_len,
        |  CAST(max(pos + dup_len) - min(pos) AS INT) AS span_tokens
        |FROM sp GROUP BY doc_id, span_id ORDER BY doc_id, span_id""".stripMargin,
      withFlagged = true),

    // suffix-trim: first-occurrence canonical per duplicated CONTENT
    // (the flagged position's first dup_len tokens), non-canonical
    // occurrences merged into variable-length spans and cut from the
    // token stream — the engine's min-struct agg replayed as a
    // row_number() = 1 pick plus a NOT-the-canonical join. The CTE
    // body is the shared suffixTrimCtes generator, which the curation
    // chain replays over its fuzzy survivors (prefix x).
    "dedup_suffix_trim" -> suffixLcpSql(
      suffixTrimCtes("", 8, n => s"$n AS") + "\n" +
      """SELECT t.doc_id, CAST(len(t.toks) AS INT) AS n_tokens,
        |  CAST(coalesce(a.n_kept, 0) AS INT) AS n_kept,
        |  coalesce(a.text, '') AS text
        |FROM t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id""".stripMargin,
      withFlagged = true),

    "dedup_paragraphs" ->
      """WITH w AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
        |  FROM documents WHERE trim(text) <> ''),
        |b AS (SELECT doc_id, CAST(u.i // 8 AS BIGINT) AS block_idx,
        |    array_to_string(t[u.i+1 : u.i+8], ' ') AS block
        |  FROM w, LATERAL unnest(range(0, len(t), 8)) AS u(i)),
        |h AS (SELECT doc_id, block_idx, block,
        |    CAST('0x' || substr(md5(block), 1, 15) AS BIGINT) AS bh FROM b),
        |f AS (SELECT doc_id, block_idx, block FROM h
        |      QUALIFY row_number() OVER (PARTITION BY bh
        |        ORDER BY doc_id, block_idx) = 1),
        |k AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(block, ' ' ORDER BY block_idx) AS text
        |  FROM f GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks
        |  FROM b GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(k.text, '') AS text,
        |  coalesce(tot.n_blocks, CAST(0 AS BIGINT)) AS n_blocks,
        |  coalesce(k.n_kept, CAST(0 AS BIGINT)) AS n_kept
        |FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN k USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "dedup_paragraphs_nl" ->
      """WITH nl AS (SELECT doc_id,
        |    text || chr(10) || chr(10) ||
        |    'all rights reserved contact the operator for details' ||
        |    chr(10) || chr(10) || upper(text) AS t FROM documents),
        |p AS (SELECT doc_id, string_split(t, chr(10) || chr(10)) AS parts FROM nl),
        |b AS (SELECT doc_id, CAST(u.i AS BIGINT) AS block_idx,
        |    trim(parts[u.i + 1]) AS block
        |  FROM p, LATERAL unnest(range(0, len(parts))) AS u(i)
        |  WHERE trim(parts[u.i + 1]) <> ''),
        |h AS (SELECT doc_id, block_idx, block,
        |    CAST('0x' || substr(md5(block), 1, 15) AS BIGINT) AS bh FROM b),
        |f AS (SELECT doc_id, block_idx, block FROM h
        |      QUALIFY row_number() OVER (PARTITION BY bh
        |        ORDER BY doc_id, block_idx) = 1),
        |k AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |    string_agg(block, chr(10) || chr(10) ORDER BY block_idx) AS text
        |  FROM f GROUP BY doc_id),
        |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks
        |  FROM b GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(k.text, '') AS text,
        |  coalesce(tot.n_blocks, CAST(0 AS BIGINT)) AS n_blocks,
        |  coalesce(k.n_kept, CAST(0 AS BIGINT)) AS n_kept
        |FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN k USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    "dedup_jaccard_topk" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents WHERE doc_id < 200),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
        |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles FROM t)
        |SELECT sa.doc_id AS a, sb.doc_id AS b,
        |  round(len(list_intersect(sa.shingles, sb.shingles))
        |    / len(list_distinct(list_concat(sa.shingles, sb.shingles))), 6) AS jaccard
        |FROM sh sa JOIN sh sb ON sa.doc_id < sb.doc_id
        |ORDER BY len(list_intersect(sa.shingles, sb.shingles))
        |  / len(list_distinct(list_concat(sa.shingles, sb.shingles))) DESC, a, b
        |LIMIT 20""".stripMargin,

    "dedup_jaccard_topk_banded" ->
      s"""WITH $minhashPairsCte
         |SELECT a, b, round(jaccard, 6) AS jaccard FROM jac
         |ORDER BY jaccard DESC, a, b LIMIT 20""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $simhashCte
         |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin,

    // brute-force all-pairs confirm — intentionally NOT banded, so a
    // hash-match proves the Spark side's pigeonhole banding is lossless
    "dedup_simhash_pairs" ->
      s"""WITH $simhashCte
         |SELECT x.doc_id AS a, y.doc_id AS b,
         |  CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |FROM sh x JOIN sh y ON x.doc_id < y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |ORDER BY a, b""".stripMargin,

    "contamination_screen" ->
      """WITH c AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |cg AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g FROM c),
        |ch AS (SELECT doc_id, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h FROM cg),
        |b0 AS (SELECT doc_id AS bench_id, substr(text, 21, 80) AS text FROM documents WHERE doc_id < 10),
        |bt AS (SELECT bench_id, string_split_regex(lower(text), '\s+') AS toks FROM b0),
        |bg AS (SELECT bench_id, unnest(list_distinct(list_transform(range(1, len(toks) - 3),
        |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] || ' ' || toks[i+4]))) AS g FROM bt),
        |bh AS (SELECT bench_id, CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h FROM bg)
        |SELECT ch.doc_id, bh.bench_id, count(*) AS n_shared
        |FROM ch JOIN bh USING (h)
        |GROUP BY ch.doc_id, bh.bench_id HAVING count(*) >= 3
        |ORDER BY doc_id, bench_id""".stripMargin,

    "dedup_embedding" ->
      """SELECT x.vec_id AS a, y.vec_id AS b,
        |  round(list_sum(list_transform(list_zip(x.embedding, y.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))), 6) AS cosine
        |FROM embeddings x JOIN embeddings y ON x.label = y.label AND x.vec_id < y.vec_id
        |WHERE list_sum(list_transform(list_zip(x.embedding, y.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
        |       * sqrt(list_sum(list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) >= 0.35
        |ORDER BY a, b""".stripMargin,

    "text_langid" ->
      s"""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM documents)
         |SELECT doc_id,
         |  round(len(list_filter(toks, x -> x IN ($stopwordListSql))) / greatest(len(toks), 1), 6) AS stopword_ratio,
         |  CASE WHEN len(list_filter(toks, x -> x IN ($stopwordListSql))) / greatest(len(toks), 1) >= 0.03
         |       THEN 'en' ELSE 'unknown' END AS pred_lang
         |FROM t ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
         |m AS (SELECT doc_id,
         |        CAST(len(toks) AS DOUBLE) AS nt,
         |        CAST(length(text) AS DOUBLE) AS nc,
         |        CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS np,
         |        len(list_filter(toks, x -> x IN ($stopwordListSql))) / greatest(len(toks), 1) AS swr
         |      FROM t)
         |SELECT doc_id, CAST(nt AS BIGINT) AS n_tokens, CAST(nc AS BIGINT) AS n_chars,
         |  round((nc - (nt - 1)) / greatest(nt, 1.0), 6) AS avg_token_len,
         |  round(np / greatest(nc, 1.0), 6) AS punct_ratio,
         |  round(swr, 6) AS stopword_ratio,
         |  round(least(nt / 64.0, 1.0) * 0.4
         |    + greatest(1.0 - np / greatest(nc, 1.0) * 10, 0.0) * 0.3
         |    + least(swr * 10, 1.0) * 0.3, 6) AS quality_score
         |FROM m ORDER BY doc_id""".stripMargin,

    "text_gopher_rules" ->
      """WITH w AS (SELECT doc_id, text,
        |    list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0) AS words,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    CAST(len(words) AS BIGINT) AS n_words,
        |    CAST(coalesce(list_sum(list_transform(words, x -> length(x))), 0) AS BIGINT) AS sum_word_len,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
        |      + CAST(length(text) - length(replace(text, '…', '')) AS BIGINT)
        |      + CAST(len(string_split(text, '...')) - 1 AS BIGINT) AS n_symbols,
        |    CAST(len(lines) AS BIGINT) AS n_lines,
        |    CAST(len(list_filter(lines, x -> regexp_matches(x, '^\s*[-*•]'))) AS BIGINT) AS n_bullet_lines,
        |    CAST(len(list_filter(lines, x -> regexp_matches(x, '(\.\.\.|…)\s*$'))) AS BIGINT) AS n_ellipsis_lines,
        |    CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS n_alpha_words,
        |    CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |      sw -> list_contains(list_transform(words, x -> lower(x)), sw))) AS BIGINT) AS n_stop_present
        |  FROM w)
        |SELECT doc_id, n_words, sum_word_len, n_symbols, n_lines,
        |  n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_present,
        |  n_words >= 50 AND n_words <= 100000 AS pass_words,
        |  3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words AS pass_mwl,
        |  10 * n_symbols <= n_words AS pass_symbol,
        |  10 * n_bullet_lines <= 9 * n_lines AS pass_bullet,
        |  10 * n_ellipsis_lines <= 3 * n_lines AS pass_ellipsis,
        |  5 * n_alpha_words >= 4 * n_words AS pass_alpha,
        |  n_stop_present >= 2 AS pass_stop,
        |  (n_words >= 50 AND n_words <= 100000)
        |    AND (3 * n_words <= sum_word_len AND sum_word_len <= 10 * n_words)
        |    AND 10 * n_symbols <= n_words
        |    AND 10 * n_bullet_lines <= 9 * n_lines
        |    AND 10 * n_ellipsis_lines <= 3 * n_lines
        |    AND 5 * n_alpha_words >= 4 * n_words
        |    AND n_stop_present >= 2 AS pass_all
        |FROM c ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """WITH t AS (SELECT doc_id, list_transform(string_split_regex(lower(text), '\s+'),
        |  tok -> CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)) AS hs FROM documents)
        |SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), hs),
        |  (acc, h) -> (acc * 1000003 + h) % 2147483647) AS fingerprint
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_vocab_topk" ->
      """WITH t AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS token FROM documents)
        |SELECT token, count(*) AS freq FROM t WHERE length(token) > 0
        |GROUP BY token ORDER BY freq DESC, token LIMIT 50""".stripMargin,

    "text_bm25" ->
      """WITH q AS (SELECT * FROM (VALUES (0, 'spark fast query join'),
        |  (1, 'stream window batch agg')) AS v(query_id, qtext)),
        |qt AS (SELECT query_id, term FROM (
        |    SELECT query_id, unnest(list_distinct(string_split_regex(lower(qtext), '\s+'))) AS term FROM q)
        |  WHERE length(term) > 0),
        |toks AS (SELECT doc_id, term FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term FROM documents)
        |  WHERE length(term) > 0),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl FROM tf GROUP BY doc_id),
        |stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl),
        |dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
        |contrib AS (SELECT qt.query_id, tf.doc_id, tf.term,
        |    ln(1.0E0 + (s.n_docs - d.df + 0.5E0) / (d.df + 0.5E0)) *
        |      (CAST(tf.tf AS DOUBLE) * (1.2E0 + 1.0E0)) /
        |      (CAST(tf.tf AS DOUBLE) + 1.2E0 * (1.0E0 - 0.75E0 + 0.75E0 * dl.dl / s.avgdl)) AS c
        |  FROM tf JOIN qt USING (term) JOIN dfreq d USING (term)
        |  JOIN dl USING (doc_id) CROSS JOIN stats s),
        |sc AS (SELECT query_id, doc_id, list_sum(list(c ORDER BY term)) AS score FROM contrib GROUP BY query_id, doc_id),
        |r AS (SELECT query_id, doc_id, score,
        |        row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
        |      FROM sc)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank, doc_id,
        |  CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_micro
        |FROM r WHERE rank <= 20 ORDER BY query_id, rank""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT) % 1000000 <
        |  CASE lang WHEN 'en' THEN 500000 WHEN 'zh' THEN 250000
        |            WHEN 'es' THEN 100000 ELSE -1 END
        |ORDER BY doc_id""".stripMargin,

    "sample_domain_cap" ->
      """WITH r AS (SELECT doc_id, source, row_number() OVER (
        |    PARTITION BY source
        |    ORDER BY CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT) % 1000000 ASC,
        |             doc_id ASC) AS rn
        |  FROM documents)
        |SELECT doc_id, source FROM r WHERE rn <= 30 ORDER BY doc_id""".stripMargin,

    "sample_temperature_mix" ->
      """WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_docs,
        |    CAST(floor(power(CAST(n_docs AS DOUBLE), 0.3e0) * 1000000 + 0.5) AS BIGINT) AS wm
        |  FROM cnt),
        |tt AS (SELECT SUM(wm) AS tot FROM w),
        |q AS (SELECT lang, n_docs, CAST(CAST(100 AS HUGEINT) * wm // tot AS BIGINT) AS quota
        |     FROM w CROSS JOIN tt),
        |r AS (SELECT d.doc_id, d.lang, q.n_docs, q.quota,
        |      row_number() OVER (PARTITION BY d.lang
        |        ORDER BY CAST('0x' || substr(md5('42:' || d.doc_id), 1, 15) AS BIGINT) % 1000000 ASC,
        |                 d.doc_id ASC) AS rn
        |     FROM documents d JOIN q USING (lang))
        |SELECT doc_id, lang, n_docs, quota FROM r WHERE rn <= quota
        |ORDER BY doc_id""".stripMargin,

    "sample_unimax_epochs" ->
      """WITH cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(count(*) * 3 AS BIGINT) AS cap FROM documents GROUP BY lang),
        |lv AS (SELECT lang, n_docs, cap,
        |    CAST(row_number() OVER (ORDER BY cap ASC, lang ASC) AS BIGINT) AS i,
        |    SUM(cap) OVER (ORDER BY cap ASC, lang ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS P,
        |    CAST(count(*) OVER () AS BIGINT) AS k
        |  FROM cnt),
        |sat AS (SELECT *, (P - cap + (k - i + 1) * cap) <= 900 AS s FROM lv),
        |st AS (SELECT coalesce(max(CASE WHEN s THEN i END), 0) AS istar,
        |    coalesce(max(CASE WHEN s THEN P END), 0) AS pstar,
        |    max(k) AS k FROM sat),
        |q AS (SELECT l.lang, l.n_docs,
        |    CAST(CASE WHEN st.istar = st.k THEN l.cap
        |         ELSE least(l.cap, (900 - st.pstar) // (st.k - st.istar))
        |         END AS BIGINT) AS quota
        |  FROM sat l CROSS JOIN st),
        |r AS (SELECT d.doc_id, d.lang, q.quota,
        |    q.quota // q.n_docs AS fullep, q.quota % q.n_docs AS part,
        |    row_number() OVER (PARTITION BY d.lang
        |      ORDER BY CAST('0x' || substr(md5('42:' || d.doc_id), 1, 15) AS BIGINT) % 1000000 ASC,
        |               d.doc_id ASC) AS rn
        |  FROM documents d JOIN q USING (lang)),
        |fullr AS (SELECT doc_id, lang, CAST(u.e AS BIGINT) AS epoch, quota
        |  FROM r, LATERAL unnest(range(0, fullep)) AS u(e)),
        |partr AS (SELECT doc_id, lang, CAST(fullep AS BIGINT) AS epoch, quota
        |  FROM r WHERE rn <= part)
        |SELECT doc_id, lang, epoch, quota FROM fullr
        |UNION ALL SELECT doc_id, lang, epoch, quota FROM partr
        |ORDER BY doc_id, epoch""".stripMargin,

    "sample_token_budget" ->
      """WITH tok AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT) % 1000000 ASC,
        |               doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM tok)
        |SELECT doc_id, source, n_tokens FROM c WHERE cum <= 800
        |ORDER BY doc_id""".stripMargin,

    "sample_token_budget_per_source" ->
      """WITH tok AS (SELECT doc_id, source,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |bud AS (SELECT source,
        |    400 + (TRY_CAST(substr(source, 4, 10) AS BIGINT) % 5) * 200 AS budget
        |  FROM (SELECT DISTINCT source FROM documents)
        |  WHERE TRY_CAST(substr(source, 4, 10) AS BIGINT) % 5 <> 4),
        |c AS (SELECT tok.doc_id, tok.source, tok.n_tokens, bud.budget,
        |    SUM(tok.n_tokens) OVER (PARTITION BY tok.source
        |      ORDER BY CAST('0x' || substr(md5('42:' || tok.doc_id), 1, 15) AS BIGINT) % 1000000 ASC,
        |               tok.doc_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM tok JOIN bud USING (source))
        |SELECT doc_id, source, n_tokens FROM c WHERE cum <= budget
        |ORDER BY doc_id""".stripMargin,

    "pack_sequences" ->
      """WITH tok AS (SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, n,
        |    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
        |  FROM tok),
        |sp AS (SELECT seq_id, doc_id,
        |    GREATEST(seq_id * 128, st) AS lo,
        |    LEAST((seq_id + 1) * 128, st + n) AS hi
        |  FROM c, unnest(generate_series(st // 128, (st + n - 1) // 128)) AS u(seq_id)
        |  WHERE n > 0)
        |SELECT seq_id, doc_id, lo - seq_id * 128 AS off_in_seq, hi - lo AS n_tok
        |FROM sp ORDER BY seq_id, doc_id""".stripMargin,

    "pack_nextfit" ->
      """WITH RECURSIVE tok AS (SELECT doc_id, doc_id % 8 AS grp,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |d AS (SELECT doc_id, grp, n,
        |    row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn FROM tok),
        |r AS (
        |  SELECT grp, rn, doc_id, n, CAST(0 AS BIGINT) AS bin, n AS running
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.grp, d.rn, d.doc_id, d.n,
        |    CASE WHEN r.running + d.n > 256 AND r.running > 0
        |         THEN r.bin + 1 ELSE r.bin END,
        |    CASE WHEN r.running + d.n > 256 AND r.running > 0
        |         THEN d.n ELSE r.running + d.n END
        |  FROM r JOIN d ON d.grp = r.grp AND d.rn = r.rn + 1)
        |SELECT doc_id, grp, bin, n AS n_tokens FROM r ORDER BY doc_id""".stripMargin,

    // export composition: planted dups → min-id exact dedup → token
    // counts → running-sum chunk explode (the pack_sequences replay) →
    // md5-60 hash order (the deterministic shuffle) → round-robin shard
    "pipeline_export_train" ->
      """WITH raw AS (SELECT doc_id, text FROM documents
        |    UNION ALL
        |    SELECT doc_id + 100000, text FROM documents WHERE doc_id < 5),
        |u AS (SELECT doc_id, text FROM raw
        |      QUALIFY row_number() OVER (PARTITION BY md5(text)
        |        ORDER BY doc_id) = 1),
        |tok AS (SELECT doc_id,
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
        |  FROM u),
        |c AS (SELECT doc_id, n,
        |    CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS st
        |  FROM tok),
        |sp AS (SELECT seq_id, doc_id,
        |    GREATEST(seq_id * 128, st) AS lo,
        |    LEAST((seq_id + 1) * 128, st + n) AS hi
        |  FROM c, unnest(generate_series(st // 128, (st + n - 1) // 128)) AS g(seq_id)
        |  WHERE n > 0),
        |hk AS (SELECT DISTINCT seq_id FROM sp),
        |ps AS (SELECT seq_id,
        |    row_number() OVER (ORDER BY
        |      CAST('0x' || substr(md5(CAST(seq_id AS VARCHAR)), 1, 15) AS BIGINT),
        |      seq_id) - 1 AS pos
        |  FROM hk)
        |SELECT CAST(ps.pos % 8 AS BIGINT) AS shard,
        |  CAST(ps.pos // 8 AS BIGINT) AS shard_pos,
        |  sp.seq_id, sp.doc_id,
        |  sp.lo - sp.seq_id * 128 AS off_in_seq, sp.hi - sp.lo AS n_tok
        |FROM sp JOIN ps USING (seq_id)
        |ORDER BY shard, shard_pos, doc_id""".stripMargin,

    "text_lm_score" ->
      """WITH t AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) - 1 AS pos
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS l
        |        FROM documents)),
        |b AS (SELECT doc_id, pos, w AS w1,
        |        lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM t),
        |bg AS (SELECT doc_id, pos, w1, w2 FROM b WHERE w2 IS NOT NULL),
        |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
        |uc AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw FROM bc GROUP BY w1),
        |v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM t),
        |lp AS (SELECT bg.doc_id, bg.pos,
        |        ln((COALESCE(bc.c, 0) + 1.0) / (COALESCE(uc.cw, 0) + v.v)) AS lp
        |      FROM bg LEFT JOIN bc USING (w1, w2) LEFT JOIN uc USING (w1) CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(floor(list_sum(list(lp ORDER BY pos)) / count(*) * 1000000 + 0.5) AS BIGINT) AS avg_logp
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_blocklist" ->
      """WITH trm(term) AS (VALUES ('slow scan'), ('vector join'),
        |    ('drop'), ('merge conflict'), ('fast')),
        |tn AS (SELECT term, len(string_split(term, ' ')) AS k FROM trm),
        |d AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
        |  FROM documents),
        |g AS (SELECT d.doc_id, tn.term
        |  FROM d, tn, LATERAL unnest(range(1, len(d.toks) - tn.k + 2)) AS u(i)
        |  WHERE array_to_string(d.toks[i : i + tn.k - 1], ' ') = tn.term),
        |h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
        |    array_to_string(list_sort(list_distinct(list(term))), ',') AS hit_terms
        |  FROM g GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
        |  COALESCE(h.hit_terms, '') AS hit_terms, h.n_hits IS NULL AS pass
        |FROM d LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin,

    "text_ccnet_buckets" ->
      """WITH t AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) - 1 AS pos
        |  FROM (SELECT doc_id,
        |          list_filter(string_split_regex(lower(text), '\s+'), x -> length(x) > 0) AS l
        |        FROM documents)),
        |b AS (SELECT doc_id, pos, w AS w1,
        |        lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM t),
        |bg AS (SELECT doc_id, pos, w1, w2 FROM b WHERE w2 IS NOT NULL),
        |bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
        |uc AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cw FROM bc GROUP BY w1),
        |v AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS v FROM t),
        |lp AS (SELECT bg.doc_id, bg.pos,
        |        ln((COALESCE(bc.c, 0) + 1.0) / (COALESCE(uc.cw, 0) + v.v)) AS lp
        |      FROM bg LEFT JOIN bc USING (w1, w2) LEFT JOIN uc USING (w1) CROSS JOIN v),
        |sc AS (SELECT doc_id,
        |        CAST(floor(list_sum(list(lp ORDER BY pos)) / count(*) * 1000000 + 0.5) AS BIGINT) AS lm_micro
        |      FROM lp GROUP BY doc_id),
        |sm AS (SELECT doc_id, lm_micro
        |      FROM sc
        |      ORDER BY CAST('0x' || substr(md5('42:' || doc_id), 1, 15) AS BIGINT), doc_id
        |      LIMIT 300),
        |rk AS (SELECT lm_micro,
        |        row_number() OVER (ORDER BY lm_micro DESC, doc_id ASC) AS rn,
        |        count(*) OVER () AS n
        |      FROM sm),
        |ct AS (SELECT max(CASE WHEN rn = (n + 2) // 3 THEN lm_micro END) AS t1,
        |              max(CASE WHEN rn = (n * 2 + 2) // 3 THEN lm_micro END) AS t2
        |       FROM rk)
        |SELECT sc.doc_id, sc.lm_micro,
        |  CASE WHEN sc.lm_micro >= ct.t1 THEN 'head'
        |       WHEN sc.lm_micro >= ct.t2 THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM sc CROSS JOIN ct ORDER BY sc.doc_id""".stripMargin,

    "corpus_diff" ->
      """WITH prev AS (SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id < 450),
        |cur AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id BETWEEN 100 AND 149 THEN text || ' [rev2]' ELSE text END) AS h
        |  FROM documents WHERE doc_id >= 50),
        |j AS (SELECT COALESCE(prev.doc_id, cur.doc_id) AS doc_id, prev.h AS hp, cur.h AS hc
        |      FROM prev FULL OUTER JOIN cur ON prev.doc_id = cur.doc_id)
        |SELECT doc_id,
        |  CASE WHEN hp IS NULL THEN 'added' WHEN hc IS NULL THEN 'removed'
        |       WHEN hp <> hc THEN 'changed' END AS change
        |FROM j WHERE hp IS NULL OR hc IS NULL OR hp <> hc
        |ORDER BY doc_id""".stripMargin,

    "bpe_top_pairs" ->
      """WITH w AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        |        FROM documents)
        |  GROUP BY word),
        |p AS (SELECT substring(word, i, 1) AS lhs, substring(word, i + 1, 1) AS rhs, cnt
        |  FROM w, unnest(generate_series(1, length(word) - 1)) AS u(i)
        |  WHERE length(word) >= 2)
        |SELECT lhs, rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM p
        |GROUP BY lhs, rhs ORDER BY pair_count DESC, lhs, rhs LIMIT 20""".stripMargin,

    "text_length_quantiles" ->
      """WITH t AS (SELECT lang, CAST(length(text) AS DOUBLE) AS len FROM documents),
        |q AS (SELECT lang, count(*) AS n,
        |        quantile_cont(len, [0.25, 0.5, 0.75, 0.9]) AS qs
        |      FROM t GROUP BY lang)
        |SELECT lang, n,
        |  CAST(floor(qs[1] * 10000 + 0.5) AS BIGINT) AS q25,
        |  CAST(floor(qs[2] * 10000 + 0.5) AS BIGINT) AS q50,
        |  CAST(floor(qs[3] * 10000 + 0.5) AS BIGINT) AS q75,
        |  CAST(floor(qs[4] * 10000 + 0.5) AS BIGINT) AS q90
        |FROM q ORDER BY lang""".stripMargin,

    "text_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
        |        i -> toks[i] || ' ' || toks[i+1])) AS gram FROM t),
        |pg AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
        |a AS (SELECT doc_id, sum(c) AS total, count(*) AS nd, max(c) AS mx FROM pg GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(a.total, 0) AS BIGINT) AS n_ngrams,
        |  round(CASE WHEN coalesce(a.total, 0) = 0 THEN 0.0
        |        ELSE (a.total - a.nd) / CAST(a.total AS DOUBLE) END, 6) AS dup_ngram_ratio,
        |  round(CASE WHEN coalesce(a.total, 0) = 0 THEN 0.0
        |        ELSE a.mx / CAST(a.total AS DOUBLE) END, 6) AS top_ngram_frac
        |FROM documents d LEFT JOIN a USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "text_pii_scrub" ->
      """WITH t AS (SELECT doc_id,
        |  text || ' contact user' || doc_id || '@example.com from 10.0.' || (doc_id % 200) || '.25 tel 0123456789' AS text
        |  FROM documents)
        |, c AS (SELECT doc_id, text,
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
        |  FROM t)
        |, c2 AS (SELECT doc_id, text, after_email,
        |    regexp_replace(after_email, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g') AS after_ip
        |  FROM c)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(after_email, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(after_ip, '\+?[0-9][0-9()\- ]{7,}[0-9]')) AS BIGINT) AS n_phones,
        |  regexp_replace(after_ip, '\+?[0-9][0-9()\- ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
        |FROM c2 ORDER BY doc_id""".stripMargin,

    "pipeline_curate_corpus" -> curateWitnessSql(
      """SELECT doc_id, source, bucket, n_words FROM cum WHERE cum <= 400
        |ORDER BY doc_id""".stripMargin),

    "pipeline_curate_corpus_full" -> curateFullSql(
      """SELECT doc_id, source, bucket, n_words FROM cum WHERE cum <= budget
        |ORDER BY doc_id""".stripMargin),

    // pipeline_curate_funnel / pipeline_curate_export / pipeline_curate
    // _pack oracles live in the DYNAMIC section (oracleSql): they chain
    // the trained unigram model's DP replay, so they are generated from
    // dirUnigram like text_unigram_tokenize's.


    "pipeline_clean_corpus" ->
      s"""WITH t AS (SELECT doc_id, text, string_split_regex(lower(text), '\\s+') AS toks FROM documents),
         |m AS (SELECT doc_id, text,
         |        CAST(len(toks) AS DOUBLE) AS nt,
         |        CAST(length(text) AS DOUBLE) AS nc,
         |        CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE) AS np,
         |        len(list_filter(toks, x -> x IN ($stopwordListSql))) / greatest(len(toks), 1) AS swr
         |      FROM t),
         |q AS (SELECT doc_id, text, swr,
         |        least(nt / 64.0, 1.0) * 0.4
         |          + greatest(1.0 - np / greatest(nc, 1.0) * 10, 0.0) * 0.3
         |          + least(swr * 10, 1.0) * 0.3 AS quality_score
         |      FROM m),
         |k AS (SELECT doc_id, text, quality_score FROM q
         |      WHERE swr >= 0.03 AND quality_score >= 0.75),
         |s1 AS (SELECT doc_id, quality_score, text,
         |        regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email
         |      FROM k),
         |s2 AS (SELECT doc_id, quality_score, text, after_email,
         |        regexp_replace(after_email, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g') AS after_ip
         |      FROM s1),
         |s3 AS (SELECT doc_id, quality_score,
         |        CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
         |          + len(regexp_extract_all(after_email, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b'))
         |          + len(regexp_extract_all(after_ip, '\\+?[0-9][0-9()\\- ]{7,}[0-9]')) AS BIGINT) AS n_redactions,
         |        regexp_replace(after_ip, '\\+?[0-9][0-9()\\- ]{7,}[0-9]', '<PHONE>', 'g') AS scrubbed
         |      FROM s2),
         |canon AS (SELECT min(doc_id) AS doc_id FROM s3 GROUP BY md5(scrubbed))
         |SELECT s3.doc_id, round(quality_score, 6) AS quality, n_redactions,
         |  CAST(length(scrubbed) AS BIGINT) AS n_chars
         |FROM s3 JOIN canon USING (doc_id) ORDER BY doc_id""".stripMargin,

    "events_json" ->
      """SELECT event_id, CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "ensemble_fuse" ->
      s"""WITH ${graft.oracle.GeneratedOracles.ensembleBaseSql(20)},
         |fused AS (
         |  SELECT query_id, doc_id,
         |    CASE WHEN crank IS NOT NULL
         |         THEN score + 0.6 / (0.03 * (crank - 1) + 1)
         |         ELSE (score + 0.6 / (0.03 * 5 + 1)) * (1 - 0.02 * 0.6) END AS fused_score
         |  FROM al),
         |ranked AS (SELECT query_id, doc_id, fused_score,
         |             row_number() OVER (PARTITION BY query_id ORDER BY fused_score DESC, doc_id ASC) AS rank
         |           FROM fused)
         |SELECT query_id, rank, doc_id, round(fused_score, 6) AS fused_score
         |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "ensemble_nq_hitrate" ->
      s"""WITH ${graft.oracle.GeneratedOracles.ensembleBaseSql(20)},
         |fused AS (
         |  SELECT query_id, doc_id,
         |    CASE WHEN crank IS NOT NULL
         |         THEN score + 0.4 / (0.03 * (crank - 1) + 1)
         |         ELSE (score + 0.4 / (0.03 * 5 + 1)) * (1 - 0.02 * 0.4) END AS fused_score
         |  FROM al WHERE query_id < 10),
         |ranked AS (SELECT query_id, doc_id,
         |             row_number() OVER (PARTITION BY query_id ORDER BY fused_score DESC, doc_id ASC) AS rank
         |           FROM fused),
         |answers AS (
         |  SELECT doc_id AS query_idx,
         |    regexp_extract_all(lower(array_to_string(string_split_regex(text, '\\s+')[5:6], ' ')),
         |      '[\\p{L}\\p{N}\\p{M}]+|[^\\p{Z}\\p{C}]') AS atoks
         |  FROM documents WHERE doc_id < 10),
         |dt AS (
         |  SELECT doc_id,
         |    regexp_extract_all(lower(text), '[\\p{L}\\p{N}\\p{M}]+|[^\\p{Z}\\p{C}]') AS dtoks
         |  FROM documents),
         |matches AS (
         |  SELECT DISTINCT a.query_idx, d.doc_id
         |  FROM dt d JOIN answers a
         |    ON len(a.atoks) > 0 AND len(a.atoks) <= len(d.dtoks)
         |   AND len(list_filter(range(1, len(d.dtoks) - len(a.atoks) + 2),
         |         p -> list_slice(d.dtoks, p, p + len(a.atoks) - 1) = a.atoks)) > 0),
         |hits AS (SELECT r.query_id, r.rank FROM ranked r
         |         JOIN matches m ON m.doc_id = r.doc_id AND m.query_idx = r.query_id
         |         WHERE r.rank <= 10),
         |gtn AS (SELECT a.query_idx AS query_id,
         |          (SELECT count(*) FROM matches m WHERE m.query_idx = a.query_idx) AS gt_n
         |        FROM answers a),
         |ks AS (SELECT unnest([1, 5, 10]) AS k),
         |perq AS (
         |  SELECT ks.k, gtn.query_id,
         |    CASE WHEN gtn.gt_n = 0 THEN 0
         |         ELSE COALESCE((SELECT count(*) FROM hits h WHERE h.query_id = gtn.query_id AND h.rank <= ks.k), 0) / gtn.gt_n END AS recall,
         |    COALESCE((SELECT 1.0 / min(h.rank) FROM hits h WHERE h.query_id = gtn.query_id AND h.rank <= ks.k), 0) AS rr,
         |    CASE WHEN EXISTS (SELECT 1 FROM hits h WHERE h.query_id = gtn.query_id AND h.rank <= ks.k) THEN 1.0 ELSE 0.0 END AS hit
         |  FROM ks CROSS JOIN gtn)
         |SELECT k, round(avg(recall), 6) AS recall, round(avg(rr), 6) AS mrr,
         |  round(avg(hit), 6) AS hitrate, count(*) AS n_queries
         |FROM perq GROUP BY k ORDER BY k""".stripMargin,

    "ensemble_nq_grid" ->
      s"""WITH ${graft.oracle.GeneratedOracles.ensembleBaseSql(20)},
         |combos AS (SELECT CAST(c[1] AS DOUBLE) AS alpha, CAST(c[2] AS DOUBLE) AS beta, CAST(c[3] AS DOUBLE) AS gamma
         |           FROM (SELECT unnest([[0.2, 0.03, 0.02], [0.4, 0.03, 0.02], [0.6, 0.03, 0.02], [0.8, 0.03, 0.02]]) AS c)),
         |fused AS (
         |  SELECT cb.alpha, cb.beta, cb.gamma, a.query_id, a.doc_id,
         |    CASE WHEN a.crank IS NOT NULL
         |         THEN a.score + cb.alpha / (cb.beta * (a.crank - 1) + 1)
         |         ELSE (a.score + cb.alpha / (cb.beta * 5 + 1)) * (1 - cb.gamma * cb.alpha) END AS fused_score
         |  FROM al a CROSS JOIN combos cb
         |  WHERE a.query_id < 10),
         |ranked AS (SELECT alpha, beta, gamma, query_id, doc_id,
         |             row_number() OVER (PARTITION BY alpha, beta, gamma, query_id
         |                                ORDER BY fused_score DESC, doc_id ASC) AS rank
         |           FROM fused),
         |answers AS (
         |  SELECT doc_id AS query_idx,
         |    regexp_extract_all(lower(array_to_string(string_split_regex(text, '\\s+')[5:6], ' ')),
         |      '[\\p{L}\\p{N}\\p{M}]+|[^\\p{Z}\\p{C}]') AS atoks
         |  FROM documents WHERE doc_id < 10),
         |dt AS (
         |  SELECT doc_id,
         |    regexp_extract_all(lower(text), '[\\p{L}\\p{N}\\p{M}]+|[^\\p{Z}\\p{C}]') AS dtoks
         |  FROM documents),
         |matches AS (
         |  SELECT DISTINCT a.query_idx, d.doc_id
         |  FROM dt d JOIN answers a
         |    ON len(a.atoks) > 0 AND len(a.atoks) <= len(d.dtoks)
         |   AND len(list_filter(range(1, len(d.dtoks) - len(a.atoks) + 2),
         |         p -> list_slice(d.dtoks, p, p + len(a.atoks) - 1) = a.atoks)) > 0),
         |hits AS (SELECT r.alpha, r.beta, r.gamma, r.query_id, min(r.rank) AS hr
         |         FROM ranked r
         |         JOIN matches m ON m.doc_id = r.doc_id AND m.query_idx = r.query_id
         |         WHERE r.rank <= 10
         |         GROUP BY r.alpha, r.beta, r.gamma, r.query_id)
         |SELECT alpha, beta, gamma, round(sum(1.0 / hr) / 10.0, 6) AS mrr,
         |  round(count(*) / 10.0, 6) AS hitrate
         |FROM hits GROUP BY alpha, beta, gamma ORDER BY alpha""".stripMargin,

    "ensemble_grid" ->
      s"""WITH ${graft.oracle.GeneratedOracles.ensembleBaseSql(20)},
         |combos AS (SELECT CAST(c[1] AS DOUBLE) AS alpha, CAST(c[2] AS DOUBLE) AS beta, CAST(c[3] AS DOUBLE) AS gamma
         |           FROM (SELECT unnest([[0.4, 0.03, 0.02], [0.4, 0.03, 0.05], [0.6, 0.03, 0.02], [0.6, 0.03, 0.05]]) AS c)),
         |fused AS (
         |  SELECT cb.alpha, cb.beta, cb.gamma, a.query_id, a.doc_id,
         |    CASE WHEN a.crank IS NOT NULL
         |         THEN a.score + cb.alpha / (cb.beta * (a.crank - 1) + 1)
         |         ELSE (a.score + cb.alpha / (cb.beta * 5 + 1)) * (1 - cb.gamma * cb.alpha) END AS fused_score
         |  FROM al a
         |  CROSS JOIN combos cb),
         |ranked AS (SELECT alpha, beta, gamma, query_id, doc_id, fused_score,
         |             row_number() OVER (PARTITION BY alpha, beta, gamma, query_id
         |                                ORDER BY fused_score DESC, doc_id ASC) AS rank
         |           FROM fused),
         |hits AS (SELECT r.alpha, r.beta, r.gamma, r.query_id, min(r.rank) AS hr
         |         FROM ranked r
         |         JOIN embeddings ql ON ql.vec_id = r.query_id
         |         JOIN embeddings dl ON dl.vec_id = r.doc_id AND dl.label = ql.label
         |         WHERE r.rank <= 10
         |         GROUP BY r.alpha, r.beta, r.gamma, r.query_id)
         |SELECT alpha, beta, gamma, round(sum(1.0 / hr) / 20.0, 6) AS mrr
         |FROM hits GROUP BY alpha, beta, gamma ORDER BY alpha, gamma""".stripMargin
  )

  /** Shared oracle fragments (constants must match graft.pipeline.Dedup /
    * TextAnalysis exactly). */
  private def minhashSigN(n: Int): String =
    Dedup.PermA.zip(Dedup.PermB).take(n).map { case (a, b) =>
      s"CAST(list_min(list_transform(hs, x -> ($a * x + $b) % ${Dedup.P})) AS BIGINT)"
    }.mkString(",\n    ")

  private def minhashSigSql: String = minhashSigN(4)
  private def minhashSigSql8: String = minhashSigN(8)

  /** Shared CTE: per-doc 32-bit SimHash (`sh(doc_id, simhash)`) —
    * mirrors `Dedup.simhash`. */
  private def simhashCte: String =
    """t AS (SELECT doc_id, list_transform(string_split_regex(lower(text), '\s+'),
      |  tok -> CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)) AS hs FROM documents),
      |sh AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 32), b ->
      |  CASE WHEN list_sum(list_transform(hs, h -> CAST(floor(h / pow(2.0, b)) AS BIGINT) % 2 * 2 - 1)) > 0
      |       THEN CAST(pow(2.0, b) AS BIGINT) ELSE 0 END)) AS BIGINT) AS simhash
      |FROM t)""".stripMargin

  /** Shared CTE chain: documents → shingles → 8-perm signatures → capped
    * LSH bands → candidate pairs → exact-Jaccard (`jac`). Mirrors
    * `confirmedNearDupPairs`; consumers filter `jac` at 0.5. */
  private def minhashPairsCte: String = minhashPairsCteFrom("documents", "")

  /** [[minhashPairsCte]] over an arbitrary (doc_id, text) source CTE with
    * prefixed internal names, so a composed oracle (the full curation
    * pipeline) can band its own intermediate survivor set without name
    * collisions. Final CTE: `${p}jac(a, b, jaccard)`. */
  private def minhashPairsCteFrom(src: String, p: String): String =
    s"""${p}t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks FROM $src),
       |${p}sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingles FROM ${p}t),
       |${p}h AS (SELECT doc_id, list_transform(shingles, s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT) % 2147483647) AS hs FROM ${p}sh),
       |${p}sig AS (SELECT doc_id, [$minhashSigSql8] AS sig FROM ${p}h),
       |${p}banded AS (SELECT doc_id, unnest([
       |  concat('0:', sig[1], ',', sig[2], ',', sig[3], ',', sig[4]),
       |  concat('1:', sig[5], ',', sig[6], ',', sig[7], ',', sig[8])]) AS band_key FROM ${p}sig),
       |${p}ok AS (SELECT band_key FROM ${p}banded GROUP BY band_key HAVING count(*) <= 1000),
       |${p}capped AS (SELECT b.* FROM ${p}banded b JOIN ${p}ok USING (band_key)),
       |${p}cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b FROM ${p}capped x JOIN ${p}capped y
       |         ON x.band_key = y.band_key AND x.doc_id < y.doc_id),
       |${p}jac AS (SELECT ${p}cand.a, ${p}cand.b,
       |          len(list_intersect(sa.shingles, sb.shingles))
       |            / len(list_distinct(list_concat(sa.shingles, sb.shingles))) AS jaccard
       |        FROM ${p}cand JOIN ${p}sh sa ON sa.doc_id = ${p}cand.a JOIN ${p}sh sb ON sb.doc_id = ${p}cand.b)""".stripMargin

  private def stopwordListSql: String =
    TextAnalysis.EnStopwords.map(w => s"'$w'").mkString(", ")
}
