package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step between a cleaned corpus and a training
  * run: documents are laid out into fixed-length token windows so every
  * training sequence is exactly `seqLen` tokens with no padding waste.
  *
  * Beyond-reference operator (builder mandate: large-scale training-data
  * pipeline ops). The reference stops at fixed-width tokenized matrices
  * (prepare_passage_tokenized.py:83-86 pads/truncates every doc to
  * doc_length); packing is what a pretraining pipeline does instead of
  * padding.
  *
  * Two forms:
  *  - [[chunkSpans]]: GPT-style concat-and-chunk. All documents are
  *    concatenated in ascending id order and the stream is cut every
  *    `seqLen` tokens; a document may straddle a cut. Exact, shuffle-light,
  *    fully SQL-replayable.
  *  - [[nextFit]]: whole-document next-fit bin packing (no doc is ever
  *    split — instruction-tuning layout). Sequential by construction, so
  *    it runs per deterministic hash group; bins never cross groups.
  *
  * Scale: the only global state in chunkSpans is the exclusive prefix sum
  * of token counts in id order. A naive `sum over (order by id)` window
  * collapses to ONE partition in Spark; [[exclusivePrefixSum]] instead
  * does the classic two-level scan — per-bucket cumulative sums in
  * parallel (one hash-partitioned window), plus a bucket-offset table
  * (#buckets rows) broadcast back. Both levels stay in whole-stage
  * codegen; nothing corpus-sized crosses the driver.
  */
object Packing {

  /** Exclusive prefix sum of `nCol` in ascending `idCol` order, computed
    * without a single-partition global window. Buckets are derived from
    * the id RANGE (ids need not be dense; heavily clustered ids degrade
    * bucket balance, not correctness). Adds `outCol` = Σ n over all rows
    * with smaller id.
    *
    * `tieCol` (ADVICE r14): when `idCol` values can COLLIDE (e.g. a
    * 60-bit shuffle hash), pass the unique column that breaks the tie —
    * the in-bucket window then orders by (id, tie), so equal ids get
    * distinct, deterministic positions instead of leaving the window
    * frame to physical row order. Bucketing stays on `idCol` alone
    * (equal ids land in the same bucket by construction).
    *
    * The input is materialized once (localCheckpoint): three consumers
    * read it — the id-bounds probe, the in-bucket window, and the
    * bucket-offset aggregate — and re-running an expensive upstream
    * projection (e.g. regex tokenization) three times would dominate the
    * scan. Pass a narrow (id, n) projection.
    */
  def exclusivePrefixSum(df: DataFrame, idCol: String, nCol: String,
      outCol: String = "start", buckets: Int = 256,
      tieCol: Option[String] = None): DataFrame =
    exclusivePrefixSumWithTotal(df, idCol, nCol, outCol, buckets, tieCol)._1

  /** [[exclusivePrefixSum]] plus the grand TOTAL of `nCol`, read off
    * the same bucket-sum collect the offsets already need (r17) — a
    * caller that also wants the total (e.g. token-mass shard sizing)
    * skips a separate aggregate action over the input. */
  def exclusivePrefixSumWithTotal(df: DataFrame, idCol: String,
      nCol: String, outCol: String = "start", buckets: Int = 256,
      tieCol: Option[String] = None): (DataFrame, Long) = {
    val in = df.localCheckpoint()
    val bounds = in.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long")).head
    if (bounds.isNullAt(0))
      return (df.withColumn(outCol, lit(0L)), 0L) // empty input
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (mx - mn) / buckets + 1)
    // exact integer `div` (a double-division round-trip is only exact to
    // 2^53 — id spaces above that would silently mis-bucket)
    val withB = in.withColumn("__b",
      expr(s"(CAST(`$idCol` AS BIGINT) - ${mn}L) div ${width}L"))
    // level 1: exclusive cumsum WITHIN each bucket (parallel over buckets)
    val ordering = col(idCol).asc +: tieCol.map(c => col(c).asc).toSeq
    val wIn = Window.partitionBy("__b").orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBucket = withB.withColumn("__in",
      coalesce(sum(col(nCol)).over(wIn), lit(0L)))
    // level 2: bucket totals → exclusive cumsum. The aggregate is
    // distributed (map-side combined); the cumsum itself runs on the
    // DRIVER over ≤ `buckets` rows — a deliberate tiny collect that
    // replaces the previous one-partition WindowExec, whose "No
    // Partition Defined" warning sprayed every Verify log and buried
    // real warnings (it was harmless at 256 rows, but a warning that
    // cries wolf is worse than a 2 KB collect).
    val spark = df.sparkSession
    import spark.implicits._
    val bucketSums = withB.groupBy("__b")
      .agg(sum(col(nCol)).cast("long").as("__bsum"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offRows = bucketSums.map { case (b, s) =>
      val off = acc; acc += s; (b, off)
    }.toSeq
    val offsets = offRows.toDF("__b", "__off")
    (inBucket.join(broadcast(offsets), Seq("__b"))
      .withColumn(outCol, (col("__in") + col("__off")).cast("long"))
      .drop("__b", "__in"), acc)
  }

  /** Concat-and-chunk packing: documents concatenated in ascending
    * `idCol` order, cut every `seqLen` tokens. Emits one row per
    * (sequence, document) overlap:
    * `(seq_id, <idCol>, off_in_seq, n_tok)` — `off_in_seq` is where the
    * document's slice begins inside the sequence, `n_tok` how many of its
    * tokens land there. Zero-token documents are dropped (they occupy no
    * stream positions). A document of n tokens spans ≤ n/seqLen + 1
    * sequences, so the explode is output-proportional.
    */
  def chunkSpans(df: DataFrame, seqLen: Int, idCol: String = "doc_id",
      nCol: String = "n_tokens", keepStart: Boolean = false): DataFrame =
    chunkSpansWithTotal(df, seqLen, idCol, nCol, keepStart)._1

  /** [[chunkSpans]] plus the total token mass (from the prefix scan's
    * own bucket collect — no extra pass; r17). */
  def chunkSpansWithTotal(df: DataFrame, seqLen: Int,
      idCol: String = "doc_id", nCol: String = "n_tokens",
      keepStart: Boolean = false): (DataFrame, Long) = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val L = lit(seqLen.toLong)
    val (withStart, total) = exclusivePrefixSumWithTotal(df, idCol, nCol)
    val spans = withStart
      .where(col(nCol) > 0)
      // `div` = exact integer division on longs (no double round-trip —
      // token offsets at 100 TB scale exceed float53 safety margins less
      // comfortably than one would like)
      .withColumn("seq_id",
        explode(sequence(expr(s"start div $seqLen"),
          expr(s"(start + `$nCol` - 1) div $seqLen"))))
      .withColumn("__lo", greatest(col("seq_id") * L, col("start")))
      .withColumn("__hi", least((col("seq_id") + 1) * L, col("start") + col(nCol)))
    // keepStart: retain the doc's global stream offset so a payload
    // consumer can compute the span's DOC-side slice ((seq_id*L +
    // off_in_seq) - start) without a second prefix-sum pass
    val base = Seq(col("seq_id"), col(idCol),
      (col("__lo") - col("seq_id") * L).cast("long").as("off_in_seq"),
      (col("__hi") - col("__lo")).cast("long").as("n_tok"))
    (spans.select(
      (if (keepStart) base :+ col("start").cast("long").as("start")
       else base): _*), total)
  }

  /** Whole-document next-fit packing: docs are dealt into `groups` hash
    * groups (`id % groups` — deterministic on any engine), walked in
    * ascending id order within the group, and a bin is closed whenever the
    * next document would overflow `budget`. A document larger than the
    * budget gets a bin of its own. Emits `(doc_id, grp, bin, n_tokens)`.
    *
    * Bins are sequential state, so each group is packed by one task
    * (`flatMapGroups`); choose `groups` so a group's (id, n) pairs fit in
    * task memory — 16 bytes/doc, so even 10⁸ docs/group is ~1.6 GB and a
    * 100 TB corpus at groups=4096 stays far under that.
    */
  def nextFit(df: DataFrame, budget: Long, groups: Int,
      idCol: String = "doc_id", nCol: String = "n_tokens"): DataFrame = {
    require(budget > 0 && groups > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(nCol).cast("long"))
      .as[(Long, Long)]
      .groupByKey { case (id, _) => id % groups }
      .flatMapGroups { (g: Long, it: Iterator[(Long, Long)]) =>
        nextFitWalk(g, it, budget)
      }
      .toDF(idCol, "grp", "bin", nCol)
  }

  /** The ONE next-fit walk definition, shared by [[nextFit]] and the
    * streaming twin ([[graft.streaming.IncrementalPacking]]): docs in
    * ascending id order; the open bin closes iff the next doc overflows
    * it AND the bin is non-empty (an oversized doc starts, and fully
    * occupies, its own bin — it must not burn an extra empty bin number
    * first). `bin0`/`fill0` carry an OPEN bin's state into the walk —
    * (0, 0) for the batch path, the store snapshot for the door. The
    * post-walk state is recoverable from the output alone: (max emitted
    * bin, Σ n in it, plus the carried fill when that bin IS bin0). */
  private[graft] def nextFitWalk(g: Long, it: Iterator[(Long, Long)],
      budget: Long, bin0: Long = 0L,
      fill0: Long = 0L): Iterator[(Long, Long, Long, Long)] = {
    val docs = it.toArray.sortBy(_._1)
    var bin = bin0
    var running = fill0
    docs.iterator.map { case (id, n) =>
      if (running + n > budget && running > 0L) { bin += 1; running = 0L }
      running += n
      (id, g, bin, n)
    }
  }
}
