package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Negative sampling for contrastive training pairs — the Spark form of the
  * reference's variant zoo (`clus/file/inter/union/notclus/simans`,
  * MEVI/main_models.py:1813-1950).
  *
  * Determinism: the reference seeds RNGs; here "random" choice is a rank by
  * md5(query ⊕ candidate) — stable across runs, partitionings, and engines
  * (the oracle can reproduce it), which is the stronger property the
  * fixtures need. All variants are per-row array expressions after the
  * cluster-membership join; nothing iterates on the driver.
  */
object NegativeSampling {

  /** Deterministic pseudo-random rank hash for (query, candidate). */
  private def rankHash(query: Column, cand: Column): Column =
    Dedup.md5Hash60(concat(query, lit(":"), cand.cast("string")))

  /** Deterministically "shuffle" an array by the md5 rank and keep n. */
  def sampleArray(query: Column, cands: Column, n: Int): Column =
    sampleArrayN(query, cands, lit(n))

  /** As sampleArray but with a dynamic (per-row) sample size. */
  def sampleArrayN(query: Column, cands: Column, n: Column): Column =
    slice(
      transform(
        array_sort(transform(cands, c =>
          struct(rankHash(query, c).as("h"), c.as("v")))),
        s => s.getField("v")),
      lit(1), greatest(n, lit(0)))

  /** `clus`: negatives from the positive doc's cluster, excluding the
    * paired positive itself — exactly main_models.py:1854-1856
    * (`pq_doc_cluster.get(newid).copy(); remove_ele(…, oldid)`; other
    * positives of the same query are NOT excluded in the reference).
    *
    * Relational shape: explode cluster members (the chunked index's rows
    * union back together naturally), rank candidates by the md5 hash per
    * (query, positive), keep n, regroup. No per-row giant arrays — a hot
    * cluster's members spread across tasks, and the window input is already
    * cut to the probed clusters.
    *
    * @param pairs        (query, doc_id) positives
    * @param assignments  (doc_id, codes)
    * @param clusterIndex (codes, doc_ids) — chunked rows supported
    * @return (query, doc_id, neg_ids ARRAY<LONG> size ≤ n, hash order)
    */
  def clusterNegatives(pairs: DataFrame, assignments: DataFrame,
      clusterIndex: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cands = pairs
      .join(assignments, Seq("doc_id"))
      .join(clusterIndex.select("codes", "doc_ids"), Seq("codes"))
      .select(col("query"), col("doc_id"), explode(col("doc_ids")).as("cand"))
      .where(col("cand") =!= col("doc_id"))
      .withColumn("__h", rankHash(col("query"), col("cand")))
    val w = Window.partitionBy("query", "doc_id")
      .orderBy(col("__h").asc, col("cand").asc)
    cands
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .groupBy("query", "doc_id")
      .agg(transform(
        array_sort(collect_list(struct(col("__h"), col("cand")))),
        s => s.getField("cand")).as("neg_ids"))
  }

  /** `file`/`inter`/`union` combinators over a co-negative list table
    * (query, neg_ids) — main_models.py:1879-1908. */
  def combineNegatives(clusNegs: DataFrame, fileNegs: DataFrame,
      mode: String, n: Int): DataFrame = {
    val combined = mode match {
      case "file"  => col("file_negs")
      case "inter" =>
        // Reference (main_models.py:1880-1892): inter_part = clus ∩ file;
        // if short of n, back-fill from rest_part = clus ∖ file
        // (md5-rank stand-in for random.sample); if rest_part can't cover
        // the deficit, fall back to the FULL cluster list. Null file rows
        // (missed join) fall through every `when` into the same fallback.
        // NOTE: the reference intersects against the full per-cluster
        // candidate list — pass clusNegs un-capped (clusterNegatives with
        // large n) when exact parity matters.
        val inter = array_intersect(col("neg_ids"), col("file_negs"))
        val rest = array_except(col("neg_ids"), col("file_negs"))
        val needMore = lit(n) - size(inter)
        when(size(inter) >= n, inter)
          .when(size(rest) >= needMore,
            concat(inter, sampleArrayN(col("query"), rest, needMore)))
          .otherwise(col("neg_ids"))
      case "union" => array_union(col("neg_ids"), col("file_negs"))
      case "interhalf" =>
        // Reference (main_models.py:1893-1905): half the quota from
        // inter = clus ∩ file, half from rest = clus ∖ file; degenerate
        // cases collapse to whichever part is non-empty. The reference's
        // random.choices-with-replacement top-up (a part shorter than its
        // half-quota repeats members) has no relational meaning — a part
        // shorter than its quota just contributes all of itself.
        val inter = array_intersect(col("neg_ids"), col("file_negs"))
        val rest = array_except(col("neg_ids"), col("file_negs"))
        val halfNeg = n / 2
        when(size(inter) === 0, rest)
          .when(size(rest) === 0, inter)
          .otherwise(concat(
            sampleArray(col("query"), inter, halfNeg),
            sampleArrayN(col("query"), rest, lit(n - halfNeg))))
      case other   => throw new IllegalArgumentException(s"mode $other")
    }
    clusNegs
      .join(fileNegs.withColumnRenamed("neg_ids", "file_negs"), Seq("query"), "left")
      .select(col("query"), col("doc_id"),
        sampleArray(col("query"),
          coalesce(combined, col("neg_ids")), n).as("neg_ids"))
  }

  /** `clusfile`: cluster candidates sourced from a per-QUERY top-cluster
    * list (the reference's `co_negclus` file, main_models.py:1824-1829:
    * `sum([pq_doc_cluster.get(clus, []) for clus in top_clus], [])` minus
    * the paired positive) instead of the positive doc's own cluster. The
    * reference's list concat keeps a doc once per containing cluster;
    * duplicates carry no relational meaning, so membership is distinct
    * here (same md5-rank draw either way).
    *
    * @param pairs        (query, doc_id) positives
    * @param negClus      (query, codes) — one row per top cluster of the
    *                     query (the co_negclus file contents)
    * @param clusterIndex (codes, doc_ids) — chunked rows supported
    * @return (query, doc_id, neg_ids ARRAY<LONG> size ≤ n, hash order)
    */
  def clusterFileNegatives(pairs: DataFrame, negClus: DataFrame,
      clusterIndex: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cands = pairs
      .join(negClus, Seq("query"))
      .join(clusterIndex.select("codes", "doc_ids"), Seq("codes"))
      .select(col("query"), col("doc_id"), explode(col("doc_ids")).as("cand"))
      .where(col("cand") =!= col("doc_id"))
      .distinct() // a doc in several top clusters is one candidate
      .withColumn("__h", rankHash(col("query"), col("cand")))
    val w = Window.partitionBy("query", "doc_id")
      .orderBy(col("__h").asc, col("cand").asc)
    cands
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .groupBy("query", "doc_id")
      .agg(transform(
        array_sort(collect_list(struct(col("__h"), col("cand")))),
        s => s.getField("cand")).as("neg_ids"))
  }

  /** `notclus`: corpus-wide negatives rejecting any candidate that shares
    * ANY code level with the positive — exactly the reference's
    * `if_in_clus` predicate (main_models.py:1841-1843:
    * `any(i == j for i, j in zip(pq_mapping[c], newid))`), which is
    * stricter than full-tuple inequality. Anti-predicate + deterministic
    * per-query rank; at 100 TB the corpus side is pre-sampled by hash
    * bucket (`md5 % buckets`) before the window, so the shuffle stays
    * bounded (the reference samples 2n candidates per round the same way).
    */
  def notClusterNegatives(pairs: DataFrame, assignments: DataFrame,
      corpus: DataFrame, n: Int, preSampleBuckets: Int = -1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand0 = corpus.select(col("doc_id").as("cand_id"))
    // Default (-1): auto-size the pre-sample to ~max(64n, 1024) expected
    // candidates. The reference draws 2n and LOOPS until co_neg_num survive
    // rejection (main_models.py:1846-1851); this is a single draw, so the
    // headroom covers high rejection rates (with coarse clustering most of
    // the corpus can share a code level with a positive). Small corpora
    // degrade to buckets=1 — everything kept, still broadcast. 0 opts into
    // the full-corpus join explicitly; never the default. The corpus count
    // enters the plan as a broadcast scalar, NOT an eager driver count():
    // sizing must not cost a full corpus scan at DataFrame-construction
    // time (and again per re-construction).
    val sampled = preSampleBuckets != 0
    val cand =
      if (preSampleBuckets > 0)
        cand0.where(pmod(Dedup.md5Hash60(col("cand_id").cast("string")),
          lit(preSampleBuckets.toLong)) === 0)
      else if (preSampleBuckets == 0) cand0
      else {
        val nb = cand0.agg(greatest(
          floor(count(lit(1)) / lit(math.max(64L * n, 1024L))).cast("long"),
          lit(1L)).as("__buckets"))
        cand0.crossJoin(broadcast(nb))
          .where(pmod(Dedup.md5Hash60(col("cand_id").cast("string")),
            col("__buckets")) === 0)
          .drop("__buckets")
      }
    val posCodes = pairs.join(assignments, Seq("doc_id"))
    val w = Window.partitionBy("query", "doc_id")
      .orderBy(rankHash(col("query"), col("cand_id")))
    val sharesAnyLevel = array_contains(
      zip_with(col("cand_codes"), col("codes"), (a, b) => a === b), true)
    // attach codes to the (small) candidate set BEFORE the pair fan-out,
    // then broadcast it — the alternative shuffles |pairs|·|cand| rows
    // into the assignments join
    val candCodes = cand.join(assignments.select(col("doc_id").as("cand_id"),
      col("codes").as("cand_codes")), Seq("cand_id"))
    posCodes
      .crossJoin(if (sampled) broadcast(candCodes) else candCodes)
      .where(!sharesAnyLevel)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .groupBy("query", "doc_id")
      .agg(sort_array(collect_list(col("cand_id"))).as("neg_ids"))
  }

  /** SimANS score-aware sampling (main_models.py:1613-1616): sampling
    * probability ∝ softmax(−a·(s − mean_gt_score − b)²). The softmax's
    * normalizing constant cancels in weighted-without-replacement sampling,
    * so the race uses w = exp(−a·(s − s_pos − b)²) directly; `pos_score`
    * plays mean-of-gt-scores (identical for single-positive rows), and b
    * is the reference's `simans_hyper_b` offset. Deterministic via the
    * exponential-race key ln(u)/w with u from the rank hash. */
  def simansNegatives(scored: DataFrame, n: Int, a: Double = 0.5,
      b: Double = 0.0): DataFrame = {
    // scored: (query, doc_id pos, cand_id, cand_score, pos_score)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query", "doc_id")
      .orderBy(raceKey(a, b).desc, col("cand_id").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= n)
      .groupBy("query", "doc_id")
      .agg(sort_array(collect_list(col("cand_id"))).as("neg_ids"))
  }

  /** Exponential-race sort key for the SimANS draw over a (cand_score,
    * pos_score) row: ln(u)/w with u from the rank hash. u must land in
    * (0,1): rankHash is 60-bit, so reduce mod P first (raw hash/(P+1)
    * would exceed 1, flipping ln(u)'s sign and inverting the race toward
    * the LOWEST weights). ln(u) < 0; larger weight → key nearer 0 → wins.
    * cand_id tie-break at the call sites: exact key ties are
    * near-impossible (u is a per-candidate hash) but the order must still
    * be total for engine/partitioning determinism. */
  private def raceKey(a: Double, b: Double): Column = {
    val u = (pmod(rankHash(col("query"), col("cand_id")), lit(Dedup.P))
      .cast("double") + 1.0) / (Dedup.P.toDouble + 2.0)
    val wgt = exp(lit(-a) * pow(col("cand_score") - col("pos_score") - lit(b), 2))
    log(u) / wgt
  }

  /** `simansinter` (main_models.py:1911-1927): the SimANS draw restricted
    * to file candidates that ALSO lie in the positive's cluster candidate
    * set, with the reference's fallback chain when the intersection can't
    * fill the quota:
    *
    *   1. ≥ n survivors       → race-weighted top-n over the survivors;
    *   2. cluster list ≥ n    → survivors ∪ an md5-rank draw of n from the
    *                            cluster list, de-duplicated, re-drawn to n
    *                            (the reference's `filtered + random.sample
    *                            (clus, n)` then set-dedup + final k=n cut);
    *   3. otherwise           → the whole (short) cluster list — the
    *                            reference tops up by choices-with-
    *                            replacement, which has no relational
    *                            meaning, so the short list stands.
    *
    * @param scored   (query, doc_id, cand_id, cand_score, pos_score) —
    *                 the file candidates with their biencoder scores
    * @param clusNegs (query, doc_id, neg_ids) — the UN-capped cluster
    *                 candidate list (clusterNegatives with large n)
    * @return (query, doc_id, neg_ids ARRAY<LONG> sorted, size ≤ n)
    */
  def simansInterNegatives(scored: DataFrame, clusNegs: DataFrame, n: Int,
      a: Double = 0.5, b: Double = 0.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clus = clusNegs.select(col("query"), col("doc_id"),
      col("neg_ids").as("clus_cands"))
    // survivors of the cluster filter, in race order (array_sort on the
    // (rank, cand) struct replays the window order inside the array)
    val w = Window.partitionBy("query", "doc_id")
      .orderBy(raceKey(a, b).desc, col("cand_id").asc)
    val filtAgg = scored
      .join(clus, Seq("query", "doc_id"))
      .where(array_contains(col("clus_cands"), col("cand_id")))
      .withColumn("__rn", row_number().over(w))
      .groupBy("query", "doc_id")
      .agg(transform(
        array_sort(collect_list(struct(col("__rn").as("r"), col("cand_id").as("v")))),
        s => s.getField("v")).as("filt"))
    // positives with zero survivors still resolve via the fallbacks
    val filt = coalesce(col("filt"), array().cast("array<long>"))
    clus
      .join(filtAgg, Seq("query", "doc_id"), "left")
      .select(col("query"), col("doc_id"),
        sort_array(
          when(size(filt) >= n, slice(filt, 1, n))
            .when(size(col("clus_cands")) >= n,
              sampleArray(col("query"),
                array_distinct(concat(filt,
                  sampleArray(col("query"), col("clus_cands"), n))), n))
            .otherwise(col("clus_cands"))).as("neg_ids"))
  }
}
