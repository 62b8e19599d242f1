package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches as PLAIN TABLES — the 100 TB pre-aggregation
  * pattern: scan the corpus once, keep a tiny sketch per grain (source,
  * day, shard), answer later questions by MERGING sketches instead of
  * re-reading raw data. Merge is an associative fold (max for HLL
  * registers, sum for CMS counters), so sketches built per partition /
  * per day / per datacenter combine with a shuffle whose size is the
  * sketch grain, never the corpus.
  *
  * Both sketches here are deliberately INTEGER-deterministic and
  * engine-replayable: the hash is the md5-prefix family the rest of the
  * engine uses (DuckDB: `CAST('0x' || substr(md5(x),1,8) AS BIGINT)`),
  * the HLL rank is trailing-zeros via `bit_count((h & -h) - 1)` — exact
  * in any engine — and the HLL estimate's `Σ 2^-M_j` sums exact binary
  * fractions whose spread (≤ 33 bits) fits a Double mantissa, so even
  * the float part is order-independent and bit-reproducible. A SQL
  * oracle can therefore certify the whole sketch pipeline by hash.
  *
  * HLL per Flajolet et al. 2007 (plain αm·m²/Σ estimator; the small- and
  * large-range corrections are omitted — document counts at sketch
  * grain sit in the plain regime). CMS per Cormode & Muthukrishnan 2005.
  */
object Sketches {

  private def h32(c: Column): Column = Dedup.md5Hash32(c)

  /** HLL registers at `groupCols` grain over distinct `keyCol` values:
    * one row per (group, bucket) with the max rank observed. bucket =
    * h mod m; rank = trailing zeros of (h div m) + 1 (the Flajolet ρ),
    * with the h-div-m = 0 degenerate pinned to the max rank 27
    * (32 − 6 + 1 at m = 64). `m` must be a power of two.
    */
  def hllRegisters(items: DataFrame, keyCol: String,
      groupCols: Seq[String], m: Int): DataFrame = {
    require(m > 0 && (m & (m - 1)) == 0, s"m=$m must be a power of two")
    val h = h32(col(keyCol))
    val h2 = floor(h / m).cast("long")
    val rank = when(h2 === 0, lit(33 - (31 - Integer.numberOfLeadingZeros(m))))
      .otherwise(bit_count(h2.bitwiseAND(-h2) - 1) + 1)
    items
      .where(col(keyCol).isNotNull) // null is absence, not a value to count
      .select((groupCols.map(col) :+ pmod(h, lit(m.toLong)).as("bucket")
        :+ rank.as("__r")): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("__r")).cast("long").as("register"))
  }

  /** Merge register tables (max per (group, bucket)) — associativity is
    * the whole point: registers from shards/days/sources combine into
    * the union's registers without touching raw data. */
  def hllMerge(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers.groupBy(groupCols.map(col): _*)
      .agg(max(col("register")).as("register"))

  /** The HLL estimate per group from a register table, in integer
    * micro-units: raw E = αm · m² / (Σ 2^−M_j + (m − observed) · 2⁰),
    * with the standard small-range correction — when E ≤ 2.5m and some
    * buckets are empty, linear counting m · ln(m / V) replaces it
    * (Flajolet et al. 2007 §4; the 2³²-range correction is irrelevant at
    * a 26-bit rank domain). `alphaM` must match m (0.709 at m = 64).
    * Every branch is the same Double expression in the SQL oracle, so
    * the branch decision and the value reproduce exactly. */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String], m: Int,
      alphaM: Double): DataFrame = {
    val raw = lit(alphaM * m * m) / col("__z")
    val corrected = when(raw <= lit(2.5 * m) && col("__v") > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / col("__v"))).otherwise(raw)
    registers.groupBy(groupCols.map(col): _*)
      .agg((sum(pow(lit(2.0), -col("register"))) +
        (lit(m) - count(lit(1))) * lit(1.0)).as("__z"),
        (lit(m) - count(lit(1))).as("__v"))
      .select(groupCols.map(col) :+
        floor(corrected * 1000000 + 0.5).cast("long").as("est_micro"): _*)
  }

  /** Count-min counter table over `keyCol` occurrences: `depth` hash
    * rows × `width` columns; counter (i, j) accumulates every item with
    * h_i(item) = j, where h_i salts the md5 with the row index. Merge
    * across shards = elementwise SUM (associative). */
  def cmsCounters(items: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"depth=$depth width=$width")
    items
      .where(col(keyCol).isNotNull)
      .select(explode(sequence(lit(0), lit(depth - 1))).as("row"),
        col(keyCol).as("__k"))
      .select(col("row"),
        pmod(h32(concat(col("row").cast("string"), lit(":"), col("__k"))),
          lit(width.toLong)).as("col"))
      .groupBy("row", "col")
      .agg(count(lit(1)).as("n"))
  }

  /** Point lookups against a counter table: the CMS estimate for each
    * distinct probe key is min_i counters[i][h_i(key)] — an upper-biased
    * estimate (≥ true count, equality for keys no other key collides
    * with on every row). Probes broadcast; the counter table is tiny. */
  def cmsLookup(counters: DataFrame, probes: DataFrame,
      keyCol: String, depth: Int, width: Int): DataFrame = {
    val probeHashed = probes
      .select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col(keyCol), col("row"),
        pmod(h32(concat(col("row").cast("string"), lit(":"), col(keyCol))),
          lit(width.toLong)).as("col"))
    probeHashed.join(broadcast(counters), Seq("row", "col"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_n"))
  }

  // -------------------------------------------------------------------
  // Misra-Gries heavy hitters — the third mergeable leg (HLL answers
  // "how many distinct", CMS answers "how often is THIS one", MG answers
  // "which ones are frequent" without a probe set)
  // -------------------------------------------------------------------

  /** The (k+1)-th largest count per group ("t") from a count table via
    * a COUNT-OF-COUNTS histogram: t = max{v : #items with count ≥ v
    * ≥ k+1} (0 when the group has ≤ k items). The only window runs
    * over DISTINCT COUNT VALUES per group — a Zipf corpus has a few
    * hundred of those no matter how wide the vocabulary — never over
    * the items themselves, so no per-group vocab sort exists anywhere
    * on this path. */
  private def mgThreshold(counts: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = counts.groupBy((groupCols :+ "__c").map(col): _*)
      .agg(count(lit(1)).as("__nit"))
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(groupCols.map(col): _*))
      .orderBy(col("__c").desc)
    val withGe = hist.withColumn("__ge", sum(col("__nit")).over(w))
    val agg = coalesce(max(when(col("__ge") >= k + 1, col("__c"))), lit(0L))
      .as("__t")
    if (groupCols.isEmpty) withGe.agg(agg)
    else withGe.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Attach the threshold and keep the offset summary: items with
    * count > t survive with `mg_cnt = count − t` and carry the sketch's
    * accumulated offset `mg_err = prevErr + t`. */
  private def mgTruncate(counts: DataFrame, keyCol: String,
      groupCols: Seq[String], k: Int, prevErr: Column): DataFrame = {
    val t = mgThreshold(counts, groupCols, k)
    val joined =
      if (groupCols.isEmpty) counts.crossJoin(broadcast(t))
      else counts.join(broadcast(t), groupCols)
    joined.where(col("__c") > col("__t"))
      .select(groupCols.map(col) ++ Seq(col(keyCol),
        (col("__c") - col("__t")).as("mg_cnt"),
        (prevErr + col("__t")).as("mg_err")): _*)
  }

  /** Misra-Gries heavy-hitter summary at `groupCols` grain, in the
    * canonical order-free OFFSET form (Agarwal et al., "Mergeable
    * Summaries", PODS 2012): from exact per-group counts, subtract the
    * (k+1)-th largest count t and keep the ≤ k items that stay
    * positive. Stored counts are deterministic functions of the
    * MULTISET (no stream order anywhere), so the identical table falls
    * out of a SQL replay. Guarantee per item: mg_cnt ≤ true count ≤
    * mg_cnt + mg_err (an item absent from the sketch has true count ≤
    * mg_err), with mg_err ≤ group total / (k+1). Scale shape: one hash
    * aggregation over items (map-side combine), one histogram
    * aggregation, one window over distinct count VALUES (tiny), one
    * broadcast join back — the output is ≤ k rows per group, the
    * scan-once/merge-forever grain. */
  def mgSketch(items: DataFrame, keyCol: String, groupCols: Seq[String],
      k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    val counts = items.where(col(keyCol).isNotNull)
      .groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
    mgTruncate(counts, keyCol, groupCols, k, lit(0L))
  }

  // -------------------------------------------------------------------
  // HDR-style quantile histogram — the fourth mergeable leg (HLL =
  // distinct, CMS = point frequency, MG = heavy hitters, HDR = quantiles)
  // -------------------------------------------------------------------

  /** Log-bucketed histogram over NON-NEGATIVE Long values (callers scale
    * doubles to micro-units first), after the HdrHistogram bucketing
    * scheme (Gil Tene's public design): values below 2^subBits map to
    * themselves; larger values keep their top `subBits` mantissa bits —
    * bucket = ((level − s + 1) << s) | ((v >> (level − s)) & (2^s − 1))
    * with level = floor(log₂ v) computed INTEGER-EXACTLY as
    * `length(bin(v)) − 1` (no floating log anywhere, so the same bucket
    * falls out of any engine). Relative error ≤ 2^−s per bucket. One
    * hash aggregation, map-side combined; the sketch is ≤ 64·2^s rows
    * per group — mergeable by plain count SUM, exactly associative. */
  def hdrHistogram(items: DataFrame, valueCol: String,
      groupCols: Seq[String], subBits: Int): DataFrame = {
    require(subBits >= 1 && subBits <= 16, s"subBits=$subBits")
    val s = subBits
    val v = col(valueCol).cast("long")
    items.where(v.isNotNull && v >= 0)
      .select((groupCols.map(col) :+ v.as("__v")): _*)
      // floor(log2 v) with NO floating log: binary-string length − 1 is
      // integer-exact in every engine (DuckDB: length(printf('%b', v)))
      .withColumn("__lvl",
        expr("length(conv(CAST(__v AS STRING), 10, 2)) - 1"))
      .withColumn("bucket", expr(
        s"CASE WHEN __v < ${1L << s} THEN __v ELSE " +
          s"CAST(__lvl - $s + 1 AS BIGINT) * ${1L << s} + " +
          s"(shiftright(__v, __lvl - $s) & ${(1L << s) - 1L}) END"))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** Merge histograms down to `groupCols` grain: SUM per bucket — exact
    * and associative, so merged == direct bit-for-bit (unlike MG there
    * is no truncation: the certificate is equality, not a bracket). */
  def hdrMerge(hists: DataFrame, groupCols: Seq[String]): DataFrame =
    hists.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(col("n")).as("n"))

  /** Quantile estimates from a histogram: for each (qNum, qDen) the
    * value lower-bound of the first bucket whose cumulative count
    * reaches rank ceil(qNum·N / qDen) — all-integer rank arithmetic
    * (quantiles arrive as fractions, never doubles), one window over
    * the per-group BUCKETS (≤ 64·2^s rows), and an integer inverse of
    * the bucket function for the reported value. True quantile lies in
    * [est, est·(1 + 2^−s)). */
  def hdrQuantiles(hist: DataFrame, groupCols: Seq[String], subBits: Int,
      qs: Seq[(Int, Int)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty && qs.forall { case (n, d) => n >= 0 && n <= d && d > 0 })
    val s = subBits
    val w = (if (groupCols.isEmpty) Window.partitionBy()
             else Window.partitionBy(groupCols.map(col): _*))
      .orderBy(col("bucket"))
    val cum = hist
      .withColumn("__cum", sum(col("n")).over(w))
      .withColumn("__tot",
        if (groupCols.isEmpty) sum(col("n")).over(Window.partitionBy())
        else sum(col("n")).over(Window.partitionBy(groupCols.map(col): _*)))
    val qRows = qs.map { case (n, d) => struct(lit(n).as("qn"), lit(d).as("qd")) }
    cum.withColumn("__lb", expr(
        s"CASE WHEN bucket < ${1L << s} THEN bucket ELSE " +
          s"shiftleft(${1L << s} + (bucket & ${(1L << s) - 1L}), " +
          s"CAST(bucket div ${1L << s} AS INT) - 1) END"))
      .select((groupCols.map(col) :+ col("__cum") :+ col("__tot") :+
        col("__lb") :+ explode(array(qRows: _*)).as("__q")): _*)
      .select(groupCols.map(col) :+ col("__q.qn").as("q_num") :+
        col("__q.qd").as("q_den") :+ col("__cum") :+ col("__tot") :+
        col("__lb"): _*)
      // rank = ceil(qn·N/qd) in integers; keep the FIRST bucket at/past it
      .where(col("__cum") >=
        expr("(__tot * q_num + q_den - 1) div q_den"))
      .groupBy((groupCols :+ "q_num" :+ "q_den").map(col): _*)
      .agg(min(col("__lb")).as("est"))
  }

  /** Merge MG sketches down to `groupCols` grain (collapsing every other
    * dimension column): sum stored counts per item, then re-truncate at
    * the merged (k+1)-th largest — the associative fold of the offset
    * form. `mg_err` accumulates every offset subtracted along the way
    * (Σ input-sketch offsets + the merge's own t), so the
    * `mg_cnt ≤ true ≤ mg_cnt + mg_err` bracket keeps holding after any
    * number of merge generations. One degenerate caveat, documented
    * rather than papered over: a shard whose every surviving count
    * ties exactly at its t produces an EMPTY sketch and its offset rows
    * vanish from the error ledger — merged VALUES stay valid
    * undercounts; only the error-bound column can understate in that
    * measure-zero case. */
  def mgMerge(sketches: DataFrame, keyCol: String, groupCols: Seq[String],
      k: Int): DataFrame = {
    require(k > 0, s"k=$k")
    val dims = sketches.columns
      .filterNot(c => c == keyCol || c == "mg_cnt" || c == "mg_err").toSeq
    // one row per input sketch (its full dim tuple) → summed offsets
    val errs = sketches.select((dims :+ "mg_err").distinct.map(col): _*)
      .distinct()
    val errAgg =
      if (groupCols.isEmpty) errs.agg(sum("mg_err").as("__preverr"))
      else errs.groupBy(groupCols.map(col): _*)
        .agg(sum("mg_err").as("__preverr"))
    val counts = sketches
      .groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(sum("mg_cnt").as("__c"))
    val withErr =
      if (groupCols.isEmpty) counts.crossJoin(broadcast(errAgg))
      else counts.join(broadcast(errAgg), groupCols)
    mgTruncate(withErr, keyCol, groupCols, k, col("__preverr"))
      .select(groupCols.map(col) ++
        Seq(col(keyCol), col("mg_cnt"), col("mg_err")): _*)
  }
}
