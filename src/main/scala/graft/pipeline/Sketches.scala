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
}
