package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for multi-dimensional pruning and small-file
  * hygiene — the two table-maintenance jobs every 100 TB corpus needs
  * beyond `Bucketing` (co-located equi-joins) and the `c0`-partitioned
  * cluster index (single-key partition pruning).
  *
  * '''Z-order''': interleaving the bits of two filter keys gives a 1-D
  * sort order in which rows close in EITHER key land close on disk, so a
  * range-partitioned + sorted write yields files/row-groups whose per-key
  * min/max spans are narrow on BOTH keys at once. Parquet's stats-based
  * row-group pruning (predicate pushdown) then skips most of the table
  * for a conjunctive range probe — a lexicographic sort can only do this
  * for its leading key. This is the layout trick behind Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, built here from public Spark primitives:
  * `repartitionByRange` + `sortWithinPartitions` + `maxRecordsPerFile`.
  *
  * '''Compaction''': a long-running ingest (the streaming sinks under
  * `graft.streaming`) leaves thousands of KB-sized files per day;
  * scan-side scheduling cost then dwarfs the read itself. `compact`
  * rewrites a directory into ~`targetRecordsPerFile`-row files,
  * range-clustered on a key so the rewrite also restores pruning.
  *
  * Everything here is a plain batch job over DataFrames — no driver-side
  * file iteration; the only listing is Spark's own scan planning.
  */
object Layout {

  /** Morton (Z-curve) value of two non-negative integer keys: bit `i` of
    * `a` goes to position `2i+1`, bit `i` of `b` to `2i`. Keys are masked
    * to `bits` low bits (caller picks `bits` to cover the key domain —
    * 16 bits covers keys up to 65535; 20 covers ~1M). The expression is a
    * static fold of shift/and/or columns, so it stays inside whole-stage
    * codegen — no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val an = a.cast("long").bitwiseAND(lit(mask))
    val bn = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      val abit = shiftleft(shiftright(an, i).bitwiseAND(lit(1L)), 2 * i + 1)
      val bbit = shiftleft(shiftright(bn, i).bitwiseAND(lit(1L)), 2 * i)
      acc.bitwiseOR(abit).bitwiseOR(bbit)
    }
  }

  /** Write `df` to `path` Z-ordered on `(keyA, keyB)`: range-partition by
    * the interleaved z-value into `nFiles` output tasks, sort each
    * partition by it, and cap records per file. The z column is dropped
    * before writing (sort order survives projection), so the on-disk
    * schema is unchanged — readers need no knowledge of the layout; they
    * just observe that range predicates on either key prune row groups.
    */
  def writeZOrdered(df: DataFrame, path: String, keyA: String, keyB: String,
      nFiles: Int, bits: Int = 16,
      maxRecordsPerFile: Long = 0L): Unit = {
    val z = zValue(col(keyA), col(keyB), bits)
    val laid = df.withColumn("_graft_z", z)
      .repartitionByRange(nFiles, col("_graft_z"))
      .sortWithinPartitions("_graft_z")
      .drop("_graft_z")
    val w = laid.write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
       w.option("maxRecordsPerFile", maxRecordsPerFile)
     else w).parquet(path)
  }

  /** Rewrite the parquet directory at `inPath` into `outPath` with
    * ~`targetRecordsPerFile` rows per file, range-clustered (and sorted)
    * on `sortKey`. Returns (rows, filesBefore, filesAfter) so callers can
    * assert/log the layout change. File counts come from the scan's own
    * planned `inputFiles` — no driver directory walk.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      sortKey: String, targetRecordsPerFile: Long): (Long, Int, Int) = {
    val in = spark.read.parquet(inPath)
    val rows = in.count()
    val filesBefore = in.inputFiles.length
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRecordsPerFile).toInt)
    in.repartitionByRange(nFiles, col(sortKey))
      .sortWithinPartitions(sortKey)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .parquet(outPath)
    val filesAfter = spark.read.parquet(outPath).inputFiles.length
    (rows, filesBefore, filesAfter)
  }

  /** [[compact]] back into the SAME directory, via a tmp-write + rename
    * swap (write `path__compacting`, swing `path` → `path__precompact`,
    * swing tmp in, drop the old). Single-writer discipline is the
    * caller's job — the streaming sinks run it inside `foreachBatch`,
    * where Structured Streaming serializes batches. A crash between the
    * renames leaves either the old or the new directory complete under
    * one of the two names, never a partial mix; readers of a live
    * exactly-once store should use a versioned/table layout instead
    * (this is the small-file hygiene pass, not a transaction log).
    */
  def compactInPlace(spark: SparkSession, path: String, sortKey: String,
      targetRecordsPerFile: Long): (Long, Int, Int) = {
    import org.apache.hadoop.fs.Path
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "__compacting")
    val old = new Path(path + "__precompact")
    val out = compact(spark, path, tmp.toString, sortKey, targetRecordsPerFile)
    fs.delete(old, true)
    require(fs.rename(dir, old), s"compactInPlace: could not retire $dir")
    require(fs.rename(tmp, dir), s"compactInPlace: could not swing in $tmp")
    fs.delete(old, true)
    out
  }
}
