package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed persistence for co-located joins — the 100 TB layout for the
  * hot equi-join keys (doc_id between embeddings/assignments/cluster
  * membership, J4's embedding-fetch join).
  *
  * Two tables bucketed by the same key into the same bucket count join
  * WITHOUT a shuffle: each task reads matching bucket files from both
  * sides (Spark's bucketed SortMergeJoin elides both Exchanges). At the
  * reference's corpus scale that removes the dominant shuffle of every
  * serving-path join — the per-query candidate fetch touches only the
  * buckets its doc ids hash to.
  *
  * Uses the session catalog (`saveAsTable` with an explicit `path`), which
  * is the only surface Spark exposes bucketing through — a plain
  * `parquet(path)` write cannot record bucket metadata.
  */
object Bucketing {

  /** Persist `df` bucketed (and sorted) by `key` as catalog table `name`,
    * files under `path`. Overwrites any existing table of that name. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, buckets: Int): Unit = {
    df.sparkSession.sql(s"DROP TABLE IF EXISTS $name")
    df.write
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(name)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog). */
  def readBucketed(spark: SparkSession, name: String): DataFrame =
    spark.table(name)
}
