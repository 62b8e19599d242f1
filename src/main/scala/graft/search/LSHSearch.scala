package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector

/** MLlib random-hyperplane LSH over the embedding column — the engine's
  * second approximate path next to [[IVFIndex]], mirroring the reference's
  * faiss ANN baseline role (MEVI/faiss_search.py:13-21; SURVEY §2.8 V9
  * "approximate = MLlib BucketedRandomProjectionLSH").
  */
object LSHSearch {

  /** Near-dup pairs (a < b) within `threshold` Euclidean distance, found
    * via bucketed candidate generation (no O(n²) scan). Deterministic for a
    * fixed seed.
    */
  def nearDupPairs(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", threshold: Double = 1.2,
      bucketLength: Double = 0.5, numTables: Int = 3,
      seed: Long = 42L): DataFrame = {
    val df = emb.select(col(idCol).as("id"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numTables)
      .setSeed(seed).setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(df)
    model.approxSimilarityJoin(df, df, threshold, "dist")
      .select(col("datasetA.id").as("a"), col("datasetB.id").as("b"),
        col("dist"))
      .where(col("a") < col("b"))
  }

  /** Top-k nearest neighbors for one query vector via LSH candidates. */
  def topK(emb: DataFrame, query: Array[Float], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      bucketLength: Double = 0.5, numTables: Int = 3,
      seed: Long = 42L): DataFrame = {
    val df = emb.select(col(idCol).as("id"),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numTables)
      .setSeed(seed).setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(df)
    val q = org.apache.spark.ml.linalg.Vectors.dense(query.map(_.toDouble))
    model.approxNearestNeighbors(df, q, k, "dist").select("id", "dist")
  }
}
