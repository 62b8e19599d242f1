package graft.search

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic random hyperplanes derived from md5 of
    * (seed, table, bit, dim) — a pure function of the seed, so the SAME
    * plane weights can be inlined as literals into both the Spark plan and
    * the DuckDB oracle SQL (no engine-private RNG in the contract surface).
    * Each weight is uniform on [-1, 1] at 1e-6 resolution.
    */
  def seededPlanes(tables: Int, bits: Int, dim: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables, bits, dim) { (t, b, d) =>
      val hex = mdig.digest(s"lshplane:$seed:$t:$b:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      (h % 2000001L - 1000000L) / 1000000.0
    }
  }

  /** Sign-pattern bucket key of `vec` under one table's hyperplanes. */
  private def bucketKey(vec: Column, planes: Array[Array[Double]]): Column =
    concat(planes.map { plane =>
      val dot = aggregate(
        zip_with(vec, typedLit(plane.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }.toIndexedSeq: _*)

  /** Seeded random-hyperplane near-dup pairs (a < b): bucket by sign
    * patterns over `tables` × `bits` hyperplanes, candidate pairs within any
    * shared bucket, exact L2 confirm ≤ `threshold`. Same banding shape as
    * the MLlib path above but fully oracle-replayable.
    *
    * The candidate join is quadratic PER BUCKET (there are only 2^bits
    * sign patterns per table, so a degenerate bucket of B ids yields B²/2
    * pairs); `maxBucket` drops buckets beyond the cap — the same skew
    * guard as Dedup.lshCandidatePairs/simhashPairs, lossy only for
    * buckets a pairwise confirm could never afford anyway. The generated
    * oracle replays the uncapped regime (fixture buckets sit far below
    * the cap). Shuffled input is (bucket, doc) rows — tables·n.
    *
    * The cap default is 4096 — ~8M candidate pairs per degenerate
    * bucket, the most a confirm stage should pay for one sign pattern.
    * (The 100× scale probe planted a worked counterexample: replicas
    * translated along one axis saturate every hyperplane sign, each
    * replica collapses into ONE bucket, and with the old 100 000 cap
    * the candidate join ran quadratic into a single spilling reducer
    * for 35 minutes. A cap only guards what it actually bounds.)
    *
    * Fixed `bits` also means a FIXED 2^bits·tables pattern space: bucket
    * occupancy — and with it total candidates — grows quadratically with
    * corpus size once n ≫ tables·2^bits. For a growing corpus use
    * [[seededNearDupPairsScaled]], which sizes bits ~ log2(n) so
    * occupancy stays constant.
    */
  def seededNearDupPairs(emb: DataFrame, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 1.2, tables: Int = 4, bits: Int = 8,
      seed: Long = 42L, maxBucket: Int = 4096): DataFrame = {
    val planes = seededPlanes(tables, bits, dim, seed)
    val e = emb.select(col(idCol).as("id"), col(vecCol).as("v"))
    // narrow (id, bkey) table materialized once: it feeds the bucket
    // count and BOTH self-join sides — the sign-pattern computation
    // (tables×bits×dim flops/row) must not run three times
    val bucketed = e.select(col("id"),
      explode(array((0 until tables).map(t =>
        concat(lit(s"$t:"), bucketKey(col("v"), planes(t)))): _*)).as("bkey"))
      .localCheckpoint()
    val okKeys = bucketed.groupBy("bkey").agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxBucket).select("bkey")
    val capped = bucketed.join(okKeys, Seq("bkey"))
    val pairs = capped.as("x")
      .join(capped.select(col("id").as("id2"), col("bkey")).as("y"), Seq("bkey"))
      .where(col("id") < col("id2"))
      .select(col("id").as("a"), col("id2").as("b"))
      .distinct()
    pairs
      .join(e.select(col("id").as("a"), col("v").as("va")), Seq("a"))
      .join(e.select(col("id").as("b"), col("v").as("vb")), Seq("b"))
      .select(col("a"), col("b"),
        sqrt(aggregate(
          zip_with(col("va"), col("vb"), (x, y) => {
            val d = x.cast("double") - y.cast("double"); d * d
          }),
          lit(0.0), (acc, v) => acc + v)).as("dist"))
      .where(col("dist") <= threshold)
  }

  /** Hyperplane count that keeps expected bucket occupancy near
    * `targetBucket` for a corpus of `n` vectors: 2^bits ≈ n/targetBucket
    * (floored at `minBits` so tiny corpora keep useful recall). */
  def autoBits(n: Long, targetBucket: Int = 64, minBits: Int = 8): Int =
    math.max(minBits,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) /
        math.log(2.0)).toInt)

  /** [[seededNearDupPairs]] with `bits` derived from the corpus COUNT via
    * [[autoBits]] — the log2(n) plane growth that keeps per-bucket
    * occupancy (and total candidate pairs, ≈ n·targetBucket·tables/2)
    * LINEAR in corpus size instead of quadratic. The count is one cheap
    * aggregation over the id column; everything downstream is the same
    * banding. This is the variant a growing 100 TB corpus runs — fixed
    * bits are only right when n is known and static (the fixtures, and
    * the oracle replay, which needs the plane set to be a function of
    * the SEED alone).
    */
  def seededNearDupPairsScaled(emb: DataFrame, dim: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      threshold: Double = 1.2, tables: Int = 4, targetBucket: Int = 64,
      seed: Long = 42L, maxBucket: Int = 4096): DataFrame = {
    val n = emb.select(idCol).count()
    seededNearDupPairs(emb, dim, idCol, vecCol, threshold, tables,
      autoBits(n, targetBucket), seed, maxBucket)
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
