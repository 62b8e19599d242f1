package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector

/** Plain product quantization — the reference's `--pq_type pq` mode
  * (MEVI/pq.py:249-279 assignment, :175-198 faiss "PQMxB" build): the
  * vector is SLICED into M contiguous sub-vectors and each slice gets an
  * independent K-centroid codebook. Contrast with [[Codebook]]/RQ
  * (`pq_type rq`, the shipped configs): RQ quantizes full-width residuals
  * sequentially; PQ quantizes disjoint slices independently — M
  * INDEPENDENT KMeans fits (no level-to-level data dependency) and an
  * assignment that is argmin per slice with no residual chain.
  *
  * Reconstruction is concatenation of the chosen centroids
  * (MEVI/pq.py:743-799, pq branch).
  *
  * Scale posture matches RQ's: the codebook (M × K × dim/M floats = the
  * same M·K·dim budget as RQ) is the only broadcast state; training fits
  * each slice over a column-pruned projection; assignment is
  * zero-shuffle map-side arithmetic.
  */
case class PQCodebook(subs: Array[Array[Array[Float]]]) extends Serializable {
  def numSub: Int = subs.length
  def k: Int = subs.headOption.map(_.length).getOrElse(0)
  def subDim: Int = subs.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)
  def dim: Int = numSub * subDim

  /** Per-slice argmin-L2 assignment (MEVI/pq.py:249-279); ties → lowest
    * code id. Double accumulation in slice order — engine-replayable. */
  def assign(vec: Array[Float]): Array[Int] = {
    val d = new Array[Double](vec.length)
    var i = 0
    while (i < vec.length) { d(i) = vec(i).toDouble; i += 1 }
    assignDouble(d)
  }

  /** Double-input form — IVF-PQ assigns RESIDUALS, which are exact in
    * double (float − float) but would round if narrowed to float first;
    * the oracle computes them in double, so this path must too. */
  def assignDouble(vec: Array[Double]): Array[Int] = {
    require(vec.length == dim, s"dim ${vec.length} != codebook dim $dim")
    val codes = new Array[Int](numSub)
    var m = 0
    while (m < numSub) {
      val off = m * subDim
      val cents = subs(m)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d = 0.0
        var j = 0
        while (j < subDim) {
          val diff = vec(off + j) - cent(j).toDouble
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(m) = best
      m += 1
    }
    codes
  }

  /** PQ reconstruction = concatenation of per-slice centroids. */
  def reconstruct(codes: Array[Int]): Array[Float] = {
    val out = new Array[Float](dim)
    var m = 0
    while (m < numSub) {
      val cent = subs(m)(codes(m))
      System.arraycopy(cent, 0, out, m * subDim, subDim)
      m += 1
    }
    out
  }
}

object PQTrainer {

  /** Fits M independent KMeans codebooks, one per contiguous slice of
    * `vecCol`. `dim` must divide evenly by `numSub` (the reference asserts
    * the same, pq.py subvector slicing). Each fit reads only its slice
    * (column-pruned projection), and the M fits share one cached slice
    * table — the input is scanned once, not M times.
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      numSub: Int,
      k: Int,
      seed: Long = 42L,
      maxIter: Int = 20): PQCodebook = {
    val dim = df.select(size(col(vecCol))).head.getInt(0)
    require(dim % numSub == 0, s"dim $dim not divisible by numSub $numSub")
    val subDim = dim / numSub

    val sliced = df.select((0 until numSub).map { m =>
      array_to_vector(
        slice(col(vecCol).cast("array<double>"), m * subDim + 1, subDim))
        .as(s"f$m")
    }: _*).persist()
    sliced.count()

    val subsArr = (0 until numSub).map { m =>
      val km = new KMeans()
        .setK(k).setSeed(seed + m).setMaxIter(maxIter)
        .setFeaturesCol(s"f$m").setPredictionCol("cluster")
      km.fit(sliced).clusterCenters.map(_.toArray.map(_.toFloat))
    }.toArray
    sliced.unpersist()
    PQCodebook(subsArr)
  }
}

object PQAssigner {

  /** (idCol, vecCol) → (idCol, codes ARRAY<INT>) with a broadcast
    * codebook — zero shuffle. */
  def assign(
      df: DataFrame,
      codebook: PQCodebook,
      idCol: String = "doc_id",
      vecCol: String = "vec"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(codebook)
    val assignUdf = udf { (vec: Array[Float]) => bc.value.assign(vec) }
    df.select(col(idCol), assignUdf(col(vecCol)).as("codes"))
  }

  /** (idCol, rec ARRAY<FLOAT>): reconstruct-from-assignment, plus the
    * per-row quantization error ‖x − rec‖ (double fold). */
  def reconstructWithError(
      df: DataFrame,
      codebook: PQCodebook,
      idCol: String = "doc_id",
      vecCol: String = "vec"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(codebook)
    val recUdf = udf { (vec: Array[Float]) =>
      val cb = bc.value
      val rec = cb.reconstruct(cb.assign(vec))
      (rec, graft.core.VectorOps.l2DiffNorm(vec, rec))
    }
    df.select(col(idCol), recUdf(col(vecCol)).as("r"))
      .select(col(idCol), col("r._1").as("rec"), col("r._2").as("recon_error"))
  }
}
