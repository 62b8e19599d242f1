package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.VectorOps

/** The ip→l2 metric reduction as an INDEXING strategy — the reference's
  * `dist_mode = iptol2` (MEVI/pq.py:82-119, augment_xb/augment_xq): docs
  * gain a `sqrt(φ − ‖p‖²)` coordinate, queries gain 0, and then
  *
  *   ‖aug(q) − aug(p)‖² = ‖q‖² + φ − 2·q·p
  *
  * is monotone in the inner product. Training the (L2) residual quantizer
  * on augmented vectors therefore yields an index whose assignment and
  * beam probe ARE inner-product geometry — the bridge
  * [[graft.search.CoarseFineRetriever]]'s design note calls for when ip
  * retrieval needs an ip-consistent index.
  */
object IpToL2 {

  /** φ must dominate every doc norm; returns max ‖p‖² (+ ε headroom). */
  def phiFor(docs: DataFrame, vecCol: String = "vec"): Double = {
    val row = docs.agg(max(VectorOps.vecNorm2Sq(col(vecCol)))).head
    require(!row.isNullAt(0),
      s"phiFor: corpus is empty or '$vecCol' is all-null — cannot derive φ")
    row.getDouble(0) + 1e-6
  }

  /** Docs with the augmented coordinate appended (dim + 1). */
  def augmentDocs(docs: DataFrame, phi: Double,
      vecCol: String = "vec"): DataFrame =
    docs.withColumn(vecCol,
      VectorOps.ipToL2AugmentDoc(col(vecCol), lit(phi)))

  /** Queries with a zero coordinate appended (dim + 1). */
  def augmentQueries(queries: DataFrame,
      vecCol: String = "qvec"): DataFrame =
    queries.withColumn(vecCol, VectorOps.ipToL2AugmentQuery(col(vecCol)))

  /** Train an ip-consistent RQ codebook: L2 KMeans over augmented docs.
    * Assignment/probing with augmented vectors then ranks by inner
    * product of the ORIGINAL vectors.
    */
  def fit(docs: DataFrame, phi: Double, vecCol: String,
      numLevels: Int, k: Int, seed: Long = 42L): Codebook =
    RQTrainer.fit(augmentDocs(docs, phi, vecCol), vecCol, numLevels, k, seed)
}
