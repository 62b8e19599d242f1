package graft.index

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA rotation / dimensionality reduction for embedding columns — the
  * OPQ-style learned rotation the reference's faiss path exposes via
  * `index_factory("OPQM,PQMxB")` (MEVI/pq.py:186-190; SURVEY §2.8 V3
  * dropped it because no shipped config used it). Reinstated here the
  * Spark-first way: MLlib fits the principal components once (driver-side
  * eigendecomposition of the Gramian — the rotation matrix is d×k floats,
  * codebook-sized), and projection is a deterministic per-row expression.
  *
  * Typical uses in an embedding pipeline: decorrelate/compact vectors
  * before residual quantization (OPQ), shrink ANN index footprint, or
  * whiten before cosine thresholds in near-dup mining.
  *
  * Determinism contract: [[project]] does NOT call `PCAModel.transform`
  * (BLAS gemv accumulation order is an implementation detail); it expands
  * the trained components into the same sequential double-fold
  * `aggregate` expression every other kernel in this library uses, so the
  * DuckDB oracle can replay the projection bit-exactly from inlined
  * component literals (GeneratedOracles.pcaProjectSql).
  *
  * Scale: the fit is one pass to accumulate a d×d Gramian (treeAggregate
  * inside MLlib RowMatrix) — d=768 → 2.3 MB of driver state; projection
  * is map-side only, no shuffle.
  */
object PcaRotation {

  /** Trained rotation: `components(j)` is the j-th principal axis (length
    * d, unit norm); projecting keeps k of d dimensions. */
  case class Rotation(components: Array[Array[Double]]) {
    def k: Int = components.length
    def dim: Int = components.headOption.map(_.length).getOrElse(0)
  }

  /** Fit k principal components on `vecCol` (ARRAY<FLOAT/DOUBLE>). MLlib
    * PCA centers the covariance internally but projects UN-centered
    * vectors; we mirror that convention (a rotation, not an affine map) so
    * inner products are preserved exactly on the kept subspace. */
  def fit(df: DataFrame, vecCol: String, k: Int): Rotation = {
    val pca = new PCA().setK(k).setInputCol("__v").setOutputCol("__p")
    val model = pca.fit(
      df.select(array_to_vector(col(vecCol).cast("array<double>")).as("__v")))
    // pc is d×k column-major; column j = component j
    val pc = model.pc
    val comps = Array.tabulate(k) { j =>
      Array.tabulate(pc.numRows)(i => pc(i, j))
    }
    Rotation(comps)
  }

  /** Projection of one vector column onto the rotation: ARRAY<DOUBLE> of
    * length k, each element a sequential-fold double dot (same
    * accumulation semantics as VectorOps.vecDot, hence DuckDB-replayable).
    */
  def projectExpr(vecCol: Column, rot: Rotation): Column = {
    val dots = rot.components.map { comp =>
      val lits = array(comp.map(lit): _*)
      aggregate(
        zip_with(vecCol.cast("array<double>"), lits, (x, c) => x * c),
        lit(0.0),
        (acc, x) => acc + x)
    }
    array(dots: _*)
  }

  /** df with `outCol` = the k-dim projection of `vecCol`. */
  def project(df: DataFrame, vecCol: String, rot: Rotation,
      outCol: String = "proj"): DataFrame =
    df.withColumn(outCol, projectExpr(col(vecCol), rot))
}
