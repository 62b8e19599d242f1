package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.index.{Codebook, RQTrainer, CodeAssigner}

/** IVF-style approximate nearest neighbor: one KMeans level partitions the
  * corpus into cells; a query probes its `nprobe` closest cells and
  * re-ranks exactly inside them. This is the reference's own coarse→fine
  * shape (and its faiss `IVF100,Flat` baseline, MEVI/faiss_search.py:88)
  * rebuilt from the RQ machinery with M=1.
  *
  * Scale: the cell assignment table is partitioned by cell id, so a probe
  * join prunes to nprobe/K of the corpus; candidate scoring reuses the
  * bounded top-k aggregator (map-side pruned shuffle).
  */
object IVFIndex {

  case class IVF(codebook: Codebook, cells: DataFrame)

  /** Train the cell structure: (doc_id, cell INT) partitioned by cell. */
  def build(docs: DataFrame, k: Int, seed: Long = 42L): IVF = {
    val cb = RQTrainer.fit(docs, "vec", numLevels = 1, k = k, seed = seed)
    val cells = CodeAssigner.assign(docs, cb)
      .select(col("doc_id"), col("codes").getItem(0).as("cell"))
      .repartition(col("cell"))
    IVF(cb, cells)
  }

  /** The nearest-`nprobe` cells of a broadcast 1-level codebook, as a
    * UDF — ONE definition of the probe (L2 fold order and the (dist,
    * cell) tie-break are part of the oracle-replay contract), shared by
    * [[search]] and [[IVFPQ.search]]. */
  private[search] def probeCellsUdf(
      bc: org.apache.spark.broadcast.Broadcast[Codebook], nprobe: Int) =
    udf { (qvec: Array[Float]) =>
      val cents = bc.value.levels(0)
      cents.indices
        .map { c =>
          val cent = cents(c)
          var d = 0.0
          var j = 0
          while (j < qvec.length) {
            val diff = qvec(j).toDouble - cent(j).toDouble
            d += diff * diff
            j += 1
          }
          (c, d)
        }
        .sortBy { case (c, d) => (d, c) }
        .take(nprobe).map(_._1)
    }

  /** Probe top-`nprobe` cells per query, exact re-rank inside them.
    * Returns (query_id, rank, doc_id, score).
    */
  def search(queries: DataFrame, ivf: IVF, docs: DataFrame,
      nprobe: Int, k: Int, metric: String = "ip"): DataFrame = {
    val bc = queries.sparkSession.sparkContext.broadcast(ivf.codebook)
    val probeUdf = probeCellsUdf(bc, nprobe)
    // candidates carry only (query_id, doc_id); qvec re-attaches via the
    // broadcast join below, so the shuffle never duplicates query vectors
    // per candidate row
    val candidates = queries
      .select(col("query_id"), explode(probeUdf(col("qvec"))).as("cell"))
      .join(ivf.cells, Seq("cell"))
      .select("query_id", "doc_id")

    val scored = candidates
      .join(docs, Seq("doc_id"))
      .join(broadcast(queries), Seq("query_id"))
      .select(col("query_id"), col("doc_id"),
        BruteForceKNN.score(metric)(col("qvec"), col("vec")).as("score"))

    TopK.ranked(scored, k)
  }
}
