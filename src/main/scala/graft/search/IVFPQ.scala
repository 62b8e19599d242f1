package graft.search

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.index.{Codebook, PQCodebook, PQTrainer, RQTrainer}

/** IVF-PQ composite index — faiss's billion-scale workhorse
  * (`index_factory("IVFx,PQy")`; the reference's faiss path builds the
  * same families, MEVI/pq.py:175-198 / faiss_search.py:88): a coarse
  * KMeans partitions the corpus into cells, and each document stores only
  * the PQ codes of its RESIDUAL (doc − cell centroid). A query probes its
  * `nprobe` closest cells and scores candidates by asymmetric distance
  * (ADC): per probed cell, a `numSub × k` lookup table of
  * ‖query-residual-slice − centroid‖² is built ONCE, and each member doc
  * costs `numSub` table lookups instead of a `dim`-wide float scan.
  *
  * Scale posture: doc storage is `numSub` bytes of codes per vector
  * (64× smaller than raw float32 at dim 64 / 8 sub-quantizers — the
  * compression that lets 100 TB of embeddings fit an index tier); the
  * probe join prunes to nprobe/K of the corpus and is an equi-join on the
  * cell-partitioned code table; scoring shuffles candidates once
  * (repartition by (query, cell)) and aggregates through the bounded
  * top-k combiner. Both codebooks broadcast (coarse K×dim + pq M×k×dim/M
  * floats — codebook-sized, never corpus-sized).
  */
object IVFPQ {

  /** coarse: 1-level cell codebook; pq: residual sub-quantizers;
    * codes: (doc_id, cell, codes ARRAY<INT>) partitioned by cell. */
  case class Index(coarse: Codebook, pq: PQCodebook, codes: DataFrame)

  /** (doc_id, cell, resid ARRAY<DOUBLE>) — cell assignment + residual in
    * double precision (float narrowing would diverge from the exact
    * double replay). Map-side only. */
  private def residuals(docs: DataFrame, coarse: Codebook): DataFrame = {
    val bcCoarse = docs.sparkSession.sparkContext.broadcast(coarse)
    val residUdf = udf { (vec: Array[Float]) =>
      val cell = bcCoarse.value.assign(vec)(0)
      val cent = bcCoarse.value.levels(0)(cell)
      (cell, Array.tabulate(vec.length)(j => vec(j).toDouble - cent(j).toDouble))
    }
    docs
      .select(col("doc_id"), residUdf(col("vec")).as("r"))
      .select(col("doc_id"), col("r._1").as("cell"), col("r._2").as("resid"))
  }

  /** (doc_id, cell, resid) → (doc_id, cell, codes) against a frozen PQ
    * codebook — the shared tail of [[encode]] and [[build]]. */
  private def encodeResiduals(withRes: DataFrame, pq: PQCodebook): DataFrame = {
    val bcPq = withRes.sparkSession.sparkContext.broadcast(pq)
    val codeUdf = udf { (resid: Array[Double]) => bcPq.value.assignDouble(resid) }
    withRes
      .select(col("doc_id"), col("cell"), codeUdf(col("resid")).as("codes"))
      .repartition(col("cell"))
  }

  /** Re-encode a corpus against frozen codebooks: (doc_id, cell,
    * codes ARRAY<INT>) partitioned by cell. This is the cheap
    * (train-free) step — also the streaming/incremental ingest path. */
  def encode(docs: DataFrame, coarse: Codebook, pq: PQCodebook): DataFrame =
    encodeResiduals(residuals(docs, coarse), pq)

  /** Fit coarse cells, then PQ on the residuals. Input: (doc_id,
    * vec ARRAY<FLOAT>). The persisted residual frame feeds BOTH the PQ
    * fit and the code table — one coarse-assignment pass, not two. */
  def build(docs: DataFrame, coarseK: Int, numSub: Int, k: Int,
      seed: Long = 42L, maxIter: Int = 20): Index = {
    val coarse = RQTrainer.fit(docs, "vec", numLevels = 1, k = coarseK,
      seed = seed, maxIter = maxIter)
    val withRes = residuals(docs, coarse).persist()
    val pq = PQTrainer.fit(withRes, "resid", numSub, k,
      seed = seed + 1, maxIter = maxIter)
    val codes = encodeResiduals(withRes, pq).localCheckpoint()
    withRes.unpersist()
    Index(coarse, pq, codes)
  }

  /** ADC search: (query_id, rank, doc_id, dist) — dist ascending L2² of
    * the query against each candidate's RECONSTRUCTED residual position,
    * exactly the asymmetric-distance approximation faiss computes. The
    * LUT is rebuilt on each (query, cell) key change after a
    * repartition+sort, so it is computed once per probed cell, not once
    * per candidate row.
    */
  def search(queries: DataFrame, index: Index, nprobe: Int, k: Int)
      : DataFrame = {
    val spark = queries.sparkSession
    val bcCoarse = spark.sparkContext.broadcast(index.coarse)
    val bcPq = spark.sparkContext.broadcast(index.pq)
    val probeUdf = IVFIndex.probeCellsUdf(bcCoarse, nprobe)

    // qvec rides the candidate join (one probe row per (query, cell),
    // duplicated across that cell's members by the join) instead of a
    // driver collect+broadcast of the query batch — the query side can
    // now be corpus-sized (e.g. negative mining over ALL training
    // queries). Small batches still broadcast: the probe side is
    // nprobe rows per query and AQE picks the broadcast join itself.
    val cands = queries
      .select(col("query_id"), col("qvec"),
        explode(probeUdf(col("qvec"))).as("cell"))
      .join(index.codes, Seq("cell"))

    val outSchema = StructType(Seq(
      StructField("query_id", LongType), StructField("doc_id", LongType),
      StructField("score", DoubleType)))
    val scored = spark.createDataFrame(
      cands.repartition(col("query_id"), col("cell"))
        .sortWithinPartitions("query_id", "cell")
        .select("query_id", "cell", "doc_id", "codes", "qvec")
        .rdd.mapPartitions { rows =>
          val coarse = bcCoarse.value
          val pq = bcPq.value
          val (m0, kk, sd) = (pq.numSub, pq.k, pq.subDim)
          var curQ = Long.MinValue
          var curCell = -1
          var lut: Array[Array[Double]] = null
          rows.map { r =>
            val q = r.getLong(0); val cell = r.getInt(1)
            if (q != curQ || cell != curCell || lut == null) {
              // (query, cell) LUT: ‖qres slice − centroid‖² per (sub, code)
              val qvec = r.getSeq[Float](4).toArray
              val cent = coarse.levels(0)(cell)
              val qres = Array.tabulate(qvec.length)(j =>
                qvec(j).toDouble - cent(j).toDouble)
              lut = Array.tabulate(m0, kk) { (m, c) =>
                val sub = pq.subs(m)(c)
                var d = 0.0
                var j = 0
                while (j < sd) {
                  val diff = qres(m * sd + j) - sub(j).toDouble
                  d += diff * diff
                  j += 1
                }
                d
              }
              curQ = q; curCell = cell
            }
            val codes = r.getSeq[Int](3)
            var dist = 0.0
            var m = 0
            while (m < m0) { dist += lut(m)(codes(m)); m += 1 }
            Row(q, r.getLong(2), -dist) // score = −dist for the shared top-k
          }
        }, outSchema)

    TopK.ranked(scored, k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        negate(col("score")).as("dist"))
  }
}
