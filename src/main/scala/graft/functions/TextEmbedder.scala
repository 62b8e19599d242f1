package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** V1 stand-in encoder: deterministic hashing bag-of-words embedding.
  *
  * The reference's document/query encoder is an opaque trained T5/BERT
  * tower (MEVI/document_encoder.py:104-126) that the engine treats as a
  * pluggable `text → ARRAY<FLOAT>` stage (SURVEY §2.8 V1). This is the
  * self-contained default plug: token → md5 bucket → counts → L2-normalized
  * dense vector. Fully relational (explode → count → dense assemble), so it
  * scales like a word-count and is oracle-reproducible; a real encoder
  * replaces it via the same mapPartitions contract without touching
  * downstream operators.
  */
object TextEmbedder {

  /** (idCol, vec ARRAY<FLOAT> of length dim, L2-normalized). */
  def hashEmbed(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dim: Int = 64): DataFrame =
    hashEmbedTokens(
      docs.select(col(idCol), Dedup.tokens(col(textCol)).as("__toks")),
      idCol, "__toks", dim)

  /** [[hashEmbed]] over a PRE-TOKENIZED stream: same md5-bucket
    * bag-of-tokens vector, but the token array column is taken as-is —
    * the seam that lets a learned tokenizer (BPE, P11) feed the V1
    * encoder in one chained pipeline. Docs with an empty token array
    * produce no row (an all-zero bag has no L2 direction). */
  def hashEmbedTokens(docs: DataFrame, idCol: String = "doc_id",
      toksCol: String = "toks", dim: Int = 64): DataFrame = {
    val counts = docs
      .select(col(idCol), explode(col(toksCol)).as("__t"))
      .select(col(idCol), pmod(Dedup.md5Hash32(col("__t")), lit(dim.toLong)).as("__b"))
      .groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val dense = counts
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__c")))).as("__m"))
      .select(col(idCol),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("__m"), i), lit(0L)).cast("double")).as("__raw"))
    dense.select(col(idCol),
      transform(col("__raw"), x =>
        (x / sqrt(aggregate(col("__raw"), lit(0.0), (acc, v) => acc + v * v)))
          .cast("float")).as("vec"))
  }

  /** SECOND encoder through the same V1 seam — a trained MLlib Word2Vec
    * (skip-gram) whose fit is the opaque-model step and whose word
    * vectors are the inlinable artifact (the oracle replays application
    * from them, exactly like the reranker inlines its LR weights).
    * Deterministic fit: one partition, doc_id-sorted sentences, fixed
    * seed. Scale boundary, on purpose: the single-partition sort makes
    * the FIT serial — it is the engine-side test twin of the opaque
    * trained-model step (real encoders train outside the engine on
    * accelerators, ref MEVI/document_encoder.py); the APPLICATION path
    * ([[word2vecApply]]) is the part the engine owns at 100 TB and is
    * fully distributed. Returns the trained token → float-vector
    * table, SMALL by construction (vocab-sized), ready to broadcast. */
  def word2vecTrain(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", dim: Int = 16,
      seed: Long = 42L, maxFitDocs: Long = 100000L): Seq[(String, Array[Float])] = {
    import org.apache.spark.ml.feature.Word2Vec
    val sentences = docs
      .select(col(idCol), Dedup.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
      .orderBy(col(idCol)).coalesce(1)
    // the deterministic single-partition fit is a SERIAL scale boundary
    // (see Scaladoc) — refuse corpora it was never meant for instead of
    // hanging one task; real encoders train outside the engine
    val nDocs = sentences.limit((maxFitDocs + 1).toInt).count()
    require(nDocs <= maxFitDocs,
      s"word2vecTrain is the deterministic single-partition test twin of " +
        s"the opaque trained-encoder step (ref MEVI/document_encoder.py) " +
        s"— its fit is serial by design and capped at $maxFitDocs docs " +
        s"(got > $maxFitDocs). Train real encoders outside the engine " +
        s"and plug the artifact through word2vecApply / the V1 seam.")
    val model = new Word2Vec()
      .setInputCol("toks").setOutputCol("__v")
      .setVectorSize(dim).setSeed(seed).setMinCount(1)
      .setNumPartitions(1).setMaxIter(1)
      .fit(sentences)
    model.getVectors.collect()
      .map(r => r.getString(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1)
          .toArray.map(_.toFloat))
      .sortBy(_._1).toSeq
  }

  /** Apply a trained word-vector table through the V1 mapPartitions
    * contract (the seam a real ONNX/JNI encoder plugs into,
    * ref MEVI/document_encoder.py:104-126): per doc, average the word
    * vectors of its tokens — double accumulation in token order, one
    * multiply by 1/n, then a float round — so a SQL oracle replays the
    * exact bits from the inlined vectors. Out-of-vocabulary tokens
    * count toward n but contribute zero (MLlib transform semantics).
    * Output: (idCol, vec ARRAY<FLOAT> of the training dim). */
  def word2vecApply(docs: DataFrame, wordVecs: Seq[(String, Array[Float])],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    require(wordVecs.nonEmpty, "empty word-vector table")
    val dim = wordVecs.head._2.length
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(wordVecs.toMap)
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("vec", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val rdd = docs
      .select(col(idCol).cast("long"), Dedup.tokens(col(textCol)).as("t"))
      .where(size(col("t")) > 0)
      .rdd.mapPartitions { it =>
        val wv = bc.value
        it.map { r =>
          val toks = r.getSeq[String](1)
          val acc = new Array[Double](dim)
          toks.foreach { t =>
            wv.get(t).foreach { v =>
              var i = 0
              while (i < dim) { acc(i) += v(i); i += 1 }
            }
          }
          val inv = 1.0 / toks.length
          Row(r.getLong(0), acc.map(x => (x * inv).toFloat).toSeq)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }
}
