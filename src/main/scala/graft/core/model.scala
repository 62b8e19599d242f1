package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Typed public surface (SURVEY §1.3): case-class rows for the engine's
  * core tables, with `Dataset[T]` converters where compile-time field
  * checks help API users. Internals stay `DataFrame` (dynamic schema).
  */
object model {

  /** Corpus row — reference corpus.tsv (MEVI/main_utils.py:190-197). */
  final case class Doc(doc_id: Long, title: String, content: String)

  /** Embedding-table row — docemb.bin (MEVI/generate.py:87-88). */
  final case class Embedding(doc_id: Long, vec: Seq[Float])

  /** Doc→code mapping row — rqmapping pkl (MEVI/pq.py:234-247). */
  final case class CodeAssignment(doc_id: Long, codes: Seq[Int])

  /** Query–doc training pair (MEVI/main_utils.py:119-126). */
  final case class QueryPair(query: String, doc_id: Long)

  /** Multi-label relevance judgment (MEVI/main_utils.py:271-278). */
  final case class Judgment(query: String, doc_ids: Seq[Long])

  /** One ranked retrieval hit. */
  final case class RankedHit(query_id: Long, rank: Int, doc_id: Long, score: Double)

  implicit class TypedOps(private val df: DataFrame) {
    def asDocs(implicit s: SparkSession): Dataset[Doc] =
      { import s.implicits._; df.as[Doc] }
    def asEmbeddings(implicit s: SparkSession): Dataset[Embedding] =
      { import s.implicits._; df.as[Embedding] }
    def asAssignments(implicit s: SparkSession): Dataset[CodeAssignment] =
      { import s.implicits._; df.as[CodeAssignment] }
    def asRankedHits(implicit s: SparkSession): Dataset[RankedHit] =
      { import s.implicits._; df.as[RankedHit] }
  }
}
