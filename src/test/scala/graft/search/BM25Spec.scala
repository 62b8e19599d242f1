package graft.search

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BM25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark query engine"),
    (2L, "spark spark spark"),
    (3L, "query planning and query execution"),
    (4L, "unrelated words entirely here")).toDF("doc_id", "text")

  test("bm25 matches the formula computed by hand") {
    val qs = Seq((0L, "spark query")).toDF("query_id", "qtext")
    val got = BM25.score(docs, qs).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap

    // postings: df(spark)=2, df(query)=2; N=4; dl = 3,3,5,4; avgdl=15/4
    val N = 4.0; val avgdl = 15.0 / 4.0; val k1 = 1.2; val b = 0.75
    def idf(df: Double) = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
    def term(tf: Double, dl: Double, df: Double) =
      idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    val exp = Map(
      1L -> (term(1, 3, 2) + term(1, 3, 2)),
      2L -> term(3, 3, 2),
      3L -> term(2, 5, 2))
    assert(got.keySet == exp.keySet) // doc 4 shares no term
    for ((k, v) <- exp) assert(math.abs(got(k) - v) < 1e-12, s"doc $k")
  }

  test("repeated-term docs don't outrank multi-term matches unboundedly") {
    val qs = Seq((0L, "spark query")).toDF("query_id", "qtext")
    val top = BM25.topK(docs, qs, k = 4).orderBy("rank")
      .select("doc_id").as[Long].collect()
    // doc 1 hits both terms; tf saturation keeps doc 2's spark-spam below it
    assert(top.head == 1L)
  }

  test("boundary whitespace never creates an empty-string term") {
    // Spark's split keeps leading/trailing empties; an "" posting would
    // join a whitespace-padded query against the ENTIRE corpus
    val padded = Seq((9L, " spark query engine \n")).toDF("doc_id", "text")
    val p = BM25.postings(padded).select("term").as[String].collect()
    assert(p.sorted.toSeq == Seq("engine", "query", "spark"))
    val qs = Seq((0L, "  nosuchterm  ")).toDF("query_id", "qtext")
    assert(BM25.score(docs, qs).count() == 0,
      "padded query must not match every document via the empty term")
    // scores of a padded query equal the trimmed query's
    val a = BM25.score(docs, Seq((0L, " spark query ")).toDF("query_id", "qtext"))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val b = BM25.score(docs, Seq((0L, "spark query")).toDF("query_id", "qtext"))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("query terms are deduplicated before scoring") {
    val q1 = Seq((0L, "spark spark")).toDF("query_id", "qtext")
    val q2 = Seq((0L, "spark")).toDF("query_id", "qtext")
    val s1 = BM25.score(docs, q1).collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val s2 = BM25.score(docs, q2).collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(s1 == s2)
  }
}
