package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImportanceResamplingSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: "domain" words vs "web" words — the
  // planted structure importance weighting must recover
  private def corpus() = {
    val domainWords = Seq("protein", "genome", "enzyme", "cell")
    val webWords = Seq("click", "buy", "free", "deal")
    (0L until 60L).map { id =>
      val words =
        if (id % 3 == 0) Seq.fill(20)(domainWords((id % 4).toInt))
        else Seq.fill(20)(webWords((id % 4).toInt))
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("domain-like docs outweigh off-domain docs") {
    val docs = corpus()
    val target = docs.where(col("doc_id") % 3 === 0) // the domain slice
    val lr = ImportanceResampling.fitLogRatios(target, docs, buckets = 64)
    val scored = ImportanceResampling.score(docs, lr, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val domainW = scored.collect { case (id, w) if id % 3 == 0 => w }
    val webW = scored.collect { case (id, w) if id % 3 != 0 => w }
    // every domain doc must outweigh every web doc: their tokens are
    // over-represented in the target relative to the raw corpus
    assert(domainW.min > webW.max,
      s"domain min ${domainW.min} !> web max ${webW.max}")
  }

  test("gumbel-top-k selects exactly k, deterministically, domain-heavy") {
    val docs = corpus()
    val target = docs.where(col("doc_id") % 3 === 0)
    val lr = ImportanceResampling.fitLogRatios(target, docs, buckets = 64)
    val scored = ImportanceResampling.score(docs, lr, buckets = 64)
    def draw() = ImportanceResampling.resample(scored, k = 10, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    val a = draw(); val b = draw()
    assert(a == b, "same seed must select the same documents")
    assert(a.size == 10)
    // exp(logw) gaps here are astronomic (20 tokens × big lr deltas):
    // the Gumbel draw must be all-domain despite domain being 1/3 of docs
    assert(a.forall(_ % 3 == 0), s"non-domain doc drawn: $a")
    val c = ImportanceResampling.resample(scored, k = 10, seed = 8L)
      .select("doc_id").as[Long].collect().toSet
    assert(c.forall(_ % 3 == 0))
  }

  test("empty and token-free docs are absent; ratio table covers every bucket") {
    val docs = Seq((0L, "alpha beta"), (1L, "   "), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val lr = ImportanceResampling.fitLogRatios(docs, docs, buckets = 16)
    assert(lr.count() == 16) // one row per bucket, hit or not
    // identical target/raw: every bucket's ratio is exactly zero
    assert(lr.where(col("lr_micro") =!= 0L).count() == 0)
    val scored = ImportanceResampling.score(docs, lr, buckets = 16)
    assert(scored.select("doc_id").as[Long].collect().toSet == Set(0L))
  }
}
