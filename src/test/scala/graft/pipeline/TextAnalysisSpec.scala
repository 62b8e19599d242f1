package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetition signals by hand: duplicated bigrams raise both ratios") {
    val docs = Seq(
      (1L, "a b a b a b"),      // bigrams: ab,ba,ab,ba,ab → 5 total, 2 distinct
      (2L, "one two three four"), // 3 distinct of 3
      (3L, "x")                  // too short → zero row
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs, n = 2).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 5L)
    assert(math.abs(r(0).getDouble(2) - 3.0 / 5) < 1e-12) // (5-2)/5
    assert(math.abs(r(0).getDouble(3) - 3.0 / 5) < 1e-12) // "a b" ×3
    assert(r(1).getLong(1) == 3L)
    assert(r(1).getDouble(2) == 0.0)
    assert(math.abs(r(1).getDouble(3) - 1.0 / 3) < 1e-12)
    assert(r(2).getLong(1) == 0L && r(2).getDouble(2) == 0.0)
  }

  test("pii scrub redacts emails, ips, and phones with correct counts") {
    val docs = Seq(
      (1L, "mail me at jo.doe+x@corp.example.org or call +1 (555) 010-7788 from 192.168.1.77"),
      (2L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.piiScrub(docs).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 1L) // email
    assert(r(0).getLong(2) == 1L) // ip
    assert(r(0).getLong(3) == 1L) // phone
    val scrubbed = r(0).getString(4)
    assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<IP>")
      && scrubbed.contains("<PHONE>"))
    assert(!scrubbed.contains("@") && !scrubbed.contains("192.168"))
    assert(r(1).getLong(1) == 0L && r(1).getString(4) == "nothing sensitive here")
  }
}
