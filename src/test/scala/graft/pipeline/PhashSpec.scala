package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Perceptual-hash image dedup over REAL decoded pixels: hand-built
  * properties (identical images collide, brightness shifts leave dHash
  * alone) plus the banding contract — candidates are COMPLETE for
  * Hamming ≤ 3 and every reported pair is confirmed by brute-force.
  */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = (f(x, y) & 0xff).toByte
    PngCodec.encode(w, h, 1, px, _ => 0)
  }

  private def mediaOf(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/png"))

  test("identical images collide at hamming 0; brightness shift spares dHash") {
    // gradient peaks at 15·9 + 15·4 = 195, so the +40 shift stays below
    // 256 — a TRUE brightness shift (wrap-around would flip gradients)
    val base = png(16, 16, (x, y) => x * 9 + y * 4)
    val shifted = png(16, 16, (x, y) => x * 9 + y * 4 + 40)
    val different = png(16, 16, (x, y) => 255 - x * 9 - (y % 3) * 70)
    val hashes = Multimodal.perceptualHash(
      mediaOf(1L -> base, 2L -> base, 3L -> shifted, 4L -> different))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Int]))
      .toMap
    assert(hashes(1L) == hashes(2L), "identical payloads must collide")
    // dHash bands (indices 4..7) survive a global brightness shift —
    // gradients compare pixel pairs, both shifted equally
    assert(hashes(1L).drop(4) == hashes(3L).drop(4),
      s"dHash must be brightness-invariant: ${hashes(1L)} vs ${hashes(3L)}")
    assert(hashes(1L) != hashes(4L), "a different image must differ somewhere")
    val pairs = Multimodal.perceptualHashPairs(
        Multimodal.perceptualHash(mediaOf(
          1L -> base, 2L -> base, 3L -> shifted, 4L -> different)),
        maxDist = 6)
      .as[(Long, Long, Int)].collect().toMap2
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 0)
  }

  implicit class Pairs(rows: Array[(Long, Long, Int)]) {
    def toMap2: Map[(Long, Long), Int] =
      rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("banding is complete for hamming <= 3 and every pair brute-confirms") {
    val docs = graft.io.Tables.load(spark, sf("0.001"), "documents")
      .select(col("doc_id"))
    val gen = udf { (id: Long) => Multimodal.syntheticPixelPng(id) }
    val media = docs.select(col("doc_id"), gen(col("doc_id")).as("payload"),
      lit("image/png").as("media_type"))
    val hashes = Multimodal.perceptualHash(media).cache()
    val got = Multimodal.perceptualHashPairs(hashes, maxDist = 6)
      .as[(Long, Long, Int)].collect().toMap2

    val h = hashes.collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.asInstanceOf[Int]).toArray)
    def ham(a: Array[Int], b: Array[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    var checkedLe3 = 0
    for (i <- h.indices; j <- (i + 1) until h.length) {
      val (ida, ha) = h(i); val (idb, hb) = h(j)
      val (a, b) = if (ida < idb) (ida, idb) else (idb, ida)
      val d = ham(ha, hb)
      if (d <= 3) {
        // pigeonhole: <= 3 flipped bits cannot touch all four dHash
        // bands... unless all 3 land in dHash; a pair differing only in
        // aHash bits ALWAYS shares every dHash band
        val dBandsEqual = ha.drop(4).sameElements(hb.drop(4))
        val dHamDdash = ha.drop(4).zip(hb.drop(4))
          .map { case (x, y) => Integer.bitCount(x ^ y) }.sum
        if (dBandsEqual || dHamDdash <= 3) {
          assert(got.contains((a, b)), s"missed hamming-$d pair ($a,$b)")
          checkedLe3 += 1
        }
      }
      // soundness: anything reported must match brute-force exactly
      got.get((a, b)).foreach(rep => assert(rep == d && d <= 6))
    }
    assert(checkedLe3 > 0, "fixture should contain close pairs")
  }
}
