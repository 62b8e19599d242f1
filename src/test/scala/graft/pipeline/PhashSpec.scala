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

  test("mixed containers hash through their real codecs; drops are attributed") {
    // one doc per container, all encoding the SAME 8×8 grey raster —
    // PNG and GIF must collide exactly (both lossless); the JPEG is
    // constant-block so its decode is pixel-exact too
    val w = 8; val h = 8
    // non-constant 4-grey raster both lossless codecs can carry exactly:
    // grey(x,y) = ((x·3 + y·5) mod 4) · 50
    def v(x: Int, y: Int) = ((x * 3 + y * 5) % 4) * 50
    val pngB = png(w, h, v)
    val jpgB = Multimodal.syntheticJpeg(0L) // constant-block law at d=0
    val jpgTwin = png(8, 8, (_, _) => 0)    // d=0's blocks decode to all-0
    // GIF palette entry j carries grey j·50 in the R channel alone
    val pal = Array.tabulate[Byte](12)(i => if (i % 3 == 0) ((i / 3) * 50).toByte else 0)
    val gifB = GifCodec.encode(w, h, pal,
      Seq((0, Array.tabulate[Byte](w * h)(i => ((i % w * 3 + i / w * 5) % 4).toByte))))
    val hashes = Multimodal.perceptualHash(
      mediaOf(1L -> pngB, 2L -> jpgB, 3L -> gifB, 4L -> jpgTwin))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(hashes.keySet == Set(1L, 2L, 3L, 4L),
      "all three containers must decode and hash")
    // PNG and GIF carry the IDENTICAL non-constant raster losslessly
    assert(hashes(3L) == hashes(1L),
      s"gif vs png of the same raster: ${hashes(3L)} vs ${hashes(1L)}")
    // the JPEG's constant blocks decode pixel-exact → match its PNG twin
    assert(hashes(2L) == hashes(4L),
      s"jpeg vs png of the same raster: ${hashes(2L)} vs ${hashes(4L)}")
    assert(hashes(1L) != hashes(2L), "distinct rasters must differ somewhere")

    val stats = Multimodal.phashDecodeStats(mediaOf(
        1L -> pngB, 2L -> jpgB, 3L -> gifB,
        4L -> "not an image".getBytes("UTF-8"),
        5L -> jpgB.take(40)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("ok:png" -> 1L, "ok:jpeg" -> 1L, "ok:gif" -> 1L,
      "unknown_container" -> 1L, "jpeg:truncated" -> 1L), stats.toString)
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
