package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Baseline JPEG codec certification. JPEG is lossy, so the spec splits:
  * DC-constant blocks go through FDCT→quant→Huffman→dequant→IDCT
  * EXACTLY (only the DC coefficient is nonzero and the quantizer divides
  * it), pinning marker layout, Huffman tables, predictors, and the IDCT
  * DC path bit-for-bit; full-AC content is pinned to a quantization-
  * bounded error envelope instead.
  */
class JpegCodecSpec extends SparkSpec {

  private def constBlocks(bw: Int, bh: Int, f: (Int, Int) => Int): Array[Byte] = {
    val (w, h) = (bw * 8, bh * 8)
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = (f(x / 8, y / 8) & 0xff).toByte
    px
  }

  test("DC-constant grey blocks roundtrip EXACTLY through the full pipeline") {
    val (bw, bh) = (3, 2)
    val px = constBlocks(bw, bh, (bx, by) => (bx * 29 + by * 41 + 13) % 256)
    val bytes = JpegCodec.encode(bw * 8, bh * 8, 1, px)
    val img = JpegCodec.decode(bytes).getOrElse(fail("decode failed"))
    assert((img.width, img.height, img.channels) == (24, 16, 1))
    assert(img.pixels.toSeq == px.toSeq, "DC-constant decode must be exact")
    // extremes exercise DC categories up to 11 bits of diff
    val hard = constBlocks(4, 1, (bx, _) => Seq(0, 255, 1, 254)(bx))
    val hardImg = JpegCodec.decode(JpegCodec.encode(32, 8, 1, hard)).get
    assert(hardImg.pixels.toSeq == hard.toSeq)
    // the header parser agrees with the pixel decoder on SOF0
    assert(ImageHeaders.parse(bytes).contains(
      ImageHeaders.Meta("jpeg", 24, 16, 1, 8)))
  }

  test("DC-constant RGB blocks roundtrip exactly through the colour transform") {
    // a constant RGB block → constant rounded YCbCr → decoded RGB is the
    // deterministic double-transform of the original; compute the same
    // expectation here and require bit equality
    val colors = Seq((12, 200, 33), (255, 0, 128), (7, 7, 7), (250, 249, 1))
    val (w, h) = (16, 16)
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = colors((y / 8) * 2 + (x / 8))
      val o = (y * w + x) * 3
      px(o) = r.toByte; px(o + 1) = g.toByte; px(o + 2) = b.toByte
    }
    val img = JpegCodec.decode(JpegCodec.encode(w, h, 3, px)).get
    assert(img.channels == 3)
    def expect(r: Int, g: Int, b: Int): (Int, Int, Int) = {
      val yv = StrictMath.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt
      val cb = StrictMath.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.5).toInt
      val cr = StrictMath.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.5).toInt
      def cl(v: Int) = math.max(0, math.min(255, v))
      (cl(StrictMath.floor(yv + 1.402 * (cr - 128) + 0.5).toInt),
        cl(StrictMath.floor(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt),
        cl(StrictMath.floor(yv + 1.772 * (cb - 128) + 0.5).toInt))
    }
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = colors((y / 8) * 2 + (x / 8))
      val (er, eg, eb) = expect(r, g, b)
      val o = (y * w + x) * 3
      assert((img.pixels(o) & 0xff, img.pixels(o + 1) & 0xff,
        img.pixels(o + 2) & 0xff) == ((er, eg, eb)), s"at ($x,$y)")
    }
  }

  test("4:2:0 subsampled: constant 16x16 macroblocks roundtrip exactly") {
    // constant macroblocks survive chroma averaging exactly (mean of
    // equals) and replication upsampling exactly — full-pipeline bit
    // equality through the 4Y+Cb+Cr MCU layout
    val colors = Seq((40, 180, 90), (200, 30, 160), (17, 17, 200), (90, 240, 20))
    val (w, h) = (32, 32)
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = colors((y / 16) * 2 + (x / 16))
      val o = (y * w + x) * 3
      px(o) = r.toByte; px(o + 1) = g.toByte; px(o + 2) = b.toByte
    }
    val bytes = JpegCodec.encode420(w, h, px)
    val img = JpegCodec.decode(bytes).getOrElse(fail("420 decode failed"))
    assert((img.width, img.height, img.channels) == (w, h, 3))
    def expect(r: Int, g: Int, b: Int): (Int, Int, Int) = {
      val yv = StrictMath.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt
      val cb = StrictMath.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5).toInt
      val cr = StrictMath.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5).toInt
      def cl(v: Int) = math.max(0, math.min(255, v))
      (cl(StrictMath.floor(yv + 1.402 * (cr - 128) + 0.5).toInt),
        cl(StrictMath.floor(yv - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5).toInt),
        cl(StrictMath.floor(yv + 1.772 * (cb - 128) + 0.5).toInt))
    }
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = colors((y / 16) * 2 + (x / 16))
      val (er, eg, eb) = expect(r, g, b)
      val o = (y * w + x) * 3
      assert((img.pixels(o) & 0xff, img.pixels(o + 1) & 0xff,
        img.pixels(o + 2) & 0xff) == ((er, eg, eb)), s"at ($x,$y)")
    }
    // non-macroblock-aligned dims crop correctly
    val odd = JpegCodec.decode(JpegCodec.encode420(19, 11,
      Array.fill(19 * 11 * 3)(77.toByte))).get
    assert((odd.width, odd.height) == ((19, 11)))
  }

  test("4:2:0 full-AC content stays inside a subsampling-tolerant envelope") {
    val rng = new scala.util.Random(71)
    // smooth content (random per 4x4 cell, not per pixel): chroma
    // averaging over hard noise is information loss, not codec error
    val (w, h) = (32, 16)
    val px = new Array[Byte](w * h * 3)
    val cells = Array.fill((w / 4) * (h / 4) * 3)(rng.nextInt(256))
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      px((y * w + x) * 3 + c) = cells(((y / 4) * (w / 4) + (x / 4)) * 3 + c).toByte
    val img = JpegCodec.decode(JpegCodec.encode420(w, h, px)).get
    var worst = 0
    for (i <- px.indices) {
      val d = math.abs((img.pixels(i) & 0xff) - (px(i) & 0xff))
      if (d > worst) worst = d
    }
    // chroma edges blur across 2-pixel boundaries; luma stays tight —
    // a real codec slip (wrong MCU order, bad upsample indexing) lands
    // hundreds off, not tens
    assert(worst <= 96, s"worst-case 4:2:0 error $worst")
  }

  test("full-AC content roundtrips within the quantization error envelope") {
    val rng = new scala.util.Random(67)
    for (ch <- Seq(1, 3); (w, h) <- Seq((24, 16), (13, 9))) { // non-aligned too
      val px = Array.fill(w * h * ch)(rng.nextInt(256).toByte)
      val img = JpegCodec.decode(JpegCodec.encode(w, h, ch, px)).getOrElse(
        fail(s"decode failed ch=$ch $w x $h"))
      assert((img.width, img.height, img.channels) == (w, h, ch))
      var worst = 0
      for (i <- px.indices) {
        val d = math.abs((img.pixels(i) & 0xff) - (px(i) & 0xff))
        if (d > worst) worst = d
      }
      // uniform quant step 8 bounds per-coefficient error at 4; the
      // observed worst-case stays well inside 24 across seeds — a codec
      // slip (wrong zigzag, bad predictor) blows far past this
      assert(worst <= 24, s"worst-case error $worst ch=$ch $w x $h")
    }
  }

  test("decodeEx names refusals: not_jpeg, unsupported modes, truncation") {
    assert(JpegCodec.decodeEx("plain text".getBytes) == Left("not_jpeg"))
    assert(JpegCodec.decodeEx(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)) == Left("no_frame")) // SOI+EOI, no SOF
    val good = JpegCodec.encode(16, 8, 1, Array.fill(16 * 8)(55.toByte))
    assert(JpegCodec.decodeEx(good).isRight)
    // layout: SOI(2) + DQT(2+2+65) at 2..70, SOF0 marker at 71
    assert((good(71) & 0xff) == 0xff && (good(72) & 0xff) == 0xc0)
    val prog = good.clone(); prog(72) = 0xc2.toByte // progressive SOF2
    assert(JpegCodec.decodeEx(prog) == Left("unsupported"))
    val sub = good.clone(); sub(82) = 0x33.toByte // 3x3 sampling factors
    assert(JpegCodec.decodeEx(sub) == Left("unsupported_sampling"))
    // scan cut mid-MCU: the bit reader runs dry inside a block (use a
    // noisy image so the entropy stream is long and the cut lands in it)
    val noisy = JpegCodec.encode(24, 16, 1,
      Array.tabulate(24 * 16)(i => ((i * 131 + 17) % 256).toByte))
    assert(JpegCodec.decodeEx(noisy.dropRight(12)) == Left("bad_scan"))
    // segment length pointing past the payload
    assert(JpegCodec.decodeEx(good.take(40)) == Left("truncated"))
    // the skip-fixture mix hits its stated reasons
    assert(JpegCodec.decodeEx(Multimodal.syntheticSkipJpeg(4L)).isRight)
    assert(JpegCodec.decodeEx(Multimodal.syntheticSkipJpeg(5L)) == Left("not_jpeg"))
    assert(JpegCodec.decodeEx(Multimodal.syntheticSkipJpeg(6L)) == Left("unsupported"))
    assert(JpegCodec.decodeEx(Multimodal.syntheticSkipJpeg(7L)) == Left("truncated"))
    val gen = org.apache.spark.sql.functions.udf(
      (id: Long) => Multimodal.syntheticSkipJpeg(id))
    val media = spark.range(0, 40).select(col("id").as("doc_id"),
      gen(col("id")).as("payload"), lit("image/mixed").as("media_type"))
    val counts = Multimodal.jpegDecodeStats(media).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("ok" -> 10L, "not_jpeg" -> 10L,
      "unsupported" -> 10L, "truncated" -> 10L))
  }

  test("DRI restart intervals: encode+decode roundtrip, markers verified") {
    // DC-constant blocks stay exact through restarts: the DC predictor
    // resets at each RSTm on BOTH sides, so a predictor-reset slip on
    // either side shifts every later block's value
    val (bw, bh) = (4, 3) // 12 MCUs
    val px = constBlocks(bw, bh, (bx, by) => (bx * 29 + by * 41 + 13) % 256)
    for (ri <- Seq(1, 2, 5, 11, 12, 99)) {
      val bytes = JpegCodec.encode(bw * 8, bh * 8, 1, px, restartInterval = ri)
      val img = JpegCodec.decode(bytes)
        .getOrElse(fail(s"decode failed at ri=$ri"))
      assert(img.pixels.toSeq == px.toSeq, s"ri=$ri")
    }
    // interval ≥ MCU count → DRI header but no RSTm in the scan
    val noRst = JpegCodec.encode(bw * 8, bh * 8, 1, px, restartInterval = 12)
    assert(!noRst.sliding(2).exists(p => (p(0) & 0xff) == 0xff &&
      ((p(1) & 0xff) & 0xf8) == 0xd0 && (p(1) & 0xff) != 0xd8))
    // ri=1 emits RST0..RST7 cycling then RST0,RST1,RST2 (11 boundaries)
    val bytes1 = JpegCodec.encode(bw * 8, bh * 8, 1, px, restartInterval = 1)
    val rsts = bytes1.sliding(2).collect {
      case Array(a, b) if (a & 0xff) == 0xff &&
        ((b & 0xff) & 0xf8) == 0xd0 && (b & 0xff) != 0xd8 => (b & 0x07)
    }.toSeq
    assert(rsts == (0 until 11).map(_ % 8))
    // RGB and full-AC content also survive restarts (envelope check)
    val rng = new scala.util.Random(41)
    val noisy = Array.fill(24 * 16 * 3)(rng.nextInt(256).toByte)
    val nImg = JpegCodec.decode(
      JpegCodec.encode(24, 16, 3, noisy, restartInterval = 2)).get
    var worst = 0
    for (i <- noisy.indices)
      worst = math.max(worst, math.abs((nImg.pixels(i) & 0xff) - (noisy(i) & 0xff)))
    assert(worst <= 64, s"worst DRI roundtrip error $worst")
    // a corrupted restart marker refuses with bad_restart: patch the
    // first RSTm's low nibble out of sequence
    val b2 = JpegCodec.encode(bw * 8, bh * 8, 1, px, restartInterval = 1)
    val iRst = b2.indices.drop(2).find(i => (b2(i) & 0xff) == 0xff &&
      (b2(i + 1) & 0xff) == 0xd0).get
    val badSeq = b2.clone(); badSeq(iRst + 1) = 0xd5.toByte
    assert(JpegCodec.decodeEx(badSeq) == Left("bad_restart"))
  }

  test("multimodal_jpeg pass: decodeJpegPixels means + moment match the generator") {
    import spark.implicits._
    val media = Seq(5L, 6L, 7L).map(id => (id, Multimodal.syntheticJpeg(id)))
      .toDF("doc_id", "payload")
      .withColumn("media_type", lit("image/jpeg"))
    val rows = Multimodal.decodeJpegPixels(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 3)
    for (id <- Seq(5L, 6L, 7L)) {
      val w = 8 * (1 + id % 3).toInt
      val h = 8 * (1 + id % 2).toInt
      var sum = 0L
      var moment = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((x / 8) * 29 + (y / 8) * 41 + id * 13) % 256
        sum += v
        moment += (y.toLong * w + x) * v
      }
      val r = rows(id)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((w, h, 1)))
      assert(r.getSeq[Double](4) == Seq(sum.toDouble / (w * h)))
      assert(r.getLong(5) == moment)
    }
    // non-JPEG payloads drop (counted by the skip twin, not lost here)
    val mixed = media.unionByName(Seq((99L, "not a jpeg".getBytes, "text/plain"))
      .toDF("doc_id", "payload", "media_type"))
    assert(Multimodal.decodeJpegPixels(mixed).count() == 3)
  }
}
