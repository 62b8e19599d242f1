package graft.pipeline

import graft.SparkSpec

/** MJPEG-AVI container codec certification: the encoder emits real
  * RIFF/AVI bytes, the decoder walks them back, and every named refusal
  * exercises its actual classification point (a patched real container,
  * never hand-built garbage).
  */
class AviCodecSpec extends SparkSpec {

  private def greyFrame(w: Int, h: Int, seed: Int): Array[Byte] = {
    val px = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(y * w + x) = (((x / 8) * 29 + (y / 8) * 41 + seed) % 256).toByte
    px
  }

  test("container roundtrip: frames come back bit-exact with geometry") {
    val (w, h) = (24, 16)
    val jpegs = (0 until 3).map(f => JpegCodec.encode(w, h, 1, greyFrame(w, h, f * 57)))
    val avi = AviCodec.encode(w, h, 40000, jpegs)
    val v = AviCodec.decode(avi).getOrElse(fail("decode failed"))
    assert((v.width, v.height, v.microSecPerFrame) == ((w, h, 40000)))
    assert(v.frames.length == 3)
    for (f <- 0 until 3)
      assert(v.frames(f).toSeq == jpegs(f).toSeq, s"frame $f payload")
  }

  test("odd-length frame payloads are word-aligned and still roundtrip") {
    val (w, h) = (8, 8)
    val base = JpegCodec.encode(w, h, 1, greyFrame(w, h, 7))
    // JPEG readers ignore trailing bytes after EOI — append one to force
    // an odd chunk length so the RIFF pad-byte path is exercised
    val odd = if (base.length % 2 == 0) base :+ 0xff.toByte else base
    assert(odd.length % 2 == 1)
    val avi = AviCodec.encode(w, h, 33000, Seq(odd, odd))
    val v = AviCodec.decode(avi).getOrElse(fail("decode failed"))
    assert(v.frames.length == 2)
    assert(v.frames(0).length == odd.length, "pad byte must not leak into payload")
    assert(v.frames(1).toSeq == odd.toSeq)
  }

  test("frame entropy decode: DC-constant MJPEG frames decode exactly") {
    val (w, h) = (16, 8)
    val pixels = (0 until 2).map(f => greyFrame(w, h, f * 13 + 5))
    val avi = AviCodec.encode(w, h, 33000,
      pixels.map(JpegCodec.encode(w, h, 1, _)))
    val imgs = AviCodec.decodeFrames(avi).getOrElse(fail("decodeFrames failed"))
    assert(imgs.length == 2)
    for (f <- 0 until 2)
      assert(imgs(f).pixels.toSeq == pixels(f).toSeq, s"frame $f pixels")
    // camera-style MJPEG: frames carry DRI restart intervals — the
    // per-frame JPEG path owns RSTm, so the container needs no changes
    val driAvi = AviCodec.encode(w, h, 33000,
      pixels.map(JpegCodec.encode(w, h, 1, _, restartInterval = 1)))
    val driImgs = AviCodec.decodeFrames(driAvi).getOrElse(fail("DRI frames"))
    for (f <- 0 until 2)
      assert(driImgs(f).pixels.toSeq == pixels(f).toSeq, s"DRI frame $f")
  }

  test("named refusals fire at their classification points") {
    val (w, h) = (8, 8)
    val jpeg = JpegCodec.encode(w, h, 1, greyFrame(w, h, 3))
    val good = AviCodec.encode(w, h, 33000, Seq(jpeg, jpeg))
    assert(AviCodec.decodeEx(good).isRight)

    assert(AviCodec.decodeEx("plain text".getBytes("UTF-8")) == Left("not_avi"))
    assert(AviCodec.decodeEx(good.take(40)) == Left("truncated"))
    assert(AviCodec.decodeEx(good.dropRight(5)) == Left("truncated"))

    def patched(from: String, to: String): Array[Byte] = {
      val b = good.clone()
      val f = from.getBytes("US-ASCII"); val t = to.getBytes("US-ASCII")
      val i = b.indexOfSlice(f.toSeq)
      assert(i >= 0, s"fourcc $from present")
      System.arraycopy(t, 0, b, i, 4); b
    }
    // both the strh handler and strf biCompression say MJPG; patching
    // the first (strh) is what the decoder gates on
    assert(AviCodec.decodeEx(patched("MJPG", "XVID")) == Left("unsupported_codec"))
    assert(AviCodec.decodeEx(patched("avih", "zzzz")) == Left("no_main_header"))
    assert(AviCodec.decodeEx(patched("strh", "zzzz")) == Left("no_stream_header"))

    // frame-count mismatch: patch avih dwTotalFrames — RIFF hdr(12) +
    // hdrl LIST hdr(12) + avih chunk hdr(8) + field offset 16 = byte 48
    val fc = good.clone(); fc(48) = 9
    assert(AviCodec.decodeEx(fc) == Left("frame_count_mismatch"))

    // per-frame refusal: corrupt the first frame's SOI marker so the
    // container walk succeeds but JpegCodec refuses the frame
    val firstFrame = good.indexOfSlice(jpeg.toSeq)
    val badFrame = good.clone(); badFrame(firstFrame + 1) = 0
    assert(AviCodec.decodeFrames(badFrame) == Left("frame_not_jpeg"))
    // geometry lie: patch avih/strf dims (avih dwWidth at 12+8+32=... use
    // a fresh encode with wrong stated dims instead: encoder is trusted,
    // so re-wrap the same frames under a different geometry)
    val lied = AviCodec.encode(w + 8, h, 33000, Seq(jpeg, jpeg))
    assert(AviCodec.decodeFrames(lied) == Left("frame_geometry_mismatch"))
  }

  test("synthetic fixture mix classifies exactly as the oracle states") {
    for (id <- 0L until 20L) {
      val got = AviCodec.decodeFrames(Multimodal.syntheticSkipAvi(id))
        .fold(identity, _ => "ok")
      val want = (id % 5) match {
        case 0 => "ok"
        case 1 => "not_avi"
        case 2 => "unsupported_codec"
        case 3 => "truncated"
        case _ => "frame_unsupported"
      }
      assert(got == want, s"doc $id")
    }
  }
}
