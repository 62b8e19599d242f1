package graft.pipeline

/** Independent DEFLATE decoder, implemented from the public RFC 1950
  * (zlib wrapper) and RFC 1951 (deflate block format) specifications —
  * deliberately NOT a wrapper over `java.util.zip.Inflater`, which is
  * the same zlib native code `Deflater` drives.
  *
  * Purpose: `TextAnalysis.compressionRatio` is the one catalog entry
  * whose output (a deflate bitstream length) has no SQL twin, so its
  * CORRECTNESS row is rows-only. This decoder gives it a genuine
  * two-implementation check (VERDICT r8 #6): the parity spec inflates
  * every document's `Deflater` output with THIS decoder and requires
  * byte-exact round-trip plus checksum agreement — a bug in either the
  * compressed-length accounting or the stream itself cannot survive a
  * decode by an implementation that shares nothing with zlib but the
  * published format.
  *
  * Supports everything `Deflater` emits: stored, fixed-Huffman and
  * dynamic-Huffman blocks, full 32 KiB back-reference window, zlib
  * header + Adler-32 trailer (own Adler-32, not `java.util.zip`).
  */
object InflateCodec {

  /** Decode a complete zlib stream (RFC 1950): 2-byte header, deflate
    * data, big-endian Adler-32 of the plaintext. Throws on any header,
    * stream, or checksum violation. */
  def zlibDecode(data: Array[Byte]): Array[Byte] = {
    require(data.length >= 6, s"zlib stream too short: ${data.length}")
    val cmf = data(0) & 0xFF
    val flg = data(1) & 0xFF
    require((cmf & 0x0F) == 8, s"not deflate: CM=${cmf & 0x0F}")
    require((cmf * 256 + flg) % 31 == 0, "zlib header check failed")
    require((flg & 0x20) == 0, "preset dictionary unsupported")
    val (out, bitEnd) = inflate(data, 2)
    // trailer starts at the next byte boundary after the final block
    val trailerOff = ((bitEnd + 7) / 8).toInt
    require(trailerOff + 4 <= data.length,
      s"missing Adler-32 trailer at byte $trailerOff of ${data.length}")
    val stored = ((data(trailerOff) & 0xFFL) << 24) |
      ((data(trailerOff + 1) & 0xFFL) << 16) |
      ((data(trailerOff + 2) & 0xFFL) << 8) |
      (data(trailerOff + 3) & 0xFFL)
    val computed = adler32(out)
    require(computed == stored,
      f"Adler-32 mismatch: computed $computed%08x stored $stored%08x")
    out
  }

  /** RFC 1950 §2.2 checksum — own 4-line implementation, so the parity
    * spec shares no checksum code with the JDK either. */
  def adler32(data: Array[Byte]): Long = {
    var a = 1L; var b = 0L
    var i = 0
    while (i < data.length) {
      a = (a + (data(i) & 0xFF)) % 65521
      b = (b + a) % 65521
      i += 1
    }
    (b << 16) | a
  }

  // ---- RFC 1951 ----

  // length codes 257..285 (RFC 1951 §3.2.5)
  private val LenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19,
    23, 27, 31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
  private val LenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
    2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0)
  // distance codes 0..29
  private val DistBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65,
    97, 129, 193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577)
  private val DistExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6,
    6, 7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13)
  // order in which code-length-code lengths are stored (§3.2.7)
  private val ClOrder = Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12,
    3, 13, 2, 14, 1, 15)

  /** Canonical Huffman table: decode by accumulating bits MSB-growing
    * per RFC 1951 (packed starting from the least-significant bit of
    * each byte, codes themselves most-significant-bit first). */
  private final class Huffman(lengths: Array[Int]) {
    val maxLen = 15
    val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    // first canonical code and first symbol index per length
    val firstCode = new Array[Int](maxLen + 2)
    val firstSym = new Array[Int](maxLen + 1)
    val symbols = new Array[Int](lengths.count(_ > 0))
    locally {
      var code = 0
      var sym = 0
      var len = 1
      while (len <= maxLen) {
        firstCode(len) = code
        firstSym(len) = sym
        code = (code + count(len)) << 1
        sym += count(len)
        len += 1
      }
      val next = new Array[Int](maxLen + 1)
      var s = 0
      while (s < lengths.length) {
        val l = lengths(s)
        if (l > 0) {
          symbols(firstSym(l) + next(l)) = s
          next(l) += 1
        }
        s += 1
      }
    }
  }

  /** Inflate a raw deflate stream starting at byte `off`. Returns the
    * plaintext and the BIT offset (from buffer start) one past the
    * final block — the caller locates any trailer from it. */
  def inflate(data: Array[Byte], off: Int): (Array[Byte], Long) = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    // 32 KiB ring for back-references (window never exceeds 32768)
    val window = new Array[Byte](32768)
    var wPos = 0
    var wFilled = 0L
    def emit(b: Byte): Unit = {
      out.write(b.toInt)
      window(wPos) = b
      wPos = (wPos + 1) & 0x7FFF
      wFilled += 1
    }
    var bitPos: Long = off.toLong * 8
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteI = (bitPos >> 3).toInt
        require(byteI < data.length, "deflate stream truncated")
        v |= (((data(byteI) >> (bitPos & 7)) & 1) << i)
        bitPos += 1
        i += 1
      }
      v
    }
    def decodeSym(h: Huffman): Int = {
      var code = 0
      var len = 0
      while (len < h.maxLen) {
        code = (code << 1) | bits(1)
        len += 1
        if (h.count(len) > 0 && code - h.firstCode(len) < h.count(len))
          return h.symbols(h.firstSym(len) + (code - h.firstCode(len)))
      }
      throw new IllegalArgumentException("invalid Huffman code")
    }
    lazy val fixedLit = new Huffman(
      Array.tabulate(288)(i =>
        if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8))
    lazy val fixedDist = new Huffman(Array.fill(30)(5))

    var fin = false
    while (!fin) {
      fin = bits(1) == 1
      val btype = bits(2)
      btype match {
        case 0 => // stored: align, LEN, ~LEN, raw bytes
          bitPos = (bitPos + 7) & ~7L
          val len = bits(16)
          val nlen = bits(16)
          require((len ^ 0xFFFF) == nlen, "stored-block LEN/NLEN mismatch")
          var i = 0
          while (i < len) {
            val byteI = (bitPos >> 3).toInt
            require(byteI < data.length, "stored block truncated")
            emit(data(byteI).toByte); bitPos += 8; i += 1
          }
        case 1 | 2 =>
          val (lit, dist) =
            if (btype == 1) (fixedLit, fixedDist)
            else {
              val hlit = bits(5) + 257
              val hdist = bits(5) + 1
              val hclen = bits(4) + 4
              val clLens = new Array[Int](19)
              var i = 0
              while (i < hclen) { clLens(ClOrder(i)) = bits(3); i += 1 }
              val clTable = new Huffman(clLens)
              val lens = new Array[Int](hlit + hdist)
              var n = 0
              while (n < hlit + hdist) {
                val sym = decodeSym(clTable)
                sym match {
                  case s if s < 16 => lens(n) = s; n += 1
                  case 16 =>
                    require(n > 0, "repeat with no previous length")
                    val rep = 3 + bits(2)
                    require(n + rep <= hlit + hdist, "repeat overshoots code lengths")
                    var j = 0
                    while (j < rep) { lens(n) = lens(n - 1); n += 1; j += 1 }
                  case 17 =>
                    val rep = 3 + bits(3)
                    require(n + rep <= hlit + hdist, "repeat overshoots code lengths")
                    n += rep
                  case 18 =>
                    val rep = 11 + bits(7)
                    require(n + rep <= hlit + hdist, "repeat overshoots code lengths")
                    n += rep
                }
              }
              (new Huffman(lens.take(hlit)), new Huffman(lens.drop(hlit)))
            }
          var endOfBlock = false
          while (!endOfBlock) {
            val sym = decodeSym(lit)
            if (sym < 256) emit(sym.toByte)
            else if (sym == 256) endOfBlock = true
            else {
              require(sym <= 285, s"bad length symbol $sym")
              val len = LenBase(sym - 257) + bits(LenExtra(sym - 257))
              val dSym = decodeSym(dist)
              require(dSym <= 29, s"bad distance symbol $dSym")
              val d = DistBase(dSym) + bits(DistExtra(dSym))
              require(d.toLong <= wFilled, s"distance $d beyond window $wFilled")
              var i = 0
              // byte-at-a-time: overlapping copies (d < len) REPEAT, by spec
              var src = (wPos - d) & 0x7FFF
              while (i < len) {
                val b = window(src)
                emit(b)
                src = (src + 1) & 0x7FFF
                i += 1
              }
            }
          }
        case _ => throw new IllegalArgumentException("reserved block type 3")
      }
    }
    (out.toByteArray, bitPos)
  }
}
