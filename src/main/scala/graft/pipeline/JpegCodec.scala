package graft.pipeline

/** Pure-JVM baseline JPEG codec (the public ITU-T T.81 specification):
  * marker-segment walk (DQT §B.2.4.1, DHT §B.2.4.2, SOF0 §B.2.2,
  * SOS §B.2.3) → entropy-coded scan with byte-stuffing → canonical
  * Huffman decode (general tables built from the DHT bits/values lists,
  * §C.2) → dequantize through the zigzag order (Figure A.6) → 2-D IDCT
  * (§A.3.3) → level shift + clamp → greyscale or YCbCr→RGB (JFIF
  * conversion) pixels. Baseline sequential, 8-bit, 4:4:4 (h=v=1)
  * sampling; progressive/arithmetic/subsampled streams refuse with a
  * named reason rather than emit garbage.
  *
  * The encoder exists so the decoder can be certified on REAL entropy-
  * coded bytes end-to-end. JPEG is lossy, so certification splits:
  * blocks that are CONSTANT carry only a DC coefficient, and with the
  * DC quantizer set to 8 the whole pipeline (FDCT → quant → Huffman →
  * dequant → IDCT) is EXACT for them — fixture images built from
  * constant 8×8 blocks must decode bit-identically, which a plain-SQL
  * oracle can state. Full-AC content is covered by bounded-error
  * property tests (quantization error is bounded by the table, not
  * unbounded).
  *
  * The encoder writes fixed-length canonical Huffman tables (12 DC
  * symbols at 4 bits, 162 AC symbols at 8 bits — valid per §C.2, no
  * all-ones code) into DHT; the DECODER builds its tables from
  * whatever DHT declares, so it reads standard Annex-K streams too.
  */
object JpegCodec {

  /** Row-major samples, `width·height·channels` bytes (1 = grey,
    * 3 = RGB). */
  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** Zigzag scan order (T.81 Figure A.6): position i of the scan maps
    * to this natural (row·8+col) index. */
  private[pipeline] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16) via StrictMath: bit-identical on every JVM, so
    * decode results are deterministic across executors. */
  private val Cos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
  }
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0)

  // ------------------------------------------------------------- tables

  /** Canonical Huffman table from DHT's (bits, values): code lengths
    * are assigned in order (§C.2). Kept as parallel arrays for a simple
    * linear-by-length decoder: mincode/maxcode/valptr per length. */
  private final class HuffTable(bits: Array[Int], val values: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1); k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  /** Encoder-side code lookup (symbol → (code, length)) for a canonical
    * table. */
  private def codesOf(bits: Array[Int], values: Array[Byte]): Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out(values(k) & 0xff) = (code, l)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      l += 1
    }
    out
  }

  // encoder tables: 12 DC symbols at 4 bits, 162 AC symbols at 8 bits —
  // fixed-length canonical Huffman (valid: 12 ≤ 2^4−1 used, no all-ones)
  private val EncDcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncDcVals = Array.tabulate[Byte](12)(_.toByte)
  private val EncAcBits = Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val EncAcVals: Array[Byte] = {
    // all (run, size) symbols: EOB (0x00), sizes 1..10 per run 0..15,
    // ZRL (0xF0) — the Annex-F symbol alphabet in ascending order
    val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
    b += 0x00
    for (run <- 0 to 15; size <- 1 to 10) b += ((run << 4) | size).toByte
    b += 0xf0.toByte
    require(b.length == 162)
    b.toArray
  }

  /** Quant table in zigzag order: DC step 8 (makes constant blocks
    * EXACT through the pipeline — 8·(c−128)/8 is integral), AC step 8. */
  private val EncQuant: Array[Int] = Array.fill(64)(8)

  // ------------------------------------------------------------ decode

  def decode(bytes: Array[Byte]): Option[Image] = decodeEx(bytes).toOption

  /** Closed reason vocabulary: not_jpeg, truncated, unsupported
    * (progressive/arithmetic/hierarchical SOFs),
    * unsupported_sampling (factors outside 1..2), bad_marker,
    * bad_table, bad_scan, bad_dims, bad_restart (missing or
    * out-of-sequence RSTm at a DRI boundary), no_frame. */
  def decodeEx(bytes: Array[Byte]): Either[String, Image] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff ||
      (bytes(1) & 0xff) != 0xd8) return Left("not_jpeg")
    var pos = 2
    val quant = new Array[Array[Int]](4) // natural order
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var width = 0; var height = 0; var nComp = 0
    var compId: Array[Int] = null; var compQ: Array[Int] = null
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var sawFrame = false
    var restartInterval = 0

    def be16(i: Int): Int = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)

    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return Left("bad_marker")
      var p = pos
      while (p < bytes.length && (bytes(p) & 0xff) == 0xff) p += 1
      if (p >= bytes.length) return Left("truncated")
      val marker = bytes(p) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos = p + 1
      } else if (marker == 0xd9) {
        return Left("no_frame") // EOI before any scan
      } else {
        if (p + 3 > bytes.length) return Left("truncated")
        val segLen = be16(p + 1)
        if (segLen < 2 || p + 1 + segLen > bytes.length) return Left("truncated")
        val dataStart = p + 3
        val dataEnd = p + 1 + segLen
        marker match {
          case 0xdb => // DQT: one or more tables
            var q = dataStart
            while (q < dataEnd) {
              val pq = (bytes(q) >> 4) & 0xf
              val tq = bytes(q) & 0xf
              if (pq != 0) return Left("unsupported") // 16-bit tables
              if (q + 1 + 64 > dataEnd) return Left("bad_table")
              val tab = new Array[Int](64)
              var i = 0
              while (i < 64) {
                val v = bytes(q + 1 + i) & 0xff
                if (v == 0) return Left("bad_table")
                tab(Zigzag(i)) = v
                i += 1
              }
              quant(tq) = tab
              q += 65
            }
          case 0xc4 => // DHT: one or more tables
            var q = dataStart
            while (q < dataEnd) {
              if (q + 17 > dataEnd) return Left("bad_table")
              val tc = (bytes(q) >> 4) & 0xf
              val th = bytes(q) & 0xf
              if (tc > 1 || th > 3) return Left("bad_table")
              val bits = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
              val total = bits.sum
              if (total == 0 || total > 256 || q + 17 + total > dataEnd)
                return Left("bad_table")
              val vals = java.util.Arrays.copyOfRange(bytes, q + 17, q + 17 + total)
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              q += 17 + total
            }
          case 0xc0 | 0xc1 => // baseline / extended sequential frame
            if (dataEnd - dataStart < 6) return Left("truncated")
            val precision = bytes(dataStart) & 0xff
            if (precision != 8) return Left("unsupported")
            height = be16(dataStart + 1)
            width = be16(dataStart + 3)
            nComp = bytes(dataStart + 5) & 0xff
            if (width <= 0 || height <= 0) return Left("bad_dims")
            if (nComp != 1 && nComp != 3) return Left("unsupported")
            if (dataEnd - dataStart < 6 + 3 * nComp) return Left("truncated")
            compId = new Array[Int](nComp); compQ = new Array[Int](nComp)
            compH = new Array[Int](nComp); compV = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compId(c) = bytes(dataStart + 6 + 3 * c) & 0xff
              val hv = bytes(dataStart + 7 + 3 * c) & 0xff
              val h = (hv >> 4) & 0xf
              val v = hv & 0xf
              // 4:4:4, 4:2:2, 4:2:0 layouts: factors 1 or 2 per axis
              if (h < 1 || h > 2 || v < 1 || v > 2)
                return Left("unsupported_sampling")
              compH(c) = h; compV(c) = v
              compQ(c) = bytes(dataStart + 8 + 3 * c) & 0xf
              c += 1
            }
            sawFrame = true
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return Left("unsupported") // progressive/arithmetic/lossless
          case 0xdd => // DRI: MCUs between restart markers (0 disables)
            if (dataEnd - dataStart < 2) return Left("truncated")
            restartInterval = be16(dataStart)
          case 0xda => // SOS: decode the scan, then we are done
            if (!sawFrame) return Left("no_frame")
            val ns = bytes(dataStart) & 0xff
            if (ns != nComp || dataEnd - dataStart < 1 + 2 * ns + 3)
              return Left("bad_scan")
            val compDc = new Array[HuffTable](nComp)
            val compAc = new Array[HuffTable](nComp)
            var c = 0
            while (c < ns) {
              val cs = bytes(dataStart + 1 + 2 * c) & 0xff
              val ci = compId.indexOf(cs)
              if (ci < 0) return Left("bad_scan")
              val tds = bytes(dataStart + 2 + 2 * c) & 0xff
              val dct = dcTables((tds >> 4) & 0xf)
              val act = acTables(tds & 0xf)
              if (dct == null || act == null) return Left("bad_table")
              compDc(ci) = dct; compAc(ci) = act
              c += 1
            }
            c = 0
            while (c < nComp) {
              if (quant(compQ(c)) == null) return Left("bad_table")
              c += 1
            }
            return decodeScan(bytes, dataEnd, width, height, nComp,
              compDc, compAc, compQ.map(quant), compH, compV,
              restartInterval)
          case _ => () // APPn / COM / other: skip
        }
        pos = p + 1 + segLen
      }
    }
    Left(if (sawFrame) "truncated" else "no_frame")
  }

  /** Entropy-coded scan: bit reader with 0xFF00 unstuffing; per MCU
    * h_c·v_c blocks per component in raster order (§A.2.3 interleaving
    * — one block for 4:4:4, the 4Y+Cb+Cr macroblock for 4:2:0); DC
    * prediction per component; chroma upsampled by replication. */
  private def decodeScan(bytes: Array[Byte], start: Int, width: Int,
      height: Int, nComp: Int, dcT: Array[HuffTable], acT: Array[HuffTable],
      qT: Array[Array[Int]], compH: Array[Int],
      compV: Array[Int], restartInterval: Int): Either[String, Image] = {
    var bitBuf = 0L; var bitCnt = 0; var p = start; var hitEoi = false

    def fill(): Boolean = {
      while (bitCnt <= 56 && !hitEoi) {
        if (p >= bytes.length) return bitCnt > 0
        val b = bytes(p) & 0xff
        if (b == 0xff) {
          if (p + 1 >= bytes.length) { hitEoi = true; return bitCnt > 0 }
          val nxt = bytes(p + 1) & 0xff
          if (nxt == 0x00) { bitBuf = (bitBuf << 8) | 0xff; bitCnt += 8; p += 2 }
          else { hitEoi = true; return bitCnt > 0 } // EOI or marker: stop
        } else { bitBuf = (bitBuf << 8) | b; bitCnt += 8; p += 1 }
      }
      true
    }
    def readBit(): Int = {
      if (bitCnt == 0 && { fill(); bitCnt == 0 }) return -1
      bitCnt -= 1
      ((bitBuf >>> bitCnt) & 1).toInt
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = readBit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def decodeSym(t: HuffTable): Int = { // §F.2.2.3 DECODE
      var code = readBit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.values(t.valPtr(l) + code - t.minCode(l)) & 0xff
        val b = readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1
    }
    // §F.2.4.3.1 EXTEND: size-bit value → signed coefficient
    def extend(v: Int, size: Int): Int =
      if (size == 0) 0
      else if (v < (1 << (size - 1))) v - (1 << size) + 1
      else v

    val maxH = compH.max
    val maxV = compV.max
    val mcuW = 8 * maxH
    val mcuH = 8 * maxV
    val mcuCols = (width + mcuW - 1) / mcuW
    val mcuRows = (height + mcuH - 1) / mcuH
    // per-component plane dims in component-resolution pixels
    val planeW = Array.tabulate(nComp)(c => mcuCols * compH(c) * 8)
    val planes = Array.tabulate(nComp)(c => new Array[Byte](
      planeW(c) * mcuRows * compV(c) * 8))
    val pred = new Array[Int](nComp)
    val coef = new Array[Int](64)
    var mcuCount = 0
    var rstExpect = 0

    var my = 0
    while (my < mcuRows) {
      var mx = 0
      while (mx < mcuCols) {
        var c = 0
        while (c < nComp) {
          var vb = 0
          while (vb < compV(c)) {
            var hb = 0
            while (hb < compH(c)) {
              java.util.Arrays.fill(coef, 0)
              val tSym = decodeSym(dcT(c))
              if (tSym < 0 || tSym > 11) return Left("bad_scan")
              val diffBits = if (tSym == 0) 0 else readBits(tSym)
              if (diffBits < 0) return Left("bad_scan")
              pred(c) += extend(diffBits, tSym)
              coef(0) = pred(c) * qT(c)(0)
              var k = 1
              var open = true
              while (open && k < 64) {
                val rs = decodeSym(acT(c))
                if (rs < 0) return Left("bad_scan")
                val run = rs >> 4
                val size = rs & 0xf
                if (size == 0) {
                  if (rs == 0x00) open = false // EOB
                  else if (rs == 0xf0) k += 16 // ZRL
                  else return Left("bad_scan")
                } else {
                  k += run
                  if (k > 63) return Left("bad_scan")
                  val v = readBits(size)
                  if (v < 0) return Left("bad_scan")
                  coef(Zigzag(k)) = extend(v, size) * qT(c)(Zigzag(k))
                  k += 1
                }
              }
              // separable IDCT (§A.3.3): column pass then row pass —
              // 2·8³ multiplies per block instead of the direct 8⁴,
              // with zero coefficients skipped in the column pass
              // (sparse blocks — the common case — cost almost nothing)
              val bx0 = (mx * compH(c) + hb) * 8
              val by0 = (my * compV(c) + vb) * 8
              val colSum = new Array[Double](64) // [u][y]
              var u = 0
              while (u < 8) {
                var v = 0
                while (v < 8) {
                  val f = coef(v * 8 + u)
                  if (f != 0) {
                    val cf = C(v) * f
                    var y = 0
                    while (y < 8) {
                      colSum(u * 8 + y) += cf * Cos(v)(y)
                      y += 1
                    }
                  }
                  v += 1
                }
                u += 1
              }
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  var s = 0.0
                  var uu = 0
                  while (uu < 8) {
                    s += C(uu) * colSum(uu * 8 + y) * Cos(uu)(x)
                    uu += 1
                  }
                  val px = StrictMath.floor(s / 4.0 + 128.0 + 0.5).toInt
                  planes(c)((by0 + y) * planeW(c) + bx0 + x) =
                    (if (px < 0) 0 else if (px > 255) 255 else px).toByte
                  x += 1
                }
                y += 1
              }
              hb += 1
            }
            vb += 1
          }
          c += 1
        }
        // §E.2.4 restart processing: after every restartInterval MCUs
        // (except the final one), the stream byte-aligns and carries an
        // RSTm marker with m cycling 0..7; DC predictions reset. Any
        // bits still buffered here are exactly the 1-bit padding before
        // the marker (fill() never buffers past a marker), so they drop.
        mcuCount += 1
        if (restartInterval > 0 && mcuCount % restartInterval == 0 &&
          !(my == mcuRows - 1 && mx == mcuCols - 1)) {
          bitBuf = 0L; bitCnt = 0; hitEoi = false
          if (p + 1 >= bytes.length) return Left("truncated")
          val m1 = bytes(p) & 0xff; val m2 = bytes(p + 1) & 0xff
          if (m1 != 0xff || (m2 & 0xf8) != 0xd0 || (m2 & 0x07) != rstExpect)
            return Left("bad_restart")
          p += 2
          rstExpect = (rstExpect + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        mx += 1
      }
      my += 1
    }

    // crop to the stated dims, upsampling subsampled components by
    // replication (image pixel → component pixel x·h_c/maxH, y·v_c/maxV);
    // 3 components are YCbCr
    val out = new Array[Byte](width * height * (if (nComp == 3) 3 else 1))
    var yy = 0
    while (yy < height) {
      var xx = 0
      while (xx < width) {
        if (nComp == 1) out(yy * width + xx) = planes(0)(yy * planeW(0) + xx)
        else {
          def at(c: Int): Int = {
            val cx = xx * compH(c) / maxH
            val cy = yy * compV(c) / maxV
            planes(c)(cy * planeW(c) + cx) & 0xff
          }
          val yv = at(0)
          val cb = at(1) - 128
          val cr = at(2) - 128
          // JFIF inverse transform, rounded and clamped
          val r = StrictMath.floor(yv + 1.402 * cr + 0.5).toInt
          val g = StrictMath.floor(yv - 0.344136 * cb - 0.714136 * cr + 0.5).toInt
          val b = StrictMath.floor(yv + 1.772 * cb + 0.5).toInt
          val o = (yy * width + xx) * 3
          out(o) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          out(o + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          out(o + 2) = (if (b < 0) 0 else if (b > 255) 255 else b).toByte
        }
        xx += 1
      }
      yy += 1
    }
    Right(Image(width, height, if (nComp == 3) 3 else 1, out))
  }

  // ------------------------------------------------------------ encode

  /** Entropy bit writer with 0xFF00 byte stuffing (§F.1.2.3). */
  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var bitBuf = 0L
    private var bitCnt = 0
    def putBits(code: Int, len: Int): Unit = {
      bitBuf = (bitBuf << len) | (code & ((1L << len) - 1))
      bitCnt += len
      while (bitCnt >= 8) {
        val b = ((bitBuf >>> (bitCnt - 8)) & 0xff).toInt
        buf.write(b)
        if (b == 0xff) buf.write(0x00)
        bitCnt -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (bitCnt > 0) { val pad = 8 - bitCnt; putBits((1 << pad) - 1, pad) }
      buf.toByteArray
    }
    /** §F.1.2.3 restart: pad to byte boundary with 1-bits (stuffing
      * applies if the pad byte lands on 0xFF), then the RSTm marker
      * raw — markers are never byte-stuffed. */
    def restartMarker(m: Int): Unit = {
      if (bitCnt > 0) { val pad = 8 - bitCnt; putBits((1 << pad) - 1, pad) }
      buf.write(0xff); buf.write(0xd0 + m)
    }
  }

  private def sizeBits(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** FDCT (§A.3.3) + uniform quantization of the 8×8 block of `plane`
    * at (bx0, by0), then DC-diff + run/size entropy coding into `bw`.
    * Returns the block's DC coefficient (the next prediction). */
  private def encodeBlock(plane: Array[Int], planeW: Int, bx0: Int,
      by0: Int, prevDc: Int, bw: BitWriter,
      dcCodes: Array[(Int, Int)], acCodes: Array[(Int, Int)]): Int = {
    val coef = new Array[Int](64)
    // separable FDCT: row pass then column pass (2·8³ multiplies)
    val rowSum = new Array[Double](64) // [u][yy]
    var u = 0
    while (u < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var xx = 0
        while (xx < 8) {
          s += (plane((by0 + yy) * planeW + bx0 + xx) - 128) * Cos(u)(xx)
          xx += 1
        }
        rowSum(u * 8 + yy) = s
        yy += 1
      }
      u += 1
    }
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 8) {
          s += rowSum(u * 8 + yy) * Cos(v)(yy)
          yy += 1
        }
        val f = 0.25 * C(u) * C(v) * s
        coef(v * 8 + u) = StrictMath.floor(f / EncQuant(0) + 0.5).toInt
        v += 1
      }
      u += 1
    }
    // DC: category + diff bits (§F.1.2.1)
    val diff = coef(0) - prevDc
    val dSize = sizeBits(diff)
    require(dSize <= 11)
    val (dCode, dLen) = dcCodes(dSize)
    bw.putBits(dCode, dLen)
    if (dSize > 0)
      bw.putBits(if (diff < 0) diff + (1 << dSize) - 1 else diff, dSize)
    // AC: run/size with EOB and ZRL (§F.1.2.2)
    var k = 1
    var run = 0
    while (k < 64) {
      val v = coef(Zigzag(k))
      if (v == 0) run += 1
      else {
        while (run > 15) { val (zc, zl) = acCodes(0xf0); bw.putBits(zc, zl); run -= 16 }
        val aSize = sizeBits(v)
        require(aSize <= 10)
        val (aCode, aLen) = acCodes((run << 4) | aSize)
        bw.putBits(aCode, aLen)
        bw.putBits(if (v < 0) v + (1 << aSize) - 1 else v, aSize)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ec, el) = acCodes(0x00); bw.putBits(ec, el) }
    coef(0)
  }

  /** JFIF forward transform, rounded (the inverse lives in decodeScan). */
  private def toYcbcr(r: Int, g: Int, b: Int): (Int, Int, Int) = {
    val yv = StrictMath.floor(0.299 * r + 0.587 * g + 0.114 * b + 0.5).toInt
    val cb = StrictMath.floor(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0 + 0.5).toInt
    val cr = StrictMath.floor(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0 + 0.5).toInt
    (math.max(0, math.min(255, yv)), math.max(0, math.min(255, cb)),
      math.max(0, math.min(255, cr)))
  }

  /** SOI + DQT + SOF0 (per-component sampling factors) + DHT + SOS +
    * scan + EOI. */
  private def container(width: Int, height: Int, hvs: Seq[Int],
      scan: Array[Byte], driInterval: Int = 0): Array[Byte] = {
    val nComp = hvs.length
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, payload: Array[Byte]): Unit = {
      marker(m)
      val len = payload.length + 2
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write(payload, 0, payload.length)
    }
    marker(0xd8) // SOI
    val dqt = new Array[Byte](1 + 64)
    dqt(0) = 0
    var i = 0
    while (i < 64) { dqt(1 + i) = EncQuant(i).toByte; i += 1 }
    seg(0xdb, dqt)
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8)
    sof.write((height >> 8) & 0xff); sof.write(height & 0xff)
    sof.write((width >> 8) & 0xff); sof.write(width & 0xff)
    sof.write(nComp)
    for (c <- 0 until nComp) { sof.write(c + 1); sof.write(hvs(c)); sof.write(0) }
    seg(0xc0, sof.toByteArray)
    val dht = new java.io.ByteArrayOutputStream()
    dht.write(0x00); EncDcBits.foreach(dht.write); EncDcVals.foreach(b => dht.write(b & 0xff))
    dht.write(0x10); EncAcBits.foreach(dht.write); EncAcVals.foreach(b => dht.write(b & 0xff))
    seg(0xc4, dht.toByteArray)
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(nComp)
    for (c <- 0 until nComp) { sos.write(c + 1); sos.write(0x00) }
    sos.write(0); sos.write(63); sos.write(0) // spectral selection (baseline)
    if (driInterval > 0)
      seg(0xdd, Array(((driInterval >> 8) & 0xff).toByte,
        (driInterval & 0xff).toByte))
    seg(0xda, sos.toByteArray)
    out.write(scan)
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Valid baseline JPEG from raw samples (1 = grey, 3 = RGB via the
    * JFIF forward transform), 4:4:4, quant step 8 everywhere, fixed-
    * length canonical Huffman tables carried in DHT. Dims need not be
    * block-aligned (edge replication pads the last blocks). */
  def encode(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] =
    encode(width, height, channels, pixels, restartInterval = 0)

  /** As [[encode]], with a DRI restart interval: after every
    * `restartInterval` MCUs the scan byte-aligns, emits RSTm (m
    * cycling 0..7), and DC predictions reset — the layout real camera
    * streams use for error resilience. 0 disables. */
  def encode(width: Int, height: Int, channels: Int,
      pixels: Array[Byte], restartInterval: Int): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels=$channels")
    require(pixels.length == width * height * channels)
    require(restartInterval >= 0)
    val nComp = channels
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val planes = Array.ofDim[Int](nComp, bw * 8 * bh * 8)
    var y = 0
    while (y < bh * 8) {
      val sy = if (y < height) y else height - 1
      var x = 0
      while (x < bw * 8) {
        val sx = if (x < width) x else width - 1
        if (nComp == 1)
          planes(0)(y * bw * 8 + x) = pixels(sy * width + sx) & 0xff
        else {
          val o = (sy * width + sx) * 3
          val (yv, cb, cr) = toYcbcr(pixels(o) & 0xff, pixels(o + 1) & 0xff,
            pixels(o + 2) & 0xff)
          planes(0)(y * bw * 8 + x) = yv
          planes(1)(y * bw * 8 + x) = cb
          planes(2)(y * bw * 8 + x) = cr
        }
        x += 1
      }
      y += 1
    }
    val dcCodes = codesOf(EncDcBits, EncDcVals)
    val acCodes = codesOf(EncAcBits, EncAcVals)
    val writer = new BitWriter
    val pred = new Array[Int](nComp)
    var mcuCount = 0
    var rstNext = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        var c = 0
        while (c < nComp) {
          pred(c) = encodeBlock(planes(c), bw * 8, bx * 8, by * 8, pred(c),
            writer, dcCodes, acCodes)
          c += 1
        }
        // 4:4:4 MCU = one block per component → MCU index = by·bw + bx
        mcuCount += 1
        if (restartInterval > 0 && mcuCount % restartInterval == 0 &&
          mcuCount < bw * bh) {
          writer.restartMarker(rstNext)
          rstNext = (rstNext + 1) % 8
          java.util.Arrays.fill(pred, 0)
        }
        bx += 1
      }
      by += 1
    }
    container(width, height, Seq.fill(nComp)(0x11), writer.finish(),
      restartInterval)
  }

  /** Valid 4:2:0 baseline JPEG from RGB samples — the dominant real-
    * world layout: Y at full resolution (factors 2,2), Cb/Cr averaged
    * over 2×2 neighborhoods at half resolution (factors 1,1), MCU =
    * 4 Y blocks + Cb + Cr. The chroma average is integer-exact
    * ((a+b+c+d+2)/4), so constant 16×16 macroblocks still roundtrip
    * EXACTLY through subsampling + replication upsampling. */
  def encode420(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3)
    val mcuCols = (width + 15) / 16
    val mcuRows = (height + 15) / 16
    val pw = mcuCols * 16
    val ph = mcuRows * 16
    val yPlane = new Array[Int](pw * ph)
    val cbFull = new Array[Int](pw * ph)
    val crFull = new Array[Int](pw * ph)
    var y = 0
    while (y < ph) {
      val sy = if (y < height) y else height - 1
      var x = 0
      while (x < pw) {
        val sx = if (x < width) x else width - 1
        val o = (sy * width + sx) * 3
        val (yv, cb, cr) = toYcbcr(pixels(o) & 0xff, pixels(o + 1) & 0xff,
          pixels(o + 2) & 0xff)
        yPlane(y * pw + x) = yv
        cbFull(y * pw + x) = cb
        crFull(y * pw + x) = cr
        x += 1
      }
      y += 1
    }
    val cw = pw / 2
    val ch = ph / 2
    val cbPlane = new Array[Int](cw * ch)
    val crPlane = new Array[Int](cw * ch)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        val o = 2 * cy * pw + 2 * cx
        cbPlane(cy * cw + cx) =
          (cbFull(o) + cbFull(o + 1) + cbFull(o + pw) + cbFull(o + pw + 1) + 2) / 4
        crPlane(cy * cw + cx) =
          (crFull(o) + crFull(o + 1) + crFull(o + pw) + crFull(o + pw + 1) + 2) / 4
        cx += 1
      }
      cy += 1
    }
    val dcCodes = codesOf(EncDcBits, EncDcVals)
    val acCodes = codesOf(EncAcBits, EncAcVals)
    val writer = new BitWriter
    val pred = new Array[Int](3)
    var my = 0
    while (my < mcuRows) {
      var mx = 0
      while (mx < mcuCols) {
        // 4 Y blocks in raster order, then Cb, then Cr (§A.2.3)
        var vb = 0
        while (vb < 2) {
          var hb = 0
          while (hb < 2) {
            pred(0) = encodeBlock(yPlane, pw, (mx * 2 + hb) * 8,
              (my * 2 + vb) * 8, pred(0), writer, dcCodes, acCodes)
            hb += 1
          }
          vb += 1
        }
        pred(1) = encodeBlock(cbPlane, cw, mx * 8, my * 8, pred(1),
          writer, dcCodes, acCodes)
        pred(2) = encodeBlock(crPlane, cw, mx * 8, my * 8, pred(2),
          writer, dcCodes, acCodes)
        mx += 1
      }
      my += 1
    }
    container(width, height, Seq(0x22, 0x11, 0x11), writer.finish())
  }
}
