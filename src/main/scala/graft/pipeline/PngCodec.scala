package graft.pipeline

import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG PIXEL codec (RFC 2083): chunk walk → concatenated-IDAT
  * inflate (`java.util.zip.Inflater`) → per-scanline unfilter (None /
  * Sub / Up / Average / Paeth) → row-major 8-bit samples. No native
  * library, no dependency — zlib ships with the JVM and the five filter
  * predictors are ~30 lines of arithmetic. Supports every colour type:
  * greyscale 1ch / truecolour 3ch / grey+alpha 2ch / RGBA 4ch raw
  * layouts, indexed-colour (type 3) expanded through the PLTE chunk to
  * RGB, 16-bit samples (reduced to their high byte, the libpng strip-16
  * convention), and Adam7 interlacing (seven filtered sub-images
  * scattered back onto the canvas). Sub-byte packed depths refuse
  * rather than emit wrong pixels, and [[decodeEx]] names every refusal
  * so a pipeline can COUNT what it drops instead of silently losing
  * rows.
  *
  * The encoder exists so the decoder can be certified on REAL
  * compressed bytes end-to-end: it applies a caller-chosen filter per
  * scanline (forward transform), deflates, and emits valid chunks with
  * correct CRCs — a decode(encode(pixels)) roundtrip exercises every
  * filter path against ground-truth pixels.
  */
object PngCodec {

  /** Row-major samples, `width·height·channels` bytes, 8-bit. */
  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def channelsOf(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1); case 2 => Some(3); case 4 => Some(2); case 6 => Some(4)
    case 3 => Some(1) // indexed: one PLTE index per pixel pre-expansion
    case _ => None
  }

  /** Paeth predictor (RFC 2083 §6.6): nearest of a/b/c to a + b − c,
    * ties broken a, then b, then c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Adam7 pass grid (RFC 2083 §2.6): (xStart, yStart, xStep, yStep) for
    * each of the seven passes, in storage order. */
  private[pipeline] val Adam7: Array[(Int, Int, Int, Int)] = Array(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Unfilter `h` scanlines of `rowBytes` bytes each from `raw` at
    * `rawOff` (each prefixed by its filter byte) into `out` at `outOff`.
    * Returns false on an unknown filter type. Shared by the sequential
    * and per-Adam7-pass reconstruction paths — a pass is just a smaller
    * image. */
  private def unfilterInto(raw: Array[Byte], rawOff: Int, out: Array[Byte],
      outOff: Int, rowBytes: Int, h: Int, bpp: Int): Boolean = {
    var y = 0
    while (y < h) {
      val filter = raw(rawOff + y * (1 + rowBytes)) & 0xff
      val src = rawOff + y * (1 + rowBytes) + 1
      val dst = outOff + y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val cur = raw(src + x) & 0xff
        val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
        val up = if (y > 0) out(dst - rowBytes + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) out(dst - rowBytes + x - bpp) & 0xff else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, upLeft)
          case _ => return false
        }
        out(dst + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
    }
    true
  }

  def decode(bytes: Array[Byte]): Option[Image] = decodeEx(bytes).toOption

  /** Decode with a NAMED refusal reason on the Left — the per-reason
    * currency [[graft.pipeline.Multimodal.pixelDecodeStats]] aggregates so
    * dropped rows are counted, not invisible. Reasons are a closed
    * vocabulary: not_png, truncated, bad_crc, bad_chunk, bad_dims,
    * bit_depth (sub-byte packed depths only — 16-bit decodes),
    * bad_interlace (method > 1 — Adam7 decodes), color_type,
    * missing_palette, bad_palette, palette_oob, no_pixel_data,
    * bad_deflate, bad_filter. */
  def decodeEx(bytes: Array[Byte]): Either[String, Image] = {
    if (bytes.length < Signature.length + 12) return Left("not_png")
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return Left("not_png")
      i += 1
    }
    var pos = Signature.length
    var width = 0; var height = 0; var channels = 0; var colorType = 0
    var bitDepth = 0; var interlaced = false
    var sawIhdr = false
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = be32(bytes, pos)
      if (len < 0 || pos + 12 + len > bytes.length) return Left("truncated")
      val ctype = new String(bytes, pos + 4, 4, US_ASCII)
      val crc = new CRC32
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue != (be32(bytes, pos + 8 + len).toLong & 0xffffffffL))
        return Left("bad_crc") // bit rot: refuse, never emit garbage pixels
      ctype match {
        case "IHDR" =>
          if (len != 13) return Left("bad_chunk")
          width = be32(bytes, pos + 8)
          height = be32(bytes, pos + 12)
          bitDepth = bytes(pos + 16) & 0xff
          colorType = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          if (interlace > 1) return Left("bad_interlace")
          interlaced = interlace == 1
          // 8-bit everywhere; 16-bit for the raw-sample layouts (the
          // spec forbids 16-bit palette); sub-byte packed depths refuse
          if (bitDepth != 8 && !(bitDepth == 16 && colorType != 3))
            return Left("bit_depth")
          channels = channelsOf(colorType).getOrElse(return Left("color_type"))
          if (width <= 0 || height <= 0) return Left("bad_dims")
          sawIhdr = true
        case "PLTE" =>
          if (len == 0 || len % 3 != 0 || len > 256 * 3)
            return Left("bad_palette")
          palette = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks are skippable by design
      }
      pos += 12 + len
    }
    if (!done) return Left("truncated") // ran out of bytes before IEND
    if (!sawIhdr || idat.size() == 0) return Left("no_pixel_data")
    if (colorType == 3 && palette == null) return Left("missing_palette")

    val sampleBytes = bitDepth / 8
    val bpp = channels * sampleBytes
    val rowBytes = width * bpp
    def passDims(p: (Int, Int, Int, Int)): (Int, Int) = {
      val (xs, ys, xStep, yStep) = p
      (if (width > xs) (width - xs + xStep - 1) / xStep else 0,
        if (height > ys) (height - ys + yStep - 1) / yStep else 0)
    }
    val rawLen =
      if (!interlaced) (1 + rowBytes) * height
      else Adam7.map { p =>
        val (pw, ph) = passDims(p)
        if (pw > 0 && ph > 0) ph * (1 + pw * bpp) else 0
      }.sum
    val raw = new Array[Byte](rawLen)
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput())
          return Left("bad_deflate") // truncated stream
        off += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return Left("bad_deflate")
    } finally inflater.end()
    if (off != raw.length) return Left("bad_deflate")

    val out = new Array[Byte](rowBytes * height)
    if (!interlaced) {
      if (!unfilterInto(raw, 0, out, 0, rowBytes, height, bpp))
        return Left("bad_filter")
    } else {
      // Adam7: each pass is an independent filtered sub-image; unfilter
      // it in its own coordinate space, then scatter its pixels onto the
      // full-canvas grid (RFC 2083 §2.6)
      var rawOff = 0
      var pi = 0
      while (pi < Adam7.length) {
        val (xs, ys, xStep, yStep) = Adam7(pi)
        val (pw, ph) = passDims(Adam7(pi))
        if (pw > 0 && ph > 0) {
          val pRow = pw * bpp
          val pass = new Array[Byte](pRow * ph)
          if (!unfilterInto(raw, rawOff, pass, 0, pRow, ph, bpp))
            return Left("bad_filter")
          var py = 0
          while (py < ph) {
            var px = 0
            while (px < pw) {
              val dst = ((ys + py * yStep) * width + (xs + px * xStep)) * bpp
              val src = (py * pw + px) * bpp
              var c = 0
              while (c < bpp) { out(dst + c) = pass(src + c); c += 1 }
              px += 1
            }
            py += 1
          }
          rawOff += ph * (1 + pRow)
        }
        pi += 1
      }
    }
    if (bitDepth == 16) {
      // 16-bit samples are big-endian; reduce to the high byte for the
      // 8-bit stats surface — the libpng strip-16 convention (the low
      // byte carries < 0.4% of the value and no structure our per-
      // channel means care about)
      val reduced = new Array[Byte](width * height * channels)
      var j = 0
      while (j < reduced.length) { reduced(j) = out(j * 2); j += 1 }
      return Right(Image(width, height, channels, reduced))
    }
    if (colorType == 3) {
      // expand PLTE indices to RGB; an index past the palette is corrupt
      val entries = palette.length / 3
      val rgb = new Array[Byte](width * height * 3)
      var j = 0
      while (j < out.length) {
        val idx = out(j) & 0xff
        if (idx >= entries) return Left("palette_oob")
        rgb(j * 3) = palette(idx * 3)
        rgb(j * 3 + 1) = palette(idx * 3 + 1)
        rgb(j * 3 + 2) = palette(idx * 3 + 2)
        j += 1
      }
      Right(Image(width, height, 3, rgb))
    } else Right(Image(width, height, channels, out))
  }

  private[pipeline] def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + data.length)
    out.putInt(data.length)
    out.put(ctype.getBytes(US_ASCII)).put(data)
    val crc = new CRC32
    crc.update(ctype.getBytes(US_ASCII)); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Forward-filter `h` scanlines of a `w`×`h` sub-image (`bpp` bytes
    * per pixel) into (filterByte ‖ filtered row) form. `filterAt` maps a
    * RUNNING scanline counter (starting at `yBase`) to a filter type so
    * callers can cycle all five filters across passes. */
  private def filterRows(pix: Array[Byte], w: Int, h: Int, bpp: Int,
      yBase: Int, filterAt: Int => Int): Array[Byte] = {
    val rowBytes = w * bpp
    val raw = new Array[Byte]((1 + rowBytes) * h)
    var y = 0
    while (y < h) {
      val f = filterAt(yBase + y)
      require(f >= 0 && f <= 4, s"filter $f")
      raw(y * (1 + rowBytes)) = f.toByte
      val dst = y * (1 + rowBytes) + 1
      val src = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val cur = pix(src + x) & 0xff
        val left = if (x >= bpp) pix(src + x - bpp) & 0xff else 0
        val up = if (y > 0) pix(src - rowBytes + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) pix(src - rowBytes + x - bpp) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(dst + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new java.io.ByteArrayOutputStream()
    while (!deflater.finished())
      zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    zout.toByteArray
  }

  private def assemble(width: Int, height: Int, bitDepth: Int,
      colorType: Int, interlace: Int, idat: Array[Byte],
      plte: Option[Array[Byte]] = None): Array[Byte] = {
    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(bitDepth.toByte).put(colorType.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(interlace.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr.array()))
    plte.foreach(p => out.write(chunk("PLTE", p)))
    out.write(chunk("IDAT", idat))
    out.write(chunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  /** Gather-then-filter the seven Adam7 passes of a raw sample buffer;
    * the running scanline counter feeds `filterFor` across passes. */
  private def adam7Raw(pixels: Array[Byte], width: Int, height: Int,
      bpp: Int, filterFor: Int => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var yBase = 0
    for ((xs, ys, xStep, yStep) <- Adam7) {
      val pw = if (width > xs) (width - xs + xStep - 1) / xStep else 0
      val ph = if (height > ys) (height - ys + yStep - 1) / yStep else 0
      if (pw > 0 && ph > 0) {
        val pass = new Array[Byte](pw * ph * bpp)
        var py = 0
        while (py < ph) {
          var px = 0
          while (px < pw) {
            val src = ((ys + py * yStep) * width + (xs + px * xStep)) * bpp
            val dst = (py * pw + px) * bpp
            var c = 0
            while (c < bpp) { pass(dst + c) = pixels(src + c); c += 1 }
            px += 1
          }
          py += 1
        }
        out.write(filterRows(pass, pw, ph, bpp, yBase, filterFor))
        yBase += ph
      }
    }
    out.toByteArray
  }

  /** Valid 8-bit PNG from raw samples; `filterFor(y)` picks the
    * per-scanline filter (0–4), so tests can force every unfilter path
    * through real deflate bytes. `interlaced` stores the seven Adam7
    * passes (scanline counter runs across passes). */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
      filterFor: Int => Int = _ => 0,
      interlaced: Boolean = false): Array[Byte] = {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case c => throw new IllegalArgumentException(s"channels=$c")
    }
    val raw =
      if (interlaced) adam7Raw(pixels, width, height, channels, filterFor)
      else filterRows(pixels, width, height, channels, 0, filterFor)
    assemble(width, height, 8, colorType, if (interlaced) 1 else 0,
      deflate(raw))
  }

  /** Valid 16-bit PNG from raw samples (0..65535, row-major, stored
    * big-endian per the spec); filters run bytewise with bpp =
    * channels·2 exactly as the decoder unfilters them. */
  def encode16(width: Int, height: Int, channels: Int, samples: Array[Int],
      filterFor: Int => Int = _ => 0,
      interlaced: Boolean = false): Array[Byte] = {
    require(samples.length == width * height * channels,
      s"sample buffer ${samples.length} != $width*$height*$channels")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case c => throw new IllegalArgumentException(s"channels=$c")
    }
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      require(v >= 0 && v <= 0xffff, s"sample $v out of 16-bit range")
      bytes(i * 2) = ((v >> 8) & 0xff).toByte
      bytes(i * 2 + 1) = (v & 0xff).toByte
      i += 1
    }
    val bpp = channels * 2
    val raw =
      if (interlaced) adam7Raw(bytes, width, height, bpp, filterFor)
      else filterRows(bytes, width, height, bpp, 0, filterFor)
    assemble(width, height, 16, colorType, if (interlaced) 1 else 0,
      deflate(raw))
  }

  /** Valid indexed-colour (type 3) PNG: PLTE triples + filtered 8-bit
    * index scanlines. `filterFor(y)` as in [[encode]] — the filter runs
    * over index bytes with bpp = 1, exactly what the decoder unfilters
    * before palette expansion. */
  def encodePalette(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte], filterFor: Int => Int = _ => 0,
      interlaced: Boolean = false): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length >= 3 &&
      palette.length <= 256 * 3, s"palette bytes ${palette.length}")
    require(indices.length == width * height,
      s"index buffer ${indices.length} != $width*$height")
    val raw =
      if (interlaced) adam7Raw(indices, width, height, 1, filterFor)
      else filterRows(indices, width, height, 1, 0, filterFor)
    assemble(width, height, 8, 3, if (interlaced) 1 else 0,
      deflate(raw), plte = Some(palette))
  }
}
