package graft.pipeline

import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{CRC32, Deflater, Inflater}

/** Pure-JVM PNG PIXEL codec (RFC 2083): chunk walk → concatenated-IDAT
  * inflate (`java.util.zip.Inflater`) → per-scanline unfilter (None /
  * Sub / Up / Average / Paeth) → row-major 8-bit samples. No native
  * library, no dependency — zlib ships with the JVM and the five filter
  * predictors are ~30 lines of arithmetic. Supports every non-interlaced
  * 8-bit-depth color type: greyscale 1ch / truecolour 3ch / grey+alpha
  * 2ch / RGBA 4ch raw layouts, plus indexed-colour (type 3) expanded
  * through the PLTE chunk to RGB; 16-bit and interlaced images refuse
  * rather than emit wrong pixels, and [[decodeEx]] names the refusal so
  * a pipeline can COUNT what it drops instead of silently losing rows.
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

  def decode(bytes: Array[Byte]): Option[Image] = decodeEx(bytes).toOption

  /** Decode with a NAMED refusal reason on the Left — the per-reason
    * currency [[graft.pipeline.Multimodal.pixelDecodeStats]] aggregates so
    * dropped rows are counted, not invisible. Reasons are a closed
    * vocabulary: not_png, truncated, bad_crc, bad_chunk, bad_dims,
    * bit_depth, interlaced, color_type, missing_palette, bad_palette,
    * palette_oob, no_pixel_data, bad_deflate, bad_filter. */
  def decodeEx(bytes: Array[Byte]): Either[String, Image] = {
    if (bytes.length < Signature.length + 12) return Left("not_png")
    var i = 0
    while (i < Signature.length) {
      if (bytes(i) != Signature(i)) return Left("not_png")
      i += 1
    }
    var pos = Signature.length
    var width = 0; var height = 0; var channels = 0; var colorType = 0
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
          val bitDepth = bytes(pos + 16) & 0xff
          colorType = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          if (interlace != 0) return Left("interlaced")
          if (bitDepth != 8) return Left("bit_depth")
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

    val rowBytes = width * channels
    val raw = new Array[Byte]((1 + rowBytes) * height)
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
    val bpp = channels
    var y = 0
    while (y < height) {
      val filter = raw(y * (1 + rowBytes)) & 0xff
      val src = y * (1 + rowBytes) + 1
      val dst = y * rowBytes
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
          case _ => return Left("bad_filter")
        }
        out(dst + x) = (recon & 0xff).toByte
        x += 1
      }
      y += 1
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

  /** Valid non-interlaced 8-bit PNG from raw samples; `filterFor(y)`
    * picks the per-scanline filter (0–4), so tests can force every
    * unfilter path through real deflate bytes. */
  def encode(width: Int, height: Int, channels: Int, pixels: Array[Byte],
      filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(pixels.length == width * height * channels,
      s"pixel buffer ${pixels.length} != $width*$height*$channels")
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case 4 => 6
      case c => throw new IllegalArgumentException(s"channels=$c")
    }
    val rowBytes = width * channels
    val bpp = channels
    val raw = new Array[Byte]((1 + rowBytes) * height)
    var y = 0
    while (y < height) {
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"filter $f")
      raw(y * (1 + rowBytes)) = f.toByte
      val dst = y * (1 + rowBytes) + 1
      val src = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val cur = pixels(src + x) & 0xff
        val left = if (x >= bpp) pixels(src + x - bpp) & 0xff else 0
        val up = if (y > 0) pixels(src - rowBytes + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) pixels(src - rowBytes + x - bpp) & 0xff else 0
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
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new java.io.ByteArrayOutputStream()
    while (!deflater.finished())
      zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(colorType.toByte)
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr.array()))
    out.write(chunk("IDAT", zout.toByteArray))
    out.write(chunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }

  /** Valid indexed-colour (type 3) PNG: PLTE triples + filtered 8-bit
    * index scanlines. `filterFor(y)` as in [[encode]] — the filter runs
    * over index bytes with bpp = 1, exactly what the decoder unfilters
    * before palette expansion. */
  def encodePalette(width: Int, height: Int, palette: Array[Byte],
      indices: Array[Byte], filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(palette.length % 3 == 0 && palette.length >= 3 &&
      palette.length <= 256 * 3, s"palette bytes ${palette.length}")
    require(indices.length == width * height,
      s"index buffer ${indices.length} != $width*$height")
    val raw = new Array[Byte]((1 + width) * height)
    var y = 0
    while (y < height) {
      val f = filterFor(y)
      require(f >= 0 && f <= 4, s"filter $f")
      raw(y * (1 + width)) = f.toByte
      var x = 0
      while (x < width) {
        val cur = indices(y * width + x) & 0xff
        val left = if (x >= 1) indices(y * width + x - 1) & 0xff else 0
        val up = if (y > 0) indices((y - 1) * width + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= 1) indices((y - 1) * width + x - 1) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, upLeft)
        }
        raw(y * (1 + width) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new java.io.ByteArrayOutputStream()
    while (!deflater.finished())
      zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val ihdr = java.nio.ByteBuffer.allocate(13)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(3.toByte) // bit depth 8, indexed colour
    ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature)
    out.write(chunk("IHDR", ihdr.array()))
    out.write(chunk("PLTE", palette))
    out.write(chunk("IDAT", zout.toByteArray))
    out.write(chunk("IEND", Array.empty[Byte]))
    out.toByteArray
  }
}
