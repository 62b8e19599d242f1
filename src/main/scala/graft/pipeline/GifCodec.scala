package graft.pipeline

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM animated-GIF pixel codec (the public GIF89a specification):
  * header + Logical Screen Descriptor → Global Color Table → block walk
  * (Graphic Control Extensions for frame delays, Image Descriptors for
  * frames) → REAL LZW decompression (variable code width 3–12 bits,
  * LSB-first packing, clear/EOI codes, KwKwK case) → palette-mapped RGB
  * frames. This is the genuinely-animated end of the multimodal family:
  * one payload explodes into N timed frames, each with real decoded
  * pixels — the video frame-sampling shape with an actual codec behind
  * it.
  *
  * The LZW encoder builds a real dictionary (greedy longest-match, width
  * growth in lockstep with the decoder, clear-code reset when the table
  * fills), so a decode(encode(frames)) roundtrip certifies the decoder
  * on streams with genuine dictionary growth — not just literal codes.
  *
  * Strictness: wrong signature, truncated blocks, out-of-range pixel
  * codes, or a frame that does not decode to exactly width·height
  * indices all return None rather than garbage pixels. Local colour
  * tables (per-frame palette override) and interlaced frames (GIF89a
  * §20 four-pass row order) decode — both are common in crawl data.
  */
object GifCodec {

  /** One decoded frame: full palette-index raster (row-major,
    * `width·height` bytes, already DE-interlaced if the frame was
    * stored interlaced) plus the RGB `palette` that applies to THIS
    * frame — its local colour table when present, else the global one.
    * `delayCs` is the GCE delay in centiseconds (0 if none given). */
  final case class Frame(left: Int, top: Int, width: Int, height: Int,
      delayCs: Int, indices: Array[Byte], palette: Array[Byte])

  final case class Gif(width: Int, height: Int, palette: Array[Byte],
      frames: Seq[Frame])

  /** Encoder-side frame description for [[encodeEx]]: optional local
    * colour table (RGB triples, power-of-two entry count) and interlaced
    * row storage. */
  final case class FrameSpec(delayCs: Int, indices: Array[Byte],
      localPalette: Option[Array[Byte]] = None, interlaced: Boolean = false)

  /** GIF89a §20 interlace pass structure: rows are stored pass 1
    * (0,8,16,…), pass 2 (4,12,…), pass 3 (2,6,10,…), pass 4 (1,3,5,…).
    * Returns the storage order of row indices for a `height`-row frame. */
  private[pipeline] def interlaceRowOrder(height: Int): Array[Int] = {
    val out = new Array[Int](height)
    var n = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < height) { out(n) = y; n += 1; y += step }
    }
    out
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  // ---------------------------------------------------------------- LZW

  /** GIF-variant LZW decode: codes are packed LSB-first; width starts at
    * `minCodeSize + 1` and grows when the table reaches the width's
    * capacity, capping at 12 bits; `clear` resets the table; the code
    * equal to the next free slot is the KwKwK self-reference. Returns
    * None on any malformed stream. */
  private[pipeline] def lzwDecode(minCodeSize: Int, data: Array[Byte],
      maxOut: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    // dictionary as prefix-chain tables (no per-entry byte arrays)
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    var nextFree = eoi + 1
    var width = minCodeSize + 1
    var prev = -1
    var bitPos = 0
    val nBits = data.length * 8
    val tail = new Array[Byte](4096) // scratch for emitting one chain

    def emit(code: Int): Byte = { // returns first byte of the chain
      var n = 0
      var c = code
      while (c >= clear + 2) { tail(n) = suffix(c); n = n + 1; c = prefix(c) }
      val first = c.toByte // literal root
      out.write(first & 0xff)
      var i = n - 1
      while (i >= 0) { out.write(tail(i) & 0xff); i -= 1 }
      first
    }

    while (bitPos + width <= nBits) {
      // read `width` bits LSB-first
      var code = 0
      var got = 0
      while (got < width) {
        val byteIdx = (bitPos + got) >> 3
        val bit = (data(byteIdx) >> ((bitPos + got) & 7)) & 1
        code |= bit << got
        got += 1
      }
      bitPos += width
      if (code == clear) {
        nextFree = eoi + 1; width = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return if (out.size() <= maxOut) Some(out.toByteArray) else None
      } else if (prev == -1) {
        if (code >= clear) return None // first code after clear: literal only
        out.write(code); prev = code
      } else {
        var firstByte: Byte = 0
        if (code < nextFree) {
          firstByte = emit(code)
        } else if (code == nextFree && nextFree < 4096) {
          // KwKwK: entry is prev-chain + its own first byte
          val f = firstOf(prefix, suffix, clear, prev)
          // emit prev chain then f
          emit(prev)
          out.write(f & 0xff)
          firstByte = f
        } else return None // code beyond table: corrupt
        if (nextFree < 4096) {
          prefix(nextFree) = prev; suffix(nextFree) = firstByte
          nextFree += 1
          if (nextFree == (1 << width) && width < 12) width += 1
        }
        prev = code
        if (out.size() > maxOut) return None // runaway stream
      }
    }
    Some(out.toByteArray)
  }

  private def firstOf(prefix: Array[Int], suffix: Array[Byte], clear: Int,
      code: Int): Byte = {
    var c = code
    while (c >= clear + 2) c = prefix(c)
    c.toByte
  }

  /** GIF-variant LZW encode with a REAL dictionary (greedy longest
    * match over a (prefixCode, byte) hash map). Width grows one step
    * behind the decoder's table-size check — the encoder has already
    * registered the entry the decoder will add only after reading the
    * next code — and a clear code resets the table when it fills. */
  private[pipeline] def lzwEncode(minCodeSize: Int,
      data: Array[Byte]): Array[Byte] = {
    require(minCodeSize >= 2 && minCodeSize <= 8)
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L; var curBits = 0
    var width = minCodeSize + 1

    def put(code: Int): Unit = {
      cur |= code.toLong << curBits
      curBits += width
      while (curBits >= 8) {
        out.write((cur & 0xff).toInt); cur >>>= 8; curBits -= 8
      }
    }

    val dict = new java.util.HashMap[Integer, Integer]() // (prev<<8|byte)→code
    var nextFree = eoi + 1

    def reset(): Unit = { dict.clear(); nextFree = eoi + 1 }

    put(clear)
    if (data.nonEmpty) {
      var w = data(0) & 0xff // current match = a code
      var i = 1
      while (i < data.length) {
        val c = data(i) & 0xff
        val key = Integer.valueOf((w << 8) | c)
        val hit = dict.get(key)
        if (hit != null) { w = hit.intValue() }
        else {
          put(w)
          if (nextFree == 4096) {
            put(clear); width = minCodeSize + 1; reset()
          } else {
            dict.put(key, Integer.valueOf(nextFree))
            nextFree += 1
            // decoder grows when ITS table hits 1<<width after the add
            // that lags ours by one code — hence the −1
            if (nextFree - 1 == (1 << width) && width < 12) width += 1
          }
          w = c
        }
        i += 1
      }
      put(w)
    }
    put(eoi)
    if (curBits > 0) out.write((cur & 0xff).toInt)
    out.toByteArray
  }

  // ---------------------------------------------------------- container

  def decode(bytes: Array[Byte]): Option[Gif] = decodeEx(bytes).toOption

  /** Decode with a NAMED refusal reason on the Left, so a pipeline can
    * count its drops ([[Multimodal.gifDecodeStats]]) instead of losing
    * rows invisibly. Closed reason vocabulary: not_gif, bad_dims, no_gct,
    * truncated, bad_frame, bad_lzw, palette_oob, bad_block, no_frames.
    * Local colour tables and interlaced frames DECODE (per-frame palette
    * override; four-pass row de-interleave) — they are too common in
    * crawl data to refuse. */
  def decodeEx(bytes: Array[Byte]): Either[String, Gif] = {
    if (bytes.length < 13) return Left("not_gif")
    val sig = new String(bytes, 0, 6, US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return Left("not_gif")
    val width = le16(bytes, 6)
    val height = le16(bytes, 8)
    if (width <= 0 || height <= 0) return Left("bad_dims")
    val packed = bytes(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctSize = 2 << (packed & 0x7) // 2^(n+1) entries
    var pos = 13
    if (!hasGct) return Left("no_gct") // palette-less: no pixel meaning
    if (pos + gctSize * 3 > bytes.length) return Left("truncated")
    val palette = java.util.Arrays.copyOfRange(bytes, pos, pos + gctSize * 3)
    pos += gctSize * 3

    val frames = scala.collection.mutable.ArrayBuffer.empty[Frame]
    var pendingDelay = 0
    while (pos < bytes.length) {
      (bytes(pos) & 0xff) match {
        case 0x3b => // trailer
          return if (frames.nonEmpty)
            Right(Gif(width, height, palette, frames.toSeq))
          else Left("no_frames")
        case 0x21 => // extension: label + sub-blocks
          if (pos + 2 > bytes.length) return Left("truncated")
          val label = bytes(pos + 1) & 0xff
          var p = pos + 2
          // GCE payload: packed(1) delay(2 LE) transparent(1)
          if (label == 0xf9) {
            if (p + 5 > bytes.length) return Left("truncated")
            if ((bytes(p) & 0xff) != 4) return Left("bad_block")
            pendingDelay = le16(bytes, p + 2)
          }
          while (p < bytes.length && (bytes(p) & 0xff) != 0) {
            p += 1 + (bytes(p) & 0xff)
            if (p > bytes.length) return Left("truncated")
          }
          if (p >= bytes.length) return Left("truncated")
          pos = p + 1
        case 0x2c => // image descriptor
          if (pos + 10 > bytes.length) return Left("truncated")
          val left = le16(bytes, pos + 1)
          val top = le16(bytes, pos + 3)
          val fw = le16(bytes, pos + 5)
          val fh = le16(bytes, pos + 7)
          val fpacked = bytes(pos + 9) & 0xff
          val interlaced = (fpacked & 0x40) != 0
          if (fw <= 0 || fh <= 0 || left + fw > width || top + fh > height)
            return Left("bad_frame")
          var p = pos + 10
          // local colour table: overrides the global palette for this
          // frame only (common in crawl-data GIFs — a refusal here would
          // silently drop a large real-world slice)
          val framePalette = if ((fpacked & 0x80) != 0) {
            val lctSize = 2 << (fpacked & 0x7)
            if (p + lctSize * 3 > bytes.length) return Left("truncated")
            val lct = java.util.Arrays.copyOfRange(bytes, p, p + lctSize * 3)
            p += lctSize * 3
            lct
          } else palette
          if (p >= bytes.length) return Left("truncated")
          val minCodeSize = bytes(p) & 0xff
          p += 1
          val lzw = new java.io.ByteArrayOutputStream()
          while (p < bytes.length && (bytes(p) & 0xff) != 0) {
            val n = bytes(p) & 0xff
            if (p + 1 + n > bytes.length) return Left("truncated")
            lzw.write(bytes, p + 1, n)
            p += 1 + n
          }
          if (p >= bytes.length) return Left("truncated")
          pos = p + 1
          val stored = lzwDecode(minCodeSize, lzw.toByteArray, fw * fh)
            .getOrElse(return Left("bad_lzw"))
          if (stored.length != fw * fh) return Left("bad_lzw")
          // de-interlace: stored row k belongs at interlaceRowOrder(k)
          val indices = if (interlaced) {
            val order = interlaceRowOrder(fh)
            val out = new Array[Byte](fw * fh)
            var k = 0
            while (k < fh) {
              System.arraycopy(stored, k * fw, out, order(k) * fw, fw)
              k += 1
            }
            out
          } else stored
          var i = 0
          val maxIdx = framePalette.length / 3
          while (i < indices.length) {
            if ((indices(i) & 0xff) >= maxIdx) return Left("palette_oob")
            i += 1
          }
          frames += Frame(left, top, fw, fh, pendingDelay, indices,
            framePalette)
          pendingDelay = 0
        case _ => return Left("bad_block")
      }
    }
    Left("truncated") // ran off the end without a trailer
  }

  /** Emit a valid animated GIF89a: global palette (`rgb` triples, entry
    * count a power of two ≥ 2), one GCE + full-canvas image per frame.
    * `frames` are (delayCs, row-major palette indices of width·height). */
  def encode(width: Int, height: Int, palette: Array[Byte],
      frames: Seq[(Int, Array[Byte])]): Array[Byte] =
    encodeEx(width, height, palette,
      frames.map { case (d, ix) => FrameSpec(d, ix) })

  /** Full-control encoder: per-frame local colour tables and interlaced
    * row storage, so the decoder's LCT/de-interlace paths can be
    * certified on real bytes end-to-end. */
  def encodeEx(width: Int, height: Int, palette: Array[Byte],
      frames: Seq[FrameSpec]): Array[Byte] = {
    def paletteBits(p: Array[Byte]): Int = {
      require(p.length % 3 == 0 && p.length >= 6)
      val entries = p.length / 3
      require((entries & (entries - 1)) == 0, "palette entries: power of two")
      31 - Integer.numberOfLeadingZeros(entries) // log2
    }
    val sizeBits = paletteBits(palette)
    require(frames.nonEmpty)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes(US_ASCII))
    out.write(width & 0xff); out.write((width >> 8) & 0xff)
    out.write(height & 0xff); out.write((height >> 8) & 0xff)
    out.write(0x80 | 0x70 | (sizeBits - 1)) // GCT, 8-bit colour res
    out.write(0); out.write(0) // bg index, aspect
    out.write(palette, 0, palette.length)
    frames.foreach { f =>
      require(f.indices.length == width * height, "full-canvas frames only")
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(0) // packed: no disposal/transparency
      out.write(f.delayCs & 0xff); out.write((f.delayCs >> 8) & 0xff)
      out.write(0); out.write(0) // transparent idx, terminator
      out.write(0x2c) // image descriptor: full canvas
      out.write(0); out.write(0); out.write(0); out.write(0)
      out.write(width & 0xff); out.write((width >> 8) & 0xff)
      out.write(height & 0xff); out.write((height >> 8) & 0xff)
      val lctBits = f.localPalette.map(paletteBits)
      out.write((if (lctBits.isDefined) 0x80 else 0) |
        (if (f.interlaced) 0x40 else 0) |
        lctBits.map(_ - 1).getOrElse(0))
      f.localPalette.foreach(p => out.write(p, 0, p.length))
      val effBits = lctBits.getOrElse(sizeBits)
      val minCodeSize = math.max(2, effBits)
      // interlaced storage: rows written in the four-pass order the
      // decoder will undo
      val stored = if (f.interlaced) {
        val order = interlaceRowOrder(height)
        val s = new Array[Byte](width * height)
        var k = 0
        while (k < height) {
          System.arraycopy(f.indices, order(k) * width, s, k * width, width)
          k += 1
        }
        s
      } else f.indices
      out.write(minCodeSize)
      val lzw = lzwEncode(minCodeSize, stored)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n); out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }
}
