package graft.pipeline

/** Pure-JVM image METADATA codec: parses real PNG / JPEG / GIF headers from
  * binary payloads — width, height, channels, bit depth — with no native
  * library. These are public container formats (PNG: RFC 2083 §4.1.1 IHDR;
  * JPEG: ITU-T T.81 §B.2.2 SOFn frame header; GIF: GIF89a spec §18 Logical
  * Screen Descriptor), so a 100 TB multimodal pipeline can run the
  * metadata/stats pass with zero codec dependencies; pixel-level ops sit
  * behind the real decoders ([[PngCodec]], [[GifCodec]], [[WavCodec]]).
  *
  * Parsing is strict: wrong signature, truncated header, or a corrupt PNG
  * IHDR CRC returns None rather than garbage dimensions.
  */
object ImageHeaders {

  /** Parsed header facts. `bitDepth` is per-channel (PNG bit depth, JPEG
    * sample precision, GIF colour-resolution bits). */
  final case class Meta(format: String, width: Int, height: Int,
      channels: Int, bitDepth: Int)

  def parse(b: Array[Byte]): Option[Meta] =
    parsePng(b).orElse(parseJpeg(b)).orElse(parseGif(b))

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val pngSig: Array[Int] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG channel count by IHDR colour type (RFC 2083 §4.1.1):
    * 0 greyscale, 2 truecolour, 3 indexed, 4 grey+alpha, 6 RGBA. */
  private def pngChannels(colorType: Int): Option[Int] = colorType match {
    case 0 => Some(1); case 2 => Some(3); case 3 => Some(1)
    case 4 => Some(2); case 6 => Some(4); case _ => None
  }

  /** Signature + first chunk must be a 13-byte IHDR with a valid CRC32
    * over (type ‖ data) — the CRC check rejects bit-rotted headers that
    * would otherwise yield plausible-looking garbage dimensions. */
  private[pipeline] def parsePng(b: Array[Byte]): Option[Meta] = {
    if (b.length < 33) return None
    var i = 0
    while (i < 8) { if ((b(i) & 0xff) != pngSig(i)) return None; i += 1 }
    if (be32(b, 8) != 13) return None // IHDR data length is fixed at 13
    if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return None
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 4 + 13) // chunk type + data
    if (crc.getValue != (be32(b, 29).toLong & 0xffffffffL)) return None
    val width = be32(b, 16)
    val height = be32(b, 20)
    if (width <= 0 || height <= 0) return None
    val bitDepth = b(24) & 0xff
    pngChannels(b(25) & 0xff).map(ch => Meta("png", width, height, ch, bitDepth))
  }

  /** Walk the marker-segment stream from SOI to the first SOFn frame
    * header (T.81 §B.2.2): precision(1) height(2) width(2) ncomp(1).
    * SOF markers are 0xC0–0xCF minus DHT(C4)/JPG(C8)/DAC(CC); the scan
    * stops at SOS (entropy-coded data follows — a frame header after
    * that would belong to a different scan protocol). */
  private[pipeline] def parseJpeg(b: Array[Byte]): Option[Meta] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    while (pos + 3 < b.length) {
      if ((b(pos) & 0xff) != 0xff) return None // lost marker sync
      var p = pos
      while (p < b.length && (b(p) & 0xff) == 0xff) p += 1 // fill bytes
      if (p >= b.length) return None
      val marker = b(p) & 0xff
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) {
        pos = p + 1 // standalone marker, no length field
      } else {
        if (p + 2 >= b.length) return None
        val segLen = be16(b, p + 1)
        if (segLen < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (p + 8 >= b.length || segLen < 8) return None
          val precision = b(p + 3) & 0xff
          val height = be16(b, p + 4)
          val width = be16(b, p + 6)
          val ncomp = b(p + 8) & 0xff
          if (width <= 0 || height <= 0 || ncomp <= 0) return None
          return Some(Meta("jpeg", width, height, ncomp, precision))
        }
        if (marker == 0xda) return None // SOS before any SOFn: no header
        pos = p + 1 + segLen
      }
    }
    None
  }

  /** GIF87a/89a Logical Screen Descriptor: LE16 width/height at offsets
    * 6/8; colour-resolution bits (packed byte bits 4–6, value+1) play the
    * per-channel depth; GIF palettes are RGB → 3 channels. */
  private[pipeline] def parseGif(b: Array[Byte]): Option[Meta] = {
    if (b.length < 13) return None
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val width = le16(b, 6)
    val height = le16(b, 8)
    if (width <= 0 || height <= 0) return None
    val colorRes = (((b(10) & 0xff) >> 4) & 0x7) + 1
    Some(Meta("gif", width, height, 3, colorRes))
  }
}
