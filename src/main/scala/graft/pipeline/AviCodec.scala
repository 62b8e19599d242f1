package graft.pipeline

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM AVI (RIFF) container codec for Motion-JPEG video streams
  * (the public Microsoft RIFF/AVI layout: `RIFF 'AVI '` → `LIST hdrl`
  * with the `avih` main header and a `LIST strl` stream description →
  * `LIST movi` holding one `00dc` chunk per compressed frame). MJPEG
  * stores each frame as a self-contained baseline JPEG, so the
  * container walk here composes with [[JpegCodec]] for full
  * pixel-level frame decode — the "video" modality of the pipeline is
  * container walk + per-frame image decode, not a new entropy layer.
  *
  * The reference pipeline treats media as opaque binaries
  * (MEVI/dataprocess handle text+ids only); this codec exists so the
  * engine's frame-sampling queries run on REAL video bytes with an
  * arithmetic oracle, mirroring the PNG/GIF/JPEG/WAV codecs.
  *
  * Refusals return a named reason rather than garbage frames: wrong
  * magic, truncated chunks, a non-MJPG stream handler, a missing main
  * header, or a `movi` frame count that contradicts `avih`. RIFF
  * chunks are word-aligned (odd payloads carry a pad byte) in both
  * directions.
  *
  * The encoder exists so the decoder is certified on real container
  * bytes end-to-end, and so fixture queries can generate VALID AVIs
  * arithmetically per doc (frames via [[JpegCodec.encode]]).
  */
object AviCodec {

  /** Container-level view: per-frame compressed JPEG payloads plus the
    * stream geometry from `avih`. Frame pixels come from
    * [[JpegCodec.decode]] on each payload. */
  final case class Video(width: Int, height: Int, microSecPerFrame: Int,
      frames: Vector[Array[Byte]])

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, US_ASCII)

  def decode(bytes: Array[Byte]): Option[Video] = decodeEx(bytes).toOption

  /** Left = named refusal reason (stable snake_case for the drop
    * accounting queries), Right = decoded container. */
  def decodeEx(bytes: Array[Byte]): Either[String, Video] = {
    if (bytes.length < 12 || tag(bytes, 0) != "RIFF" ||
      tag(bytes, 8) != "AVI ") return Left("not_avi")
    val riffLen = le32(bytes, 4)
    if (riffLen < 4 || 8 + riffLen > bytes.length) return Left("truncated")

    var width = -1; var height = -1; var usecPerFrame = -1
    var totalFrames = -1
    var handler: String = null
    val frames = Vector.newBuilder[Array[Byte]]
    var nFrames = 0

    // Walk a LIST payload [from, until) one chunk at a time; `inMovi`
    // collects `##dc`/`##db` frame chunks, otherwise we descend into
    // hdrl/strl and read avih/strh. Returns a refusal or ().
    def walk(from: Int, until: Int, inMovi: Boolean): Option[String] = {
      var pos = from
      while (pos + 8 <= until) {
        val ctype = tag(bytes, pos)
        val len = le32(bytes, pos + 4)
        if (len < 0 || pos + 8 + len > until) return Some("truncated")
        val body = pos + 8
        ctype match {
          case "LIST" =>
            if (len < 4) return Some("truncated")
            val sub = tag(bytes, body)
            if (sub == "hdrl" || sub == "strl" || sub == "movi") {
              val r = walk(body + 4, body + len, inMovi = sub == "movi")
              if (r.isDefined) return r
            } // odml/INFO/...: skip, like any reader
          case "avih" =>
            if (len < 40) return Some("truncated")
            usecPerFrame = le32(bytes, body)
            totalFrames = le32(bytes, body + 16)
            width = le32(bytes, body + 32)
            height = le32(bytes, body + 36)
          case "strh" =>
            if (len < 8) return Some("truncated")
            // only the first video stream's handler gates the decode
            if (tag(bytes, body) == "vids" && handler == null)
              handler = tag(bytes, body + 4)
          case c if inMovi && c.length == 4 &&
            c.charAt(0).isDigit && c.charAt(1).isDigit &&
            (c.substring(2) == "dc" || c.substring(2) == "db") =>
            frames += java.util.Arrays.copyOfRange(bytes, body, body + len)
            nFrames += 1
          case _ => // idx1/strf/strn/JUNK/...: skip
        }
        pos += 8 + len + (len & 1) // word alignment
      }
      None
    }

    walk(12, 8 + riffLen, inMovi = false) match {
      case Some(reason) => return Left(reason)
      case None =>
    }
    if (width <= 0 || height <= 0 || usecPerFrame <= 0)
      return Left("no_main_header")
    if (handler == null) return Left("no_stream_header")
    if (handler != "MJPG" && handler != "mjpg")
      return Left("unsupported_codec")
    if (nFrames == 0) return Left("no_frames")
    if (totalFrames != nFrames) return Left("frame_count_mismatch")
    Right(Video(width, height, usecPerFrame, frames.result()))
  }

  /** Container walk + per-frame entropy decode. Any frame
    * [[JpegCodec]] refuses refuses the whole video (a video with
    * undecodable frames is corrupt, not partially usable) with the
    * frame's reason prefixed `frame_`. */
  def decodeFrames(bytes: Array[Byte]): Either[String, Vector[JpegCodec.Image]] =
    decodeEx(bytes).flatMap { v =>
      val out = Vector.newBuilder[JpegCodec.Image]
      var i = 0
      while (i < v.frames.length) {
        JpegCodec.decodeEx(v.frames(i)) match {
          case Left(reason) => return Left(s"frame_$reason")
          case Right(img) =>
            if (img.width != v.width || img.height != v.height)
              return Left("frame_geometry_mismatch")
            out += img
        }
        i += 1
      }
      Right(out.result())
    }

  /** Emit a valid single-stream MJPEG AVI: each element of `frames`
    * must be a complete JPEG payload of the stated geometry. */
  def encode(width: Int, height: Int, microSecPerFrame: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && microSecPerFrame > 0)
    require(frames.nonEmpty, "at least one frame")
    val paddedFrameLen = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val moviLen = 4 + paddedFrameLen
    val strhLen = 56; val strfLen = 40
    val strlLen = 4 + (8 + strhLen) + (8 + strfLen)
    val avihLen = 56
    val hdrlLen = 4 + (8 + avihLen) + (8 + strlLen)
    val riffLen = 4 + (8 + hdrlLen) + (8 + moviLen)
    val out = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = out.put(s.getBytes(US_ASCII))

    fourcc("RIFF"); out.putInt(riffLen); fourcc("AVI ")

    fourcc("LIST"); out.putInt(hdrlLen); fourcc("hdrl")
    fourcc("avih"); out.putInt(avihLen)
    out.putInt(microSecPerFrame)
    out.putInt(0) // dwMaxBytesPerSec
    out.putInt(0) // dwPaddingGranularity
    out.putInt(0) // dwFlags
    out.putInt(frames.length) // dwTotalFrames
    out.putInt(0) // dwInitialFrames
    out.putInt(1) // dwStreams
    out.putInt(frames.map(_.length).max) // dwSuggestedBufferSize
    out.putInt(width); out.putInt(height)
    out.putInt(0); out.putInt(0); out.putInt(0); out.putInt(0) // reserved

    fourcc("LIST"); out.putInt(strlLen); fourcc("strl")
    fourcc("strh"); out.putInt(strhLen)
    fourcc("vids"); fourcc("MJPG")
    out.putInt(0) // dwFlags
    out.putShort(0); out.putShort(0) // wPriority, wLanguage
    out.putInt(0) // dwInitialFrames
    out.putInt(microSecPerFrame) // dwScale
    out.putInt(1000000) // dwRate → fps = rate/scale
    out.putInt(0) // dwStart
    out.putInt(frames.length) // dwLength (in frames)
    out.putInt(frames.map(_.length).max) // dwSuggestedBufferSize
    out.putInt(-1) // dwQuality (driver default)
    out.putInt(0) // dwSampleSize (0: variable-size frames)
    out.putShort(0); out.putShort(0) // rcFrame left, top
    out.putShort(width.toShort); out.putShort(height.toShort)

    fourcc("strf"); out.putInt(strfLen) // BITMAPINFOHEADER
    out.putInt(40) // biSize
    out.putInt(width); out.putInt(height)
    out.putShort(1) // biPlanes
    out.putShort(24) // biBitCount
    fourcc("MJPG") // biCompression
    out.putInt(width * height * 3) // biSizeImage
    out.putInt(0); out.putInt(0) // biXPelsPerMeter, biYPelsPerMeter
    out.putInt(0); out.putInt(0) // biClrUsed, biClrImportant

    fourcc("LIST"); out.putInt(moviLen); fourcc("movi")
    frames.foreach { f =>
      fourcc("00dc"); out.putInt(f.length); out.put(f)
      if ((f.length & 1) == 1) out.put(0.toByte) // word alignment
    }
    out.array()
  }
}
