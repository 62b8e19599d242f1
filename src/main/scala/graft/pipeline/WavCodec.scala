package graft.pipeline

import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM WAV/RIFF PCM codec (the public RIFF container + the
  * Microsoft WAVE format chunk layout): RIFF header walk → `fmt `
  * parse (PCM only) → `data` sample decode. 8-bit WAVs store unsigned
  * samples (0..255, centered at 128); 16-bit WAVs store little-endian
  * two's-complement — both decode to signed Int samples interleaved by
  * channel, so downstream stats are format-independent.
  *
  * The encoder exists so the decoder is certified on real container
  * bytes end-to-end (a decode(encode(samples)) roundtrip crosses the
  * endianness and sign conventions in both directions), and so fixture
  * queries can generate VALID WAVs arithmetically per doc.
  *
  * Rejections return None rather than garbage samples: wrong magic,
  * non-PCM format codes, truncated chunks, bit depths other than 8/16,
  * or a data chunk that is not a whole number of frames.
  */
object WavCodec {

  /** Interleaved signed samples: `frames · channels` values.
    * 8-bit input is re-centered (stored byte − 128 ∈ [−128, 127]);
    * 16-bit input is sign-extended ([−32768, 32767]). */
  final case class Audio(sampleRate: Int, channels: Int,
      bitsPerSample: Int, samples: Array[Int]) {
    def frames: Int = if (channels == 0) 0 else samples.length / channels
  }

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, US_ASCII)

  def decode(bytes: Array[Byte]): Option[Audio] = {
    if (bytes.length < 12) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var sawFmt = false
    var data: Array[Byte] = null
    while (pos + 8 <= bytes.length && (data == null || !sawFmt)) {
      val ctype = tag(bytes, pos)
      val len = le32(bytes, pos + 4)
      if (len < 0 || pos + 8 + len > bytes.length) return None
      ctype match {
        case "fmt " =>
          if (len < 16) return None
          val audioFormat = le16(bytes, pos + 8)
          if (audioFormat != 1) return None // PCM only; no float/ADPCM
          channels = le16(bytes, pos + 10)
          sampleRate = le32(bytes, pos + 12)
          bits = le16(bytes, pos + 22)
          if (channels <= 0 || sampleRate <= 0) return None
          if (bits != 8 && bits != 16) return None
          sawFmt = true
        case "data" =>
          data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + len)
        case _ => // LIST/INFO/fact/...: skip unknown chunks, like any reader
      }
      // RIFF chunks are word-aligned: odd payloads carry a pad byte
      pos += 8 + len + (len & 1)
    }
    if (!sawFmt || data == null) return None
    val bytesPerFrame = channels * (bits / 8)
    if (data.length % bytesPerFrame != 0) return None // partial frame: refuse
    val n = data.length / (bits / 8)
    val samples = new Array[Int](n)
    var i = 0
    if (bits == 8) {
      while (i < n) { samples(i) = (data(i) & 0xff) - 128; i += 1 }
    } else {
      while (i < n) { samples(i) = le16(data, i * 2).toShort.toInt; i += 1 }
    }
    Some(Audio(sampleRate, channels, bits, samples))
  }

  /** Emit a valid PCM WAV. `samples` are interleaved signed values;
    * for 8-bit they must lie in [−128, 127] (stored +128), for 16-bit
    * in [−32768, 32767] (stored little-endian). */
  def encode(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int]): Array[Byte] = {
    require(bitsPerSample == 8 || bitsPerSample == 16, "PCM 8/16-bit only")
    require(channels > 0 && samples.length % channels == 0,
      "samples must be whole interleaved frames")
    val bytesPerSample = bitsPerSample / 8
    val dataLen = samples.length * bytesPerSample
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
    out.put("WAVE".getBytes(US_ASCII))
    out.put("fmt ".getBytes(US_ASCII)).putInt(16)
    out.putShort(1) // PCM
    out.putShort(channels.toShort)
    out.putInt(sampleRate)
    out.putInt(sampleRate * channels * bytesPerSample) // byte rate
    out.putShort((channels * bytesPerSample).toShort)  // block align
    out.putShort(bitsPerSample.toShort)
    out.put("data".getBytes(US_ASCII)).putInt(dataLen)
    var i = 0
    if (bitsPerSample == 8) {
      while (i < samples.length) {
        require(samples(i) >= -128 && samples(i) <= 127, "8-bit range")
        out.put((samples(i) + 128).toByte); i += 1
      }
    } else {
      while (i < samples.length) {
        require(samples(i) >= Short.MinValue && samples(i) <= Short.MaxValue,
          "16-bit range")
        out.putShort(samples(i).toShort); i += 1
      }
    }
    out.array()
  }
}
