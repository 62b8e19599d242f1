package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `BINARY` payloads with typed
  * metadata, processed in batch-shaped `mapPartitions` stages (the JVM
  * analog of Arrow-batched pandas UDFs).
  *
  * Decode is REAL across all four container families, pure JVM, zero
  * codec dependencies: [[ImageHeaders]] reads PNG/JPEG/GIF headers;
  * [[PngCodec]] fully decodes PNG pixels (8/16-bit, palette, Adam7);
  * [[JpegCodec]] decodes baseline JPEG (general-DHT Huffman, dequant,
  * IDCT, YCbCr); [[GifCodec]] decodes animated GIF frames (LZW, LCT,
  * interlace); [[WavCodec]] decodes PCM WAV audio. Undecodable payloads
  * surface as `decoded = false` with NULL metadata — never fabricated
  * numbers — and every pixel pass has a named-reason drop counter
  * ([[pixelDecodeStats]]/[[jpegDecodeStats]]/[[gifDecodeStats]]) so
  * refused rows are counted, not invisible. The only remaining stand-in
  * is the explicitly-named [[fakeFeatures]] TEST helper.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("media_type", StringType, nullable = false)))

  /** Wrap a text corpus into fake media rows (payload = utf-8 bytes).
    * `mediaType` is any Column expression over the input (defaults to a
    * constant, so any (idCol, textCol) frame works — no hidden column
    * dependencies). */
  def asMedia(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      mediaType: org.apache.spark.sql.Column = lit("raw/text")): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      mediaType.as("media_type"))

  /** Metadata extraction — pure column expressions (no decode needed):
    * payload size + content hash. */
  def metadata(media: DataFrame): DataFrame =
    media.select(col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"),
      col("media_type"))

  private val featureDim = 16

  /** Header decode. Dimensions/format/channels are REAL —
    * [[ImageHeaders.parse]] reads actual PNG IHDR / JPEG SOFn / GIF LSD
    * bytes (pure JVM, public container formats). Payloads no parser
    * recognizes (e.g. the text-as-media fixtures) come back with
    * `decoded = false` and NULL metadata — a dedup/filter pipeline must
    * never route real data on fabricated dimensions, so unknown means
    * null, not a plausible-looking number. Batch shape: one partition =
    * one iterator pass, no per-row codec setup.
    */
  def decode(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("bit_depth", IntegerType, nullable = true)))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        ImageHeaders.parse(r.getAs[Array[Byte]](1)) match {
          case Some(meta) => Row(id, true, meta.format, meta.width,
            meta.height, meta.channels, meta.bitDepth)
          case None => Row(id, false, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** TEST HELPER — explicitly fake: deterministic strided-byte-hash
    * "features" standing in for a learned embedding where a test needs a
    * stable vector per payload. Never part of a production decode path —
    * real feature extraction decodes pixels ([[decodePixels]]) or
    * waveforms ([[decodeAudio]]) first. */
  def fakeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val feats = Array.tabulate(featureDim) { i =>
          var acc = 0L
          var j = i
          while (j < payload.length) { acc = acc * 131 + (payload(j) & 0xff); j += featureDim }
          ((acc % 1000).toFloat) / 1000.0f
        }
        Row(r.getLong(0), feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** What [[decodePixels]] would DROP, counted by refusal reason — the
    * honest companion to a flatMap that silently loses undecodable rows.
    * One row per [[PngCodec.decodeEx]] outcome ("ok" for decodable) with
    * the row count; a 100 TB crawl pass reads this to see its coverage
    * hole instead of inferring it from missing output. Partial counts
    * aggregate map-side (hash groupBy on ≤14 reason keys — no skew). */
  def pixelDecodeStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("reason", StringType, nullable = false)))
    val rdd = media.select("payload").rdd.mapPartitions { it =>
      it.map { r =>
        Row(PngCodec.decodeEx(r.getAs[Array[Byte]](0))
          .fold(identity, _ => "ok"))
      }
    }
    spark.createDataFrame(rdd, outSchema)
      .groupBy("reason").agg(count(lit(1)).as("n"))
  }

  /** PIXEL-level decode — REAL, not stubbed, for PNG payloads:
    * [[PngCodec.decode]] inflates the IDAT stream and unfilters every
    * scanline in pure JVM, and the per-channel means here are computed
    * over the actual reconstructed samples. Payloads that are not
    * decodable 8-bit PNGs are dropped (this is the typed pixel-stats
    * pass; [[decode]] is the metadata pass that keeps every row).
    * Sample sums are integers ≤ 255·w·h — exact in Long — so the mean
    * is the same double under any summation order, which is what lets
    * a SQL oracle replay it. Batch shape: one partition = one iterator
    * pass, the layout the inflater wants (no per-row codec setup).
    */
  def decodePixels(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("means", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("pos_moment", LongType, nullable = false)))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        PngCodec.decode(r.getAs[Array[Byte]](1)).map { img =>
          val n = img.width * img.height
          val sums = new Array[Long](img.channels)
          // ordinal-weighted channel-0 sum Σ (y·w+x)·v: means are pixel-
          // permutation invariant, so they alone cannot catch a wrong
          // Adam7 scatter — this moment can (integer-exact in Long)
          var posMoment = 0L
          var i = 0
          while (i < img.pixels.length) {
            sums(i % img.channels) += img.pixels(i) & 0xff
            if (i % img.channels == 0)
              posMoment += (i / img.channels).toLong * (img.pixels(i) & 0xff)
            i += 1
          }
          Row(r.getLong(0), img.width, img.height, img.channels,
            sums.map(_.toDouble / n).toSeq, posMoment)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** One decoded still image, container-tagged for the skip accounting. */
  final case class DecodedImage(container: String, width: Int, height: Int,
      channels: Int, pixels: Array[Byte])

  /** Container-dispatched single-image decode for the perceptual-hash
    * family: sniffs the payload magic and routes to the matching REAL
    * codec — PNG ([[PngCodec]]), baseline JPEG ([[JpegCodec]]), or
    * animated GIF ([[GifCodec]]; frame 0 is materialized through its
    * effective palette to an RGB raster — the first still is what an
    * image near-dup pipeline keys on). Refusals come back as the
    * codec's named reason PREFIXED with the sniffed container
    * (`jpeg:truncated`, `gif:bad_lzw`, ...) so drops are attributable
    * per container; unsniffable payloads are `unknown_container`. */
  def decodeImageAny(bytes: Array[Byte]): Either[String, DecodedImage] = {
    if (bytes == null || bytes.length < 3) Left("unknown_container")
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
        bytes(2) == 'N'.toByte)
      PngCodec.decodeEx(bytes)
        .map(i => DecodedImage("png", i.width, i.height, i.channels, i.pixels))
        .left.map(r => s"png:$r")
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      JpegCodec.decodeEx(bytes)
        .map(i => DecodedImage("jpeg", i.width, i.height, i.channels, i.pixels))
        .left.map(r => s"jpeg:$r")
    else if (bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte &&
        bytes(2) == 'F'.toByte)
      GifCodec.decodeEx(bytes).flatMap { g =>
        g.frames.headOption.toRight("no_frames").map { f =>
          val rgb = new Array[Byte](f.width * f.height * 3)
          var i = 0
          while (i < f.indices.length) {
            val p = (f.indices(i) & 0xff) * 3
            rgb(i * 3) = f.palette(p)
            rgb(i * 3 + 1) = f.palette(p + 1)
            rgb(i * 3 + 2) = f.palette(p + 2)
            i += 1
          }
          DecodedImage("gif", f.width, f.height, 3, rgb)
        }
      }.left.map(r => s"gif:$r")
    else Left("unknown_container")
  }

  /** IMAGE NEAR-DUP FINGERPRINTS over the real decoded pixels: the two
    * classic 64-bit perceptual hashes, computed entirely in integers so
    * a SQL oracle replays every bit from the fixture's pixel law.
    * Container-agnostic since r9: payloads dispatch through
    * [[decodeImageAny]], so PNG, baseline JPEG, and GIF stills all hash
    * through the same 8×8/9×8 grey grids (count refusals with
    * [[phashDecodeStats]]).
    *
    *  - aHash: nearest-neighbor 8×8 grey downsample (grey = SUM of the
    *    first ≤3 channel bytes — no division, stays integer), bit i set
    *    iff `64·gᵢ > Σg` (the mean comparison cross-multiplied).
    *  - dHash: 9×8 downsample, bit (x,y) set iff grey(x+1,y) >
    *    grey(x,y) — the horizontal-gradient hash, robust to global
    *    brightness shifts that flip aHash bits wholesale.
    *
    * Each hash is emitted as four 16-bit BANDS (`a0..a3`, `d0..d3`,
    * row-major, bit 15 of a band first): Ints are engine-portable
    * (packing 64 bits into one signed Long sacrifices bit 63), and the
    * bands ARE the LSH blocking key — Hamming distance ≤ 3 over 64
    * bits pigeonholes into at least one EXACT band match, so the
    * near-dup join in [[perceptualHashPairs]] is an equi-join, never
    * all-pairs. Undecodable payloads drop, like [[decodePixels]]. */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(
      StructField("doc_id", LongType, nullable = false) +:
        (Seq("a0", "a1", "a2", "a3", "d0", "d1", "d2", "d3")
          .map(n => StructField(n, IntegerType, nullable = false))))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        decodeImageAny(r.getAs[Array[Byte]](1)).toOption.map { img =>
          val gch = math.min(3, img.channels)
          def grey(sx: Int, sy: Int): Int = {
            val base = (sy * img.width + sx) * img.channels
            var s = 0; var c = 0
            while (c < gch) { s += img.pixels(base + c) & 0xff; c += 1 }
            s
          }
          // aHash over an 8×8 grid
          val ag = new Array[Int](64)
          var total = 0L
          var ty = 0
          while (ty < 8) {
            var tx = 0
            while (tx < 8) {
              val g = grey(tx * img.width / 8, ty * img.height / 8)
              ag(ty * 8 + tx) = g; total += g
              tx += 1
            }
            ty += 1
          }
          val aBits = ag.map(g => if (64L * g > total) 1 else 0)
          // dHash over a 9×8 grid, horizontal gradients
          val dBits = new Array[Int](64)
          ty = 0
          while (ty < 8) {
            val sy = ty * img.height / 8
            var tx = 0
            while (tx < 8) {
              val g0 = grey(tx * img.width / 9, sy)
              val g1 = grey((tx + 1) * img.width / 9, sy)
              dBits(ty * 8 + tx) = if (g1 > g0) 1 else 0
              tx += 1
            }
            ty += 1
          }
          def band(bits: Array[Int], b: Int): Int = {
            var v = 0; var i = 0
            while (i < 16) { v = (v << 1) | bits(b * 16 + i); i += 1 }
            v
          }
          Row.fromSeq(r.getLong(0) +:
            ((0 until 4).map(b => band(aBits, b)) ++
              (0 until 4).map(b => band(dBits, b))))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Image near-dup pairs from [[perceptualHash]] bands: candidates
    * share at least one exact 16-bit dHash band (the pigeonhole LSH —
    * complete for Hamming ≤ 3, banded so the join is equi, with the
    * repo-standard hot-bucket cap), confirmed by the EXACT combined
    * Hamming distance over all eight bands (Spark/DuckDB `bit_count`
    * over per-band XOR). Output: (a, b, hamming ≤ maxDist), a < b. */
  def perceptualHashPairs(hashes: DataFrame, maxDist: Int,
      maxBucket: Int = 4096): DataFrame = {
    require(maxDist >= 0)
    // staged write (r17): the hash table is 9 ints/doc but its plan
    // DECODES every image — it feeds the 4 band branches, the
    // hot-bucket count, and both confirm-join sides, and the decode
    // mapPartitions RDD gets no exchange reuse, so one materialization
    // previously re-decoded the corpus ~10× (measured 24.9 CPU-s →
    // 3.4 at sf0.1)
    val h = hashes.localCheckpoint()
    val bandCols = Seq("d0", "d1", "d2", "d3")
    val cand = bandCols.zipWithIndex.map { case (bc, i) =>
      h.select(lit(i).as("band"), col(bc).as("key"), col("doc_id"))
    }.reduce(_ unionByName _)
    // hot-bucket cap: a constant-background corpus collapses into one
    // band value; cap the bucket rather than let the pair join square
    val capped = cand.join(
      cand.groupBy("band", "key").agg(count(lit(1)).as("__n"))
        .where(col("__n") <= maxBucket).select("band", "key"),
      Seq("band", "key"), "left_semi")
    val pairs = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    val ham = Seq("a0", "a1", "a2", "a3", "d0", "d1", "d2", "d3")
      .map(c => bit_count(col(s"ha.$c").bitwiseXOR(col(s"hb.$c"))
        .cast("long")))
      .reduce(_ + _)
    pairs
      .join(h.as("ha"), col("a") === col("ha.doc_id"))
      .join(h.as("hb"), col("b") === col("hb.doc_id"))
      .select(col("a"), col("b"), ham.cast("int").as("hamming"))
      .where(col("hamming") <= maxDist)
  }

  /** Perceptual-hash twin of [[pixelDecodeStats]]: every payload the
    * hash pass would see, counted by outcome — `ok:<container>` for
    * rows that hashed, the container-prefixed refusal reason for rows
    * that dropped ([[decodeImageAny]]'s contract). The per-container
    * split is the point: a crawl where `jpeg:truncated` suddenly spikes
    * is a different incident than one where `unknown_container` does. */
  def phashDecodeStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("reason", StringType, nullable = false)))
    val rdd = media.select("payload").rdd.mapPartitions { it =>
      it.map { r =>
        Row(decodeImageAny(r.getAs[Array[Byte]](0))
          .fold(identity, img => s"ok:${img.container}"))
      }
    }
    spark.createDataFrame(rdd, outSchema)
      .groupBy("reason").agg(count(lit(1)).as("n"))
  }

  /** Deterministic MIXED-CONTAINER image fixture for the phash family:
    * by `docId % 3` a decodable PNG ([[syntheticPixelPng]] — whose
    * channel law collapses to 1 channel exactly on this residue), a
    * baseline JPEG ([[syntheticJpeg]], constant 8×8 blocks so the lossy
    * pipeline is pixel-exact), or an animated GIF ([[syntheticGif]],
    * frame 0 through its palette). Every decoded grey is arithmetic in
    * (x, y, docId), so the SQL oracle states all 128 hash bits. */
  def syntheticMixedImage(docId: Long): Array[Byte] = (docId % 3) match {
    case 0 => syntheticPixelPng(docId)
    case 1 => syntheticJpeg(docId)
    case _ => syntheticGif(docId)
  }

  /** Deterministic payload MIX for the phash drop accounting: by
    * `docId % 5` a decodable PNG / JPEG / GIF, plain text (refused:
    * unknown_container), or a JPEG cut mid-DQT (refused:
    * jpeg:truncated). */
  def syntheticSkipImage(docId: Long): Array[Byte] = (docId % 5) match {
    case 0 => syntheticPixelPng(docId)
    case 1 => syntheticJpeg(docId)
    case 2 => syntheticGif(docId)
    case 3 => s"doc $docId is plain text, not an image".getBytes("UTF-8")
    case _ => syntheticJpeg(docId).take(40) // inside the DQT segment
  }

  /** Resize over REAL decoded pixels: nearest-neighbor sample of each
    * PNG payload down to a `tw`×`th` thumbnail (source index
    * `⌊x'·w/tw⌋` — the standard image-dedup normalization step) and
    * per-channel means over the thumbnail. Undecodable payloads drop,
    * like [[decodePixels]]. Thumbnail sums are integers in Long, so the
    * means are order-independent doubles a SQL oracle can replay.
    */
  def resizeStats(media: DataFrame, tw: Int, th: Int): DataFrame = {
    require(tw > 0 && th > 0)
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("means", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        PngCodec.decode(r.getAs[Array[Byte]](1)).map { img =>
          val sums = new Array[Long](img.channels)
          var ty = 0
          while (ty < th) {
            val sy = ty * img.height / th
            var tx = 0
            while (tx < tw) {
              val sx = tx * img.width / tw
              val base = (sy * img.width + sx) * img.channels
              var c = 0
              while (c < img.channels) {
                sums(c) += img.pixels(base + c) & 0xff
                c += 1
              }
              tx += 1
            }
            ty += 1
          }
          Row(r.getLong(0), img.width, img.height, img.channels,
            sums.map(_.toDouble / (tw.toLong * th)).toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** AUDIO decode — REAL, not stubbed, for PCM WAV payloads:
    * [[WavCodec.decode]] walks the RIFF container and decodes 8/16-bit
    * PCM samples in pure JVM; the per-channel stats here are computed
    * over the actual decoded waveform. Non-WAV payloads drop (typed
    * audio pass, same contract as [[decodePixels]]).
    *
    * Stats are chosen to be integer-exact so a SQL oracle can replay
    * them: the sample sum fits in Long (|s| ≤ 32768, frames bounded),
    * so `mean` is the same double under any order; `peak` (max |s|)
    * and `zero_crossings` (count of sign flips between consecutive
    * frames, per channel) are integers. Batch shape: one partition =
    * one iterator pass.
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("bits", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("means", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("peaks", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("zero_crossings", ArrayType(LongType, containsNull = false), nullable = false)))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        WavCodec.decode(r.getAs[Array[Byte]](1)).map { audio =>
          val ch = audio.channels
          val frames = audio.frames
          val sums = new Array[Long](ch)
          val peaks = new Array[Long](ch)
          val zcr = new Array[Long](ch)
          var i = 0
          while (i < audio.samples.length) {
            val c = i % ch
            val v = audio.samples(i)
            sums(c) += v
            if (math.abs(v.toLong) > peaks(c)) peaks(c) = math.abs(v.toLong)
            if (i >= ch && ((audio.samples(i - ch) < 0) != (v < 0))) zcr(c) += 1
            i += 1
          }
          Row(r.getLong(0), audio.sampleRate, ch, audio.bitsPerSample, frames,
            sums.map(_.toDouble / frames).toSeq, peaks.toSeq, zcr.toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Spectral audio features — REAL decode + REAL DSP: [[WavCodec]]
    * parses the RIFF/PCM payload, channel 0 goes through [[Dsp]]'s
    * radix-2 FFT (truncated/zero-padded to `nFft`), and the row carries
    * the classic audio-fingerprint features: DC magnitude, dominant
    * non-DC bin, its magnitude, and the spectral centroid over bins
    * 1..nFft/2. Magnitudes are rounded to whole units and the centroid
    * to milli-units BEFORE comparison-bearing use (the dominant-bin
    * argmax runs over the rounded values, lowest bin on ties) so a
    * direct O(N²) DFT replayed in SQL lands on identical integers —
    * the 1e-13-relative FFT-vs-DFT float divergence sits ~9 orders of
    * magnitude under the rounding grid. Cross-implementation oracle:
    * an indexing, twiddle-recurrence, bit-reversal, or truncation slip
    * in the FFT hash-fails against the DFT. */
  def spectralFeatures(media: DataFrame, nFft: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_fft", IntegerType, nullable = false),
      StructField("dc_mag", LongType, nullable = false),
      StructField("dom_bin", IntegerType, nullable = false),
      StructField("dom_mag", LongType, nullable = false),
      StructField("centroid_milli", LongType, nullable = false)))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        WavCodec.decode(r.getAs[Array[Byte]](1)).map { audio =>
          val ch = audio.channels
          val mono = Array.tabulate(audio.frames)(i => audio.samples(i * ch))
          val mags = Dsp.magnitudeSpectrum(mono, nFft)
          val rounded = mags.map(m => math.floor(m + 0.5).toLong)
          val best = Dsp.dominantBin(rounded)
          var num = 0.0
          var den = 0.0
          var k = 1
          while (k < mags.length) { num += k * mags(k); den += mags(k); k += 1 }
          val centroid = if (den == 0.0) 0.0 else num / den
          Row(r.getLong(0), nFft, rounded(0), best, rounded(best),
            math.floor(centroid * 1000 + 0.5).toLong)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Short-time spectrogram — REAL decode + REAL DSP, framed: channel 0
    * of the [[WavCodec]]-decoded waveform is cut into `nFft`-sample
    * analysis windows every `hop` samples (rectangular window, final
    * frames zero-padded), each through [[Dsp]]'s radix-2 FFT; one output
    * row per (doc, frame) with the frame's DC magnitude, dominant non-DC
    * bin and its magnitude — the time-frequency feature grid an audio
    * dedup/quality stage consumes. Same rounding contract as
    * [[spectralFeatures]]: magnitudes round to whole units before any
    * comparison-bearing use, so the SQL oracle's per-frame O(N²) DFT
    * lands on identical integers. Boundary assumption: the radix-2 FFT
    * and the oracle's direct DFT sum in different orders and can differ
    * by ~1 ulp, so `floor(mag+0.5)` is cross-engine-stable only when no
    * magnitude sits essentially ON a .5 boundary — the fixture spec
    * (MultimodalFeatureSpec) asserts every fixture magnitude clears the
    * boundary by > 1e-6, the same pin the other rounding-grid checks
    * carry. Frames of one doc stay inside the
    * mapPartitions pass — no shuffle to explode audio into frames. */
  def spectrogram(media: DataFrame, nFft: Int, hop: Int): DataFrame = {
    require(hop > 0 && nFft > 0, s"nFft=$nFft hop=$hop")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("n_fft", IntegerType, nullable = false),
      StructField("dc_mag", LongType, nullable = false),
      StructField("dom_bin", IntegerType, nullable = false),
      StructField("dom_mag", LongType, nullable = false)))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        WavCodec.decode(r.getAs[Array[Byte]](1)).toSeq.flatMap { audio =>
          val ch = audio.channels
          val mono = Array.tabulate(audio.frames)(i => audio.samples(i * ch))
          val nWin = (mono.length + hop - 1) / hop
          (0 until nWin).map { f =>
            val win = mono.slice(f * hop, math.min(f * hop + nFft, mono.length))
            val mags = Dsp.magnitudeSpectrum(win, nFft)
            val rounded = mags.map(m => math.floor(m + 0.5).toLong)
            val best = Dsp.dominantBin(rounded)
            Row(r.getLong(0), f, nFft, rounded(0), best, rounded(best))
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** VIDEO-shaped decode — REAL animated-GIF frame extraction:
    * [[GifCodec.decode]] walks the GIF89a block stream and LZW-decodes
    * every frame in pure JVM; each payload explodes into one row per
    * frame with the frame's delay and per-channel RGB means over the
    * palette-mapped pixels (integer sums ≤ 255·w·h — exact in Long, so
    * the means are order-independent doubles a SQL oracle can replay).
    * Non-GIF payloads drop. This upgrades the [[frameSample]] explode
    * SHAPE into an explode with a real codec behind it. */
  def decodeGifFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("delay_cs", IntegerType, nullable = false),
      StructField("means", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("row_moment", LongType, nullable = false)))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        GifCodec.decode(r.getAs[Array[Byte]](1)).toSeq.flatMap { gif =>
          gif.frames.zipWithIndex.map { case (f, idx) =>
            val n = f.width * f.height
            // f.palette: the frame's effective table (LCT override or GCT)
            val sums = new Array[Long](3)
            // row-weighted red sum Σ y·R(x,y): per-frame means are a row
            // PERMUTATION invariant, so they alone cannot catch a wrong
            // de-interlace — this moment can (integer-exact in Long)
            var rowMoment = 0L
            var i = 0
            while (i < f.indices.length) {
              val p = (f.indices(i) & 0xff) * 3
              sums(0) += f.palette(p) & 0xff
              sums(1) += f.palette(p + 1) & 0xff
              sums(2) += f.palette(p + 2) & 0xff
              rowMoment += (i / f.width).toLong * (f.palette(p) & 0xff)
              i += 1
            }
            Row(id, idx, f.width, f.height, f.delayCs,
              sums.map(_.toDouble / n).toSeq, rowMoment)
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic REAL animated GIF whose palette colours and frame
    * pixels are arithmetic in (x, y, frame, docId) — so a plain-SQL
    * oracle can state the per-frame per-channel means the LZW decoder
    * must reconstruct. Repeating index patterns give the LZW dictionary
    * genuine matches, so the streams exercise real compression. */
  def syntheticGif(docId: Long): Array[Byte] = {
    val w = (3 + docId % 6).toInt
    val h = (2 + docId % 5).toInt
    val nFrames = (1 + docId % 4).toInt
    val palette = new Array[Byte](4 * 3)
    var j = 0
    while (j < 4) {
      palette(j * 3) = (((j * 53 + docId * 7) % 256) & 0xff).toByte
      palette(j * 3 + 1) = (((j * 101 + docId * 11) % 256) & 0xff).toByte
      palette(j * 3 + 2) = (((j * 29 + docId * 13) % 256) & 0xff).toByte
      j += 1
    }
    val frames = (0 until nFrames).map { f =>
      val indices = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          indices(y * w + x) = (((x * 3 + y * 5 + f * 7 + docId) % 4) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      ((5 + f * 3 + docId % 7).toInt, indices)
    }
    GifCodec.encode(w, h, palette, frames)
  }

  /** Deterministic REAL PCM WAV whose sample values are arithmetic in
    * (frame, channel, docId) — so a plain-SQL oracle can state the
    * per-channel mean / peak / zero-crossing stats the decoder must
    * reconstruct. Mixes the container's axes: mono/stereo by parity,
    * 8-bit (unsigned storage, re-centered) every third doc, 16-bit LE
    * otherwise, four sample rates. Bounded frame counts keep the SQL
    * replay's expansion small. */
  def syntheticWav(docId: Long): Array[Byte] = {
    val channels = (1 + docId % 2).toInt
    val bits = if (docId % 3 == 0) 8 else 16
    val sampleRate = (8000 + (docId % 4) * 4000).toInt
    val nFrames = (40 + docId % 60).toInt
    val samples = new Array[Int](nFrames * channels)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        samples(i * channels + c) =
          if (bits == 8) ((i * 17 + c * 29 + docId * 13) % 241).toInt - 120
          else ((i * 131 + c * 37 + docId * 11) % 16001).toInt - 8000
        c += 1
      }
      i += 1
    }
    WavCodec.encode(sampleRate, channels, bits, samples)
  }

  /** Deterministic REAL PNG (compressed IDAT, per-row filter cycling
    * through all five types) whose pixel values are arithmetic in
    * (x, y, channel, docId) — so a plain-SQL oracle can state the
    * per-channel means the decoder must reconstruct. Small dims keep
    * the SQL replay's pixel expansion bounded. */
  def syntheticPixelPng(docId: Long): Array[Byte] = {
    val w = (1 + docId % 16).toInt
    val h = (1 + docId % 8).toInt
    val ch = (docId % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          px((y * w + x) * ch + c) =
            (((x * 7 + y * 13 + docId * 3 + c * 31) % 256) & 0xff).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PngCodec.encode(w, h, ch, px, y => ((y + docId) % 5).toInt)
  }

  /** JPEG pixel pass — REAL baseline decode ([[JpegCodec]]: marker walk,
    * general-DHT Huffman, dequant, IDCT, colour transform). Same contract
    * as [[decodePixels]]: per-channel means + the ordinal-weighted
    * position moment over the actual reconstructed samples; payloads the
    * decoder refuses drop (count them with [[jpegDecodeStats]]). */
  def decodeJpegPixels(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("means", ArrayType(DoubleType, containsNull = false), nullable = false),
      StructField("pos_moment", LongType, nullable = false)))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        JpegCodec.decode(r.getAs[Array[Byte]](1)).map { img =>
          val n = img.width * img.height
          val sums = new Array[Long](img.channels)
          var posMoment = 0L
          var i = 0
          while (i < img.pixels.length) {
            sums(i % img.channels) += img.pixels(i) & 0xff
            if (i % img.channels == 0)
              posMoment += (i / img.channels).toLong * (img.pixels(i) & 0xff)
            i += 1
          }
          Row(r.getLong(0), img.width, img.height, img.channels,
            sums.map(_.toDouble / n).toSeq, posMoment)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** JPEG twin of [[pixelDecodeStats]]: [[JpegCodec.decodeEx]] refusal
    * reasons counted next to the decodable "ok" rows. */
  def jpegDecodeStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("reason", StringType, nullable = false)))
    val rdd = media.select("payload").rdd.mapPartitions { it =>
      it.map { r =>
        Row(JpegCodec.decodeEx(r.getAs[Array[Byte]](0))
          .fold(identity, _ => "ok"))
      }
    }
    spark.createDataFrame(rdd, outSchema)
      .groupBy("reason").agg(count(lit(1)).as("n"))
  }

  /** Deterministic REAL baseline JPEG built from CONSTANT 8×8 blocks —
    * the layout the lossy pipeline reproduces EXACTLY (only DC survives
    * the FDCT and the quantizer divides it), so a plain-SQL oracle can
    * state every decoded pixel: v(x,y) = (⌊x/8⌋·29 + ⌊y/8⌋·41 +
    * docId·13) mod 256. The bytes still cross real Huffman coding, DC
    * prediction, byte stuffing, and the IDCT. */
  def syntheticJpeg(docId: Long): Array[Byte] = {
    val w = 8 * (1 + docId % 3).toInt
    val h = 8 * (1 + docId % 2).toInt
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) =
          ((((x / 8) * 29 + (y / 8) * 41 + docId * 13) % 256) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    JpegCodec.encode(w, h, 1, px)
  }

  /** [[syntheticJpeg]]'s exact pixel arithmetic, encoded WITH DRI
    * restart intervals (1–3 MCUs between RSTm markers — the
    * error-resilience layout real camera streams emit). Decoded pixels
    * are identical to the plain baseline, so the multimodal_jpeg oracle
    * applies verbatim — what changes is that the scan crosses RSTm
    * byte-alignment and DC-predictor resets on both sides. */
  def syntheticJpegDri(docId: Long): Array[Byte] = {
    val w = 8 * (1 + docId % 3).toInt
    val h = 8 * (1 + docId % 2).toInt
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) =
          ((((x / 8) * 29 + (y / 8) * 41 + docId * 13) % 256) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    JpegCodec.encode(w, h, 1, px, restartInterval = 1 + (docId % 3).toInt)
  }

  /** Deterministic REAL 4:2:0 JPEG from CONSTANT 16×16 macroblocks with
    * colours kept inside [16, 240) so no clamp engages: the chroma 2×2
    * average of equal values is exact and replication upsampling is
    * exact, so every decoded pixel is the deterministic
    * forward+inverse JFIF transform of its macroblock colour — which a
    * plain-SQL oracle restates term-for-term. */
  def syntheticJpeg420(docId: Long): Array[Byte] = {
    val w = 16 * (1 + docId % 2).toInt
    val h = 16
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val mx = x / 16
        val o = (y * w + x) * 3
        px(o) = ((16 + (mx * 23 + docId * 7) % 224) & 0xff).toByte
        px(o + 1) = ((16 + (mx * 41 + docId * 3) % 224) & 0xff).toByte
        px(o + 2) = ((16 + (mx * 59 + docId * 13) % 224) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    JpegCodec.encode420(w, h, px)
  }

  /** Deterministic JPEG payload MIX for the drop accounting: by
    * `docId % 4` a decodable baseline JPEG, plain text (refused:
    * not_jpeg), one whose SOF0 marker is patched to progressive SOF2
    * (refused: unsupported — the [[syntheticJpeg]] layout puts the SOF
    * marker at byte 71 regardless of dims), or one cut mid-DQT
    * (refused: truncated). */
  def syntheticSkipJpeg(docId: Long): Array[Byte] = (docId % 4) match {
    case 0 => syntheticJpeg(docId)
    case 1 => s"doc $docId is plain text, not a jpeg".getBytes("UTF-8")
    case 2 =>
      val b = syntheticJpeg(docId)
      b(72) = 0xc2.toByte // SOF0 → SOF2 (progressive)
      b
    case _ => syntheticJpeg(docId).take(40) // inside the DQT segment
  }

  /** GIF twin of [[pixelDecodeStats]]: what [[decodeGifFrames]] would
    * drop, counted by [[GifCodec.decodeEx]] refusal reason ("ok" for
    * decodable payloads). Same shape: tiny-key hash groupBy, map-side
    * partials, no skew. */
  def gifDecodeStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("reason", StringType, nullable = false)))
    val rdd = media.select("payload").rdd.mapPartitions { it =>
      it.map { r =>
        Row(GifCodec.decodeEx(r.getAs[Array[Byte]](0))
          .fold(identity, _ => "ok"))
      }
    }
    spark.createDataFrame(rdd, outSchema)
      .groupBy("reason").agg(count(lit(1)).as("n"))
  }

  /** Deterministic GIF payload MIX for the drop accounting: by
    * `docId % 6` a plain decodable animated GIF, one whose frames carry
    * local colour tables, an interlaced one (both DECODE — the codec
    * owns LCT and interlace), plain text (refused: not_gif), one with
    * the trailer cut off (refused: truncated), or one whose LZW
    * min-code-size byte is corrupted to an illegal value (refused:
    * bad_lzw). The refusal variants patch the REAL encoder's bytes, so
    * each named reason exercises its actual classification point. */
  def syntheticSkipGif(docId: Long): Array[Byte] = (docId % 6) match {
    case 0 => syntheticGif(docId)
    case 1 | 2 => syntheticGifExt(docId)
    case 3 => s"doc $docId is plain text, not a gif".getBytes("UTF-8")
    case 4 => syntheticGif(docId).dropRight(1) // no trailer
    case _ =>
      // syntheticGif layout: 13-byte header+LSD, 4-entry GCT (12 bytes),
      // 8-byte GCE, 10-byte image descriptor → minCodeSize byte at 43;
      // GIF LZW requires 2 ≤ minCodeSize ≤ 8
      val b = syntheticGif(docId)
      b(43) = 1.toByte
      b
  }

  /** Deterministic REAL animated GIF exercising the codec's local-
    * colour-table and interlace paths: every even (docId+f) frame
    * carries an 8-entry LCT overriding the 4-entry global table, every
    * (docId+f) % 3 == 0 frame is stored in GIF89a four-pass interlaced
    * row order. All palette/index values are arithmetic in (x, y, f,
    * docId), so a plain-SQL oracle states the per-frame means AND the
    * row-weighted moment the de-interleave must land on. */
  def syntheticGifExt(docId: Long): Array[Byte] = {
    val w = (3 + docId % 6).toInt
    val h = (2 + docId % 5).toInt
    val nFrames = (1 + docId % 3).toInt
    val global = new Array[Byte](4 * 3)
    var j = 0
    while (j < 4) {
      var c = 0
      while (c < 3) {
        global(j * 3 + c) = (((j * 53 + c * 31 + docId * 7) % 256) & 0xff).toByte
        c += 1
      }
      j += 1
    }
    val frames = (0 until nFrames).map { f =>
      val hasLct = (docId + f) % 2 == 0
      val entries = if (hasLct) 8 else 4
      val lct = if (hasLct) {
        val p = new Array[Byte](8 * 3)
        var e = 0
        while (e < 8) {
          var c = 0
          while (c < 3) {
            p(e * 3 + c) =
              (((e * 47 + c * 19 + docId * 3 + f * 11) % 256) & 0xff).toByte
            c += 1
          }
          e += 1
        }
        Some(p)
      } else None
      val indices = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          indices(y * w + x) =
            (((x * 3 + y * 5 + f * 7 + docId) % entries) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      GifCodec.FrameSpec((4 + f * 2 + docId % 5).toInt, indices,
        localPalette = lct, interlaced = (docId + f) % 3 == 0)
    }
    GifCodec.encodeEx(w, h, global, frames)
  }

  /** Deterministic REAL indexed-colour PNG (PLTE palette + filtered
    * index scanlines, filters cycling through all five types) whose
    * palette entries and index raster are arithmetic in (x, y, entry,
    * docId) — so a plain-SQL oracle can state the per-channel RGB means
    * the palette-expanding decoder must reconstruct. */
  def syntheticPalettePng(docId: Long): Array[Byte] = {
    val w = (2 + docId % 9).toInt
    val h = (1 + docId % 6).toInt
    val entries = 2 << (docId % 4).toInt // 2/4/8/16 colours
    val palette = new Array[Byte](entries * 3)
    var e = 0
    while (e < entries) {
      var c = 0
      while (c < 3) {
        palette(e * 3 + c) = (((e * 41 + c * 17 + docId * 5) % 256) & 0xff).toByte
        c += 1
      }
      e += 1
    }
    val indices = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        indices(y * w + x) = (((x * 3 + y * 7 + docId) % entries) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    PngCodec.encodePalette(w, h, palette, indices, y => ((y + docId) % 5).toInt)
  }

  /** Deterministic payload MIX for certifying the drop accounting: by
    * `docId % 8` a decodable greyscale/RGB(A) PNG, a palette PNG, a
    * 16-bit PNG, an Adam7-interlaced PNG (all four DECODE — the codec
    * owns those layouts), plain text (refused: not_png), a valid PNG
    * with the tail cut off (refused: truncated), one with a flipped
    * IDAT byte (refused: bad_crc), or a 4-bit packed-depth IHDR
    * (refused: bit_depth). Every refusal variant carries structurally-
    * valid chunk CRCs up to its defect, so the named reason is the real
    * classification path, not a byte-length shortcut. */
  def syntheticSkipPng(docId: Long): Array[Byte] = (docId % 8) match {
    case 0 => syntheticPixelPng(docId)
    case 1 => syntheticPalettePng(docId)
    case 2 => syntheticPng16(docId)
    case 3 => syntheticInterlacedPng(docId)
    case 4 => s"doc $docId is plain text, not an image".getBytes("UTF-8")
    case 5 => syntheticPixelPng(docId).dropRight(8) // cuts into IEND
    case 6 =>
      val b = syntheticPixelPng(docId)
      b(b.length - 20) = (b(b.length - 20) ^ 0x11).toByte // IDAT bit rot
      b
    case _ => // valid-CRC IHDR with sub-byte depth 4: genuinely refused
      val ihdr = java.nio.ByteBuffer.allocate(13)
      ihdr.putInt(4).putInt(4)
      ihdr.put(4.toByte).put(0.toByte) // depth 4, greyscale
      ihdr.put(0.toByte).put(0.toByte).put(0.toByte)
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      out.write(PngCodec.chunk("IHDR", ihdr.array()))
      out.write(PngCodec.chunk("IEND", Array.empty[Byte]))
      out.toByteArray
  }

  /** Deterministic REAL 16-bit PNG whose big-endian samples are
    * arithmetic in (x, y, channel, docId) — the decoder's strip-16
    * reduction must land on means over ⌊v/256⌋, which a plain-SQL
    * oracle states directly. */
  def syntheticPng16(docId: Long): Array[Byte] = {
    val w = (1 + docId % 8).toInt
    val h = (1 + docId % 5).toInt
    val ch = (docId % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
    val samples = new Array[Int](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          samples((y * w + x) * ch + c) =
            ((x * 131 + y * 241 + c * 89 + docId * 7) % 65536).toInt
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PngCodec.encode16(w, h, ch, samples, y => ((y + docId) % 5).toInt)
  }

  /** The [[syntheticPixelPng]] raster stored Adam7-interlaced: same
    * pixels, seven-pass storage — the decoder's scatter must reproduce
    * the identical raster (pinned by decodePixels' position moment, not
    * just the permutation-invariant means). */
  def syntheticInterlacedPng(docId: Long): Array[Byte] = {
    val w = (1 + docId % 16).toInt
    val h = (1 + docId % 8).toInt
    val ch = (docId % 3) match { case 0 => 1; case 1 => 3; case _ => 4 }
    val px = new Array[Byte](w * h * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          px((y * w + x) * ch + c) =
            (((x * 7 + y * 13 + docId * 3 + c * 31) % 256) & 0xff).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    PngCodec.encode(w, h, ch, px, y => ((y + docId) % 5).toInt,
      interlaced = true)
  }

  /** Deterministic REAL-format image bytes for certifying the header
    * codec end-to-end: by `docId % 3` a valid PNG (signature + IHDR with
    * a correct CRC32), a valid JPEG header stream (SOI → JFIF APP0 →
    * SOF0 → SOS), or a GIF89a Logical Screen Descriptor. Dimensions and
    * channel shape are arithmetic in `docId`, so a plain-SQL oracle can
    * state what the parser must read back — the bytes themselves go
    * through the same parser any real file would.
    */
  def syntheticImageBytes(docId: Long): Array[Byte] = {
    val width = (1 + (docId * 7) % 2000).toInt
    val height = (1 + (docId * 13) % 1500).toInt
    (docId % 3) match {
      case 0 => // PNG, colour type by docId % 4: grey/RGB/grey+alpha/RGBA
        val colorType = (docId % 4) match {
          case 0 => 0; case 1 => 2; case 2 => 4; case _ => 6
        }
        val out = java.nio.ByteBuffer.allocate(33)
        out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
          .map(_.toByte))
        out.putInt(13)
        val typeAndData = java.nio.ByteBuffer.allocate(17)
        typeAndData.put("IHDR".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        typeAndData.putInt(width).putInt(height)
        typeAndData.put(8.toByte).put(colorType.toByte) // bit depth 8
        typeAndData.put(0.toByte).put(0.toByte).put(0.toByte)
        val crc = new java.util.zip.CRC32
        crc.update(typeAndData.array())
        out.put(typeAndData.array()).putInt(crc.getValue.toInt)
        out.array()
      case 1 => // JPEG: SOI + JFIF APP0 + SOF0(ncomp by parity) + SOS
        val ncomp = if (docId % 2 == 0) 3 else 1
        val out = java.nio.ByteBuffer.allocate(2 + 18 + (10 + 3 * ncomp) + 4)
        out.put(0xff.toByte).put(0xd8.toByte)
        out.put(0xff.toByte).put(0xe0.toByte).putShort(16.toShort) // APP0
        out.put("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        out.put(0.toByte).put(1.toByte).put(1.toByte) // version 1.1
        out.put(0.toByte).putShort(1.toShort).putShort(1.toShort) // density
        out.put(0.toByte).put(0.toByte) // no thumbnail
        out.put(0xff.toByte).put(0xc0.toByte) // SOF0
        out.putShort((8 + 3 * ncomp).toShort)
        out.put(8.toByte) // precision
        out.putShort(height.toShort).putShort(width.toShort)
        out.put(ncomp.toByte)
        for (c <- 0 until ncomp)
          out.put((c + 1).toByte).put(0x11.toByte).put(0.toByte)
        out.put(0xff.toByte).put(0xda.toByte).putShort(2.toShort) // SOS
        out.array()
      case _ => // GIF89a LSD: colour-resolution bits 8 (packed 0x70)
        val out = java.nio.ByteBuffer.allocate(13)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        out.put("GIF89a".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        out.putShort(width.toShort).putShort(height.toShort)
        out.put(0x70.toByte).put(0.toByte).put(0.toByte)
        out.array()
    }
  }

  /** STUB frame sampling: every `stride`-th chunk of the payload becomes a
    * "frame" row — the explode shape of real video frame-sampling. A real
    * pipeline materializes `substring(payload, i·stride+1, stride)` as the
    * frame bytes; the stub emits only per-frame metadata, computed
    * arithmetically so no payload bytes are copied per frame (the explode
    * over frame indices — the part that matters for the plan shape — is
    * real). A payload yields ceil(len/stride) frames: the last one is the
    * partial tail (frame_len < stride) — truncating to full frames would
    * silently drop up to stride−1 trailing bytes per payload.
    */
  def frameSample(media: DataFrame, stride: Int = 64): DataFrame =
    media.where(length(col("payload")) > 0)
      .select(col("doc_id"), length(col("payload")).as("__len"),
        explode(sequence(lit(0),
          ((length(col("payload")) + lit(stride - 1)) / stride).cast("int") - 1))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        least(lit(stride.toLong),
          col("__len").cast("long") - col("frame_idx") * stride).as("frame_len"))

  /** REAL video frame decode: [[AviCodec]] walks the RIFF/AVI container
    * and [[JpegCodec]] entropy-decodes every MJPEG frame; one output
    * row per frame with the per-frame grey mean and ordinal-weighted
    * position moment over the actual reconstructed samples. Payloads
    * the container or any frame refuses drop (count them with
    * [[videoDecodeStats]]). Batch shape: one iterator pass per
    * partition, frames of one video stay local — no shuffle is needed
    * to explode a video into frames, only the final presentation sort.
    * `sampleStride` keeps every stride-th frame (frame 0 always kept):
    * real frame-sampling decodes only what it keeps — the container
    * walk skips the other `00dc` chunks without JPEG-decoding them. */
  def decodeVideoFrames(media: DataFrame, sampleStride: Int = 1): DataFrame = {
    require(sampleStride >= 1, s"sampleStride=$sampleStride")
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("usec_per_frame", IntegerType, nullable = false),
      StructField("mean_micro", LongType, nullable = false),
      StructField("pos_moment", LongType, nullable = false)))
    val stride = sampleStride
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        AviCodec.decodeEx(r.getAs[Array[Byte]](1)).toOption.toSeq.flatMap { v =>
          v.frames.indices.by(stride).flatMap { f =>
            JpegCodec.decode(v.frames(f)).toSeq.map { img =>
              val n = img.width * img.height
              var sum = 0L; var posMoment = 0L
              var i = 0
              while (i < img.pixels.length) {
                val px = img.pixels(i) & 0xff
                if (i % img.channels == 0) {
                  sum += px
                  posMoment += (i / img.channels).toLong * px
                }
                i += 1
              }
              // micro-units of the mean, round-half-up — matches the
              // SQL oracle's floor(avg·1e6 + 0.5) exactly in integers
              val meanMicro = (sum * 1000000L + n / 2) / n
              Row(r.getLong(0), f, img.width, img.height,
                v.microSecPerFrame, meanMicro, posMoment)
            }
          }
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Scene-cut detection over REAL decoded video: per-frame grey means
    * from [[decodeVideoFrames]], consecutive-frame absolute mean
    * difference as the change score, cut where the score clears
    * `thresholdMicro` (micro grey-units). The decode is the per-partition
    * codec pass; the temporal logic is deliberately DECLARATIVE — a
    * `lag` window per video — so Catalyst owns it and the only shuffle
    * is the per-video window partition (frames of one video are few;
    * the key is `doc_id`, so skew is bounded by the longest single
    * video, not by corpus size). Frame 0 of each video starts a scene
    * by definition (`is_cut` true, score null). Downstream keyframe
    * sampling = `where(is_cut)`. */
  def sceneCuts(media: DataFrame, thresholdMicro: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    decodeVideoFrames(media)
      .withColumn("score_micro",
        abs(col("mean_micro") - lag(col("mean_micro"), 1).over(w)))
      .withColumn("is_cut",
        coalesce(col("score_micro") > thresholdMicro, lit(true)))
      .select("doc_id", "frame_idx", "mean_micro", "score_micro", "is_cut")
  }

  /** Video twin of [[pixelDecodeStats]]: [[AviCodec.decodeFrames]]
    * refusal reasons (container-level or `frame_`-prefixed per-frame
    * JPEG reasons) counted next to the decodable "ok" rows. */
  def videoDecodeStats(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("reason", StringType, nullable = false)))
    val rdd = media.select("payload").rdd.mapPartitions { it =>
      it.map { r =>
        Row(AviCodec.decodeFrames(r.getAs[Array[Byte]](0))
          .fold(identity, _ => "ok"))
      }
    }
    spark.createDataFrame(rdd, outSchema)
      .groupBy("reason").agg(count(lit(1)).as("n"))
  }

  /** Deterministic REAL MJPEG AVI: 1–3 grey frames of CONSTANT 8×8
    * blocks (the layout baseline JPEG reproduces EXACTLY, see
    * [[syntheticJpeg]]), each carried as a real `00dc` JPEG chunk in a
    * real RIFF walk. Every decoded pixel of frame f is
    * v(x,y,f) = (⌊x/8⌋·29 + ⌊y/8⌋·41 + docId·13 + f·57) mod 256, which
    * a plain-SQL oracle restates per frame. */
  def syntheticAvi(docId: Long): Array[Byte] = {
    val w = 8 * (1 + docId % 3).toInt
    val h = 8 * (1 + docId % 2).toInt
    val nFrames = (1 + docId % 3).toInt
    val frames = (0 until nFrames).map { f =>
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(y * w + x) = ((((x / 8) * 29 + (y / 8) * 41 + docId * 13 +
            f * 57) % 256) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      JpegCodec.encode(w, h, 1, px)
    }
    AviCodec.encode(w, h, (33000 + (docId % 5) * 1000).toInt, frames)
  }

  /** Deterministic AVI payload MIX for the drop accounting: by
    * `docId % 5` a decodable MJPEG AVI, plain text (refused: not_avi),
    * one whose stream handler is patched MJPG→XVID (refused:
    * unsupported_codec), one cut mid-movi (refused: truncated), or one
    * whose first frame's SOF0 marker is patched to progressive SOF2
    * (refused: frame_unsupported — the container walk succeeds, the
    * per-frame JPEG decode refuses). Each refusal patches the REAL
    * encoder's bytes at its actual classification point. */
  def syntheticSkipAvi(docId: Long): Array[Byte] = (docId % 5) match {
    case 0 => syntheticAvi(docId)
    case 1 => s"doc $docId is plain text, not a video".getBytes("UTF-8")
    case 2 =>
      val b = syntheticAvi(docId)
      patchFourcc(b, "MJPG", "XVID")
    case 3 => syntheticAvi(docId).dropRight(9) // inside the last frame
    case _ =>
      val b = syntheticAvi(docId)
      // first frame starts after RIFF hdr(12) + hdrl LIST(8+192) +
      // movi LIST hdr(12) + 00dc chunk hdr(8) = byte 232; the
      // syntheticJpeg layout puts the SOF marker at frame byte 71
      // (0xFF C0 at 71–72) regardless of dims
      b(232 + 72) = 0xc2.toByte // SOF0 → SOF2 (progressive)
      b
  }

  /** Patch every occurrence of a fourcc in place (test/fixture helper:
    * corrupts real encoder output at a named classification point). */
  private def patchFourcc(b: Array[Byte], from: String, to: String): Array[Byte] = {
    val f = from.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val t = to.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var i = 0
    while (i + 4 <= b.length) {
      if (b(i) == f(0) && b(i + 1) == f(1) && b(i + 2) == f(2) &&
        b(i + 3) == f(3)) {
        b(i) = t(0); b(i + 1) = t(1); b(i + 2) = t(2); b(i + 3) = t(3)
        i += 4
      } else i += 1
    }
    b
  }
}
