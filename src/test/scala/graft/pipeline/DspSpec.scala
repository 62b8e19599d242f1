package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Certifies the radix-2 FFT against a direct O(N²) DFT — the same
  * cross-implementation contract the `multimodal_fft` oracle replays in
  * SQL — plus the feature extraction built on it.
  */
class DspSpec extends SparkSpec {

  /** Direct DFT magnitude of bins 0..n/2 — the reference the oracle SQL
    * states. Deliberately a different algorithm from Dsp.fft. */
  private def dftMags(x: Array[Double], n: Int): Array[Double] =
    Array.tabulate(n / 2 + 1) { k =>
      var re = 0.0; var im = 0.0
      var i = 0
      while (i < x.length) {
        val ang = -2.0 * math.Pi * k * i / n
        re += x(i) * math.cos(ang)
        im += x(i) * math.sin(ang)
        i += 1
      }
      math.sqrt(re * re + im * im)
    }

  test("fft matches direct DFT across lengths and deterministic signals") {
    for (n <- Seq(2, 4, 8, 16, 64, 256); seed <- 0 to 2) {
      val x = Array.tabulate(n)(i => ((i * 131 + seed * 977) % 16001 - 8000).toDouble)
      val re = x.clone()
      val im = new Array[Double](n)
      Dsp.fft(re, im)
      val want = dftMags(x, n)
      var k = 0
      while (k <= n / 2) {
        val got = math.sqrt(re(k) * re(k) + im(k) * im(k))
        val scale = math.max(1.0, want(k))
        assert(math.abs(got - want(k)) / scale < 1e-9,
          s"n=$n seed=$seed bin=$k: fft=$got dft=${want(k)}")
        k += 1
      }
    }
  }

  test("fft rejects non-power-of-2 length") {
    intercept[IllegalArgumentException] {
      Dsp.fft(new Array[Double](12), new Array[Double](12))
    }
  }

  test("magnitudeSpectrum truncates long input and zero-pads short input") {
    val long = Array.tabulate(100)(i => (i * 17) % 241 - 120)
    val trunc = Dsp.magnitudeSpectrum(long, 64)
    val direct = dftMags(long.take(64).map(_.toDouble), 64)
    trunc.indices.foreach { k =>
      assert(math.abs(trunc(k) - direct(k)) / math.max(1.0, direct(k)) < 1e-9)
    }
    val short = Array.tabulate(5)(i => i + 1)
    val padded = Dsp.magnitudeSpectrum(short, 16)
    val padDirect = dftMags(short.map(_.toDouble), 16)
    assert(padded.length == 9)
    padded.indices.foreach { k =>
      assert(math.abs(padded(k) - padDirect(k)) / math.max(1.0, padDirect(k)) < 1e-9)
    }
  }

  test("dominantBin takes the lowest bin on a tie and skips DC") {
    // DC huge; bins 2 and 5 tie — the lowest wins. Rounded-magnitude
    // domain: the production argmax runs on the oracle's rounding grid.
    assert(Dsp.dominantBin(Array(1000000000L, 3L, 7L, 2L, 1L, 7L)) == 2)
    assert(Dsp.dominantBin(Array(0L, 5L)) == 1)
  }

  test("spectralFeatures decodes channel 0 and lands on the DFT integers") {
    import spark.implicits._
    val docIds = Seq(0L, 1L, 2L, 3L, 5L, 6L, 12L, 61L)
    val media = docIds.toDF("doc_id")
      .select(col("doc_id"),
        udf((id: Long) => Multimodal.syntheticWav(id)).apply(col("doc_id")).as("payload"))
    val got = Multimodal.spectralFeatures(media, nFft = 64)
      .orderBy("doc_id").collect()

    docIds.zip(got).foreach { case (id, row) =>
      // Reference features from the generation arithmetic (channel 0)
      // through the direct DFT — no WavCodec, no FFT.
      val bits = if (id % 3 == 0) 8 else 16
      val nFrames = (40 + id % 60).toInt
      val n = math.min(nFrames, 64)
      val x = Array.tabulate(n) { i =>
        (if (bits == 8) (i * 17 + id * 13) % 241 - 120
         else (i * 131 + id * 11) % 16001 - 8000).toDouble
      }
      val mags = dftMags(x, 64)
      val rounded = mags.map(m => math.floor(m + 0.5).toLong)
      var best = 1
      (2 until rounded.length).foreach(k => if (rounded(k) > rounded(best)) best = k)
      var num = 0.0; var den = 0.0
      (1 until mags.length).foreach { k => num += k * mags(k); den += mags(k) }
      val centroid = if (den == 0.0) 0L
        else math.floor(num / den * 1000 + 0.5).toLong

      assert(row.getLong(0) == id)
      assert(row.getInt(1) == 64)
      assert(row.getLong(2) == rounded(0), s"doc $id dc")
      assert(row.getInt(3) == best, s"doc $id dom_bin")
      assert(row.getLong(4) == rounded(best), s"doc $id dom_mag")
      assert(row.getLong(5) == centroid, s"doc $id centroid")
    }
  }

  test("spectralFeatures skips undecodable payloads") {
    import spark.implicits._
    val media = Seq((1L, "not a wav".getBytes)).toDF("doc_id", "payload")
    assert(Multimodal.spectralFeatures(media, 64).count() == 0)
  }
}
