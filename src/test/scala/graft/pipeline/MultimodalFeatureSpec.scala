package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scene-cut detection and short-time spectrogram over the REAL codec
  * fixtures: both checked against independent local recomputation from
  * the generation arithmetic (not against the codecs themselves), so a
  * framing, lag, threshold, or zero-padding slip fails here even before
  * the DuckDB oracle runs.
  */
class MultimodalFeatureSpec extends SparkSpec {
  import spark.implicits._

  private def media(n: Int, gen: Long => Array[Byte], mt: String) = {
    val g = udf { (id: Long) => gen(id) }
    spark.range(n).select(col("id").as("doc_id"),
      g(col("id")).as("payload"), lit(mt).as("media_type"))
  }

  // the syntheticAvi pixel law, restated independently
  private def frameMeanMicro(doc: Long, f: Int): Long = {
    val w = 8 * (1 + doc % 3).toInt
    val h = 8 * (1 + doc % 2).toInt
    var sum = 0L
    for (y <- 0 until h; x <- 0 until w)
      sum += ((x / 8) * 29 + (y / 8) * 41 + doc * 13 + f * 57) % 256
    (sum * 1000000L + (w * h) / 2) / (w * h)
  }

  test("scene cuts match a local replay of lag + threshold") {
    val th = 100000000L
    val got = Multimodal.sceneCuts(media(40, Multimodal.syntheticAvi, "video/avi"), th)
      .select($"doc_id", $"frame_idx", $"mean_micro", $"score_micro", $"is_cut")
      .as[(Long, Int, Long, Option[Long], Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap

    var checked = 0
    for (doc <- 0L until 40L) {
      val nFrames = (1 + doc % 3).toInt
      var prev = -1L
      for (f <- 0 until nFrames) {
        val mean = frameMeanMicro(doc, f)
        val (_, _, gMean, gScore, gCut) = got((doc, f))
        assert(gMean === mean, s"doc=$doc f=$f mean")
        if (f == 0) {
          assert(gScore.isEmpty && gCut, s"doc=$doc frame 0 starts a scene")
        } else {
          val score = math.abs(mean - prev)
          assert(gScore.contains(score), s"doc=$doc f=$f score")
          assert(gCut === (score > th), s"doc=$doc f=$f cut flag")
        }
        prev = mean
        checked += 1
      }
    }
    assert(checked === got.size, "row count matches the fixture geometry")
    // the threshold must actually split the fixture both ways
    val cuts = got.values.count(r => r._2 > 0 && r._5)
    val noncuts = got.values.count(r => r._2 > 0 && !r._5)
    assert(cuts > 0 && noncuts > 0, s"threshold splits: $cuts cuts / $noncuts non")
  }

  // channel-0 sample law of syntheticWav, restated independently
  private def sample(doc: Long, i: Int): Int =
    if (doc % 3 == 0) ((i * 17 + doc * 13) % 241).toInt - 120
    else ((i * 131 + doc * 11) % 16001).toInt - 8000

  test("spectrogram frames match a direct per-window DFT") {
    val nFft = 32
    val hop = 16
    val got = Multimodal.spectrogram(
        media(30, Multimodal.syntheticWav, "audio/wav"), nFft, hop)
      .select($"doc_id", $"frame_idx", $"dc_mag", $"dom_bin", $"dom_mag")
      .as[(Long, Int, Long, Int, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap

    var checked = 0
    for (doc <- 0L until 30L) {
      val n = (40 + doc % 60).toInt
      val nWin = (n + hop - 1) / hop
      for (f <- 0 until nWin) {
        // direct DFT over the zero-padded window — independent of Dsp.fft
        val win = (0 until nFft).map { j =>
          val i = f * hop + j
          if (i < n) sample(doc, i) else 0
        }
        val rounded = (0 to nFft / 2).map { k =>
          var re = 0.0; var im = 0.0
          for (j <- 0 until nFft) {
            val ang = -2.0 * math.Pi * k * j / nFft
            re += win(j) * math.cos(ang)
            im += win(j) * math.sin(ang)
          }
          val mag = math.sqrt(re * re + im * im)
          // the floor(mag+0.5) cross-engine certificate assumes no fixture
          // magnitude sits ON a .5 rounding boundary (radix-2 FFT and the
          // O(N²) DFT sum in different orders and can differ by ~1 ulp,
          // which would flip the rounded value engine-to-engine there) —
          // pin that the fixture honors the assumption with wide margin
          val fracDist = math.abs((mag - math.floor(mag)) - 0.5)
          assert(fracDist > 1e-6,
            s"doc=$doc f=$f k=$k magnitude $mag within 1e-6 of a .5 boundary")
          math.floor(mag + 0.5).toLong
        }
        var best = 1
        for (k <- 2 to nFft / 2) if (rounded(k) > rounded(best)) best = k
        val (_, _, gDc, gBin, gMag) = got((doc, f))
        assert(gDc === rounded(0), s"doc=$doc f=$f dc")
        assert(gBin === best, s"doc=$doc f=$f dominant bin")
        assert(gMag === rounded(best), s"doc=$doc f=$f dominant mag")
        checked += 1
      }
    }
    assert(checked === got.size, "frame grid matches ceil(n/hop) exactly")
  }
}
