package graft.pipeline

/** Pure-JVM spectral kernels for the audio feature-extraction stage of a
  * multimodal pipeline: an iterative radix-2 Cooley–Tukey FFT (the
  * textbook public algorithm — bit-reversal permutation + butterfly
  * passes) and the magnitude-spectrum features built on it.
  *
  * Per-row DSP is genuinely imperative work, so this runs inside a scalar
  * UDF over the decoded sample column — the Spark-side shape (binary
  * payload → codec decode → fixed-length feature vector) is exactly the
  * `mapInPandas` feature-extract contract from the build brief, with the
  * decode real (WavCodec) rather than stubbed. The certification path is
  * deliberately cross-implementation: queries compute spectra with THIS
  * radix-2 FFT while the oracle replays a direct O(N²) DFT in DuckDB SQL
  * from the same integer sample arithmetic — an indexing, twiddle,
  * bit-reversal, or scaling slip anywhere fails the hash.
  */
object Dsp {

  /** In-place iterative radix-2 FFT. `re.length` must be a power of 2
    * and equal `im.length`. Forward transform, no normalization
    * (X[k] = Σ x[n]·e^{−2πikn/N}).
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0,
      s"radix-2 FFT needs a power-of-2 length, got $n")
    // Bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // Butterfly passes: lengths 2, 4, ..., n
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0
        var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val ar = re(base + k); val ai = im(base + k)
          val br = re(base + k + len / 2); val bi = im(base + k + len / 2)
          val tr = br * cwr - bi * cwi
          val ti = br * cwi + bi * cwr
          re(base + k) = ar + tr; im(base + k) = ai + ti
          re(base + k + len / 2) = ar - tr; im(base + k + len / 2) = ai - ti
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Magnitude spectrum of a real signal: bins 0..n/2 (DC through
    * Nyquist — the non-redundant half for real input). Input is
    * truncated or zero-padded to `nFft`.
    */
  def magnitudeSpectrum(samples: Array[Int], nFft: Int): Array[Double] = {
    val re = new Array[Double](nFft)
    val im = new Array[Double](nFft)
    val m = math.min(samples.length, nFft)
    var i = 0
    while (i < m) { re(i) = samples(i).toDouble; i += 1 }
    fft(re, im)
    val out = new Array[Double](nFft / 2 + 1)
    var k = 0
    while (k <= nFft / 2) {
      out(k) = math.sqrt(re(k) * re(k) + im(k) * im(k))
      k += 1
    }
    out
  }

  /** Dominant non-DC bin: argmax over bins 1..n/2, lowest bin on a tie.
    * Takes the ROUNDED integer magnitudes, not raw doubles — production
    * ([[Multimodal.spectralFeatures]]) must run the argmax on the same
    * rounding grid the SQL oracle replays, or tie-breaks diverge on
    * magnitudes the grid considers equal. This is the only argmax; keep
    * it that way (a raw-double twin once sat here with subtly different
    * tie semantics).
    */
  def dominantBin(roundedMags: Array[Long]): Int = {
    var best = 1
    var k = 2
    while (k < roundedMags.length) {
      if (roundedMags(k) > roundedMags(best)) best = k
      k += 1
    }
    best
  }
}
