package graft.codec

/** Iterative radix-2 Cooley-Tukey FFT (public algorithm, textbook form)
  * plus the spectral features a quality filter wants per audio clip:
  * centroid, rolloff, flatness, bandwidth. All pure JVM — runs inside
  * the narrow `mapPartitions` codec stage, never a UDF.
  *
  * Scale note: per-row cost is O(F · n log n) for F frames of n samples;
  * no state, no shuffle — embarrassingly parallel across clips.
  */
object Fft {

  /** In-place complex FFT. `re`/`im` length must be a power of two. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"fft size $n not a power of 2")
    if (n <= 1) return
    // bit-reversal permutation
    var i = 1; var j = 0
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
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k; val b = blk + k + len / 2
          val tr = re(b) * cr - im(b) * ci
          val ti = re(b) * ci + im(b) * cr
          re(b) = re(a) - tr; im(b) = im(a) - ti
          re(a) += tr; im(a) += ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** Magnitude spectrum of a real frame (Hann-windowed), bins 0..n/2. */
  def magnitudeSpectrum(frame: Array[Double]): Array[Double] = {
    val n = frame.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    var i = 0
    while (i < n) {
      val w = 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (n - 1))) // Hann
      re(i) = frame(i) * w
      i += 1
    }
    fft(re, im)
    val out = new Array[Double](n / 2 + 1)
    i = 0
    while (i <= n / 2) {
      out(i) = math.sqrt(re(i) * re(i) + im(i) * im(i))
      i += 1
    }
    out
  }

  /** Spectral features of one clip: frame the signal (frameLen power of
    * two, hop = frameLen/2), average the per-frame magnitude spectra,
    * then reduce. Returns (centroidHz, rolloffHz, flatness, bandwidthHz);
    * all-zero signal → (0, 0, 1, 0).
    *
    * - centroid: magnitude-weighted mean frequency
    * - rolloff: frequency below which 85% of spectral energy lies
    * - flatness: geometric / arithmetic mean of the power spectrum
    *   (≈1 for noise, →0 for pure tones)
    * - bandwidth: magnitude-weighted stddev around the centroid
    */
  def spectralFeatures(samples: Array[Short], sampleRate: Int,
                       frameLen: Int = 1024): (Double, Double, Double, Double) = {
    val s = spectralBundle(samples, sampleRate, frameLen)
    (s.centroidHz, s.rolloffHz, s.flatness, s.bandwidthHz)
  }

  /** Every spectral statistic of a clip from ONE framing pass. The
    * standalone spectralFeatures / dominantFrequency / spectralFlux
    * delegate here (identical reductions over the same per-frame
    * spectra) — calling all three separately used to re-run the
    * dominant O(frames·frameLen·log frameLen) FFT accumulation three
    * times per row; the pipeline's spectral query now pays it once. */
  final case class Spectral(
      centroidHz: Double, rolloffHz: Double, flatness: Double,
      bandwidthHz: Double, dominantHz: Double, flux: Double)

  def spectralBundle(samples: Array[Short], sampleRate: Int,
      frameLen: Int = 1024): Spectral = {
    require((frameLen & (frameLen - 1)) == 0, "frameLen must be a power of 2")
    if (samples == null || samples.length < frameLen)
      return Spectral(0.0, 0.0, 1.0, 0.0, 0.0, 0.0)
    val hop = frameLen / 2
    val nBins = frameLen / 2 + 1
    val sum = new Array[Double](nBins) // raw magnitude sums
    val prev = new Array[Double](nBins) // L1-normalized previous frame
    var start = 0; var frames = 0; var flux = 0.0
    val frame = new Array[Double](frameLen)
    while (start + frameLen <= samples.length) {
      var i = 0
      while (i < frameLen) { frame(i) = samples(start + i) / 32768.0; i += 1 }
      val mag = magnitudeSpectrum(frame)
      var b = 0
      while (b < nBins) { sum(b) += mag(b); b += 1 }
      // flux: L1-normalize the frame in place AFTER accumulating sums
      var l1 = 0.0
      i = 0
      while (i < nBins) { l1 += mag(i); i += 1 }
      if (l1 > 1e-12) {
        i = 0
        while (i < nBins) { mag(i) /= l1; i += 1 }
      }
      if (frames > 0) {
        var d = 0.0
        i = 0
        while (i < nBins) {
          val diff = mag(i) - prev(i); d += diff * diff; i += 1
        }
        flux += math.sqrt(d)
      }
      System.arraycopy(mag, 0, prev, 0, nBins)
      frames += 1
      start += hop
    }
    val meanFlux = if (frames < 2) 0.0 else flux / (frames - 1)

    // ---- dominant frequency: FFT peak over the raw sums (scale-
    // invariant parabolic interpolation, so sums ≡ means bit-for-bit
    // in the delta ratio)
    var pk = 1
    var b = 2
    while (b < nBins - 1) { if (sum(b) > sum(pk)) pk = b; b += 1 }
    val dominant =
      if (sum(pk) <= 1e-12) 0.0
      else {
        val a = sum(pk - 1); val c = sum(pk + 1); val m0 = sum(pk)
        val denom = a - 2 * m0 + c
        val delta = if (math.abs(denom) < 1e-30) 0.0 else 0.5 * (a - c) / denom
        (pk + delta) * sampleRate.toDouble / frameLen
      }

    // ---- averaged-spectrum reductions (centroid/rolloff/flatness/bw)
    val acc = new Array[Double](nBins)
    b = 0
    while (b < nBins) { acc(b) = sum(b) / frames; b += 1 }
    val binHz = sampleRate.toDouble / frameLen
    var sumMag = 0.0; var sumF = 0.0
    b = 0
    while (b < nBins) { sumMag += acc(b); sumF += acc(b) * b * binHz; b += 1 }
    if (sumMag <= 1e-12)
      return Spectral(0.0, 0.0, 1.0, 0.0, dominant, meanFlux)
    val centroid = sumF / sumMag
    // rolloff at 85% of total energy (power, not magnitude)
    var totPow = 0.0
    b = 0
    while (b < nBins) { totPow += acc(b) * acc(b); b += 1 }
    var cum = 0.0; var rb = 0
    while (rb < nBins && cum < 0.85 * totPow) { cum += acc(rb) * acc(rb); rb += 1 }
    val rolloff = math.max(0, rb - 1) * binHz
    // flatness over the power spectrum, excluding DC; floor to avoid log(0)
    var logSum = 0.0; var ariSum = 0.0
    b = 1
    while (b < nBins) {
      val p = math.max(acc(b) * acc(b), 1e-20)
      logSum += math.log(p); ariSum += p
      b += 1
    }
    val m = nBins - 1
    val flatness = math.exp(logSum / m) / (ariSum / m)
    var sumVar = 0.0
    b = 0
    while (b < nBins) {
      val d = b * binHz - centroid
      sumVar += acc(b) * d * d
      b += 1
    }
    val bandwidth = math.sqrt(sumVar / sumMag)
    Spectral(centroid, rolloff, flatness, bandwidth, dominant, meanFlux)
  }

  /** Time-averaged, L2-normalized band-energy vector of a clip — the
    * audio near-dup feature. Frames of `frameLen` (hop = frameLen/2,
    * Hann), magnitude spectra split into `nBands` equal bands (DC bin
    * excluded), accumulated over all frames, then L2-normalized so the
    * vector is exactly invariant to volume scaling. Quantization noise
    * from μ-law/A-law and small additive noise perturb it only at the
    * broadband floor, so near-identical audio keeps cosine ≈ 1 while
    * different tonal content drops it sharply.
    *
    * NOTE on design history: a Haitsma-Kalker-style 64-bit sign
    * fingerprint was tried first and measured UNSTABLE here — for
    * quasi-stationary audio most sign bits compare noise-floor band
    * pairs, and a μ-law round trip (quantization noise ≈ -35 dB of a
    * strong tone, i.e. above the synthetic noise floor) re-rolled 25-30
    * of 64 bits. Exact-verified peak-band bucketing over this vector is
    * the robust formulation ([[graft.operators.Dedup.audioNearDup]]).
    *
    * Returns null for clips shorter than one frame.
    */
  def bandEnergies(samples: Array[Short], frameLen: Int = 1024,
                   nBands: Int = 64): Array[Double] = {
    if (samples == null || samples.length < frameLen) return null
    val nBins = frameLen / 2 + 1
    val bands = new Array[Double](nBands)
    val frame = new Array[Double](frameLen)
    var start = 0
    while (start + frameLen <= samples.length) {
      var i = 0
      while (i < frameLen) { frame(i) = samples(start + i) / 32768.0; i += 1 }
      val mag = magnitudeSpectrum(frame)
      i = 1
      while (i < nBins) {
        val band = (i - 1) * nBands / (nBins - 1)
        bands(band) += mag(i) * mag(i)
        i += 1
      }
      start += frameLen / 2
    }
    var norm = 0.0
    var b = 0
    while (b < nBands) { norm += bands(b) * bands(b); b += 1 }
    if (norm <= 0.0) return null // digital silence: no spectral identity
    norm = math.sqrt(norm)
    b = 0
    while (b < nBands) { bands(b) /= norm; b += 1 }
    bands
  }

  /** Index of the strongest band — the bucketing key for
    * [[graft.operators.Dedup.audioNearDup]]. */
  def peakBand(bands: Array[Double]): Int = {
    var best = 0; var b = 1
    while (b < bands.length) { if (bands(b) > bands(best)) best = b; b += 1 }
    best
  }

  /** Spectral-peak landmark fingerprints (Wang 2003, the Shazam
    * constellation scheme): per half-overlapped frame, keep the
    * `peaksPerFrame` strongest LOCAL-MAX bins; pair each peak with up
    * to `fanout` peaks in the next 1..`maxDt` frames and hash
    * (f1, f2, dt) into an int. Each returned Long packs
    * (hash << 32) | anchorFrame.
    *
    * Why this exists next to [[bandEnergies]]: the band-energy cosine
    * tier compares WHOLE-clip spectra, so a copy shifted in time decoheres
    * (energy lands in the same bands only if content is stationary).
    * Landmark hashes are relative (f1, f2, Δt) — invariant to time
    * offset (the anchor frame shifts, the hash doesn't) and robust to
    * volume scaling (dominant argmax bins are scale-invariant; only
    * noise-floor peaks reshuffle under 16-bit re-quantization — FftSpec
    * measures the overlap) — so a delayed re-noised
    * copy still shares most hashes, and the match offset is recoverable
    * as the constant anchor-frame difference
    * ([[graft.operators.Dedup.audioFingerprintMatch]] histograms it).
    * Returns null for clips shorter than one frame or with no peaks. */
  def peakLandmarks(samples: Array[Short], frameLen: Int = 512,
      peaksPerFrame: Int = 3, fanout: Int = 3,
      maxDt: Int = 8): Array[Long] = {
    if (samples == null || samples.length < frameLen) return null
    val hop = frameLen / 2
    val nBins = frameLen / 2 + 1
    val frame = new Array[Double](frameLen)
    // per-frame selected peak bins, ascending (deterministic)
    val framePeaks = new scala.collection.mutable.ArrayBuffer[Array[Int]]
    var start = 0
    while (start + frameLen <= samples.length) {
      var i = 0
      while (i < frameLen) { frame(i) = samples(start + i) / 32768.0; i += 1 }
      val mag = magnitudeSpectrum(frame)
      // local maxima, then the peaksPerFrame strongest (tie -> lower bin)
      var cand = List.empty[Int]
      i = 2
      while (i < nBins - 1) {
        if (mag(i) > mag(i - 1) && mag(i) >= mag(i + 1) && mag(i) > 1e-9)
          cand = i :: cand
        i += 1
      }
      val top = cand.sortBy(b => (-mag(b), b)).take(peaksPerFrame)
        .sorted.toArray
      framePeaks += top
      start += hop
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long]
    var t1 = 0
    while (t1 < framePeaks.length) {
      val ps = framePeaks(t1)
      var pi = 0
      while (pi < ps.length) {
        val f1 = ps(pi)
        var paired = 0
        var dt = 1
        while (dt <= maxDt && paired < fanout && t1 + dt < framePeaks.length) {
          val qs = framePeaks(t1 + dt)
          var qi = 0
          while (qi < qs.length && paired < fanout) {
            val f2 = qs(qi)
            val hash = ((f1 & 0x3ff) << 16) | ((f2 & 0x3ff) << 6) | (dt & 0x3f)
            out += (hash.toLong << 32) | t1.toLong
            paired += 1
            qi += 1
          }
          dt += 1
        }
        pi += 1
      }
      t1 += 1
    }
    if (out.isEmpty) null else out.toArray
  }

  /** Mean spectral flux: the average L2 distance between consecutive
    * frames' L1-normalized magnitude spectra — the standard onset /
    * non-stationarity signal (≈0 for steady tones, large for content
    * whose spectrum moves). Normalizing each frame first makes the
    * measure volume-invariant. 0.0 for fewer than two frames. */
  def spectralFlux(samples: Array[Short], frameLen: Int = 1024): Double =
    spectralBundle(samples, sampleRate = 1, frameLen).flux // sr unused by flux

  /** Dominant frequency via FFT peak with quadratic (parabolic)
    * interpolation over the time-averaged magnitude spectrum — the
    * standard sub-bin refinement: the true peak of a leaky bin triple
    * (m[k-1], m[k], m[k+1]) sits at k + (m[k-1]-m[k+1]) /
    * (2(m[k-1]-2m[k]+m[k+1])). Recovers pure-tone frequency to ~1 Hz
    * at 8 kHz / 1024-point frames. 0.0 for silent/too-short input. */
  def dominantFrequency(samples: Array[Short], sampleRate: Int,
                        frameLen: Int = 1024): Double = {
    spectralBundle(samples, sampleRate, frameLen).dominantHz
  }

  // ------------------------------------------------------------ mel/MFCC
  /** Mel scale (O'Shaughnessy 1987, the standard public formula). */
  def melScale(hz: Double): Double = 2595.0 * math.log10(1.0 + hz / 700.0)
  def invMelScale(mel: Double): Double =
    700.0 * (math.pow(10.0, mel / 2595.0) - 1.0)

  /** Time-averaged log-mel filterbank energies: average the power
    * spectrum over Hann frames, apply `nMels` triangular filters with
    * mel-spaced centers over 0..sr/2, take log (floored at 1e-12).
    * Returns null for clips shorter than one frame. */
  def logMel(samples: Array[Short], sampleRate: Int, frameLen: Int = 1024,
             nMels: Int = 26): Array[Double] = {
    if (samples == null || samples.length < frameLen) return null
    val nBins = frameLen / 2 + 1
    val pow = new Array[Double](nBins)
    val frame = new Array[Double](frameLen)
    var start = 0; var nFrames = 0
    while (start + frameLen <= samples.length) {
      var i = 0
      while (i < frameLen) { frame(i) = samples(start + i) / 32768.0; i += 1 }
      val mag = magnitudeSpectrum(frame)
      i = 0
      while (i < nBins) { pow(i) += mag(i) * mag(i); i += 1 }
      start += frameLen / 2
      nFrames += 1
    }
    var i = 0
    while (i < nBins) { pow(i) /= nFrames; i += 1 }
    // triangular filters: nMels+2 mel-spaced edge frequencies
    val maxMel = melScale(sampleRate / 2.0)
    val edges = Array.tabulate(nMels + 2)(m =>
      invMelScale(m * maxMel / (nMels + 1)))
    val binHz = sampleRate.toDouble / frameLen
    val out = new Array[Double](nMels)
    var m = 0
    while (m < nMels) {
      val lo = edges(m); val c = edges(m + 1); val hi = edges(m + 2)
      var e = 0.0
      i = math.max(1, math.ceil(lo / binHz).toInt)
      val end = math.min(nBins - 1, math.floor(hi / binHz).toInt)
      while (i <= end) {
        val f = i * binHz
        val w =
          if (f <= c) (f - lo) / (c - lo)
          else (hi - f) / (hi - c)
        if (w > 0) e += w * pow(i)
        i += 1
      }
      out(m) = math.log(math.max(e, 1e-12))
      m += 1
    }
    out
  }

  /** MFCC: orthonormal DCT-II of the log-mel energies, first `nCoef`
    * coefficients. c0 carries overall log energy (shifts with volume);
    * c1.. are volume-invariant spectral-shape descriptors. */
  def mfcc(logMelE: Array[Double], nCoef: Int = 13): Array[Double] = {
    if (logMelE == null) return null
    val n = logMelE.length
    val out = new Array[Double](math.min(nCoef, n))
    var k = 0
    while (k < out.length) {
      var s = 0.0
      var m = 0
      while (m < n) {
        s += logMelE(m) * math.cos(math.Pi * k * (m + 0.5) / n)
        m += 1
      }
      val scale =
        if (k == 0) math.sqrt(1.0 / n) else math.sqrt(2.0 / n)
      out(k) = scale * s
      k += 1
    }
    out
  }

  /** Energy-threshold voice-activity detection. Frames of `frameLen`
    * samples (non-overlapping); a frame is active iff its RMS (relative
    * to full scale) exceeds `threshold`. Returns
    * (speechRatio, firstActiveSample, lastActiveSampleExclusive);
    * no active frames → (0.0, 0, 0).
    */
  def vad(samples: Array[Short], frameLen: Int = 256,
          threshold: Double = 0.01): (Double, Int, Int) = {
    if (samples == null || samples.length == 0) return (0.0, 0, 0)
    // ceil division: the trailing PARTIAL frame is examined too — with
    // floor framing, up to frameLen-1 active trailing samples were
    // classified silent and trimSilence cut genuine speech
    val nFrames = (samples.length + frameLen - 1) / frameLen
    var active = 0; var first = -1; var last = -1
    var f = 0
    while (f < nFrames) {
      var s = 0.0
      var i = f * frameLen
      val end = math.min(i + frameLen, samples.length)
      val n = end - i
      while (i < end) { val v = samples(i).toDouble; s += v * v; i += 1 }
      val r = math.sqrt(s / n) / 32768.0
      if (r > threshold) {
        active += 1
        if (first < 0) first = f * frameLen
        last = end
      }
      f += 1
    }
    if (first < 0) (0.0, 0, 0)
    else (active.toDouble / nFrames, first, last)
  }

  /** Trim leading/trailing silence per `vad`; all-silent → empty;
    * null-tolerant like the rest of the codec surface. */
  def trimSilence(samples: Array[Short], frameLen: Int = 256,
                  threshold: Double = 0.01): Array[Short] = {
    if (samples == null) return null
    val (_, from, until) = vad(samples, frameLen, threshold)
    java.util.Arrays.copyOfRange(samples, from, until)
  }
}
