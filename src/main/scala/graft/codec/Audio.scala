package graft.codec

/** Pure-JVM audio codecs for the graft's binary `bytes` column
  * (BASELINE.json.input_hint): PCM s16le, G.711 μ-law and A-law —
  * standard public formulas (ITU-T G.711). Used by the `mapPartitions`
  * decode stage; the per-row invariant is decoded-PCM SNR ≥ 30 dB vs the
  * fixture's reference PCM (BASELINE.md).
  */
object Audio {

  val Codecs: Vector[String] = Vector("pcm_s16le", "ulaw", "alaw")

  // ---------------------------------------------------------------- PCM16
  def pcm16Encode(samples: Array[Short]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      out(2 * i) = (samples(i) & 0xff).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def pcm16Decode(bytes: Array[Byte]): Array[Short] = {
    val n = bytes.length / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
      i += 1
    }
    out
  }

  // ---------------------------------------------------------------- μ-law
  private val MuLawBias = 0x84
  private val MuLawClip = 32635

  def ulawEncodeSample(s0: Short): Byte = {
    var s = s0.toInt
    val sign = if (s < 0) { s = -s; 0x80 } else 0
    if (s > MuLawClip) s = MuLawClip
    s += MuLawBias
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val mantissa = (s >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mantissa)).toByte
  }

  def ulawDecodeSample(b: Byte): Short = {
    val u = ~b & 0xff
    val sign = u & 0x80
    val exp = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    var s = ((mantissa << 3) + MuLawBias) << exp
    s -= MuLawBias
    (if (sign != 0) -s else s).toShort
  }

  // ---------------------------------------------------------------- A-law
  def alawEncodeSample(s0: Short): Byte = {
    var s = s0.toInt
    val sign = if (s >= 0) 0x80 else { s = -s - 1; if (s < 0) s = 0; 0 }
    if (s > 32635) s = 32635
    val out =
      if (s < 256) (s >> 4) & 0x0f
      else {
        var exp = 7
        var mask = 0x4000
        while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
        val mantissa = (s >> (exp + 3)) & 0x0f
        ((exp << 4) | mantissa)
      }
    ((out | sign) ^ 0x55).toByte
  }

  def alawDecodeSample(b: Byte): Short = {
    val a = (b ^ 0x55) & 0xff
    val sign = a & 0x80
    val exp = (a >> 4) & 0x07
    val mantissa = a & 0x0f
    var s =
      if (exp == 0) (mantissa << 4) + 8
      else ((mantissa << 4) + 0x108) << (exp - 1)
    if (sign == 0) s = -s
    s.toShort
  }

  def encode(codec: String, samples: Array[Short]): Array[Byte] = codec match {
    case "pcm_s16le" => pcm16Encode(samples)
    // primitive while loops: Array[Short].map boxes every sample
    // (Function1 is not specialized for Short)
    case "ulaw" =>
      val out = new Array[Byte](samples.length)
      var i = 0
      while (i < samples.length) { out(i) = ulawEncodeSample(samples(i)); i += 1 }
      out
    case "alaw" =>
      val out = new Array[Byte](samples.length)
      var i = 0
      while (i < samples.length) { out(i) = alawEncodeSample(samples(i)); i += 1 }
      out
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }

  /** Returns null for unknown codecs / null payloads — the graft analog of
    * the reference's `tp=="img"` undecodable passthrough (EL:603-604). */
  def decode(codec: String, bytes: Array[Byte]): Array[Short] = {
    if (bytes == null) return null
    codec match {
      case "pcm_s16le" => pcm16Decode(bytes)
      case "ulaw" =>
        // explicit loop: .map boxes every sample (Function1 is not
        // specialized on Byte=>Short) and decode IS the per-row hot path
        val out = new Array[Short](bytes.length)
        var i = 0
        while (i < bytes.length) { out(i) = ulawDecodeSample(bytes(i)); i += 1 }
        out
      case "alaw" =>
        val out = new Array[Short](bytes.length)
        var i = 0
        while (i < bytes.length) { out(i) = alawDecodeSample(bytes(i)); i += 1 }
        out
      case _ => null
    }
  }

  /** Signal-to-noise ratio in dB of `test` against reference `ref`. */
  def snrDb(ref: Array[Short], test: Array[Short]): Double = {
    if (ref == null || test == null || ref.length != test.length || ref.isEmpty)
      return Double.NegativeInfinity
    var sig = 0.0
    var err = 0.0
    var i = 0
    while (i < ref.length) {
      val r = ref(i).toDouble
      val d = r - test(i)
      sig += r * r
      err += d * d
      i += 1
    }
    if (err == 0.0) Double.PositiveInfinity else 10.0 * math.log10(sig / err)
  }

  /** Gain the signal to a target RMS (loudness normalization — the
    * conditioning step before mixing training audio from heterogeneous
    * sources). Hard-clamps at full scale rather than wrapping; silence
    * is returned unchanged (no gain can fix it — the VAD/quality gates
    * own that case). */
  def normalizeRms(samples: Array[Short], targetRms: Double): Array[Short] = {
    if (samples == null || samples.length == 0) return samples
    val r = rms(samples)
    if (r <= 0.0) return samples
    val gain = targetRms / r
    val out = new Array[Short](samples.length)
    var i = 0
    while (i < samples.length) {
      val v = math.rint(samples(i) * gain)
      out(i) = math.max(Short.MinValue,
        math.min(Short.MaxValue, v)).toShort
      i += 1
    }
    out
  }

  /** Fraction of samples at (or within `margin` of) digital full scale —
    * the standard clipping-damage signal; recordings above ~1% clipped
    * samples are audibly distorted and a quality filter drops or
    * re-gains them. */
  def clipRatio(samples: Array[Short], margin: Int = 1): Double = {
    if (samples == null || samples.length == 0) return 0.0
    val lo = Short.MinValue + margin
    val hi = Short.MaxValue - margin
    var n = 0; var i = 0
    while (i < samples.length) {
      if (samples(i) <= lo || samples(i) >= hi) n += 1
      i += 1
    }
    n.toDouble / samples.length
  }

  /** Mean sample value relative to full scale — a nonzero DC offset
    * signals a miswired capture chain and wastes headroom. */
  def dcOffset(samples: Array[Short]): Double = {
    if (samples == null || samples.length == 0) return 0.0
    var s = 0L; var i = 0
    while (i < samples.length) { s += samples(i); i += 1 }
    s.toDouble / samples.length / 32768.0
  }

  def rms(samples: Array[Short]): Double = {
    if (samples == null || samples.isEmpty) return 0.0
    var s = 0.0
    var i = 0
    while (i < samples.length) { s += samples(i).toDouble * samples(i); i += 1 }
    math.sqrt(s / samples.length)
  }

  /** Zero-crossing rate — crossings per sample, a cheap voicing/noise
    * discriminator (feature-extraction surface for the binary column). */
  def zeroCrossingRate(samples: Array[Short]): Double = {
    if (samples == null || samples.length < 2) return 0.0
    var z = 0
    var i = 1
    while (i < samples.length) {
      if ((samples(i) >= 0) != (samples(i - 1) >= 0)) z += 1
      i += 1
    }
    z.toDouble / (samples.length - 1)
  }

  /** Frame sampling: every `stride`-th sample (cheap downsample for
    * feature extraction; anti-aliasing is out of scope for features). */
  def frameSample(samples: Array[Short], stride: Int): Array[Short] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    if (samples == null) return null
    val out = new Array[Short]((samples.length + stride - 1) / stride)
    var i = 0
    while (i < out.length) { out(i) = samples(i * stride); i += 1 }
    out
  }

  /** Sample-rate conversion by linear interpolation — the audio analog of
    * the image op's nearest-neighbor resize (real resampling math on the
    * decoded grid; a production pipeline would add a low-pass filter
    * before downsampling — out of scope as for image NN-resize). The
    * rate-based grid `src = i * fromHz / toHz` preserves sample TIMING
    * (output sample i sits at the same instant as input time i/toHz), so
    * integer-ratio conversions land exactly on source samples — an
    * 8k→16k→8k round trip is bit-exact. Output length = floor(n·to/from). */
  def resampleLinear(samples: Array[Short], fromHz: Int,
      toHz: Int): Array[Short] = {
    if (samples == null) return null
    require(fromHz > 0 && toHz > 0, "sample rates must be positive")
    if (fromHz == toHz || samples.length <= 1) return samples.clone()
    val n = samples.length
    val m = math.max(1, (n.toLong * toHz / fromHz).toInt)
    val out = new Array[Short](m)
    val ratio = fromHz.toDouble / toHz
    var i = 0
    while (i < m) {
      val src = i * ratio
      val lo = math.min(n - 1, src.toInt)
      val hi = math.min(n - 1, lo + 1)
      val frac = src - lo
      out(i) = math.round(
        samples(lo) * (1.0 - frac) + samples(hi) * frac).toShort
      i += 1
    }
    out
  }

  /** Peak absolute amplitude (clipping indicator). */
  def peak(samples: Array[Short]): Int = {
    if (samples == null || samples.isEmpty) return 0
    var m = 0
    var i = 0
    while (i < samples.length) {
      val a = math.abs(samples(i).toInt); if (a > m) m = a; i += 1
    }
    m
  }

  /** Deterministic fixture waveform: sine + small seeded noise, amplitude
    * well inside 16-bit range so μ-law/A-law round-trips stay ≥ 30 dB SNR. */
  def synth(seed: Long, sampleRate: Int, nSamples: Int): Array[Short] = {
    // per-sample math.sin + Random.nextGaussian (log/sqrt + CAS) made
    // corpus synthesis cost more than stage-1 inference itself; use the
    // sine recurrence sin((i+1)w) = 2cos(w)·sin(iw) − sin((i−1)w)
    // (one multiply + one subtract per sample) and splitmix64 noise.
    // Deterministic in `seed`; same freq/amp envelope as before.
    var st = seed
    def next(): Long = {
      st += graft.util.Mix.Golden
      graft.util.Mix.fin(st)
    }
    val freq = 180.0 + (next() & Long.MaxValue) % 2800
    val amp = 6000.0 + (next() & Long.MaxValue) % 14000
    val w = 2 * math.Pi * freq / sampleRate
    val k = 2 * math.cos(w)
    val out = new Array[Short](nSamples)
    var prev = math.sin(-w) // sin at i = -1
    var cur = 0.0 // sin at i = 0
    var i = 0
    while (i < nSamples) {
      // uniform noise in [-80, 80) ≈ the old gaussian σ=40 jitter
      val noise = ((next() & Long.MaxValue) % 160L) - 80.0
      val v = amp * cur + noise
      out(i) = math.max(-32768.0, math.min(32767.0, v)).toShort
      val nxt = k * cur - prev
      prev = cur
      cur = nxt
      i += 1
    }
    out
  }
}
