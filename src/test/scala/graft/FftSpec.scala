package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.{Audio, Fft}
import graft.lid.TextStats

class FftSpec extends AnyFunSuite {

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n); val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  test("fft matches naive DFT on a deterministic signal (n=64)") {
    val x = Array.tabulate(64)(i => math.sin(0.3 * i) + 0.5 * math.cos(1.7 * i))
    val (er, ei) = naiveDft(x)
    val re = x.clone(); val im = new Array[Double](64)
    Fft.fft(re, im)
    for (k <- 0 until 64) {
      assert(math.abs(re(k) - er(k)) < 1e-9, s"re bin $k")
      assert(math.abs(im(k) - ei(k)) < 1e-9, s"im bin $k")
    }
  }

  test("Parseval: time energy equals 1/n * spectral energy") {
    val x = Array.tabulate(256)(i => math.cos(0.11 * i) * (1 + 0.01 * i))
    val timeE = x.map(v => v * v).sum
    val re = x.clone(); val im = new Array[Double](256)
    Fft.fft(re, im)
    val specE = (0 until 256).map(k => re(k) * re(k) + im(k) * im(k)).sum / 256
    assert(math.abs(timeE - specE) / timeE < 1e-12)
  }

  test("fft rejects non-power-of-two sizes") {
    intercept[IllegalArgumentException] {
      Fft.fft(new Array[Double](100), new Array[Double](100))
    }
  }

  test("spectral centroid of a pure 1 kHz sine is ~1 kHz; flatness near 0") {
    val sr = 16000
    val sine = Array.tabulate[Short](8192)(i =>
      (12000 * math.sin(2 * math.Pi * 1000 * i / sr.toDouble)).toShort)
    val (centroid, rolloff, flatness, bandwidth) = Fft.spectralFeatures(sine, sr)
    info(f"sine: centroid=$centroid%.1f rolloff=$rolloff%.1f flat=$flatness%.4f bw=$bandwidth%.1f")
    assert(math.abs(centroid - 1000.0) < 60.0, s"centroid $centroid")
    assert(math.abs(rolloff - 1000.0) < 60.0, s"rolloff $rolloff")
    assert(flatness < 0.05, s"flatness $flatness")
    assert(bandwidth < 400.0, s"bandwidth $bandwidth")
  }

  test("noise is flatter and wider-band than a tone") {
    val sr = 16000
    val noise = Audio.synth(11L, sr, 8192)
    val sine = Array.tabulate[Short](8192)(i =>
      (12000 * math.sin(2 * math.Pi * 2000 * i / sr.toDouble)).toShort)
    val (_, _, fN, bwN) = Fft.spectralFeatures(noise, sr)
    val (_, _, fS, bwS) = Fft.spectralFeatures(sine, sr)
    assert(fN > 10 * fS, s"noise flatness $fN vs sine $fS")
    assert(bwN > bwS, s"noise bw $bwN vs sine $bwS")
  }

  test("degenerate spectral inputs") {
    assert(Fft.spectralFeatures(null, 8000) == (0.0, 0.0, 1.0, 0.0))
    assert(Fft.spectralFeatures(new Array[Short](10), 8000) == (0.0, 0.0, 1.0, 0.0))
    // all-zero long enough signal
    assert(Fft.spectralFeatures(new Array[Short](4096), 8000) == (0.0, 0.0, 1.0, 0.0))
  }

  test("vad finds the voiced span; trimSilence removes the padding") {
    val tone = Array.tabulate[Short](2048)(i =>
      (8000 * math.sin(2 * math.Pi * 440 * i / 8000.0)).toShort)
    val sig = new Array[Short](1024) ++ tone ++ new Array[Short](1024)
    val (ratio, from, until) = Fft.vad(sig)
    assert(ratio == 0.5, s"ratio $ratio")
    assert(from == 1024 && until == 3072, s"($from,$until)")
    val trimmed = Fft.trimSilence(sig)
    assert(trimmed.length == 2048)
    assert(trimmed.sameElements(tone))
  }

  test("bandEnergies: volume-exact, noise/codec-robust, tone-discriminative") {
    def cos(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum // both L2-normalized
    val seeds = Seq(3L, 14L, 159L, 2653L, 58979L)
    for (seed <- seeds) {
      val pcm = Audio.synth(seed, 8000, 8192)
      val bands = Fft.bandEnergies(pcm)
      assert(bands != null && bands.length == 64)
      assert(math.abs(cos(bands, bands) - 1.0) < 1e-12) // unit norm
      // volume scaling: cosine identical to ~quantization error
      val quiet = pcm.map(v => (v * 0.5).toShort)
      assert(cos(bands, Fft.bandEnergies(quiet)) > 0.9999, s"volume $seed")
      // μ-law codec roundtrip (≥30 dB SNR distortion)
      val ul = Audio.decode("ulaw", Audio.encode("ulaw", pcm))
      assert(cos(bands, Fft.bandEnergies(ul)) > 0.99, s"ulaw $seed")
      // additive noise at ~0.6% full scale
      var st = seed
      val noisy = pcm.map { v =>
        st = st * 6364136223846793005L + 1442695040888963407L
        (v + ((st >>> 33) % 400L) - 200L).toShort
      }
      assert(cos(bands, Fft.bandEnergies(noisy)) > 0.98, s"noise $seed")
      // peak band survives all three transformations
      assert(Fft.peakBand(Fft.bandEnergies(ul)) == Fft.peakBand(bands))
      assert(Fft.peakBand(Fft.bandEnergies(quiet)) == Fft.peakBand(bands))
    }
    // distinct tones: cosine far below the 0.95 near-dup threshold
    val vecs = seeds.map(s => Fft.bandEnergies(Audio.synth(s, 8000, 8192)))
    for (i <- vecs.indices; j <- vecs.indices if i < j) {
      val c = cos(vecs(i), vecs(j))
      assert(c < 0.8, s"seeds ${seeds(i)} vs ${seeds(j)}: cos $c")
    }
    // degenerate inputs
    assert(Fft.bandEnergies(new Array[Short](100)) == null) // too short
    assert(Fft.bandEnergies(new Array[Short](4096)) == null) // silence
    assert(Fft.bandEnergies(null) == null)
  }

  test("dominantFrequency recovers planted tones to ~1 Hz via parabolic refinement") {
    val sr = 8000
    for (hz <- Seq(440.0, 1234.5, 2718.0, 199.0)) {
      val tone = Array.tabulate[Short](8192)(i =>
        (11000 * math.sin(2 * math.Pi * hz * i / sr)).toShort)
      val est = Fft.dominantFrequency(tone, sr)
      assert(math.abs(est - hz) < 1.5, s"$hz Hz -> $est")
    }
    // bin width is 7.8125 Hz at 8 kHz / 1024 — sub-bin accuracy proves
    // the interpolation is live, not just argmax
    assert(Fft.dominantFrequency(new Array[Short](8192), sr) == 0.0)
    assert(Fft.dominantFrequency(null, sr) == 0.0)
  }

  test("spectral flux: ~0 for steady tones, high for moving spectra, volume-invariant") {
    val sr = 8000
    val steady = Array.tabulate[Short](8192)(i =>
      (11000 * math.sin(2 * math.Pi * 500 * i / sr)).toShort)
    // alternate 500 Hz / 2500 Hz every frame-length block
    val moving = Array.tabulate[Short](8192) { i =>
      val hz = if ((i / 1024) % 2 == 0) 500.0 else 2500.0
      (11000 * math.sin(2 * math.Pi * hz * i / sr)).toShort
    }
    val fs = Fft.spectralFlux(steady)
    val fm = Fft.spectralFlux(moving)
    info(f"flux steady=$fs%.4f moving=$fm%.4f")
    assert(fs < 0.01, s"steady $fs")
    assert(fm > 10 * fs, s"moving $fm vs steady $fs")
    // L1-normalized frames → volume-invariant
    val quiet = steady.map(v => (v / 4).toShort)
    assert(math.abs(Fft.spectralFlux(quiet) - fs) < 0.02)
    assert(Fft.spectralFlux(null) == 0.0)
    assert(Fft.spectralFlux(new Array[Short](100)) == 0.0)
  }

  test("log-mel filterbank: tone frequency ordering and volume behavior") {
    val sr = 16000
    def tone(hz: Double) = Array.tabulate[Short](8192)(i =>
      (10000 * math.sin(2 * math.Pi * hz * i / sr)).toShort)
    val low = Fft.logMel(tone(300), sr)
    val high = Fft.logMel(tone(3000), sr)
    assert(low.length == 26 && high.length == 26)
    def argmax(a: Array[Double]) = a.indices.maxBy(a(_))
    assert(argmax(low) < argmax(high),
      s"low peak ${argmax(low)} !< high peak ${argmax(high)}")
    // mel scale is monotone and hits the standard anchor (1000 Hz ≈ 1000 mel)
    assert(math.abs(Fft.melScale(1000) - 999.99) < 0.1)
    assert(Fft.invMelScale(Fft.melScale(1234.5)) - 1234.5 < 1e-9)
    // degenerate
    assert(Fft.logMel(null, sr) == null)
    assert(Fft.logMel(new Array[Short](10), sr) == null)
  }

  test("mfcc: c1.. are volume-invariant, c0 shifts; DCT basics") {
    val sr = 16000
    val pcm = Audio.synth(23L, sr, 8192)
    val full = Fft.mfcc(Fft.logMel(pcm, sr))
    val half = Fft.mfcc(Fft.logMel(pcm.map(v => (v / 2).toShort), sr))
    assert(full.length == 13)
    // halving amplitude shifts every log-mel band by -2 ln 2 → only c0 moves
    assert(full(0) > half(0))
    for (k <- 1 until 13)
      assert(math.abs(full(k) - half(k)) < 0.05, s"c$k ${full(k)} vs ${half(k)}")
    // DCT-II of a constant vector concentrates in c0
    val const = Fft.mfcc(Array.fill(26)(3.7))
    assert(math.abs(const(0) - math.sqrt(26.0) * 3.7) < 1e-9)
    for (k <- 1 until 13) assert(math.abs(const(k)) < 1e-9)
    assert(Fft.mfcc(null) == null)
  }

  test("vad degenerate cases") {
    assert(Fft.vad(new Array[Short](4096)) == (0.0, 0, 0))
    assert(Fft.trimSilence(new Array[Short](4096)).isEmpty)
    assert(Fft.vad(null) == (0.0, 0, 0))
    // sub-frame-length input falls back to whole-signal RMS
    val loud = Array.fill[Short](100)(8000)
    assert(Fft.vad(loud) == (1.0, 0, 100))
  }

  test("peakLandmarks degenerate and adversarial inputs") {
    assert(Fft.peakLandmarks(null) == null)
    assert(Fft.peakLandmarks(new Array[Short](100)) == null) // sub-frame
    assert(Fft.peakLandmarks(new Array[Short](4096)) == null) // silence
    // constant DC: no local maxima above the floor in bins >= 2
    assert(Fft.peakLandmarks(Array.fill[Short](4096)(1000)) == null)
    // full-scale alternating (Nyquist tone): must not overflow or emit
    // out-of-range fields
    val nyq = Array.tabulate[Short](4096)(i =>
      if (i % 2 == 0) Short.MaxValue else Short.MinValue)
    val lmN = Fft.peakLandmarks(nyq)
    val tone = Array.tabulate[Short](8192)(i =>
      (12000 * math.sin(2 * math.Pi * 700 * i / 8000.0)).toShort)
    val lm = Fft.peakLandmarks(tone)
    assert(lm != null && lm.nonEmpty)
    (Option(lmN).toSeq.flatten ++ lm).foreach { m =>
      val hash = (m >>> 32).toInt
      val t1 = (m & 0xffffffffL).toInt
      val f1 = (hash >>> 16) & 0x3ff
      val f2 = (hash >>> 6) & 0x3ff
      val dt = hash & 0x3f
      assert(t1 >= 0 && f1 >= 2 && f1 <= 256 && f2 >= 2 && f2 <= 256
        && dt >= 1 && dt <= 8, s"bad landmark: h=$hash t=$t1")
    }
    // determinism
    assert(Fft.peakLandmarks(tone).toSeq == lm.toSeq)
    // volume robustness: dominant-peak hashes survive scaling (16-bit
    // re-quantization reshuffles noise-floor peaks, so exact set
    // equality is NOT expected — strong overlap is)
    val quiet = tone.map(s => (s * 0.3).toShort)
    val hs = (a: Array[Long]) => a.map(_ >>> 32).toSet
    val (hq, ho) = (hs(Fft.peakLandmarks(quiet)), hs(lm))
    val overlap = (hq & ho).size.toDouble / math.min(hq.size, ho.size)
    assert(overlap >= 0.4, s"overlap $overlap (${hq.size}/${ho.size})")
  }
}

class SignalQualitySpec extends AnyFunSuite {

  test("clipRatio flags hard-limited audio; clean audio scores 0") {
    val clean = Array.tabulate[Short](4000)(i =>
      (20000 * math.sin(2 * math.Pi * 300 * i / 8000.0)).toShort)
    assert(Audio.clipRatio(clean) == 0.0)
    // drive the same tone 2x past full scale and hard-limit it
    val clipped = Array.tabulate[Short](4000)(i => {
      val v = 65000 * math.sin(2 * math.Pi * 300 * i / 8000.0)
      math.max(Short.MinValue, math.min(Short.MaxValue, v.toInt)).toShort
    })
    val r = Audio.clipRatio(clipped)
    // plateau share of a 2x-overdriven sine: 1 - 2·asin(32767/65000)/π ≈ 0.664
    assert(r > 0.6 && r < 0.72, s"clip ratio $r")
    assert(Audio.clipRatio(null) == 0.0)
  }

  test("dcOffset measures a planted bias, 0 for symmetric signals") {
    val sym = Array.tabulate[Short](4096)(i =>
      (8000 * math.sin(2 * math.Pi * i / 64.0)).toShort)
    assert(math.abs(Audio.dcOffset(sym)) < 0.002)
    val biased = sym.map(v => (v + 3277).toShort) // +10% of full scale
    assert(math.abs(Audio.dcOffset(biased) - 0.1) < 0.003)
  }

  test("normalizeRms hits the target loudness and clamps instead of wrapping") {
    val quiet = Array.tabulate[Short](4096)(i =>
      (800 * math.sin(2 * math.Pi * i / 64.0)).toShort)
    val normed = Audio.normalizeRms(quiet, 8000.0)
    assert(math.abs(Audio.rms(normed) - 8000.0) / 8000.0 < 0.01)
    // absurd target: samples clamp at full scale, never wrap sign
    val slammed = Audio.normalizeRms(quiet, 1e9)
    assert(slammed.forall(v => v == Short.MinValue || v == Short.MaxValue ||
      math.abs(v.toInt) < 32768))
    assert(Audio.clipRatio(slammed) > 0.9)
    // silence passes through untouched
    val silent = new Array[Short](256)
    assert(Audio.normalizeRms(silent, 8000.0).sameElements(silent))
    assert(Audio.normalizeRms(null, 8000.0) == null)
  }

  test("compressionRatio: repetition compresses far below prose; bounds hold") {
    val repetitive = "buy now click here " * 50
    val prose = "The committee discussed seventeen distinct proposals about " +
      "harbor dredging, vaccine logistics, quarterly audits, and playground " +
      "renovations before adjourning without a final vote on anything."
    val rr = TextStats.compressionRatio(repetitive)
    val rp = TextStats.compressionRatio(prose)
    assert(rr < 0.1, s"repetitive $rr")
    assert(rp > 0.5, s"prose $rp")
    assert(TextStats.compressionRatio(null) == 0.0)
    assert(TextStats.compressionRatio("") == 0.0)
  }

  test("charWindows: full coverage, no tiny tail, single window for short text") {
    val text = "x" * 500
    val wins = TextStats.charWindows(text, 120)
    assert(wins.map(_.length).sum == 500)
    assert(wins.init.forall(_.length == 120) || wins.length == 1)
    assert(wins.last.length >= 40) // tail ≥ window/3 after merge
    assert(TextStats.charWindows("short", 120).toSeq == Seq("short"))
    assert(TextStats.charWindows(null, 120).isEmpty)
    assert(TextStats.charWindows("   ", 120).isEmpty)
  }

  test("window LID detects a planted bilingual document") {
    val models = graft.lid.LidModels.default
    val de = "die regierung hat gestern über das neue gesetz beraten und " +
      "die minister haben den haushalt für das kommende jahr besprochen "
    val fr = "le gouvernement a discuté hier du nouveau projet de loi et " +
      "les ministres ont examiné le budget pour la prochaine année "
    val bilingual = de * 2 + fr * 2
    val langs = graft.lid.TextStats.charWindows(bilingual, 120)
      .map(w => models.impressoFt.predict(w).head._1).distinct.sorted
    assert(langs.contains("de") && langs.contains("fr"), langs.mkString(","))
    // monolingual control stays single-language
    val mono = graft.lid.TextStats.charWindows(de * 4, 120)
      .map(w => models.impressoFt.predict(w).head._1).distinct
    assert(mono.sameElements(Array("de")), mono.mkString(","))
    // and detection survives the query's two-detector agreement gate
    // (top-1 match, both probs >= 0.5) that suppresses OOD word salad
    val agreed = graft.lid.TextStats.charWindows(bilingual, 120).flatMap { w =>
      val p1 = models.impressoFt.predict(w)
      val p2 = models.langidNb.predict(w)
      if (p1.nonEmpty && p2.nonEmpty && p1.head._1 == p2.head._1 &&
        p1.head._2 >= 0.5 && p2.head._2 >= 0.5) Some(p1.head._1) else None
    }.distinct.sorted
    assert(agreed.contains("de") && agreed.contains("fr"), agreed.mkString(","))
  }
}

class GopherSpec extends AnyFunSuite {

  test("clean prose with required stopwords passes the gate") {
    val text = Array.fill(8)("the cat and dog have fun with all").mkString(" ")
    val g = TextStats.gopher(text)
    assert(g.nWords == 64)
    assert(math.abs(g.meanWordLen - 3.25) < 1e-12)
    assert(g.symbolWordRatio == 0.0)
    assert(g.alphaWordFrac == 1.0)
    assert(g.stopwordHits == 4) // the, and, have, with
    assert(g.dupLineFrac == 0.0)
    assert(g.keep)
  }

  test("symbol-heavy text fails the symbol-to-word gate") {
    val g = TextStats.gopher("a ... b … c # d", minWords = 1, minStopHits = 0)
    assert(g.nWords == 7)
    assert(math.abs(g.symbolWordRatio - 3.0 / 7) < 1e-12)
    assert(!g.keep)
  }

  test("duplicate lines fail the repetition gates") {
    val text = Array.fill(10)("the words and that have with lines go on here").mkString("\n")
    val g = TextStats.gopher(text, minWords = 10)
    assert(g.dupLineFrac == 0.9)
    assert(g.dupLineCharFrac == 0.9)
    assert(!g.keep)
  }

  test("numeric words fail the alphabetic-word gate") {
    val words = Array.fill(40)("123 456 the and") :+ "end"
    val g = TextStats.gopher(words.mkString(" "), minWords = 10)
    assert(g.alphaWordFrac < 0.8)
    assert(!g.keep)
  }

  test("word-count and stopword floors are parameterized") {
    val short = "the quick brown fox jumps over the lazy dog again and again"
    assert(!TextStats.gopher(short).keep) // 12 words < paper's 50
    assert(TextStats.gopher(short, minWords = 10).keep) // "the","and" = 2 hits
    assert(!TextStats.gopher(short, minWords = 10, minStopHits = 3).keep)
  }

  test("degenerate inputs") {
    assert(!TextStats.gopher(null).keep)
    assert(!TextStats.gopher("   ").keep)
    assert(TextStats.gopher("").nWords == 0)
  }
}
