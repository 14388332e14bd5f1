package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.lid.TextStats
import graft.operators._
import org.apache.spark.sql.functions.col
import graft.model.{LangProb, Stage1Row}

/** Property-based tests (SURVEY.md §5): ratio bounds, decision totality,
  * scrub idempotence, vote monotonicity. Uses ScalaCheck generators with
  * a deterministic sampling loop (the scalatest<->scalacheck bridge
  * artifact isn't part of the offline dependency set). */
class PropertySpec extends AnyFunSuite {

  private def forAll[T](g: Gen[T], n: Int = 300)(check: T => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(12345L)
    var s = seed
    var i = 0
    while (i < n) {
      g.apply(Gen.Parameters.default, s).foreach(check)
      s = s.next
      i += 1
    }
  }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(check: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => check(t._1, t._2))

  private val anyText: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaChar, Gen.numChar,
      Gen.oneOf(' ', '\t', 'ß', 'é', 'ë', '-', '@', '.'))).map(_.mkString),
    Gen.const(null: String),
    Gen.const(""))

  test("alphabeticalRatio in [0,1] for any input") {
    forAll(anyText) { s =>
      val r = TextStats.alphabeticalRatio(s)
      assert(r >= 0.0 && r <= 1.0)
    }
  }

  test("scrub is idempotent and never lengthens tag-free text") {
    forAll(anyText) { s =>
      val once = Scrub.scrub(s)
      val twice = Scrub.scrub(once.text)
      assert(twice.text == once.text)
      assert(twice.total == 0)
    }
  }

  private val langGen = Gen.oneOf("de", "en", "fr", "it", "lb")
  private val predArr: Gen[Array[LangProb]] = Gen.oneOf(
    Gen.const(null: Array[LangProb]),
    Gen.zip(langGen, Gen.choose(0.0, 1.0))
      .map { case (l, p) => Array(LangProb(l, p)) })

  private val rowGen: Gen[Stage1Row] = for {
    a <- predArr; b <- predArr; c <- predArr; d <- predArr; e <- predArr
    f <- predArr
    orig <- Gen.option(langGen)
    len <- Gen.choose(0, 500)
    ratio <- Gen.option(Gen.choose(0.0, 1.0))
    ppl <- Gen.option(Gen.choose(1.0, 100.0))
    audioOk <- Gen.oneOf(true, false)
    rms <- Gen.oneOf(Gen.const(0.0), Gen.choose(1.0, 9999.0))
  } yield Stage1Row("srcXX-1900-01-01-a-i0001", "srcXX", "1900", len,
    orig.orNull, ratio, a, b, c, d, e, f, ppl, audioOk,
    rms.asInstanceOf[Double],
    100, if (len == 0) null else "x" * len, "ts", "v")

  private val Codes = Set("all", "all-but-impresso_ft", "dominant-by-len",
    "dominant-by-lowvote", "voting", "undecodable")

  test("phone scrub catches numbers followed by extra digits (possessive leak)") {
    import graft.operators.Scrub
    // the possessive pattern could not give back groups when the
    // trailing lookahead failed, so this number escaped entirely
    val r = Scrub.scrub("call +41 22 345 6789012 now")
    assert(r.phones >= 1, r.toString)
    assert(!r.text.contains("+41 22 345"), r.text)
    // ordinary matches unchanged
    val r2 = Scrub.scrub("call +41 22 345 67 89 now")
    assert(r2.phones == 1 && r2.text == s"call ${Scrub.PhoneTag} now")
    // clean prose untouched
    assert(Scrub.scrub("ein text ohne nummern").text == "ein text ohne nummern")
  }

  test("vad examines the trailing partial frame; trimSilence is null-tolerant") {
    import graft.codec.Fft
    // 256 silent + 44 loud samples: floor framing saw only the silent
    // full frame and trimmed ALL the speech
    val pcm = new Array[Short](300)
    (256 until 300).foreach(i => pcm(i) = 20000)
    val (ratio, from, until) = Fft.vad(pcm)
    assert(until == 300 && from == 256, s"($ratio, $from, $until)")
    assert(Fft.trimSilence(pcm).length == 44)
    assert(Fft.trimSilence(null) == null)
  }

  test("decision function is total: one code per row, keep <=> no drop reason") {
    val stats = VotesFixtures.st()
    forAll(rowGen) { r =>
      val d = Stage2.decide(r, stats, Stage2.Params())
      assert(Codes.contains(d.lg_decision), d.lg_decision)
      assert(d.keep == (d.drop_reason == null))
      // kept rows always carry an admissible language
      if (d.keep) assert(d.lg != null &&
        Thresholds.AdmissibleLanguages.contains(d.lg))
    }
  }

  test("stage-2 vote is monotone in prob (fixed support)") {
    val stats = VotesFixtures.st()
    forAll(Gen.choose(0.5, 1.0), Gen.choose(0.0, 0.5)) { (p, dp) =>
      val lo = Votes.stage2Votes(
        Seq(Votes.Top1("wp_ft", "fr", p)), Some(0.8), stats)
      val hi = Votes.stage2Votes(
        Seq(Votes.Top1("wp_ft", "fr", math.min(1.0, p + dp))), Some(0.8), stats)
      assert(hi.head.vote >= lo.head.vote - 1e-9)
    }
  }

  test("decontaminate invariants: verbatim benchmark copy has rate 1.0; " +
      "disjoint alphabets never flag") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val benchText = "the quick brown fox jumps over seventeen lazy dogs today"
    val bench = Seq((0L, benchText)).toDF("doc_id", "text")
    val train = Seq(
      (1L, benchText), // verbatim copy: every shingle hits
      (2L, "αβγδεζηθικλμνξο πρστυφχψω αβγδεζηθικ λμνξοπρστυ") // disjoint
    ).toDF("doc_id", "text")
    val r = graft.operators.Dedup.decontaminate(train, bench,
      "doc_id", "text", n = 10, minHits = 1).collect()
    assert(r.map(_.getLong(0)).toSet == Set(1L), r.mkString("|"))
    assert(r.head.getDouble(3) == 1.0) // hits == total for the copy
    assert(r.head.getLong(1) == r.head.getLong(2))
  }

  test("minhash signatures: identical sets agree on every slot") {
    forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { xs =>
      val a = Dedup.signature(xs, 32)
      val b = Dedup.signature(xs.reverse, 32) // order-independent
      assert(a.sameElements(b))
    }
  }

  test("OPH signatures: order-independent, densified, no sentinel slots") {
    forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { xs =>
      val a = Dedup.signatureOph(xs, 32)
      assert(a.sameElements(Dedup.signatureOph(xs.reverse, 32)))
      assert(!a.contains(Long.MaxValue)) // densification filled every bin
    }
  }

  test("vec_dot helper: symmetric and Cauchy-Schwarz bounded") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val vecGen = Gen.listOfN(8, Gen.choose(-100.0, 100.0)).map(_.toArray)
    forAll(vecGen, vecGen) { (a, b) =>
      val (ad, bd) = (new GenericArrayData(a), new GenericArrayData(b))
      val dab = graft.functions.DotUtil.dot(ad, bd)
      assert(dab == graft.functions.DotUtil.dot(bd, ad))
      val naa = graft.functions.DotUtil.dot(ad, ad)
      val nbb = graft.functions.DotUtil.dot(bd, bd)
      assert(naa >= 0.0 && nbb >= 0.0)
      assert(math.abs(dab) <= math.sqrt(naa) * math.sqrt(nbb) + 1e-6)
    }
  }

  test("image codec: roundtrip identity, same-size resize is identity") {
    import graft.codec.Image
    val g = for {
      w <- Gen.choose(1, 24); h <- Gen.choose(1, 24)
      c <- Gen.oneOf(1, 3)
      px <- Gen.listOfN(w * h * c, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield (w, h, c, px.toArray)
    forAll(g, 100) { case (w, h, c, px) =>
      val d = Image.decodeImage(Image.encodeImage(w, h, c, px))
      assert(d != null && d.pixels.sameElements(px))
      assert(Image.resizeNearest(d, w, h).pixels.sameElements(px))
      val m = Image.meanBrightness(d.pixels)
      assert(m >= 0.0 && m <= 255.0)
    }
  }

  test("BPE: any word reconstructs exactly under any trained table") {
    val corpusGen = Gen.listOfN(30,
      Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString))
    val wordGen = Gen.listOf(
      Gen.oneOf(Gen.alphaLowerChar, Gen.numChar, Gen.const('ü')))
      .map(_.mkString)
    forAll(Gen.zip(corpusGen, wordGen), 150) { case (corpus, word) =>
      val rank = graft.lid.Bpe.ranks(graft.lid.Bpe.train(corpus, 40))
      val toks = graft.lid.Bpe.encodeWord(word, rank)
      if (word.isEmpty) assert(toks.isEmpty)
      else {
        assert(toks.mkString.stripSuffix(graft.lid.Bpe.Eow) == word)
        assert(toks.length <= word.length + 1) // never worse than chars
      }
    }
  }

  test("FFT: Parseval holds for random signals at power-of-2 sizes") {
    val g = for {
      logN <- Gen.choose(2, 10)
      vals <- Gen.listOfN(1 << logN, Gen.choose(-1000.0, 1000.0))
    } yield vals.toArray
    forAll(g, 80) { x =>
      val n = x.length
      val re = x.clone(); val im = new Array[Double](n)
      graft.codec.Fft.fft(re, im)
      val timeE = x.map(v => v * v).sum
      val specE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
      assert(math.abs(timeE - specE) <= 1e-9 * math.max(1.0, timeE))
    }
  }

  test("codec/analysis paths never throw on arbitrary bytes (fuzz)") {
    val bytesGen = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    forAll(bytesGen, 200) { bs =>
      // decode: null or a valid PCM array, never an exception
      for (codec <- Seq("pcm_s16le", "ulaw", "alaw", "junk")) {
        val pcm = graft.codec.Audio.decode(codec, bs)
        if (pcm != null) {
          // and every analysis stage accepts whatever decode produced
          graft.codec.Audio.rms(pcm)
          graft.codec.Audio.clipRatio(pcm)
          graft.codec.Audio.dcOffset(pcm)
          graft.codec.Fft.vad(pcm)
          if (pcm.length >= 1024) {
            graft.codec.Fft.bandEnergies(pcm)
            graft.codec.Fft.dominantFrequency(pcm, 8000)
          }
        }
      }
      // image/video decode on the same junk
      graft.codec.Image.decodeImage(bs)
      graft.codec.Image.decodeVideo(bs)
    }
  }

  test("imageio decode path: corrupted PNG/JPEG/MPNG containers never throw") {
    val px = Array.tabulate(8 * 8 * 3)(i => (i * 7 % 256).toByte)
    val png = graft.codec.Image.encodePng(8, 8, 3, px)
    val jpg = graft.codec.Image.encodeJpeg(8, 8, 3, px)
    // every truncation of a real container: null or a decode, never a throw
    for (c <- Seq(png, jpg); n <- 0 until c.length by 7)
      graft.codec.Image.decodeImage(c.take(n))
    // signature-prefixed junk REACHES the ImageIO reader (passes the
    // sniff) and must be rejected via the error-isolation path
    val rnd = new scala.util.Random(11)
    (0 until 100).foreach { _ =>
      val junk = Array.fill(64)((rnd.nextInt(256) - 128).toByte)
      System.arraycopy(png, 0, junk, 0, 8) // PNG signature
      assert(graft.codec.Image.decodeImage(junk) == null)
      val junk2 = junk.clone()
      junk2(0) = 0xff.toByte; junk2(1) = 0xd8.toByte // JPEG SOI
      graft.codec.Image.decodeImage(junk2)
    }
    // MPNG with bit-flipped payload bytes: null or valid, never a throw
    val mp = graft.codec.Image.encodeMpng(Seq(png, png))
    (0 until mp.length by 11).foreach { i =>
      val m = mp.clone(); m(i) = (m(i) ^ 0x5a).toByte
      graft.codec.Image.decodeVideo(m)
    }
  }

  test("band energies: unit norm and volume invariance for random PCM") {
    val g = for {
      seed <- Gen.choose(0L, Long.MaxValue)
      len <- Gen.choose(1024, 4096)
    } yield (seed, len)
    forAll(g, 40) { case (seed, len) =>
      val pcm = graft.codec.Audio.synth(seed, 8000, len)
      val b = graft.codec.Fft.bandEnergies(pcm)
      if (b != null) {
        val norm = math.sqrt(b.map(v => v * v).sum)
        assert(math.abs(norm - 1.0) < 1e-9)
        assert(b.forall(_ >= 0.0))
        val pk = graft.codec.Fft.peakBand(b)
        assert(pk >= 0 && pk < b.length)
      }
    }
  }

  test("property: hammingPairs star mode preserves components + keep " +
      "decisions on every clique-bucketed corpus (20 seeded corpora)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.util.Mix.mix
    // corpus = nc cliques; clique j's members are its base hash with at
    // most ONE flipped bit each, in distinct positions => pairwise
    // hamming <= 2 <= maxHamming(3): every bucket the members share is
    // a genuine near-dup clique, the regime star mode guarantees.
    (1 to 20).foreach { seed =>
      val nc = 2 + (mix(seed.toLong).abs % 4).toInt // 2..5 cliques
      val rows = (0 until nc).flatMap { j =>
        val base = mix(seed * 1000L + j * 7L)
        val size = 2 + (mix(seed * 31L + j).abs % 5).toInt // 2..6 docs
        (0 until size).map { m =>
          val h = if (m == 0) base else base ^ (1L << ((m * 11) % 64))
          (j * 100L + m, h)
        }
      }
      // precondition, asserted so a degenerate generator fails LOUDLY:
      // inter-clique bases stay far apart (no accidental near-dups)
      val bases = (0 until nc).map(j => mix(seed * 1000L + j * 7L))
      for (x <- bases; y <- bases if x != y)
        assert(java.lang.Long.bitCount(x ^ y) > 7, s"seed $seed degenerate")
      val hashes = rows.toDF("id", "sh")
      val all = Dedup.hammingPairs(hashes, maxHamming = 3, chunks = 6)
      val star = Dedup.hammingPairs(hashes, maxHamming = 3, chunks = 6,
        pairMode = "star")
      def labels(p: org.apache.spark.sql.DataFrame) =
        Dedup.components(p.select(col("a"), col("b")))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(labels(all) == labels(star), s"seed $seed: components differ")
      val ids = rows.map(_._1).toDF("doc_id")
      def keeps(p: org.apache.spark.sql.DataFrame) =
        Dedup.keepPolicy(ids, "doc_id", p.select(col("a"), col("b")))
          .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
      assert(keeps(all) == keeps(star), s"seed $seed: keep flags differ")
    }
  }
}
