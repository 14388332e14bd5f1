package graft.model

import scala.util.Random
import graft.lid.LangCorpus
import graft.codec.Audio
import graft.operators.Scrub

/** Deterministic synthetic clip corpus + gold labels (FIXTURES.md §2).
  *
  * Scale-first design: every row is a pure function of `(seed, index)` —
  * `clipAt(i)` — so the corpus is synthesized distributively with
  * `spark.range(n).map(clipAt)` and never materialized on the driver.
  * Gold labels derive from the PLANTED facts (language, orig_lg
  * correctness, per-source trust, row kind) via the documented decision
  * rules (SURVEY.md §2.9) — NOT by running the pipeline — so keep/drop F1
  * genuinely measures detector + cascade fidelity.
  */
object ClipGen {

  val DefaultSeed = 42L

  // ---------------------------------------------------------- source plan
  final case class SourcePlan(
      name: String,
      dominant: String,
      dominance: Double, // P(row language == dominant)
      origPresent: Double, // P(orig_lg present)
      origAccuracy: Double, // P(orig_lg correct | present)
      weight: Double) // Zipf share of rows

  /** 20 sources, Zipf-skewed (src00 is the deliberately hot source for
    * skew tests, FIXTURES.md §2.1). src00 additionally has dominance
    * ≥ 0.9 so the stage-2 dominance penalty (quirk Q1) has live data;
    * sources with index % 7 == 3 have untrustworthy orig_lg metadata
    * (accuracy 0.5 < threshold_confidence_orig_lg 0.75). */
  val sources: Vector[SourcePlan] = {
    val raw = (0 until 20).map { i =>
      val name = f"src$i%02d"
      val dominant = LangCorpus.Languages(i % LangCorpus.Languages.length)
      val dominance = if (i == 0) 0.97 else 0.72 + 0.02 * (i % 9)
      // orig accuracies sit FAR from the 0.75 trust threshold so the
      // measured overall_orig_lg_support can't flip a source's trust by
      // small-sample noise (tail sources see only dozens of stats rows
      // in the small test corpora)
      val origAcc = if (i == 0) 1.0 else if (i % 7 == 3) 0.5 else 0.99
      val w = 1.0 / math.pow(i + 1.0, 0.9)
      SourcePlan(name, dominant, dominance, 0.8, origAcc, w)
    }
    val z = raw.map(_.weight).sum
    raw.map(s => s.copy(weight = s.weight / z)).toVector
  }

  private val cumWeights: Array[Double] =
    sources.scanLeft(0.0)(_ + _.weight).tail.toArray

  /** overall_orig_lg_support lands near origAccuracy; trust threshold is
    * 0.75 (EL:853-858) — planted accuracies (1.0 / 0.97 / 0.5) sit far
    * from the boundary so gold trust is unambiguous. */
  def sourceTrusted(s: SourcePlan): Boolean = s.origAccuracy > 0.75

  // ------------------------------------------------------------ row kinds
  sealed trait Kind
  case object Fluent extends Kind
  case object FluentPii extends Kind
  case object Short extends Kind // < 20 chars
  case object NoiseText extends Kind // alphabetical ratio < 0.5
  case object EmptyText extends Kind
  case object Undecodable extends Kind // unknown codec — the img analog
  case object SilentAudio extends Kind

  private def pickKind(r: Double): Kind =
    if (r < 0.80) Fluent
    else if (r < 0.84) FluentPii
    else if (r < 0.89) Short
    else if (r < 0.94) NoiseText
    else if (r < 0.97) EmptyText
    else if (r < 0.99) Undecodable
    else SilentAudio

  private def splitmix(x0: Long): Long = graft.util.Mix.mix(x0)

  private val piiSnippets: Vector[Random => String] = Vector(
    _ => "jean.muller@example.lu",
    _ => "anna_bauer99@mail-test.de",
    r => s"+41 ${20 + r.nextInt(70)} ${100 + r.nextInt(900)} ${10 + r.nextInt(90)} ${10 + r.nextInt(90)}",
    r => f"${100 + r.nextInt(900)}%03d-${10 + r.nextInt(90)}%02d-${1000 + r.nextInt(9000)}%04d",
    r => s"LU${10 + r.nextInt(90)} 0019 4006 4475 ${1000 + r.nextInt(9000)}",
    r => Scrub.ToxLexicon(r.nextInt(Scrub.ToxLexicon.length)))

  // --------------------------------------------------------------- clipAt
  /** Pure (seed, index) → (ClipRow, GoldRow). */
  def clipAt(i: Long, seed: Long = DefaultSeed): (ClipRow, GoldRow) = {
    val rnd = new Random(splitmix(seed ^ (i * 0x9e3779b97f4a7c15L)))
    val src = {
      val r = rnd.nextDouble()
      val idx = java.util.Arrays.binarySearch(cumWeights, r) match {
        case neg if neg < 0 => -neg - 1
        case pos => pos
      }
      sources(math.min(idx, sources.length - 1))
    }
    val kind = pickKind(rnd.nextDouble())
    val lang =
      if (rnd.nextDouble() < src.dominance) src.dominant
      else {
        val others = LangCorpus.Languages.filterNot(_ == src.dominant)
        others(rnd.nextInt(others.length))
      }

    // ---- transcript + planted facts
    val (transcript, goldLg) = kind match {
      case Fluent => (LangCorpus.text(lang, 60 + rnd.nextInt(340), rnd), lang)
      case FluentPii =>
        val base = LangCorpus.text(lang, 80 + rnd.nextInt(300), rnd)
        val nPii = 1 + rnd.nextInt(3)
        val words = base.split(" ")
        val withPii = (0 until nPii).foldLeft(words.toVector) { (acc, _) =>
          val pos = 1 + rnd.nextInt(math.max(1, acc.length - 1))
          val snip = piiSnippets(rnd.nextInt(piiSnippets.length))(rnd)
          (acc.take(pos) :+ snip) ++ acc.drop(pos)
        }
        (withPii.mkString(" "), lang)
      case Short => (LangCorpus.sentence(lang, 1 + rnd.nextInt(2), rnd).take(19), lang)
      case NoiseText => (LangCorpus.noise(60 + rnd.nextInt(200), rnd), null)
      case EmptyText => (if (rnd.nextBoolean()) null else "   ", null)
      case Undecodable => (LangCorpus.text(lang, 60 + rnd.nextInt(200), rnd), lang)
      case SilentAudio => (LangCorpus.text(lang, 60 + rnd.nextInt(200), rnd), lang)
    }

    val origLg: String =
      if (kind == EmptyText || kind == NoiseText) null
      else if (rnd.nextDouble() < src.origPresent) {
        if (rnd.nextDouble() < src.origAccuracy) lang
        else LangCorpus.Languages.filterNot(_ == lang)(rnd.nextInt(4))
      } else null

    // ---- audio
    val sr = if (rnd.nextBoolean()) 8000 else 16000
    val nSamples = sr / 10 + rnd.nextInt(sr / 5) // 100–300 ms
    val durMs = (nSamples * 1000L / sr).toInt
    val samples =
      if (kind == SilentAudio) new Array[Short](nSamples)
      else Audio.synth(splitmix(seed + i), sr, nSamples)
    val codec =
      if (kind == Undecodable) "opus"
      else Audio.Codecs(rnd.nextInt(Audio.Codecs.length))
    val bytes =
      if (kind == Undecodable) Array.fill[Byte](64)(0x7f.toByte)
      else Audio.encode(codec, samples)

    // ---- clip id: "<source>-YYYY-MM-DD-<e>-iNNNN" (19-char suffix).
    // NNNN cycles mod 10000 (reference format is fixed-width), so the
    // date is derived from i/10000 to make ids globally unique up to
    // 3.36e9 clips — a random date collides ~once per 100k rows and
    // breaks join-key uniqueness.
    val block = i / 10000
    val year = 1850 + (block % 100).toInt
    val month = 1 + ((block / 100) % 12).toInt
    val day = 1 + ((block / 1200) % 28).toInt
    val id = f"${src.name}-$year%04d-$month%02d-$day%02d-a-i${(i % 10000).toInt}%04d"

    // ---- gold decision + keep (documented rules over planted facts).
    // orig_lg NEVER enters rules 2a/2b or voting (the reference strips
    // "orig_lg" from self.lids at construction, EL:116 — the trusted
    // pseudo-prediction only shapes the output orig_lg field), so gold
    // decisions depend on the detectors and planted row kind alone.
    val (goldDecision, goldKeep, decidedLg) = kind match {
      case Undecodable => ("undecodable", false, null)
      case EmptyText =>
        // null transcript → len = 0, which is FALSY in rule 2c's guard
        // (EL:745-746) → falls through to voting (no predictions, ratio
        // defaults 1.0) → empty votes → dominant-by-lowvote. A blank
        // non-null transcript has 0 < len < 20 → rule 2c.
        if (transcript == null) ("dominant-by-lowvote", false, src.dominant)
        else ("dominant-by-len", false, src.dominant)
      case Short =>
        // no LID arrays (stage-1 skipped) → rules 2a/2b see the empty
        // set → rule 2c fires on 0 < len < 20
        ("dominant-by-len", false, src.dominant)
      case NoiseText => (null, false, null) // lg depends on detector noise; keep gate is alpha < 0.5 either way
      case SilentAudio => ("all", false, lang)
      case Fluent | FluentPii => ("all", true, lang)
    }
    val goldScrubbed =
      if (goldKeep) Scrub.scrub(transcript).text else null

    (ClipRow(id, bytes, sr, durMs, codec, transcript, origLg),
      GoldRow(id, goldLg, goldDecision, goldKeep, goldScrubbed))
  }

  /** Driver-side corpus for small tests. */
  def corpus(n: Int, seed: Long = DefaultSeed): (Seq[ClipRow], Seq[GoldRow]) = {
    val rows = (0L until n.toLong).map(clipAt(_, seed))
    (rows.map(_._1), rows.map(_._2))
  }
}
