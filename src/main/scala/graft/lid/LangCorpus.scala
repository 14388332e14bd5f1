package graft.lid

import scala.util.Random

/** Deterministic per-language text generators. Two jobs:
  *
  *  1. Training corpora for the from-scratch LID models (the reference's
  *     fastText/langid/lingua models are LFS stubs — we train tiny,
  *     seeded, in-memory models instead; `models/fasttext/README.md:1-4`
  *     documents only the language coverage, which we honor: the
  *     "impresso" model knows exactly fr/de/lb/en/it, `README.md:172`).
  *  2. Transcript synthesis for the clip fixtures (FIXTURES.md §2.1) —
  *     generated with DIFFERENT seeds than the training corpora so the
  *     eval is not train-set leakage.
  *
  * Everything derives from fixed word lists + `scala.util.Random` with
  * caller-supplied seeds, so every JVM run reproduces byte-identical text.
  */
object LangCorpus {

  /** The language set of the graft pipeline (= reference impresso_ft
    * coverage, README.md:172). */
  val Languages: Vector[String] = Vector("de", "en", "fr", "it", "lb")

  // Small, distinctive vocabularies. Orthographic signatures (ß/ä/ö/ü,
  // é/è/ç, ë/ä+apostrophes, accents) give char-n-gram models plenty of
  // signal at 20+ chars of text.
  private val vocab: Map[String, Vector[String]] = Map(
    "de" -> Vector("und", "der", "die", "das", "nicht", "mit", "ein",
      "eine", "zeitung", "regierung", "gestern", "heute", "haben", "wird",
      "sich", "auch", "nach", "über", "für", "jahr", "stadt", "land",
      "straße", "können", "müssen", "schon", "zwischen", "während",
      "deutsch", "gemeinde", "bericht", "seite", "leute", "arbeit",
      "wurde", "gegen", "immer", "große", "kleine", "dieser"),
    "en" -> Vector("the", "and", "of", "to", "in", "was", "for", "with",
      "newspaper", "government", "yesterday", "today", "have", "will",
      "also", "after", "year", "city", "country", "people", "work",
      "report", "page", "between", "during", "against", "always", "which",
      "there", "their", "would", "could", "should", "about", "through",
      "english", "town", "council", "meeting", "public"),
    "fr" -> Vector("le", "la", "les", "et", "des", "une", "dans", "pour",
      "avec", "gouvernement", "journal", "hier", "aujourd'hui", "être",
      "avoir", "très", "après", "année", "ville", "pays", "gens",
      "travail", "rapport", "entre", "pendant", "contre", "toujours",
      "déjà", "français", "où", "était", "sont", "cette", "leurs",
      "aussi", "depuis", "commune", "conseil", "réunion", "publique"),
    "it" -> Vector("il", "la", "le", "e", "di", "una", "in", "per", "con",
      "governo", "giornale", "ieri", "oggi", "essere", "avere", "molto",
      "dopo", "anno", "città", "paese", "gente", "lavoro", "rapporto",
      "tra", "durante", "contro", "sempre", "già", "italiano", "dove",
      "era", "sono", "questa", "loro", "anche", "perché", "comune",
      "consiglio", "riunione", "pubblica"),
    "lb" -> Vector("an", "de", "mat", "engem", "net", "fir", "d'zeitung",
      "regierung", "gëschter", "haut", "hunn", "gëtt", "sech", "och",
      "no", "iwwer", "joer", "stad", "land", "leit", "aarbecht",
      "bericht", "säit", "tëschent", "wärend", "géint", "ëmmer",
      "lëtzebuergesch", "wou", "waren", "sinn", "dës", "hir", "awer",
      "zënter", "gemeng", "conseil", "versammlung", "ëffentlech", "kéng"))

  def wordsOf(lang: String): Vector[String] = vocab(lang)

  /** One pseudo-sentence of `nWords` words in `lang`. */
  def sentence(lang: String, nWords: Int, rnd: Random): String = {
    val v = vocab(lang)
    val sb = new StringBuilder
    var i = 0
    while (i < nWords) {
      if (i > 0) sb.append(' ')
      sb.append(v(rnd.nextInt(v.length)))
      i += 1
    }
    sb.toString
  }

  /** Fluent text of roughly `targetChars` characters. */
  def text(lang: String, targetChars: Int, rnd: Random): String = {
    val sb = new StringBuilder
    while (sb.length < targetChars) {
      if (sb.nonEmpty) sb.append(". ")
      sb.append(sentence(lang, 4 + rnd.nextInt(8), rnd))
    }
    sb.toString.take(math.max(targetChars, 1))
  }

  /** Garbage text: digit/punctuation floods (low alphabetical ratio) —
    * the F4-filter analog rows in the fixture corpus. */
  def noise(targetChars: Int, rnd: Random): String = {
    val pool = "0123456789-–=+*/#%&$§|<>().,;:!? "
    val sb = new StringBuilder
    while (sb.length < targetChars) sb.append(pool(rnd.nextInt(pool.length)))
    sb.toString
  }

  /** Training corpus for the LID models: `nPerLang` sentences per
    * language, seeded independently of fixture generation (seed 7001). */
  def trainingCorpus(nPerLang: Int = 400): Seq[(String, String)] = {
    val rnd = new Random(7001L)
    Languages.flatMap { lang =>
      (0 until nPerLang).map(_ => lang -> sentence(lang, 6 + rnd.nextInt(10), rnd))
    }
  }
}
