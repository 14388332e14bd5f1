package graft.lid

import java.util.regex.Pattern

/** Pure-Scala per-row text statistics mirroring the reference's scalar
  * surface (alphabetical ratio `lib/language_identification.py:89-94`,
  * digit strip `:183-184`, whitespace strip `:518`) plus the graft's
  * quality-scoring features (token counts, punctuation/stopword ratios,
  * rolling-hash fingerprint). Everything here is deterministic, allocation-
  * light, and safe to call per row inside `mapPartitions` hot loops.
  */
object TextStats {

  // Mirrors Python `re.sub(r"[\W_\d]+", "", text)` — Python \W is
  // Unicode-aware, so we enable UNICODE_CHARACTER_CLASS for parity.
  private val NonAlpha: Pattern =
    Pattern.compile("[\\W_\\d]+", Pattern.UNICODE_CHARACTER_CLASS)
  private val Digits: Pattern = Pattern.compile("\\d+")
  private val WsRun: Pattern = Pattern.compile("\\s+")
  // BPE-ish token regex: word runs or single non-space symbols.
  private val TokenRe: Pattern =
    Pattern.compile("[\\p{L}\\p{N}_]+|[^\\p{L}\\p{N}_\\s]",
      Pattern.UNICODE_CHARACTER_CLASS)

  /** `len(re.sub(r"[\W_\d]+","",text)) / len(text)`; 0.0 for null/empty.
    * Reference: lib/language_identification.py:89-94. */
  def alphabeticalRatio(text: String): Double = {
    if (text == null || text.isEmpty) return 0.0
    NonAlpha.matcher(text).replaceAll("").length.toDouble / text.length
  }

  /** Round half-up to n digits (matches Python round-for-positive +
    * Spark/DuckDB round on the value ranges we use). */
  def roundTo(x: Double, n: Int): Double = {
    if (x.isNaN || x.isInfinite) return x
    BigDecimal(x).setScale(n, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** fastText pre-normalization: strip digit runs (LI:183-184). */
  def stripDigits(text: String): String =
    if (text == null) "" else Digits.matcher(text).replaceAll("")

  def whitespaceTokens(text: String): Array[String] = {
    if (text == null) return Array.empty
    val t = text.trim
    if (t.isEmpty) Array.empty else WsRun.split(t)
  }

  def regexTokenCount(text: String): Int = {
    if (text == null) return 0
    val m = TokenRe.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  final case class Quality(
      nChars: Int,
      nTokens: Int,
      meanTokenLen: Double,
      punctRatio: Double,
      digitRatio: Double,
      upperRatio: Double,
      stopwordRatio: Double)

  private val StopwordsEn: Set[String] =
    Set("the", "and", "of", "to", "in", "a", "is", "was", "for", "with",
      "on", "that", "it", "as", "at", "by", "an", "be", "this", "are")

  /** Quality features used by the keep/drop gates and the `documents`
    * quality-score query. Stopword ratio uses a small English set by
    * default; the pipeline passes per-language sets. */
  def quality(text: String, stopwords: Set[String] = StopwordsEn): Quality = {
    if (text == null || text.isEmpty)
      return Quality(0, 0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val n = text.length
    var punct = 0; var digit = 0; var upper = 0
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isDigit(c)) digit += 1
      else if (Character.isUpperCase(c)) upper += 1
      else if (!Character.isLetterOrDigit(c) && !Character.isWhitespace(c))
        punct += 1
      i += 1
    }
    val toks = whitespaceTokens(text)
    val meanLen =
      if (toks.isEmpty) 0.0 else toks.map(_.length).sum.toDouble / toks.length
    val stopHits =
      if (toks.isEmpty) 0.0
      else toks.count(t => stopwords.contains(t.toLowerCase)).toDouble / toks.length
    Quality(n, toks.length, meanLen, punct.toDouble / n, digit.toDouble / n,
      upper.toDouble / n, stopHits)
  }

  /** 64-bit polynomial rolling-hash document fingerprint over the
    * whitespace-normalized lowercase text (graft text-analysis surface). */
  def fingerprint(text: String): Long = {
    if (text == null) return 0L
    val norm = WsRun.matcher(text.trim.toLowerCase).replaceAll(" ")
    var h = 1125899906842597L // prime
    var i = 0
    while (i < norm.length) { h = 31 * h + norm.charAt(i); i += 1 }
    h
  }

  /** Character shingles (n-grams) of the whitespace-normalized text,
    * distinct — the unit for Jaccard / MinHash dedup. */
  def shingles(text: String, n: Int): Set[String] = {
    if (text == null) return Set.empty
    val norm = WsRun.matcher(text.trim.toLowerCase).replaceAll(" ")
    if (norm.length < n) return if (norm.isEmpty) Set.empty else Set(norm)
    val out = scala.collection.mutable.HashSet.empty[String]
    var i = 0
    while (i + n <= norm.length) { out += norm.substring(i, i + n); i += 1 }
    out.toSet
  }
}
