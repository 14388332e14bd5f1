package graft.lid

import scala.collection.mutable

/** Byte-pair encoding tokenizer — the standard public algorithm
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"). Training runs driver-side on a bounded
  * corpus sample (the universal recipe — the merge table is a model
  * artifact, not a per-row computation); encoding is a pure broadcast-
  * friendly function applied in the narrow map stage, giving the token
  * counts / compression ratios a training-data pipeline reports per
  * document.
  *
  * Determinism: merge selection breaks count ties lexicographically, so
  * the merge table is a pure function of the sample.
  */
object Bpe {

  /** End-of-word marker (paper's `</w>`). */
  val Eow = "</w>"

  type Pair = (String, String)

  /** Train `numMerges` merges from an iterator of texts. Words are
    * whitespace-split and lowercased; each word is a char sequence plus
    * the end-of-word marker. */
  def train(corpus: IterableOnce[String], numMerges: Int): Vector[Pair] = {
    // word frequency over the sample
    val wordFreq = new mutable.HashMap[String, Long]()
    corpus.iterator.foreach { text =>
      if (text != null) TextStats.whitespaceTokens(text.toLowerCase)
        .foreach(w => wordFreq.update(w, wordFreq.getOrElse(w, 0L) + 1L))
    }
    // symbol sequences per unique word
    var words: Vector[(Array[String], Long)] = wordFreq.iterator.map {
      case (w, f) => (w.map(_.toString).toArray :+ Eow, f)
    }.toVector
    val merges = Vector.newBuilder[Pair]
    var m = 0
    while (m < numMerges) {
      val counts = new mutable.HashMap[Pair, Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) m = numMerges
      else {
        // argmax by (count desc, pair asc) — deterministic
        val best = counts.iterator.reduce { (a, b) =>
          if (a._2 > b._2 || (a._2 == b._2 &&
            (a._1._1 < b._1._1 ||
              (a._1._1 == b._1._1 && a._1._2 <= b._1._2)))) a else b
        }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, f) =>
          if (syms.length < 2) (syms, f)
          else {
            val out = new mutable.ArrayBuffer[String](syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                syms(i + 1) == best._2) {
                out += joined; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, f)
          }
        }
        m += 1
      }
    }
    merges.result()
  }

  /** Merge table → rank map for O(pairs · merges-applied) encoding. */
  def ranks(merges: Vector[Pair]): Map[Pair, Int] =
    merges.zipWithIndex.toMap

  /** Encode one word (already lowercased, no whitespace) by repeatedly
    * applying the lowest-rank applicable merge — the paper's inference
    * procedure. Unknown characters pass through as singleton symbols. */
  def encodeWord(word: String, rank: Map[Pair, Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var syms: Array[String] = word.map(_.toString).toArray :+ Eow
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue; var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestAt = i
          case _ =>
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val out = new mutable.ArrayBuffer[String](syms.length - 1)
        var j = 0
        while (j < syms.length) {
          if (j == bestAt) { out += syms(j) + syms(j + 1); j += 2 }
          else { out += syms(j); j += 1 }
        }
        syms = out.toArray
      }
    }
    syms
  }

  /** Token count of a text under the merge table (whitespace pre-split,
    * lowercase — same normalization as training). */
  def tokenCount(text: String, rank: Map[Pair, Int]): Int = {
    if (text == null) return 0
    var n = 0
    TextStats.whitespaceTokens(text.toLowerCase)
      .foreach(w => n += encodeWord(w, rank).length)
    n
  }
}
