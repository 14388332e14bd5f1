package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lid.Bpe

class BpeSpec extends AnyFunSuite {

  // the Sennrich et al. 2016 worked example: {low:5, lower:2, newest:6,
  // widest:3}. (e,s) counts 9 (newest+widest), then (es,t) 9, then
  // (est,</w>) 9 — hand-computable merge order.
  private val corpus =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("training reproduces the paper's merge order") {
    val merges = Bpe.train(corpus, 5)
    assert(merges(0) == ("e", "s"))
    assert(merges(1) == ("es", "t"))
    assert(merges(2) == ("est", Bpe.Eow))
    // next: (l,o) and (lo,w) at count 7
    assert(merges(3) == ("l", "o"))
    assert(merges(4) == ("lo", "w"))
  }

  test("encoding applies merges by rank; roundtrip preserves the word") {
    val rank = Bpe.ranks(Bpe.train(corpus, 10))
    val toks = Bpe.encodeWord("newest", rank)
    // "newest" was in-sample: fully merged path ends with "est</w>"
    assert(toks.last.endsWith(Bpe.Eow))
    assert(toks.mkString.stripSuffix(Bpe.Eow) == "newest")
    // out-of-sample word with known subwords still reconstructs
    val oov = Bpe.encodeWord("lowest", rank)
    assert(oov.mkString.stripSuffix(Bpe.Eow) == "lowest")
    // unknown characters pass through as singletons
    val junk = Bpe.encodeWord("zq7#", rank)
    assert(junk.mkString.stripSuffix(Bpe.Eow) == "zq7#")
  }

  test("in-vocab words compress harder than character fallback") {
    val rank = Bpe.ranks(Bpe.train(corpus, 50))
    val inVocab = Bpe.encodeWord("newest", rank).length
    val charFallback = Bpe.encodeWord("xyzqv", rank).length
    assert(inVocab < charFallback)
    // 50 merges on 4 words exhausts all pairs: in-sample words become
    // single tokens
    assert(inVocab == 1)
  }

  test("tokenCount: normalization parity with training and determinism") {
    val rank = Bpe.ranks(Bpe.train(corpus, 10))
    assert(Bpe.tokenCount("LOW low", rank) == 2 * Bpe.encodeWord("low", rank).length)
    assert(Bpe.tokenCount(null, rank) == 0)
    assert(Bpe.tokenCount("  ", rank) == 0)
    val a = Bpe.train(corpus, 20)
    val b = Bpe.train(corpus.reverse, 20) // order-independent counts
    assert(a == b)
  }
}
