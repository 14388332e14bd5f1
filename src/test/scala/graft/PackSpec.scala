package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pack

class PackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("every doc packed exactly once; budget respected; oversize flagged") {
    val docs = (0L until 200L).map(i => (i, 40 + (i % 13).toInt * 20))
      .toSeq :+ (999L, 5000) // one oversize doc
    val packs = Pack.packSequences(docs.toDS(), maxTokens = 512).collect()
    // coverage: every id exactly once
    val seen = packs.flatMap(_.doc_ids)
    assert(seen.length == docs.length)
    assert(seen.toSet == docs.map(_._1).toSet)
    // budget: every non-oversize pack fits; oversize is a flagged singleton
    packs.foreach { p =>
      if (p.oversize) assert(p.n_docs == 1 && p.total_tokens > 512)
      else assert(p.total_tokens <= 512, s"pack ${p.pack_id}: ${p.total_tokens}")
      assert(p.pack_id == p.doc_ids.head)
      // ids ascend within a pack (greedy in-order)
      assert(p.doc_ids == p.doc_ids.sorted)
      assert(p.total_tokens ==
        p.doc_ids.map(id => docs.find(_._1 == id).get._2.toLong).sum)
    }
    // fill efficiency: multi-doc packs should average near the budget
    val full = packs.filter(p => !p.oversize && p.n_docs > 1)
    val meanFill = full.map(_.total_tokens).sum.toDouble / full.length / 512
    assert(meanFill > 0.7, s"mean fill $meanFill")
    // determinism
    val again = Pack.packSequences(docs.toDS(), maxTokens = 512)
      .collect().map(p => (p.pack_id, p.doc_ids)).toMap
    packs.foreach(p => assert(again(p.pack_id) == p.doc_ids))
  }

  test("degenerate inputs") {
    assert(Pack.packSequences(Seq.empty[(Long, Int)].toDS(), 512)
      .collect().isEmpty)
    val one = Pack.packSequences(Seq((7L, 100)).toDS(), 512).collect()
    assert(one.length == 1 && one.head.pack_id == 7L && !one.head.oversize)
  }

  test("packDocuments tolerates null text (counts as 0 tokens)") {
    val df = Seq((1L, "a b c"), (2L, null: String), (3L, "d e"))
      .toDF("doc_id", "text")
    val packs = Pack.packDocuments(df, "doc_id", "text", maxTokens = 512)
      .collect()
    val seen = packs.flatMap(_.getSeq[Long](1))
    assert(seen.toSet == Set(1L, 2L, 3L)) // null-text doc still packed
    assert(packs.map(_.getLong(3)).sum == 5L) // 3 + 0 + 2 tokens
  }

  test("pack composition is independent of spark.sql.shuffle.partitions") {
    val docs = (0L until 120L).map(i => (i, 60 + (i % 7).toInt * 10)).toDS()
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val a = Pack.packSequences(docs, 512).collect()
      .map(p => p.pack_id -> p.doc_ids).toMap
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Pack.packSequences(docs, 512).collect()
        .map(p => p.pack_id -> p.doc_ids).toMap
      assert(a == b) // numPartitions is pinned, not config-derived
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
