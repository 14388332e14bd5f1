package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.{DecisionRow, GoldRow}
import graft.operators.{Eval, Stage1}

/** Pins the gold reader / id parse / eval join to the REFERENCE'S OWN
  * artifact: `test/ground-truth/all.jsonl` (5,325 rows of
  * `{"id": ..., "gold_lg": ...}`), the only automated correctness
  * instrument the reference ships (lib/impresso_lid_eval.py:61-92).
  * Everything else in the suite runs on synthetic fixtures; this spec
  * proves the S10 reader, the EV:81-84 id regex semantics
  * (Stage1.parseSource/parseYear), and Eval.langAccuracy on the real
  * ids and the real label distribution.
  */
class GroundTruthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val goldPath = "/root/reference/test/ground-truth/all.jsonl"

  // the reference's content-item id shape (impresso_lid_eval.py:81-84)
  private val IdRe =
    "^(.+)-(\\d{4})-(\\d{2})-(\\d{2})-([a-z])-i(\\d{4})$".r

  private lazy val goldLines: Seq[(String, String)] =
    spark.read.json(goldPath)
      .select($"id", $"gold_lg").as[(String, String)].collect().toSeq

  /** The reference loads gold into a dict keyed by id
    * (`id2data[jdata["id"]].update(jdata)`, EV:56) — 40 of the 5,325
    * lines are duplicate ids (no label conflicts), so the effective
    * eval universe is 5,285 unique ids. Mirror that here. */
  private lazy val gold: Seq[(String, String)] =
    goldLines.groupBy(_._1).view.mapValues(_.last._2).toSeq
      .map { case (id, lg) => (id, lg) }

  test("reads all 5,325 gold lines; 5,285 unique ids after the " +
      "reference's dict dedup, with the real label distribution") {
    assert(goldLines.size == 5325)
    assert(gold.size == 5285)
    // label conflicts would make last-wins order-dependent — assert none
    assert(goldLines.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1))
    val lineDist = goldLines.groupBy(_._2).view.mapValues(_.size).toMap
    assert(lineDist == Map("de" -> 2874, "fr" -> 1613, "lb" -> 823,
      "la" -> 7, "it" -> 4, "en" -> 3, "nl" -> 1))
    val dist = gold.groupBy(_._2).view.mapValues(_.size).toMap
    assert(dist == Map("de" -> 2838, "fr" -> 1611, "lb" -> 822,
      "la" -> 6, "it" -> 4, "en" -> 3, "nl" -> 1))
  }

  test("every real id matches the EV regex, and parseSource/parseYear " +
      "agree with the regex captures on all 5,325 ids") {
    var matched = 0
    goldLines.foreach { case (id, _) =>
      id match {
        case IdRe(coll, year, _, _, _, _) =>
          matched += 1
          assert(Stage1.parseSource(id) == coll,
            s"parseSource mismatch on $id")
          assert(Stage1.parseYear(id) == year,
            s"parseYear mismatch on $id")
        case _ => fail(s"id does not match EV regex: $id")
      }
    }
    assert(matched == 5325)
    // the slice semantics bucket malformed ids into "" (Python id[:-19])
    assert(Stage1.parseSource("short-id") == "")
    assert(Stage1.parseYear("short-id") == "")
  }

  test("langAccuracy over planted predictions keyed by the real ids " +
      "reproduces the analytically expected accuracies") {
    // plant: ids whose MD5-free deterministic hash is even predict the
    // gold label, odd ids predict a fixed wrong label — so per-language
    // expected accuracy = evenCount / total, computable exactly here.
    def coin(id: String): Boolean =
      (graft.util.Mix.mix(id.hashCode.toLong) & 1L) == 0L
    val decisions = gold.map { case (id, lg) =>
      DecisionRow(id, Stage1.parseSource(id), Stage1.parseYear(id),
        len = 100, orig_lg = null, alphabetical_ratio = Some(1.0),
        lg = if (coin(id)) lg else "xx", lg_decision = "all",
        votes = Array.empty, ppl = None, keep = true,
        drop_reason = null, transcript = "", ts = "2026-08-17")
    }.toDS()
    val goldDs = gold.map { case (id, lg) =>
      GoldRow(id, lg, null, gold_keep = true, gold_scrubbed_text = null)
    }.toDS()

    val acc = Eval.langAccuracy(spark, decisions, goldDs)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2)))).toMap

    val byLang = gold.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val correct = rows.count { case (id, _) => coin(id) }
      assert(acc(lang) == ((correct.toLong, rows.size.toLong)),
        s"accuracy row mismatch for $lang")
    }
    val allCorrect = gold.count { case (id, _) => coin(id) }
    assert(acc("_ALL_") == ((allCorrect.toLong, 5285L)))
  }
}
