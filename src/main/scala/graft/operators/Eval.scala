package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Evaluation (= `lib/impresso_lid_eval.py`, SURVEY.md §2.5 A15 + J2) —
  * gold join + per-language accuracy, plus the graft's keep/drop
  * precision/recall/F1 vs gold labels (BASELINE.md targets).
  * The gold side is small relative to predictions; the join is an
  * inner equi-join on clip_id (shuffle hash join at scale; at test scale
  * AQE broadcasts it). */
object Eval {

  /** Per-language accuracy with the `_ALL_` rollup bucket (EV:94-104).
    * ONE join + ONE rollup aggregation — the `_ALL_` row is the rollup
    * grand total, not a second scan of the join (the union-of-aggs
    * shape executes the join twice; same rewrite as the a15 queries).
    * `gold_lg0` duplicates the grouping column so the aggregate
    * survives expand-projection (NULL on the rollup row). */
  def langAccuracy(spark: SparkSession, decisions: Dataset[DecisionRow],
      gold: Dataset[GoldRow]): DataFrame = {
    import spark.implicits._
    val joined = decisions.select($"clip_id", $"lg")
      .join(gold.filter($"gold_lg".isNotNull).select($"clip_id", $"gold_lg"),
        "clip_id")
      .withColumn("gold_lg0", $"gold_lg")
    joined.rollup($"gold_lg").agg(
      sum(when($"lg" === $"gold_lg0", 1L).otherwise(0L)).as("correct"),
      count(lit(1)).as("total"))
      .select(coalesce($"gold_lg", lit("_ALL_")).as("gold_lg"),
        $"correct", $"total",
        round($"correct" / $"total", 4).as("accuracy"))
      .orderBy($"gold_lg")
  }

  /** Per-item eval diagnostics (EV:105-122 analog): one row per
    * gold-labeled item with its prediction and correctness — the error-
    * analysis feed the aggregate accuracy frame can't provide. Same join
    * shape as [[langAccuracy]]; output stays distributed (sink it, don't
    * collect it). */
  def perItem(spark: SparkSession, decisions: Dataset[DecisionRow],
      gold: Dataset[GoldRow]): DataFrame = {
    import spark.implicits._
    decisions.select($"clip_id", $"lg", $"lg_decision")
      .join(gold.filter($"gold_lg".isNotNull).select($"clip_id", $"gold_lg"),
        "clip_id")
      .select($"clip_id", $"lg", $"gold_lg", $"lg_decision",
        ($"lg" === $"gold_lg").as("correct"))
  }

  final case class KeepF1(
      tp: Long, fp: Long, fn: Long, tn: Long,
      precision: Double, recall: Double, f1: Double)

  def keepF1(spark: SparkSession, decisions: Dataset[DecisionRow],
      gold: Dataset[GoldRow]): KeepF1 = {
    import spark.implicits._
    val joined = decisions.select($"clip_id", $"keep")
      .join(gold.select($"clip_id", $"gold_keep"), "clip_id")
    val row = joined.agg(
      sum(when($"keep" && $"gold_keep", 1L).otherwise(0L)),
      sum(when($"keep" && !$"gold_keep", 1L).otherwise(0L)),
      sum(when(!$"keep" && $"gold_keep", 1L).otherwise(0L)),
      sum(when(!$"keep" && !$"gold_keep", 1L).otherwise(0L))).head
    val (tp, fp, fn, tn) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val p = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    val r = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    val f1 = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    KeepF1(tp, fp, fn, tn, p, r, f1)
  }

  /** Scrubbed-transcript byte-equality rate vs gold (target: 1.0). */
  def scrubEquality(spark: SparkSession, scrubbed: Dataset[ScrubbedRow],
      gold: Dataset[GoldRow]): (Long, Long) = {
    import spark.implicits._
    val joined = scrubbed.select($"clip_id", $"scrubbed_text")
      .join(gold.filter($"gold_keep").select($"clip_id", $"gold_scrubbed_text"),
        "clip_id")
    val row = joined.agg(
      sum(when($"scrubbed_text" === $"gold_scrubbed_text", 1L).otherwise(0L)),
      count(lit(1))).head
    (row.getLong(0), row.getLong(1))
  }

  /** Decision-code agreement on rows where gold pins a code. */
  def decisionAgreement(spark: SparkSession, decisions: Dataset[DecisionRow],
      gold: Dataset[GoldRow]): DataFrame = {
    import spark.implicits._
    decisions.select($"clip_id", $"lg_decision")
      .join(gold.filter($"gold_decision".isNotNull)
        .select($"clip_id", $"gold_decision"), "clip_id")
      .groupBy($"gold_decision", $"lg_decision").count()
      .orderBy($"gold_decision", $"lg_decision")
  }
}
