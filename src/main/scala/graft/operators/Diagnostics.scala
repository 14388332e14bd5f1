package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{DecisionRow, Stage1Row}

/** Diagnostics operators (SURVEY.md §2.5 A13/A14, §2.1 S9/S11).
  *
  * All are counter aggregations with map-side partial aggregation; the
  * reference emits them as per-file JSON / STATS-log lines (EL:810-821,
  * LI:562-618) — here they are regular DataFrames a caller sinks
  * anywhere.
  */
object Diagnostics {

  /** A13 — stage-2 decision-distribution stats: counts over lg, orig_lg
    * and lg_decision per (source, year), plus N (EL:810-821). The
    * reference keeps independent Counters per attribute — modeled as one
    * long-format frame keyed (source, year, stat, key). */
  def decisionStats(spark: SparkSession,
      decisions: Dataset[DecisionRow]): DataFrame = {
    import spark.implicits._
    val base = decisions.select($"source", $"year", $"lg", $"orig_lg",
      $"lg_decision")
    val stats = Seq("lg", "orig_lg", "lg_decision").map { c =>
      base.groupBy($"source", $"year",
        lit(c).as("stat"), coalesce(col(c), lit("null")).as("key"))
        .agg(count(lit(1)).as("n"))
    }
    val total = base.groupBy($"source", $"year",
      lit("N").as("stat"), lit("N").as("key"))
      .agg(count(lit(1)).as("n"))
    stats.reduce(_ union _).union(total)
  }

  /** A14 — stage-1 skip-reason + LID-disagreement counters
    * (LI:252-259, 528-560). Skip reasons use the F2 three-way taxonomy
    * carried on `Stage1Row.skip_reason` (skipped_no_text /
    * skipped_short_text / skipped_low_alpha, LI:633-659). Disagreement
    * key = sorted distinct top-1 languages joined by '_' (dynamic
    * LID_DISAGREEMENT_<l1>_<l2> keys). */
  def stage1Stats(spark: SparkSession,
      s1: Dataset[Stage1Row]): DataFrame = {
    import spark.implicits._
    val reasons = s1.map { r =>
      if (r.skip_reason == null) "processed" else "skipped_" + r.skip_reason
    }.toDF("key").groupBy(lit("reason").as("stat"), $"key")
      .agg(count(lit(1)).as("n"))

    val disagreements = s1.map { r =>
      val tops = Votes.top1s(Stage1b.systemsOf(r))
        .map(_.lang).distinct.sorted
      if (tops.size > 1) "LID_DISAGREEMENT_" + tops.mkString("_") else null
    }.filter(_ != null).toDF("key")
      .groupBy(lit("disagreement").as("stat"), $"key")
      .agg(count(lit(1)).as("n"))

    reasons.union(disagreements)
  }
}
