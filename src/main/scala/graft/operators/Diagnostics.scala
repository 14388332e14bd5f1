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
    // ONE scan: each row explodes into its four (stat, key) entries and
    // a single groupBy counts them all. The union-of-groupBys shape this
    // replaces re-executed the (typed-map) decisions pipeline once per
    // attribute — the same scan+union+rescan anti-pattern the a15
    // rollup rewrite measured 65x on.
    def entry(stat: String, key: org.apache.spark.sql.Column) =
      struct(lit(stat).as("stat"), key.as("key"))
    decisions.select($"source", $"year",
      explode(array(
        entry("lg", coalesce($"lg", lit("null"))),
        entry("orig_lg", coalesce($"orig_lg", lit("null"))),
        entry("lg_decision", coalesce($"lg_decision", lit("null"))),
        entry("N", lit("N")))).as("sk"))
      .groupBy($"source", $"year", $"sk.stat".as("stat"),
        $"sk.key".as("key"))
      .agg(count(lit(1)).as("n"))
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
    // ONE scan (see decisionStats): each row emits its reason entry plus
    // an optional disagreement entry from a single typed flatMap.
    s1.flatMap { r =>
      val reason =
        if (r.skip_reason == null) "processed"
        else "skipped_" + r.skip_reason
      val tops = Votes.top1s(Stage1b.systemsOf(r))
        .map(_.lang).distinct.sorted
      val dis =
        if (tops.size > 1)
          Seq(("disagreement", "LID_DISAGREEMENT_" + tops.mkString("_")))
        else Seq.empty
      ("reason", reason) +: dis
    }.toDF("stat", "key")
      .groupBy($"stat", $"key")
      .agg(count(lit(1)).as("n"))
  }
}
