package graft.model

/** Typed row models for every stage boundary (SURVEY.md §1.3). Case
  * classes → Catalyst `ExpressionEncoder`s; explicit, never inferred.
  */

/** Canonical input row (BASELINE.json.input_hint):
  * `clip_id` = `<source>-YYYY-MM-DD-<edition>-iNNNN` (parse rules mirror
  * the reference id, lib/impresso_lid_eval.py:81-84: source = id[:-19],
  * year = id[-18:-14]). */
final case class ClipRow(
    clip_id: String,
    bytes: Array[Byte],
    sr_hz: Int,
    dur_ms: Int,
    codec: String,
    transcript: String, // nullable
    orig_lg: String) // nullable provider metadata

/** One (lang, prob) prediction — the reference's `{lang, prob}` struct
  * (lib/language_identification.py:479-495), prob-desc sorted. */
final case class LangProb(lang: String, prob: Double)

final case class LangVote(lang: String, vote: Double)

/** Stage-1 output (analog of the stage-1a LID record,
  * lib/newspaper_statistics.py:41-51, plus graft audio/ppl fields).
  * Per-system arrays are null when the system errored or the text was
  * invalid for LID (LI:630-662 — invalid rows pass through, not dropped). */
final case class Stage1Row(
    clip_id: String,
    source: String,
    year: String,
    len: Int,
    orig_lg: String, // nullable
    alphabetical_ratio: Option[Double], // absent when text invalid
    impresso_ft: Array[LangProb], // nullable
    wp_ft: Array[LangProb],
    langid_nb: Array[LangProb],
    langdetect_nb: Array[LangProb], // C1 (averaged sampled-NB trials)
    lingua_rank: Array[LangProb],
    impresso_lp: Array[LangProb], // C5 (Rocchio nearest-centroid)
    ppl: Option[Double], // char-LM perplexity; absent when no text
    audio_ok: Boolean, // decodable + non-empty
    audio_rms: Double,
    n_samples: Int,
    transcript: String, // carried through for stage-3 scrub
    ts: String,
    stage1_version: String,
    /** F2 skip-reason taxonomy (LI:633-659): null when processed, else
      * no_text / short_text / low_alpha. */
    skip_reason: String = null)

/** Aggregator version stamp — the reference's `aggregator_lid` attr
  * (lib/newspaper_statistics.py:227-230: `{ts, version}` where version =
  * git describe or the package version). */
final case class StatsVersion(ts: String, version: String)

object StatsVersion {
  /** Deterministic stamp (no wall clock in the data path — same policy
    * as Thresholds.FixedTs). */
  val Current: StatsVersion =
    StatsVersion("2026-01-01T00:00:00Z", "graft-stats-v1.0.0")
}

/** Per-source statistics (stage-1b output) — field set mirrors
  * `attrs_for_json` (lib/newspaper_statistics.py:198-218) COMPLETELY
  * (incl. the trailing `aggregator_lid` version stamp), with the graft
  * renames (newspaper→source) and the `dominant_language_ratio`
  * enrichment (quirk Q1, SURVEY.md §2.9: the reference reads this key but
  * never writes it; we emit it and keep the penalty behind it). */
final case class SourceStats(
    source: String,
    lids: Seq[String],
    boosted_lids: Seq[String],
    boost_factor: Double,
    admissible_languages: Seq[String], // null = all admissible
    dominant_language: String, // nullable (empty ensemble)
    dominant_language_ratio: Double,
    overall_orig_lg_support: Option[Double],
    n: Long,
    lid_distributions: Map[String, Map[String, Double]],
    lid_absolute_counts: Map[String, Map[String, Long]],
    lg_support: Map[String, Map[String, Double]],
    clip_type_distribution: Map[String, Long],
    orig_lg_ensemble_disagreements: Map[String, Long],
    orig_lg_total_decisions: Long,
    ts: String,
    aggregator_lid: StatsVersion = StatsVersion.Current)

/** Stage-2 output (analog of `attrs_per_content_item`,
  * lib/impresso_ensemble_lid.py:118-149) fused with the graft keep/drop
  * decision. `lg_decision` ∈ {all, all-but-impresso_ft, dominant-by-len,
  * dominant-by-lowvote, voting, undecodable}. */
final case class DecisionRow(
    clip_id: String,
    source: String,
    year: String,
    len: Int,
    orig_lg: String,
    alphabetical_ratio: Option[Double],
    lg: String, // nullable final decision
    lg_decision: String,
    votes: Array[LangVote],
    ppl: Option[Double],
    keep: Boolean,
    drop_reason: String, // null when kept
    transcript: String,
    ts: String)

/** Stage-3 output: surviving transcripts, scrubbed. */
final case class ScrubbedRow(
    clip_id: String,
    source: String,
    lg: String,
    scrubbed_text: String,
    n_emails: Int,
    n_phones: Int,
    n_ids: Int,
    n_tox: Int)

/** Fixture gold labels (FIXTURES.md §2.2) — computed by the generator
  * from the documented rules, never by running the pipeline. */
final case class GoldRow(
    clip_id: String,
    gold_lg: String, // nullable (no decidable language planted)
    gold_decision: String,
    gold_keep: Boolean,
    gold_scrubbed_text: String)

/** Per-partition lineage + metrics row (FIXTURES.md §2.4) — enables
  * checkpoint-resume by bucket watermark. */
final case class MetricsRow(
    partition_id: Int,
    source: String,
    rows_in: Long,
    rows_out: Long,
    drop_reasons: Map[String, Long],
    ppl_histogram: Array[Long],
    watermark: String,
    ts: String)
