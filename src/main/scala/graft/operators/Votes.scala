package graft.operators

import graft.model.{LangProb, LangVote, SourceStats}

/** Row-local ensemble-vote logic shared by stage 1b and stage 2. This is
  * deliberately NOT an aggregation — votes never cross rows (SURVEY.md
  * §2.5 A5: "pure row-local logic"), so it runs inside whole-stage
  * codegen'd typed maps with zero shuffle.
  */
object Votes {

  final case class Top1(lid: String, lang: String, prob: Double)

  /** Top-1 per system with null guards (P4: element_at with size check). */
  def top1s(systems: Seq[(String, Array[LangProb])]): Seq[Top1] =
    systems.collect {
      case (lid, arr) if arr != null && arr.nonEmpty =>
        Top1(lid, arr(0).lang, arr(0).prob)
    }

  /** Stage-1b ensemble vote (`get_votes`, lib/newspaper_statistics.py:
    * 388-453) + winner/tie-kill (NS:504-517):
    *  - a system's top-1 votes if prob >= minProb (0.25) and the lang is
    *    admissible;
    *  - orig_lg counts as a system with prob 1.0;
    *  - boosted systems contribute `boostFactor` instead of 1, but ONLY
    *    if >= 2 systems voted for that lang (NS:437-438);
    *  - langs scoring < minVoteScore (1.5) are dropped;
    *  - winner = max score; exact tie with runner-up => None (NS:509-511).
    * Deterministic tie-break inside sorting: score desc then lang asc.
    */
  def stage1bEnsemble(
      tops: Seq[Top1],
      origLg: String,
      admissible: Set[String] = null,
      boostedLids: Set[String] = Thresholds.BoostedLids,
      boostFactor: Double = Thresholds.BoostFactor,
      minProb: Double = Thresholds.MinimalLidProbabilityStage1b,
      minVoteScore: Double = Thresholds.MinimalVoteScore): Option[String] = {

    // the orig_lg voter is added UNCONDITIONALLY in the reference
    // (NS:399-406) — the admissibility and prob gates live only inside
    // the LID-system loop (NS:407-431)
    val voters = tops.filter(t =>
      t.prob >= minProb && (admissible == null || admissible.contains(t.lang))) ++
      (if (origLg != null) Seq(Top1("orig_lg", origLg, 1.0)) else Seq.empty)

    if (voters.isEmpty) return None
    val byLang = voters.groupBy(_.lang)
    val scores = byLang.map { case (lang, vs) =>
      val multi = vs.size >= 2
      lang -> vs.map(v =>
        if (multi && boostedLids.contains(v.lid)) boostFactor else 1.0).sum
    }.filter(_._2 >= minVoteScore)

    if (scores.isEmpty) return None
    val sorted = scores.toSeq.sortBy { case (l, s) => (-s, l) }
    if (sorted.length >= 2 && sorted(0)._2 == sorted(1)._2) None // tie kill
    else Some(sorted.head._1)
  }

  /** Stage-2 weighted votes (`get_votes`, lib/impresso_ensemble_lid.py:
    * 346-551). Returns votes sorted desc (T3). Note quirk Q4: orig_lg is
    * NOT a voter here.
    *  - alphabetical_ratio < threshold (0.5) => votes = {dominant: 1}
    *    (EL:360-372);
    *  - per system top-1: prob >= 0.5; admissible; zero lg_support kills
    *    the vote (EL:416-417, 496-503); vote = prob * support (EL:429);
    *  - dominance penalty when dominant_language_ratio >= 0.90 and
    *    lang != dominant: vote *= 1 - (ratio-0.9)/0.1 (EL:431-460; dead
    *    in the reference — quirk Q1 — live here because stage 1b emits
    *    the ratio);
    *  - impresso_ft predicting "lb" => vote *= weightLb (3.0, EL:473-485);
    *  - `vetoLb`: per-source `lb` exclusion (F7) — when the row's source
    *    is in `--exclude-lb`, ANY system's `lb` prediction is skipped
    *    after the admissibility check and before the prob gate
    *    (EL:401-412; flag EL:969-978). The degenerate low-alpha branch is
    *    NOT vetoed — the reference's check lives only inside the
    *    prediction loop.
    */
  def stage2Votes(
      tops: Seq[Top1],
      alphabeticalRatio: Option[Double],
      stats: SourceStats,
      minProb: Double = Thresholds.MinimalLidProbabilityStage2,
      alphaThreshold: Double = Thresholds.AlphabeticalRatioThresholdStage2,
      dominantThreshold: Double = Thresholds.DominantLanguageThreshold,
      weightLb: Double = Thresholds.WeightLbImpressoFt,
      vetoLb: Boolean = false): Seq[LangVote] = {

    val admissible = Option(stats.admissible_languages).map(_.toSet).orNull

    // a MISSING ratio defaults to 1.0 in the reference
    // (`content_item.get("alphabetical_ratio", 1.0)`, EL:361-364) —
    // stage-1-skipped rows therefore take the NORMAL voting path (and,
    // having no predictions, end at empty votes → dominant-by-lowvote),
    // not the degenerate dominant vote
    if (alphabeticalRatio.getOrElse(1.0) < alphaThreshold) {
      // degenerate text => trust the source prior only (EL:360-372)
      return if (stats.dominant_language == null) Seq.empty
      else Seq(LangVote(stats.dominant_language, 1.0))
    }

    val acc = scala.collection.mutable.HashMap.empty[String, Double]
    tops.foreach { t =>
      val adm = (admissible == null || admissible.contains(t.lang)) &&
        !(vetoLb && t.lang == "lb") // F7 veto (EL:403-412)
      if (adm && t.prob >= minProb) {
        val support = stats.lg_support
          .getOrElse(t.lid, Map.empty).getOrElse(t.lang, 0.0)
        if (support > 0.0) {
          var vote = t.prob * support
          if (stats.dominant_language_ratio >= dominantThreshold &&
            stats.dominant_language != null && t.lang != stats.dominant_language) {
            vote *= 1.0 - (stats.dominant_language_ratio - dominantThreshold) /
              (1.0 - dominantThreshold)
          }
          if (t.lid == "impresso_ft" && t.lang == "lb") vote *= weightLb
          acc(t.lang) = acc.getOrElse(t.lang, 0.0) + vote
        }
      }
    }
    acc.toSeq.sortBy { case (l, v) => (-v, l) }
      .map { case (l, v) => LangVote(l, graft.lid.TextStats.roundTo(v, 3)) }
  }
}
