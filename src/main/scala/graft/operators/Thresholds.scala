package graft.operators

/** All pipeline parameters in one place, with the reference defaults they
  * mirror (file:line into /root/reference). Grouped per stage; every knob
  * is plumbed through the stage constructors so tests can probe boundary
  * values (SURVEY.md §5).
  */
object Thresholds {
  // ---- stage 1a (lib/language_identification.py argparse, LI:733-858)
  val MinimalTextLength = 20 // LI:802-811
  val AlphabeticalRatioThresholdStage1 = 0.0 // LI:848-856
  val RoundNDigits = 3 // LI:813-817

  // ---- stage 1b (lib/newspaper_statistics.py, NS:638-796)
  val StatsMinimalTextLength = 200 // NS:662-670 (len * ratio >= 200)
  val StatsAlphabeticalRatioMin = 0.5 // NS:485-495
  val BoostFactor = 1.5 // NS:671-677, README.md:204-206
  val MinimalLidProbabilityStage1b = 0.25 // NS:678-687
  val MinimalVoteScore = 1.5 // NS:688-696
  val BoostedLids: Set[String] = Set("impresso_ft", "orig_lg") // README.md:204

  // ---- stage 2 (lib/impresso_ensemble_lid.py, EL:824-1003)
  val MinimalLidProbabilityStage2 = 0.5 // EL:882-891
  val MinimalVotingScore = 0.5 // EL:892-901
  val ThresholdConfidenceOrigLg = 0.75 // EL:853-858
  val AlphabeticalRatioThresholdStage2 = 0.5 // EL:950-959
  val DominantLanguageThreshold = 0.90 // EL:960-968
  val WeightLbImpressoFt = 3.0 // EL:872-881
  val Stage2MinimalTextLength = 20 // EL:916-924 (rules 2b/2c)

  // ---- graft keep/drop fusion (BASELINE.json.north_star)
  /** Perplexity keep ceiling — calibrated between fluent-max (incl.
    * PII-laden rows, whose digit/@ chars raise ppl) and noise-min of the
    * char LM (LidModelSpec pins the margin). */
  val PplKeepMax = 20.0
  /** Minimum decoded-audio RMS; 0 ⇒ silent clip ⇒ drop. */
  val AudioRmsMin = 10.0
  /** Admissible final languages (closed world of the graft corpus). */
  val AdmissibleLanguages: Set[String] = Set("de", "en", "fr", "it", "lb")

  // ---- versions / stamps (deterministic: no wall clock in the data path)
  val Stage1Version = "graft-stage1-v1.0.0"
  val Stage2Version = "graft-stage2-v1.0.0"
  val FixedTs = "2026-01-01T00:00:00Z"

  // ---- perplexity histogram bins for the metrics table (FIXTURES.md §2.4)
  val PplBins: Array[Double] = Array(0, 2, 4, 6, 8, 10, 14, 20, 40, 100)
}
