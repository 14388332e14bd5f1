package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model._

/** Stage 1b — per-source statistics (= `lib/newspaper_statistics.py`,
  * SURVEY.md §2.5 A1-A12, §3.2).
  *
  * Plan shape (scale notes): ONE narrow pass + one tiny exchange.
  * Each input partition folds its rows into per-source counter bundles
  * (hand-written map-side combine — the A5/A6 ensemble vote and top-1
  * extraction are row-local and happen inside the fold), so the shuffle
  * carries at most (#partitions × #sources) counter rows, never data
  * rows. A DataFrame explode/groupBy/join bundle computes the same thing
  * but costs several exchanges + plans; at 10^12 rows both move only
  * counters, but this shape also keeps the job count constant.
  *
  * The A4 relfreq denominator is `n` (valid-row count) for ALL systems,
  * not the per-LID total (NS:583-585) — honored in `finish` below.
  */
object Stage1b {

  final case class Params(
      minimalTextLength: Int = Thresholds.StatsMinimalTextLength,
      alphaMin: Double = Thresholds.StatsAlphabeticalRatioMin,
      boostFactor: Double = Thresholds.BoostFactor,
      boostedLids: Set[String] = Thresholds.BoostedLids,
      minProb: Double = Thresholds.MinimalLidProbabilityStage1b,
      minVoteScore: Double = Thresholds.MinimalVoteScore,
      admissible: Set[String] = null)

  val LidNames: Seq[String] =
    Seq("impresso_ft", "wp_ft", "langid_nb", "langdetect_nb",
      "lingua_rank", "impresso_lp")

  /** (name, predictions) pairs of every LID system on a row — the single
    * place the system list is enumerated for voting/stats/diagnostics. */
  def systemsOf(r: Stage1Row): Seq[(String, Array[LangProb])] = Seq(
    "impresso_ft" -> r.impresso_ft, "wp_ft" -> r.wp_ft,
    "langid_nb" -> r.langid_nb, "langdetect_nb" -> r.langdetect_nb,
    "lingua_rank" -> r.lingua_rank, "impresso_lp" -> r.impresso_lp)

  // compound-key separator: U+0001 (written as an escape so it stays
  // visible in the source; a raw control-char literal renders as an
  // empty string and invites an accidental "fix"). Lang codes and lid
  // names never contain it.
  private val Sep = "\u0001"

  /** Mergeable per-source counter bundle (compound `lidlang` keys
    * keep the encoder to flat string-keyed maps). */
  final case class SrcAgg(
      source: String,
      n: Long, // valid rows (A3)
      typeDist: Map[String, Long], // over ALL rows (A1)
      lidCnt: Map[String, Long], // (lid,lang) absolute counts (A4)
      lidSupp: Map[String, Long], // top1==ensemble counts (A8)
      origTotal: Long, // A9/A10
      origSupp: Long,
      disagree: Map[String, Long]) { // "orig->ens" (A9)

    def merge(o: SrcAgg): SrcAgg = {
      def m(a: Map[String, Long], b: Map[String, Long]) =
        b.foldLeft(a) { case (acc, (k, v)) =>
          acc.updated(k, acc.getOrElse(k, 0L) + v)
        }
      SrcAgg(source, n + o.n, m(typeDist, o.typeDist), m(lidCnt, o.lidCnt),
        m(lidSupp, o.lidSupp), origTotal + o.origTotal,
        origSupp + o.origSupp, m(disagree, o.disagree))
    }
  }

  private final class MutAgg {
    var n = 0L
    val typeDist = new scala.collection.mutable.HashMap[String, Long]
    val lidCnt = new scala.collection.mutable.HashMap[String, Long]
    val lidSupp = new scala.collection.mutable.HashMap[String, Long]
    var origTotal = 0L
    var origSupp = 0L
    val disagree = new scala.collection.mutable.HashMap[String, Long]
    def bump(m: scala.collection.mutable.HashMap[String, Long], k: String): Unit =
      m.update(k, m.getOrElse(k, 0L) + 1L)
    def freeze(source: String): SrcAgg =
      SrcAgg(source, n, typeDist.toMap, lidCnt.toMap, lidSupp.toMap,
        origTotal, origSupp, disagree.toMap)
  }

  /** Fold one row into its source's accumulator. */
  private def accumulate(acc: MutAgg, r: Stage1Row, p: Params): Unit = {
    // A1 — type distribution over ALL rows (img analog incl., NS:479)
    val tp =
      if (!r.audio_ok) "undecodable"
      else if (r.audio_rms == 0.0) "silent"
      else "clip"
    acc.bump(acc.typeDist, tp)

    // F3 + F4 (NS:481-495)
    val valid = r.audio_ok && r.audio_rms > 0.0 &&
      r.alphabetical_ratio.exists(a =>
        a >= p.alphaMin && r.len * a >= p.minimalTextLength)
    if (!valid) return
    acc.n += 1

    val tops = Votes.top1s(systemsOf(r))
    val ens = Votes.stage1bEnsemble(tops, r.orig_lg, p.admissible,
      p.boostedLids, p.boostFactor, p.minProb, p.minVoteScore).orNull

    // A4/A8 per system + orig_lg + ensemble pseudo-systems
    val entries = tops.map(t => (t.lid, t.lang)) ++
      (if (r.orig_lg != null) Seq(("orig_lg", r.orig_lg)) else Nil) ++
      (if (ens != null) Seq(("ensemble", ens)) else Nil)
    entries.foreach { case (lid, lang) =>
      val k = lid + Sep + lang
      acc.bump(acc.lidCnt, k)
      if (ens != null && ens == lang) acc.bump(acc.lidSupp, k)
    }

    // A9/A10 — orig_lg_total_decisions counts EVERY valid row carrying
    // orig_lg (NS:532-534), whether or not the ensemble decided; support
    // needs agreement, disagreement needs a non-null ensemble. The r2
    // gate on `ens != null` under-counted the A10 denominator, which
    // INFLATED overall_orig_lg_support and could flip a source across
    // the 0.75 trust threshold.
    if (r.orig_lg != null) {
      acc.origTotal += 1
      if (ens != null) {
        if (r.orig_lg == ens) acc.origSupp += 1
        else acc.bump(acc.disagree, r.orig_lg + "->" + ens)
      }
    }
  }

  /** Assemble the public stats row from a merged counter bundle. */
  def finish(a: SrcAgg, p: Params): SourceStats = {
    val byLid = a.lidCnt.toSeq.map { case (k, v) =>
      val Array(lid, lang) = k.split(Sep, 2); (lid, lang, v)
    }
    def nested(vals: Seq[(String, String, Double)]) =
      vals.groupBy(_._1).map { case (lid, xs) =>
        lid -> xs.map(x => x._2 -> x._3).toMap
      }
    val absolute = byLid.groupBy(_._1).map { case (lid, xs) =>
      lid -> xs.map(x => x._2 -> x._3).toMap
    }
    val dist = nested(byLid.map { case (lid, lang, c) =>
      (lid, lang, BigDecimal(c.toDouble / a.n)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    })
    val support = nested(byLid.map { case (lid, lang, c) =>
      val supp = a.lidSupp.getOrElse(lid + Sep + lang, 0L)
      (lid, lang, BigDecimal(supp.toDouble / c)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    })
    val ensDist = absolute.getOrElse("ensemble", Map.empty)
    // A12 — dominant, deterministic tie-break (cnt desc, lang asc)
    val dominant = ensDist.toSeq.sortBy { case (l, c) => (-c, l) }
      .headOption.map(_._1).orNull
    val domCnt = ensDist.values.maxOption.getOrElse(0L)
    SourceStats(
      source = a.source,
      lids = LidNames,
      boosted_lids = p.boostedLids.toSeq.sorted,
      boost_factor = p.boostFactor,
      admissible_languages = Option(p.admissible).map(_.toSeq.sorted).orNull,
      dominant_language = dominant,
      dominant_language_ratio = if (a.n == 0) 0.0 else domCnt.toDouble / a.n,
      overall_orig_lg_support =
        if (a.origTotal == 0) None
        else Some(a.origSupp.toDouble / a.origTotal),
      n = a.n,
      lid_distributions = dist,
      lid_absolute_counts = absolute,
      lg_support = support,
      clip_type_distribution = a.typeDist,
      orig_lg_ensemble_disagreements = a.disagree,
      orig_lg_total_decisions = a.origTotal,
      ts = Thresholds.FixedTs)
  }

  def apply(spark: SparkSession, s1: Dataset[Stage1Row],
      p: Params = Params()): Dataset[SourceStats] = {
    import spark.implicits._
    val partials: Dataset[SrcAgg] = s1.mapPartitions { it =>
      val accs = new scala.collection.mutable.HashMap[String, MutAgg]
      it.foreach { r =>
        accumulate(accs.getOrElseUpdate(r.source, new MutAgg), r, p)
      }
      accs.iterator.map { case (src, acc) => acc.freeze(src) }
    }
    partials.groupByKey(_.source)
      .reduceGroups((a, b) => a.merge(b))
      .map { case (_, agg) => finish(agg, p) }
  }
}
