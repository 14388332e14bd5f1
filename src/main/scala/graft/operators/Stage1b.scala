package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model._

/** Stage 1b — per-source statistics (= `lib/newspaper_statistics.py`,
  * SURVEY.md §2.5 A1-A12, §3.2).
  *
  * Plan shape (scale notes):
  *  - row-local work (top-1 extraction, the A5/A6 ensemble vote + tie
  *    kill) happens in a typed projection BEFORE any exchange — votes
  *    never cross rows;
  *  - ONE logical shuffle family keyed by `source` (+ lid/lang for the
  *    distribution counts); all aggregates are hash aggregates with
  *    map-side partial aggregation, so the exchange carries counters,
  *    not rows;
  *  - the result is one row per source (tiny), which stage 2 broadcasts.
  *  - the A4 relfreq denominator is `n` (valid-item count) for ALL
  *    systems, not the per-LID total (NS:583-585) — hence the explicit
  *    join with `n` below.
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

  /** Row after the row-local ensemble vote; `top1` carries each system's
    * top-1 lang plus the `orig_lg` pseudo-system and, when decided, the
    * `ensemble` pseudo-system (they appear in the reference's
    * lid_distributions too, NS:358-386, FIXTURES.md §1.3). */
  final case class EnsembleRow(
      source: String,
      orig_lg: String,
      ensemble: String,
      top1: Map[String, String])

  val LidNames: Seq[String] =
    Seq("impresso_ft", "wp_ft", "langid_nb", "lingua_rank")

  def ensembleRow(r: Stage1Row, p: Params): EnsembleRow = {
    val tops = Votes.top1s(Seq(
      "impresso_ft" -> r.impresso_ft, "wp_ft" -> r.wp_ft,
      "langid_nb" -> r.langid_nb, "lingua_rank" -> r.lingua_rank))
    val ens = Votes.stage1bEnsemble(tops, r.orig_lg, p.admissible,
      p.boostedLids, p.boostFactor, p.minProb, p.minVoteScore).orNull
    val top1 = tops.map(t => t.lid -> t.lang).toMap ++
      (if (r.orig_lg != null) Map("orig_lg" -> r.orig_lg) else Map.empty) ++
      (if (ens != null) Map("ensemble" -> ens) else Map.empty)
    EnsembleRow(r.source, r.orig_lg, ens, top1)
  }

  def apply(spark: SparkSession, s1: Dataset[Stage1Row],
      p: Params = Params()): Dataset[SourceStats] = {
    import spark.implicits._

    // A1 — type distribution over ALL rows (incl. undecodable, like the
    // reference's img rows, NS:479)
    val typed = s1.withColumn("tp",
      when(!$"audio_ok", "undecodable")
        .when($"audio_rms" === 0.0, "silent")
        .otherwise("clip"))
    val typeDist = typed.groupBy($"source", $"tp").count()
      .groupBy($"source")
      .agg(map_from_entries(collect_list(struct($"tp", $"count")))
        .as("clip_type_distribution"))

    // F3 (undecodable/silent out) + F4 (len*ratio gate, NS:485-495)
    val valid = s1.filter($"audio_ok" && $"audio_rms" > 0.0 &&
      $"alphabetical_ratio".isNotNull &&
      $"alphabetical_ratio" >= p.alphaMin &&
      $"len" * $"alphabetical_ratio" >= p.minimalTextLength)

    // row-local ensemble vote (A5/A6) — no shuffle
    val ens = valid.map(ensembleRow(_, p))

    // A3 — n
    val nDf = ens.groupBy($"source").agg(count(lit(1)).as("n"))

    // A4 + A8 in one pass: per (source, lid, lang) absolute count and
    // "top-1 == ensemble" support count
    val exploded = ens.select($"source", $"ensemble",
      explode($"top1").as(Seq("lid", "lang")))
    val cnts = exploded.groupBy($"source", $"lid", $"lang").agg(
      count(lit(1)).as("cnt"),
      sum(when($"ensemble" === $"lang", 1L).otherwise(0L)).as("supp_cnt"))
    val perLid = cnts.join(nDf, "source")
      .groupBy($"source", $"lid").agg(
        map_from_entries(collect_list(struct($"lang", $"cnt"))).as("abs_m"),
        map_from_entries(collect_list(struct($"lang",
          round($"cnt" / $"n", 9)))).as("dist_m"),
        map_from_entries(collect_list(struct($"lang",
          round($"supp_cnt" / $"cnt", 9)))).as("supp_m"))
    val lidMaps = perLid.groupBy($"source").agg(
      map_from_entries(collect_list(struct($"lid", $"abs_m")))
        .as("lid_absolute_counts"),
      map_from_entries(collect_list(struct($"lid", $"dist_m")))
        .as("lid_distributions"),
      map_from_entries(collect_list(struct($"lid", $"supp_m")))
        .as("lg_support"))

    // A12 — dominant language, deterministic tie-break (cnt desc, lang asc)
    val ensCnt = ens.filter($"ensemble".isNotNull)
      .groupBy($"source", $"ensemble").count()
    val w = Window.partitionBy($"source")
      .orderBy($"count".desc, $"ensemble".asc)
    val dom = ensCnt.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"source", $"ensemble".as("dominant_language"),
        $"count".as("dom_cnt"))

    // A9/A10 — orig_lg support + totals
    val origAgg = ens.groupBy($"source").agg(
      sum(when($"orig_lg".isNotNull && $"ensemble".isNotNull, 1L)
        .otherwise(0L)).as("orig_total"),
      sum(when($"orig_lg".isNotNull && $"orig_lg" === $"ensemble", 1L)
        .otherwise(0L)).as("orig_supp"))

    // A9 — disagreement counter keyed "orig->ens" (NS:539)
    val disagree = ens
      .filter($"orig_lg".isNotNull && $"ensemble".isNotNull &&
        $"orig_lg" =!= $"ensemble")
      .groupBy($"source",
        concat($"orig_lg", lit("->"), $"ensemble").as("key")).count()
      .groupBy($"source")
      .agg(map_from_entries(collect_list(struct($"key", $"count")))
        .as("orig_lg_ensemble_disagreements"))

    val joined: DataFrame = typeDist
      .join(nDf, Seq("source"), "left")
      .join(lidMaps, Seq("source"), "left")
      .join(dom, Seq("source"), "left")
      .join(origAgg, Seq("source"), "left")
      .join(disagree, Seq("source"), "left")

    val lidsSeq = LidNames
    val boosted = p.boostedLids.toSeq.sorted
    val admissibleSeq = Option(p.admissible).map(_.toSeq.sorted).orNull
    val bf = p.boostFactor
    joined.map { row =>
      def m2[V](name: String): Map[String, Map[String, V]] = {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) Map.empty
        else row.getMap[String, Map[String, V]](i).toMap.map {
          case (k, v) => k -> v.asInstanceOf[scala.collection.Map[String, V]].toMap
        }
      }
      def m1(name: String): Map[String, Long] = {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) Map.empty
        else row.getMap[String, Long](i).toMap
      }
      def optL(name: String): Long = {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) 0L else row.getLong(i)
      }
      val n = optL("n")
      val domCnt = optL("dom_cnt")
      val origTotal = optL("orig_total")
      val origSupp = optL("orig_supp")
      SourceStats(
        source = row.getString(row.fieldIndex("source")),
        lids = lidsSeq,
        boosted_lids = boosted,
        boost_factor = bf,
        admissible_languages = admissibleSeq,
        dominant_language = {
          val i = row.fieldIndex("dominant_language")
          if (row.isNullAt(i)) null else row.getString(i)
        },
        dominant_language_ratio =
          if (n == 0) 0.0 else domCnt.toDouble / n,
        overall_orig_lg_support =
          if (origTotal == 0) None else Some(origSupp.toDouble / origTotal),
        n = n,
        lid_distributions = m2[Double]("lid_distributions"),
        lid_absolute_counts = m2[Long]("lid_absolute_counts"),
        lg_support = m2[Double]("lg_support"),
        clip_type_distribution = m1("clip_type_distribution"),
        orig_lg_ensemble_disagreements = m1("orig_lg_ensemble_disagreements"),
        orig_lg_total_decisions = origTotal,
        ts = Thresholds.FixedTs)
    }
  }
}
