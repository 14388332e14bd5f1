package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.operators._

/** End-to-end quality-filter pipeline (SURVEY.md §7.3):
  * clips → stage1 (decode + LID + ppl) → stage1b (per-source stats,
  * the ONE shuffle) → stage2 (broadcast-join cascade + keep/drop) →
  * stage3 (scrub).
  *
  * Scale notes: the data path is scan → narrow map (stage1) → narrow map
  * (stage2) → filter+map (stage3). The only exchange is the stats
  * aggregation on the stage-1 output, which ships counters, not rows.
  * At 10^12 rows the stage-1 output would be persisted as hash-bucketed
  * parquet between runs (see lineage.Checkpoint); here the fused plan is
  * used, with stage1 cached only when both 1b and 2 need it.
  */
object Pipeline {

  /** Distributed deterministic corpus — rows are a pure function of the
    * range index, so 10^12 rows would synthesize without any driver
    * materialization or skew (range is evenly partitioned). */
  def clips(spark: SparkSession, n: Long,
      seed: Long = ClipGen.DefaultSeed,
      partitions: Int = 0): Dataset[ClipRow] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0, n, 1, partitions)
    else spark.range(n)
    base.map(i => ClipGen.clipAt(i, seed)._1)
  }

  def gold(spark: SparkSession, n: Long,
      seed: Long = ClipGen.DefaultSeed): Dataset[GoldRow] = {
    import spark.implicits._
    spark.range(n).map(i => ClipGen.clipAt(i, seed)._2)
  }

  final case class Result(
      stage1: Dataset[Stage1Row],
      stats: Seq[SourceStats],
      decisions: Dataset[DecisionRow],
      scrubbed: Dataset[ScrubbedRow])

  def run(spark: SparkSession, clipsDs: Dataset[ClipRow]): Result = {
    val s1 = Stage1(spark, clipsDs)
    // stage1 feeds both the stats agg and the decision map — cache it so
    // the expensive model inference runs once (at cluster scale this is
    // the persisted stage boundary instead)
    s1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = Stage1b(spark, s1).collect().toSeq
    val decisions = Stage2(spark, s1, stats)
    val scrubbed = Stage3(spark, decisions)
    Result(s1, stats, decisions, scrubbed)
  }

  /** Per-partition lineage + metrics (FIXTURES.md §2.4) computed from the
    * decision output — drop-reason counts and a perplexity histogram per
    * (partition, source). */
  def metrics(spark: SparkSession,
      decisions: Dataset[DecisionRow]): Dataset[MetricsRow] = {
    import spark.implicits._
    val bins = Thresholds.PplBins
    val binCol = {
      // width_bucket-style binning of ppl into fixed bins
      val p = coalesce($"ppl", lit(Double.MaxValue))
      bins.zipWithIndex.foldLeft(lit(bins.length)) { case (acc, (b, i)) =>
        when(p <= b, i).otherwise(acc)
      }
    }
    // All three aggregations reduce to counters before the exchange
    // (hash agg with map-side partials) — never collect raw rows.
    val tagged = decisions
      .withColumn("pid", spark_partition_id())
      .withColumn("bin", binCol)
      .withColumn("reason", coalesce($"drop_reason", lit("kept")))

    val totals = tagged.groupBy($"pid", $"source").agg(
      count(lit(1)).as("rows_in"),
      sum(when($"keep", 1L).otherwise(0L)).as("rows_out"))
    val reasons = tagged.groupBy($"pid", $"source", $"reason").count()
      .groupBy($"pid", $"source")
      .agg(map_from_entries(collect_list(struct($"reason", $"count")))
        .as("drop_reasons"))
    val hist = tagged.groupBy($"pid", $"source", $"bin").count()
      .groupBy($"pid", $"source")
      .agg(map_from_entries(collect_list(struct($"bin", $"count")))
        .as("bin_counts"))

    totals.join(reasons, Seq("pid", "source"))
      .join(hist, Seq("pid", "source"))
      .map { row =>
        val binsArr = new Array[Long](bins.length + 1)
        row.getMap[Int, Long](row.fieldIndex("bin_counts"))
          .foreach { case (b, c) => binsArr(b) = c }
        MetricsRow(
          row.getInt(row.fieldIndex("pid")),
          row.getString(row.fieldIndex("source")),
          row.getLong(row.fieldIndex("rows_in")),
          row.getLong(row.fieldIndex("rows_out")),
          row.getMap[String, Long](row.fieldIndex("drop_reasons")).toMap,
          binsArr,
          watermark = row.getInt(row.fieldIndex("pid")).toString,
          ts = Thresholds.FixedTs)
      }
  }
}
