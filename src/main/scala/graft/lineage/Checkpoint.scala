package graft.lineage

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{ClipRow, DecisionRow}
import graft.operators.Thresholds

/** Checkpoint-resume by partition watermark (north rule; FIXTURES.md
  * §2.4), emulating Iceberg-style snapshot semantics with hash-bucketed
  * partitioned Parquet plus a manifest table (no Iceberg jars in this
  * environment — SURVEY.md §7.1).
  *
  * Layout:
  *   {dir}/data/bucket=N/  — output parquet, hash-bucketed by clip_id
  *   {dir}/manifest/       — parquet, one row per COMPLETED bucket
  *
  * Protocol (mirrors the reference's Make stamp files, README.md:354-356):
  *  1. bucket = pmod(hash(clip_id), nBuckets) — explicit, skew-free
  *     partitioning of the input;
  *  2. resume = LEFT ANTI join of the input's buckets against the
  *     manifest — only unfinished buckets are read and processed
  *     (with partition pruning on the bucketed layout this skips their
  *     files entirely);
  *  3. data is written with dynamic partition overwrite BEFORE the
  *     manifest append, so a crash between the two leaves a bucket
  *     without a manifest row and the next run rewrites it idempotently.
  */
object Checkpoint {

  final case class ManifestRow(bucket: Int, rows: Long, watermark: String,
      ts: String)

  def bucketCol(nBuckets: Int) =
    pmod(hash(col("clip_id")), lit(nBuckets)).as("bucket")

  def manifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val path = s"$dir/manifest"
    // ONLY a missing path means "nothing completed yet" — a corrupt or
    // transiently-unreadable manifest must FAIL the run, not silently
    // report zero finished buckets (which would reprocess the corpus
    // and append duplicate manifest rows)
    try spark.read.parquet(path)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getErrorClass == "PATH_NOT_FOUND" =>
        spark.emptyDataset[ManifestRow].toDF()
    }
  }

  /** Process at most `maxBuckets` of the unfinished buckets (pass
    * Int.MaxValue for all — bounding it simulates a killed run in tests
    * and enables incremental backfill in production). Returns the number
    * of buckets completed this invocation. */
  def runIncrement(spark: SparkSession, clips: Dataset[ClipRow],
      dir: String, nBuckets: Int,
      process: Dataset[ClipRow] => Dataset[DecisionRow],
      maxBuckets: Int = Int.MaxValue): Int = {
    import spark.implicits._
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    val done = manifest(spark, dir).select(col("bucket"))
    val withBucket = clips.withColumn("bucket", bucketCol(nBuckets))
    // resume = anti-join of input buckets against completed watermarks
    val todoBuckets = withBucket.select(col("bucket")).distinct()
      .join(done, Seq("bucket"), "left_anti")
      .orderBy(col("bucket"))
      .as[Int].collect().take(maxBuckets)
    if (todoBuckets.isEmpty) return 0

    val slice = withBucket
      .filter(col("bucket").isin(todoBuckets.map(Integer.valueOf): _*))
      .drop("bucket").as[ClipRow]
    val decided = process(slice)
      .withColumn("bucket", bucketCol(nBuckets))
    decided.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$dir/data")

    // manifest row appended only AFTER the data commit
    val counts = spark.read.parquet(s"$dir/data")
      .filter(col("bucket").isin(todoBuckets.map(Integer.valueOf): _*))
      .groupBy(col("bucket")).count()
      .as[(Int, Long)].collect().toMap
    todoBuckets.map(b => ManifestRow(b, counts.getOrElse(b, 0L),
      b.toString, Thresholds.FixedTs)).toSeq.toDS()
      .write.mode("append").parquet(s"$dir/manifest")
    todoBuckets.length
  }

  /** Drive increments until no unfinished bucket remains. */
  def runToCompletion(spark: SparkSession, clips: Dataset[ClipRow],
      dir: String, nBuckets: Int,
      process: Dataset[ClipRow] => Dataset[DecisionRow]): Unit = {
    while (runIncrement(spark, clips, dir, nBuckets, process) > 0) ()
  }

  def readOutput(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/data")

  /** Drain the LSH observability counters recorded since the last drain
    * (graft.operators.Dedup.LshMetrics — buckets, max bucket size,
    * candidate vs all-pairs counts, survivors) into a durable metrics
    * table under the checkpoint dir, stamped with a run label. This is
    * how a 10^12-row dedup job sees the quadratic candidate trend
    * ACROSS runs — the in-memory queue dies with the driver; the
    * parquet append outlives it next to the lineage manifest it
    * explains. Returns the number of rows appended (0 = no LSH runs
    * recorded, nothing written). */
  def appendLshMetrics(spark: SparkSession, dir: String,
      runLabel: String): Long = {
    val df = graft.operators.Dedup.lshMetricsDf(spark)
      .withColumn("run", lit(runLabel))
      .withColumn("ts", lit(Thresholds.FixedTs))
    val n = df.count()
    if (n > 0)
      df.coalesce(1).write.mode("append").parquet(s"$dir/lsh_metrics")
    n
  }

  def readLshMetrics(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lsh_metrics")
}
