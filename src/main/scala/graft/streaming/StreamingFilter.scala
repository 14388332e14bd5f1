package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.{ClipRow, DecisionRow, SourceStats}
import graft.operators.{Stage1, Stage2}
import graft.sources.JsonlIO

/** Structured Streaming surface (SURVEY.md §2.11: the reference is pure
  * batch; this is the graft's incremental path). The SAME stage-1/2
  * row-local transforms run over `readStream` — they are stateless maps,
  * so batch/stream parity is exact given a fixed stats table (stats come
  * from a prior batch run, like the reference's per-newspaper stats
  * files). `Trigger.AvailableNow` drains what exists and stops —
  * checkpointed, so repeated invocations resume incrementally (the
  * streaming twin of lineage.Checkpoint).
  */
object StreamingFilter {

  /** Stream clips from a parquet directory through stage1+stage2 and sink
    * decisions to `outDir` (append mode, exactly-once via checkpoint). */
  def run(spark: SparkSession, inputDir: String, stats: Seq[SourceStats],
      outDir: String, checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val clips = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[ClipRow]].schema)
      .parquet(inputDir)
      .as[ClipRow]
    val s1 = Stage1(spark, clips)
    val decisions: Dataset[DecisionRow] = Stage2(spark, s1, stats)
    decisions.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Windowed per-source keep-rate monitoring with a watermark —
    * event time is synthesized from the clip id's year (the corpus has
    * no ingest timestamp; production would use one). Late rows beyond
    * the watermark are dropped by the engine. */
  def keepRateByWindow(spark: SparkSession,
      decisions: DataFrame): DataFrame = {
    import spark.implicits._
    decisions
      .withColumn("event_ts",
        to_timestamp(concat(col("year"), lit("-01-01"))))
      .withWatermark("event_ts", "365 days")
      .groupBy(window(col("event_ts"), "3650 days"), col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept"))
  }
}
