package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types._
import graft.model.{ClipRow, SourceStats, Stage1Row}

/** JSONL sources/sinks mirroring the reference's edges (SURVEY.md §2.1):
  * S1/S2/S3 line-JSON readers (Spark's JSON source is bz2/gzip
  * transparent exactly like smart_open — .jsonl.bz2 paths just work,
  * though bz2 is non-splittable per file, so production keeps many
  * small-ish files or converts to Parquet at the edge, SURVEY §7.4),
  * S4 prefix/glob expansion (Catalyst InMemoryFileIndex does the
  * listing), S6/S8 compact-JSON sinks, S5/S7 stats JSON read/write.
  *
  * Schemas are always EXPLICIT (never inferred) — schema inference would
  * scan 100 TB twice and can silently widen types.
  */
object JsonlIO {

  /** Explicit schema of the clip table's JSONL form; `bytes` is base64
    * (Spark binary <-> JSON convention). */
  val clipSchema: StructType = StructType(Seq(
    StructField("clip_id", StringType),
    StructField("bytes", BinaryType),
    StructField("sr_hz", IntegerType),
    StructField("dur_ms", IntegerType),
    StructField("codec", StringType),
    StructField("transcript", StringType),
    StructField("orig_lg", StringType)))

  /** S1/S2/S3/S4: read clips from JSONL paths (globs allowed; empty
    * lines and corrupt records are dropped, matching the reference's
    * `if line.strip()` skip — F6). */
  def readClips(spark: SparkSession, paths: String*): Dataset[ClipRow] = {
    import spark.implicits._
    spark.read.schema(clipSchema)
      .option("mode", "DROPMALFORMED")
      .json(paths: _*)
      .as[ClipRow]
  }

  /** S6/S8: one compact JSON object per line. `ignoreNullFields=true`
    * mirrors the reference's cleanup_attrs drop-null behavior (P3). */
  def writeJsonl[T](ds: Dataset[T], path: String,
      dropNulls: Boolean = true): Unit =
    ds.write.mode("overwrite")
      .option("ignoreNullFields", dropNulls.toString)
      .json(path)

  /** S5: read a stats table written by [[writeStats]]. */
  def readStats(spark: SparkSession, path: String): Seq[SourceStats] = {
    import spark.implicits._
    spark.read.schema(implicitly[org.apache.spark.sql.Encoder[SourceStats]]
      .schema).json(path).as[SourceStats].collect().toSeq
  }

  /** S7: stats JSON sink (one object per source, single file — the
    * stats table is tiny by construction). */
  def writeStats(spark: SparkSession, stats: Seq[SourceStats],
      path: String): Unit = {
    import spark.implicits._
    stats.toDS().coalesce(1).write.mode("overwrite")
      .option("ignoreNullFields", "false").json(path)
  }
}
