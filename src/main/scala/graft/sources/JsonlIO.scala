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
    * drops ALL null fields — only correct when no field is `required`;
    * for the reference's cleanup_attrs semantics use
    * [[writeJsonlCleaned]] (P3). */
  def writeJsonl[T](ds: Dataset[T], path: String,
      dropNulls: Boolean = true): Unit =
    ds.write.mode("overwrite")
      .option("ignoreNullFields", dropNulls.toString)
      .json(path)

  /** Per-field JSON fragment `"name":<value>` with correct escaping —
    * `to_json` on a one-field struct, outer braces stripped. */
  private def fieldJson(name: String): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val j = to_json(struct(col(name).as(name)),
      Map("ignoreNullFields" -> "false"))
    j.substr(lit(2), length(j) - 2)
  }

  /** S6/S8 with the reference's `cleanup_attrs` contract (P3,
    * EL:311-327): REQUIRED keys are emitted even when null (`"lg":null`),
    * non-required null keys are dropped per row, and key order is the
    * fixed schema column order. Spark's JSON sink can't express a
    * per-field null policy, so the line is assembled from per-field
    * `to_json` fragments — all codegen'd column expressions, no UDF, and
    * the sink stays a plain distributed text write. */
  def writeJsonlCleaned(df: DataFrame, path: String,
      required: Set[String]): Unit =
    cleanedJson(df, required).write.mode("overwrite").text(path)

  /** The cleaned JSON line column (factored out for tests). */
  def cleanedJson(df: DataFrame, required: Set[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    val frags = df.schema.fieldNames.toSeq.map { f =>
      if (required.contains(f)) fieldJson(f)
      else when(col(f).isNotNull, fieldJson(f))
    }
    df.select(concat(lit("{"), concat_ws(",", frags: _*), lit("}"))
      .as("value"))
  }

  /** Required attrs of the decisions sink — mirrors the reference's
    * required flags (EL:118-149: id, lg, tp, len, orig_lg; `tp` has no
    * clip analog, `source` stands in as the always-present metadata). */
  val DecisionRequired: Set[String] =
    Set("clip_id", "lg", "source", "len", "orig_lg")

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
