package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-bucketing both sides of a recurring join
  * on the same key and bucket count makes the join shuffle-free (the
  * bucketed scan already satisfies the required hash distribution).
  * At 10^12 rows this is how the gold×decisions eval join (J2) and any
  * repeated clip_id-keyed join avoid moving the corpus — the exchange is
  * paid ONCE at write time, then every subsequent join is co-located.
  *
  * Spark's native bucketing needs a catalog table (saveAsTable); the
  * in-memory/derby catalog works in local mode, a Hive/Glue/Unity
  * catalog in production. `lineage.Checkpoint` implements the same idea
  * manually (pmod(hash(id))) where a catalog is unavailable.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts the plan contains NO Exchange on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True if the physical plan contains any shuffle exchange. String
    * match over the explain output so the check sees through the
    * AdaptiveSparkPlanExec wrapper (whose tree isn't expanded until
    * execution). */
  def hasExchange(df: DataFrame): Boolean =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
      .contains("Exchange hashpartitioning")
}
