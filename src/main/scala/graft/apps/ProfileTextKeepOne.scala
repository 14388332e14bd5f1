package graft.apps

import org.apache.spark.sql.SparkSession

/** One-shot fresh-JVM timing of the fuzzy-dedup keep chain (tuning
  * tool). Usage: scripts/run.sh graft.apps.ProfileTextKeepOne [sfDir] */
object ProfileTextKeepOne {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0 = System.nanoTime()
    val n = graft.operators.Dedup.keepPolicy(docs, "doc_id",
      graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 8, threshold = 0.5, maxShingleDf = 200L)
        .select($"a", $"b")).count()
    println(f"one-shot keep chain: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    spark.stop()
  }
}
