package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profiler for the fuzzy-dedup keep chain
  * (tuning tool, not part of the driver contract).
  * Usage: scripts/run.sh graft.apps.ProfileTextKeep [sfDir] */
object ProfileTextKeep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def ph[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$n%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val inv = docs.select($"doc_id".as("id"), $"text").as[(Long, String)]
        .flatMap { case (id, text) =>
          graft.lid.TextStats.shingles(text, 8).iterator.map(s => (id, s))
        }.toDF("id", "shingle").persist()
      ph("inv")(inv.count())
      val rare = inv.groupBy($"shingle").agg(count(lit(1)).as("df"))
        .filter($"df" <= 500).select($"shingle")
      ph("rare")(rare.count())
      val pruned = inv.join(rare, Seq("shingle")).persist()
      ph("pruned")(pruned.count())
      val sz = pruned.groupBy($"id").agg(count(lit(1)).as("sz"))
      val aa = pruned.select($"id".as("a"), $"shingle")
      val bb = pruned.select($"id".as("b"), $"shingle")
      val cand = aa.join(bb, Seq("shingle")).filter($"a" < $"b")
        .groupBy($"a", $"b").agg(count(lit(1)).as("common"))
      ph("cand")(cand.count())
      val pairs = cand
        .join(sz.select($"id".as("a"), $"sz".as("sza")), Seq("a"))
        .join(sz.select($"id".as("b"), $"sz".as("szb")), Seq("b"))
        .withColumn("jaccard",
          round($"common" / ($"sza" + $"szb" - $"common"), 4))
        .filter($"jaccard" >= 0.5).select($"a", $"b", $"jaccard")
      ph("pairs")(pairs.count())
      val ck = ph("checkpoint")(pairs.localCheckpoint(true))
      ph("comp+keep")(graft.operators.Dedup.keepPolicy(
        docs, "doc_id", ck.select($"a", $"b")).count())
      ph("op: jaccard only")(graft.operators.Dedup.ngramJaccard(docs,
        "doc_id", "text", n = 8, threshold = 0.5, maxShingleDf = 500L)
        .count())
      ph("full operator")(graft.operators.Dedup.keepPolicy(docs, "doc_id",
        graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text",
          n = 8, threshold = 0.5, maxShingleDf = 500L)
          .select($"a", $"b")).count())
      inv.unpersist(); pruned.unpersist()
    }
    spark.stop()
  }
}
