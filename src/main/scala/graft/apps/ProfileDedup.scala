package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Micro-profiler for the MinHash paths (VERDICT r1 item 6: OPH measured
  * SLOWER than the k-perm signature it should beat). Times, per path:
  * signature computation alone, candidate-pair counts before the
  * distinct, and the full query — so "densification inflates candidates"
  * vs "signature cost" vs "host noise" are separable.
  * Usage: scripts/run.sh graft.apps.ProfileDedup [sfDir] [reps]
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", $"text").cache()
    val nDocs = docs.count()
    println(s"docs=$nDocs")

    // --- signature cost alone (row-local map, count sink)
    def sigTime(oph: Boolean): Double = {
      val fn: Iterable[String] => Array[Long] =
        if (oph) Dedup.signatureOph(_, 64, 16) else Dedup.signature(_, 64)
      val t0 = System.nanoTime()
      docs.as[(Long, String)].map { case (_, t) =>
        fn(graft.lid.TextStats.shingles(t, 5)).length
      }.agg(sum("value")).head
      (System.nanoTime() - t0) / 1e9
    }
    // --- candidate pairs BEFORE the distinct (bucket fan-out proxy)
    def candCount(oph: Boolean): (Long, Long) = {
      val fn: Iterable[String] => Array[Long] =
        if (oph) Dedup.signatureOph(_, 64, 16) else Dedup.signature(_, 64)
      val sigs = docs.as[(Long, String)].map { case (id, t) =>
        Dedup.SigRow(id, fn(graft.lid.TextStats.shingles(t, 5)))
      }
      val buckets = sigs.select($"id",
        posexplode(transform(sequence(lit(0), lit(15)),
          b => hash(slice($"sig", b * 4 + 1, lit(4)), b)))
          .as(Seq("band", "bucket")))
      val pre = buckets.select($"band", $"bucket", $"id".as("a"))
        .join(buckets.select($"band", $"bucket", $"id".as("b")),
          Seq("band", "bucket"))
        .filter($"a" < $"b")
      (pre.count(), pre.select($"a", $"b").distinct().count())
    }
    (1 to reps).foreach { r =>
      val tk = sigTime(oph = false); val to = sigTime(oph = true)
      println(f"rep$r sig: kperm=$tk%.2fs oph=$to%.2fs")
    }
    val (preK, postK) = candCount(oph = false)
    val (preO, postO) = candCount(oph = true)
    println(s"candidates kperm: pre=$preK distinct=$postK")
    println(s"candidates oph:   pre=$preO distinct=$postO")
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      Dedup.minHashLsh(docs, "doc_id", "text", n = 5, numHashes = 64,
        bands = 16, threshold = 0.5, oph = false).count()
      val tk = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      Dedup.minHashLsh(docs, "doc_id", "text", n = 5, numHashes = 64,
        bands = 16, threshold = 0.5, oph = true).count()
      val to = (System.nanoTime() - t1) / 1e9
      println(f"rep$r full: kperm=$tk%.2fs oph=$to%.2fs")
    }
    spark.stop()
  }
}
