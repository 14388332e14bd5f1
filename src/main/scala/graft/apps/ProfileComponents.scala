package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Micro-profiler for the components/keep-policy tier (VERDICT r2 item
  * 4: `dedup_audio_keep` spent 4.7 s on 550 rows — per-round job
  * overhead, not data). Separates: corpus synth + audio near-dup,
  * components alone on planted chains (forces multi-round propagation),
  * and the fused keepPolicy — so round-count wins are visible in
  * isolation. Usage: scripts/run.sh graft.apps.ProfileComponents [reps]
  */
object ProfileComponents {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    (1 to reps).foreach { rep =>
      println(s"rep $rep")
      // long chains (length 16 within each 20-id block) — the
      // adversarial diameter case for min-label propagation
      val chain = spark.range(0, 4000).toDF("a")
        .filter($"a" % 20 < 15)
        .select($"a", ($"a" + 1).as("b"))
      time("components(chains d=16)") {
        Dedup.components(chain).agg(sum($"label")).head
      }
      // audio keep end-to-end (the bench query at 550 rows)
      val corpus = time("audio corpus+nearDup") {
        val c = graft.SparkEntry.audioDedupCorpus(spark, 500L)
        (c, Dedup.audioNearDup(c, "id", "bytes", "codec"))
      }
      time("keepPolicy(audio pairs)") {
        Dedup.keepPolicy(corpus._1, "id", corpus._2).count()
      }
    }
    spark.stop()
  }
}
