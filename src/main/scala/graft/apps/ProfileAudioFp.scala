package graft.apps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage timing for dedup_audio_fingerprint (r6 optimization): corpus
  * synthesis, landmark extraction, the distinct+census, and the full
  * operator — separable so "FFT compute" vs "relational tail" is a
  * measurement, not a guess.
  * Usage: scripts/run.sh graft.apps.ProfileAudioFp [reps] */
object ProfileAudioFp {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $tag ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
    }
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep")
      val corpus = graft.SparkEntry.audioMelodyCorpus(spark, 1000L)
      time("corpus.count")(corpus.count())
      val lm = corpus.select($"id", $"codec", $"bytes")
        .as[(Long, String, Array[Byte])]
        .flatMap { case (id, codec, bytes) =>
          val pcm = graft.codec.Audio.decode(codec, bytes)
          val marks = if (pcm == null) null
            else graft.codec.Fft.peakLandmarks(pcm)
          if (marks == null) Iterator.empty
          else marks.iterator.map(m =>
            (id, (m >>> 32).toInt, (m & 0xffffffffL).toInt))
        }.toDF("id", "hash", "t1")
      time("landmarks.count")(lm.count())
      time("landmarks.distinct.count")(lm.distinct().count())
      val lmd = lm.distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      time("persist lmd")(lmd.count())
      val rare = lmd.groupBy($"hash")
        .agg(countDistinct($"id").as("df"))
        .filter($"df" <= 16).select($"hash")
      time("rare census")(rare.count())
      val pruned = lmd.join(rare, Seq("hash"))
      time("pruned.count")(pruned.count())
      val a = pruned.select($"hash", $"id".as("a"), $"t1".as("ta"))
      val b = pruned.select($"hash", $"id".as("b"), $"t1".as("tb"))
      val pairs = a.join(b, Seq("hash")).filter($"a" < $"b")
      time("pairs.count")(pairs.count())
      time("delta groupBy")(pairs
        .groupBy($"a", $"b", ($"ta" - $"tb").as("delta"))
        .agg(count(lit(1)).as("cnt")).count())
      lmd.unpersist()
      time("full operator")(
        graft.operators.Dedup.audioFingerprintMatch(
          graft.SparkEntry.audioMelodyCorpus(spark, 1000L),
          "id", "bytes", "codec", minMatches = 12, maxHashDf = 16).count())
    }
    spark.stop()
  }
}
