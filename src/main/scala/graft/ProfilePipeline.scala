package graft

import org.apache.spark.sql.SparkSession

/** Phase-by-phase pipeline profiler (tuning tool, not part of the
  * driver contract). Usage: scripts/run.sh graft.ProfilePipeline [n] */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 60000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    phase("model init")(graft.lid.LidModels.default)
    (1 to 2).foreach { pass =>
      println(s"--- pass $pass ---")
      val clips = Pipeline.clips(spark, n, partitions = cpus.toInt)
      phase("gen only (count)")(clips.count())
      val s1 = operators.Stage1(spark, clips)
      s1.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      phase("gen+stage1 (cached)")(s1.count())
      val stats = phase("stage1b collect")(
        operators.Stage1b(spark, s1).collect().toSeq)
      val dec = operators.Stage2(spark, s1, stats)
      phase("stage2 count")(dec.count())
      val scr = operators.Stage3(spark, dec)
      phase("stage2+3 count")(scr.count())
      phase("metrics count")(Pipeline.metrics(spark, dec).count())
      s1.unpersist()
    }
    spark.stop()
  }
}
