package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: dump the formatted physical plan of selected
  * SparkEntry queries (or all). Usage:
  *   scripts/run.sh graft.Explain <sfDir> [query ...]
  * Greps worth running on the output: PushedFilters, ReadSchema,
  * BroadcastHashJoin, WholeStageCodegen, Exchange.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
    else SparkEntry.queries.keys.toSeq.sorted.filterNot(_.startsWith("pipeline"))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      try println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Exception => println(s"explain failed: $e") }
    }
    spark.stop()
  }
}
