package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Bucketing

class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pre-bucketed join is shuffle-free and equals the plain join") {
    val a = spark.range(20000).select($"id".as("k"), ($"id" % 7).as("va"))
    val b = spark.range(0, 20000, 2).select($"id".as("k"), ($"id" % 5).as("vb"))

    // plain non-broadcast join shuffles at least one side
    val plain = a.join(b, "k")
    val plainMerge = a.hint("merge").join(b.hint("merge"), "k")
    assert(Bucketing.hasExchange(plainMerge))

    Bucketing.writeBucketed(a, "bspec_a", "k", 8)
    Bucketing.writeBucketed(b, "bspec_b", "k", 8)
    val bucketed = Bucketing.bucketedJoin(spark, "bspec_a", "bspec_b", "k")
      .hint("merge") // forbid broadcast so the bucketed scan is the proof
    assert(!Bucketing.hasExchange(bucketed),
      bucketed.queryExecution.executedPlan.toString)

    val expect = plain.agg(count(lit(1)), sum($"va" * $"vb")).head
    val got = bucketed.agg(count(lit(1)), sum($"va" * $"vb")).head
    assert(got.getLong(0) == expect.getLong(0))
    assert(got.getLong(1) == expect.getLong(1))
  }
}
