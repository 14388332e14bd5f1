package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Zipf-skewed key set: key 0 holds half the rows
  lazy val skewed = spark.range(10000)
    .withColumn("key", when($"id" % 2 === 0, 0L).otherwise(pmod($"id", lit(50))))
    .withColumn("v", $"id" % 7)

  test("salted two-phase aggregation equals direct aggregation") {
    val direct = skewed.groupBy($"key")
      .agg(count(lit(1)).as("n"), sum($"v").as("sv"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val salted = Skew.saltedAgg(skewed,
      key = $"key", salt = Skew.saltFrom($"id", 16),
      partial = Seq(count(lit(1)).as("n"), sum($"v").as("sv")),
      merge = Seq(sum($"n").as("n"), sum($"sv").as("sv")))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(salted == direct)
    // the hot key really was spread: >1 distinct salt for key 0
    val spread = skewed.filter($"key" === 0)
      .select(Skew.saltFrom($"id", 16)).distinct().count()
    assert(spread > 8)
  }

  test("salted join equals plain join") {
    val small = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = skewed.join(small, skewed("key") === small("k"))
      .groupBy($"name").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Skew.saltedJoin(skewed, "key", "id", small, "k", 8)
      .groupBy($"name").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
  }
}
