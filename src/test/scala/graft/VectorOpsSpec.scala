package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  lazy val df = {
    VectorOps.register(spark)
    Seq(
      (1L, Array(1.0, 2.0, 3.0), Array(4.0, -5.0, 6.0)),
      (2L, Array(0.0, 0.0), Array(0.0, 0.0)),
      (3L, Array(1.5), Array(2.0))
    ).toDF("id", "a", "b")
  }

  test("vec_dot matches the higher-order-function formulation") {
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val r = df.select($"id", VectorOps.dot($"a", $"b").as("native"),
      hof.as("hof")).collect()
    r.foreach(row => assert(row.getDouble(1) == row.getDouble(2)))
    assert(r.find(_.getLong(0) == 1L).get.getDouble(1) == 4.0 - 10.0 + 18.0)
  }

  test("null array yields null; null elements contribute zero") {
    val withNulls = Seq(
      (1L, Some(Seq(Some(1.0), None, Some(3.0))), Some(Seq(Some(2.0), Some(5.0), Some(4.0)))),
      (2L, None, Some(Seq(Some(1.0))))
    ).toDF("id", "a", "b")
      .select($"id", $"a".cast("array<double>").as("a"),
        $"b".cast("array<double>").as("b"))
    val r = withNulls.select($"id", VectorOps.dot($"a", $"b").as("d"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getDouble(1))).toMap
    assert(r(1L) == 2.0 + 12.0) // middle element null → skipped
    assert(r(2L) == null)
  }

  test("mismatched lengths yield NULL, never a silent truncation") {
    val mism = Seq(
      (1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)), // 3 vs 2
      (2L, Seq(1.0, 2.0), Seq(3.0, 4.0))
    ).toDF("id", "a", "b")
      .select($"id", $"a".cast("array<double>").as("a"),
        $"b".cast("array<double>").as("b"))
    val r = mism.select($"id", VectorOps.dot($"a", $"b").as("d")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getDouble(1)))
      .toMap
    assert(r(1L) == null) // a plausible-but-wrong cosine would corrupt dedup
    assert(r(2L) == 11.0)
    // same contract for the MinHash estimator expression
    val sigs = Seq(
      (1L, Seq(7L, 8L, 9L), Seq(7L, 1L)), // 3 vs 2 -> null
      (2L, Seq(7L, 8L, 9L), Seq(7L, 8L, 0L)) // 2 equal slots
    ).toDF("id", "a", "b")
      .select($"id", $"a".cast("array<bigint>").as("a"),
        $"b".cast("array<bigint>").as("b"))
    val e = sigs.select($"id", VectorOps.eqCount($"a", $"b").as("c")).collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) null else x.getInt(1)))
      .toMap
    assert(e(1L) == null)
    assert(e(2L) == 2)
  }

  test("vec_eq_count stays inside whole-stage codegen") {
    VectorOps.register(spark)
    val vecs = spark.range(100).select($"id",
      transform(sequence(lit(0), lit(7)), i => i + $"id").as("a"))
    val plan = vecs.select(VectorOps.eqCount($"a", $"a").as("c"))
      .queryExecution.executedPlan
    val code = org.apache.spark.sql.execution.debug.codegenString(plan)
    assert(code.contains("EqCountUtil.eqCount"),
      "vec_eq_count fell back to interpreted eval")
  }

  test("vec_dot works from SQL and rejects wrong types") {
    df.createOrReplaceTempView("vo")
    val viaSql = spark.sql("SELECT vec_dot(a, b) AS d FROM vo WHERE id = 3")
      .head().getDouble(0)
    assert(viaSql == 3.0)
    val err = intercept[Exception] {
      spark.sql("SELECT vec_dot(id, a) FROM vo").collect()
    }
    assert(err.getMessage.toLowerCase.contains("vec_dot"))
  }

  test("vec_dot stays inside whole-stage codegen") {
    VectorOps.register(spark)
    // range-based source so ConvertToLocalRelation can't fold the plan away
    val vecs = spark.range(100).select($"id",
      transform(sequence(lit(0), lit(7)), i => i.cast("double") + $"id")
        .as("a"))
    val plan = vecs.select(VectorOps.dot($"a", $"a").as("d"))
      .queryExecution.executedPlan
    val formatted = plan.toString
    // the `*(n)` prefix marks a WholeStageCodegen span in simpleString
    assert(formatted.linesIterator.exists(l =>
      l.contains("vec_dot") && l.trim.startsWith("*")), formatted)
    // and the generated code actually calls the static helper
    val code = org.apache.spark.sql.execution.debug
      .codegenString(plan)
    assert(code.contains("DotUtil.dot"), "vec_dot fell back to interpreted eval")
  }
}
