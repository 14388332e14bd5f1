package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static bridge shared by interpreted eval and generated code. */
object SimHashUtil {
  def hash64(s: UTF8String, n: Int): Long =
    graft.operators.Dedup.simHash64(s.toString, n)
}

/** Native Catalyst 64-bit SimHash over a string column (shingle size `n`
  * fixed at plan time). The third codegen expression after `alpha_ratio`
  * and `vec_dot`: hashing every row through a typed `Dataset.map` costs
  * an encoder round-trip (InternalRow → ClipRow → InternalRow) and
  * breaks whole-stage codegen at both edges; as an expression the
  * scan → shingle-hash → project pipeline stays in one generated stage
  * and the text column is pruned immediately after this projection. */
case class SimHash64Expr(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string argument and shingle n >= 1, got " +
        s"${child.dataType}, n=$n")

  override def dataType: DataType = LongType

  // Null-TOLERANT, non-nullable: null text hashes like an empty shingle
  // set (0L), matching the typed-map formulation this replaced. A
  // nullable output here is a measured 1.6x pessimization: the
  // downstream chunk join derives its keys from this value, Catalyst
  // pushes `isnotnull(simhash64(text))` into the SCAN filter, and the
  // hash evaluates twice per row per join leg (seen in the r2 bench:
  // 1.29 s → 2.13 s).
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHashUtil.hash64(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = childGen.code + code"""
      final long ${ev.value} = ${childGen.isNull} ? 0L :
        graft.functions.SimHashUtil.hash64(${childGen.value}, $n);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression):
      SimHash64Expr = copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHashOps {
  /** Register `simhash64(text[, n])` on a session (idempotent); `n`
    * must be a literal (it parameterizes the generated code). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => {
        val n = if (exprs.length > 1) {
          // n parameterizes the generated code, so it must be a literal;
          // a non-foldable arg would otherwise die resolving with an
          // opaque eval-on-unbound-expression error
          if (!exprs(1).foldable)
            throw new IllegalArgumentException(
              "simhash64(text, n): n must be a literal (foldable) integer, " +
                s"got ${exprs(1).sql}")
          exprs(1).eval().asInstanceOf[Number].intValue()
        } else 4
        SimHash64Expr(exprs(0), n)
      }, "built-in")

  /** Column-API form; requires [[register]] on the session first. */
  def simhash64(text: Column, n: Int = 4): Column =
    org.apache.spark.sql.functions.call_function("simhash64", text,
      org.apache.spark.sql.functions.lit(n))
}
