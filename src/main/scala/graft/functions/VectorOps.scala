package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Single-pass dot product shared by interpreted eval and generated code.
  * Reads `ArrayData` in place (no `toDoubleArray` copy); null elements
  * contribute 0. */
object DotUtil {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}

/** Native Catalyst dot product over two `array<double>` columns (SURVEY.md
  * §4 "custom Expression" tier). Spark's higher-order-function route —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — allocates an intermediate
  * array and evaluates the lambdas interpreted, OUTSIDE whole-stage
  * codegen; on the similarity hot paths (cross-join re-rank, LSH sketch =
  * planes × dim multiplies per row) that interpreter hop dominates. This
  * expression stays inside codegen via a static call and allocates
  * nothing. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType

  // NULL on mismatched lengths (not silent truncation): the HOF
  // formulation this replaced returned NULL via zip_with's null padding,
  // and a plausible-but-wrong cosine would silently corrupt dedup/ANN
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else DotUtil.dot(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.DotUtil.dot($a, $b);
      }""")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

/** Equal-slot counter shared by interpreted eval and generated code. */
object EqCountUtil {
  def eqCount(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }
}

/** Native count of equal slots between two `array<long>` columns — the
  * MinHash similarity estimator (est J = eq slots / k). Replaces the
  * `aggregate(zip_with(...))` HOF route, whose lambdas evaluate
  * interpreted and outside whole-stage codegen (VecDot header note).
  * NULL on mismatched lengths: signatures of different k are a caller
  * bug, not 'slightly dissimilar'. */
case class VecEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_eq_count requires two array<bigint> arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (aa.numElements() != bb.numElements()) null
    else EqCountUtil.eqCount(aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.EqCountUtil.eqCount($a, $b);
      }""")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecEqCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_eq_count"
}

object VectorOps {
  /** Register `vec_dot` + `vec_eq_count` on a session (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_eq_count", exprs => VecEqCount(exprs(0), exprs(1)), "built-in")
  }

  /** Column-API form; requires [[register]] on the session first. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)

  /** Column-API form; requires [[register]] on the session first. */
  def eqCount(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_eq_count", a, b)
}
