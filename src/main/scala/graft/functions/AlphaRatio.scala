package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass helper shared by interpreted eval and generated code. */
object AlphaRatioUtil {
  /** #letters / #chars — exactly the reference's
    * len(re.sub(r"[\W_\d]+","",s))/len(s) (Python \w = letters, digits,
    * underscore; removing non-word + '_' + digits keeps letters only).
    * Counting beats running a regex in the hot path. */
  def compute(s: UTF8String): Double = {
    if (s == null) return 0.0
    val str = s.toString
    if (str.isEmpty) return 0.0
    var letters = 0
    var i = 0
    while (i < str.length) {
      if (Character.isLetter(str.charAt(i))) letters += 1
      i += 1
    }
    letters.toDouble / str.length
  }
}

/** Native Catalyst expression for the alphabetical ratio (SURVEY.md §4
  * "custom Expression" tier): stays inside whole-stage codegen via
  * `doGenCode` emitting a static call — no UDF serialization, no
  * interpreter fallback on the hot path. */
case class AlphaRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"alpha_ratio requires a string argument, got ${child.dataType}")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    AlphaRatioUtil.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AlphaRatioUtil.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): AlphaRatio =
    copy(child = newChild)

  override def prettyName: String = "alpha_ratio"
}

object AlphaRatio {
  /** Register `alpha_ratio` on a session (SQL + Column API via
    * [[alphaRatio]]). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "alpha_ratio", exprs => AlphaRatio(exprs.head), "built-in")

  /** Column-API form; requires [[register]] on the session first. */
  def alphaRatio(c: Column): Column =
    org.apache.spark.sql.functions.call_function("alpha_ratio", c)
}
