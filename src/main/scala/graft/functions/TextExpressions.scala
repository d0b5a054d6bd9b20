package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the text-analysis hot loops — same
 * rationale as [[HashExpressions]]: the builtin-composed forms
 * (`filter(tokens, array_contains(profile, _))` per language) are
 * interpreted per token per profile; these score everything in one pass
 * through a static JIT-compiled kernel ([[TextKernels]]), and stay inside
 * WholeStageCodegen via static-call `doGenCode`.
 *
 * The Column-composed forms in [[TextFunctions]] remain the reference
 * semantics; `TextFunctionsSpec` pins both paths to identical results.
 */
object TextExpressions {

  /** Cavnar-Trenkle-style profile argmax over a tokens array<string>. */
  case class LangIdExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def prettyName: String = "lang_id"

    override def checkInputDataTypes(): TypeCheckResult =
      ExprChecks.requireArrayOf(prettyName, child.dataType, StringType)

    override def nullSafeEval(input: Any): Any =
      TextKernels.langId(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.langId($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Stopword hit count (with multiplicity) over a tokens array<string>. */
  case class StopwordHits(child: Expression) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "stopword_hits"

    override def checkInputDataTypes(): TypeCheckResult =
      ExprChecks.requireArrayOf(prettyName, child.dataType, StringType)

    override def nullSafeEval(input: Any): Any =
      java.lang.Integer.valueOf(TextKernels.stopwordHits(input.asInstanceOf[ArrayData]))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.stopwordHits($c)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def lang_id(tokens: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(tokens)))

  def stopword_hits(tokens: Column): Column =
    ColumnBridge.column(StopwordHits(ColumnBridge.expression(tokens)))

  /** Register both as SQL functions on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lang_id", exprs => LangIdExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "stopword_hits", exprs => StopwordHits(exprs.head), "scala_udf")
  }
}
