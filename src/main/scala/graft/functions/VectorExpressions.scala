package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector-similarity hot loops —
 * same rationale as HashExpressions: the `zip_with`/`aggregate`
 * compositions are interpreted per element per plane, these are one tight
 * JVM pass per row.
 *
 * Inputs are `array<float>` embedding columns (the harness schema);
 * float math is widened to double exactly as the builtin composition
 * does, so results are interchangeable where both paths exist.
 */
object VectorExpressions {

  private def mix(z0: Long): Long = {
    var z = z0 * 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL; z ^= (z >>> 31)
    z
  }

  /** Deterministic hyperplane component in [-1, 1) for (plane, dim) —
    * derived by hashing, no RNG state, identical on every executor. */
  private[graft] def planeComponent(plane: Int, dim: Int): Double = {
    val h = mix(plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong + 1)
    val m = java.lang.Math.floorMod(h, 2000001L) - 1000000L
    m.toDouble / 1000000.0
  }

  /** Cosine similarity of two float arrays: dot, |a|, |b| in one pass.
    * Returns 0.0 when either norm is 0 (matching Similarity.cosine). */
  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_similarity"

    override def checkInputDataTypes(): TypeCheckResult = ExprChecks.all(
      ExprChecks.requireArrayOf(prettyName, left.dataType, FloatType),
      ExprChecks.requireArrayOf(prettyName, right.dataType, FloatType))

    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Double.valueOf(VectorKernels.cosineSimilarity(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

    // Static-call codegen: keeps the stage inside WholeStageCodegen while
    // the loop runs as one JIT-compiled kernel method.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (x, y) =>
        s"graft.functions.VectorKernels.cosineSimilarity($x, $y)")

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Sign-LSH bucket of a float vector: `planes` hyperplane projections in
    * one pass over the vector (accumulate all projections per element),
    * one sign bit each. `planeOffset` selects an independent plane set per
    * band. */
  case class SignLshBucket(child: Expression, planes: Int, planeOffset: Int)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "sign_lsh_bucket"

    override def checkInputDataTypes(): TypeCheckResult = ExprChecks.all(
      ExprChecks.requireArrayOf(prettyName, child.dataType, FloatType),
      ExprChecks.requireParam(prettyName, planes >= 1 && planes <= 63,
        s"planes must be in [1, 63] (sign bits of one long), got $planes"))

    override def nullSafeEval(input: Any): Any =
      java.lang.Long.valueOf(VectorKernels.signLshBucket(
        input.asInstanceOf[ArrayData], planes, planeOffset))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.VectorKernels.signLshBucket($c, $planes, $planeOffset)")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // ---- Column surfaces ----------------------------------------------

  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sign_lsh_bucket(v: Column, planes: Int, planeOffset: Int = 0): Column =
    ColumnBridge.column(SignLshBucket(ColumnBridge.expression(v), planes, planeOffset))
}
