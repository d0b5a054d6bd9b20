package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType}

/**
 * Input-type validation shared by the custom Catalyst expressions: a
 * mistyped call (e.g. `simhash64(text)` instead of `simhash64(tokens)`)
 * must fail at ANALYSIS time with a clear message, not at runtime with a
 * ClassCastException inside a kernel.
 */
private[functions] object ExprChecks {

  /** Child must be an array of one of `elemTypes`. */
  def requireArrayOf(fn: String, actual: DataType, elemTypes: DataType*): TypeCheckResult =
    actual match {
      case ArrayType(et, _) if elemTypes.contains(et) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$fn requires ${elemTypes.map(t => s"array<${t.simpleString}>").mkString(" or ")}" +
            s" input, got ${other.simpleString}")
    }

  /** Child must be exactly one of `types`. */
  def requireType(fn: String, actual: DataType, types: DataType*): TypeCheckResult =
    if (types.contains(actual)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires ${types.map(_.simpleString).mkString(" or ")} input, " +
        s"got ${actual.simpleString}")

  /** Static (non-column) parameter must satisfy `ok`. */
  def requireParam(fn: String, ok: Boolean, msg: String): TypeCheckResult =
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$fn: $msg")

  def all(checks: TypeCheckResult*): TypeCheckResult =
    checks.find(!_.isSuccess).getOrElse(TypeCheckResult.TypeCheckSuccess)
}
