package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared literal-extraction and type-guard helpers for the registered
  * expression builders. ONE home for two contracts that were previously
  * copy-pasted per file:
  *
  *  - registration-time literal parameters (sketch sizes, seeds,
  *    patterns) must be literals, rejected loudly otherwise;
  *  - the float-slot kernels (cosine, int8, hyperplane, whiten) read
  *    4-byte elements through `ArrayData.getFloat`, so any non-float
  *    element type — array<double> included — would stride wrong under
  *    UnsafeArrayData and return silently garbage numbers (the hazard
  *    class the r8 ADVICE caught in graft_vec_sum). `floatArrayCheck`
  *    is the analysis-time guard every such expression installs.
  */
private[functions] object ExprLits {

  def litInt(e: Expression, what: String): Int = e match {
    case Literal(v, _) => v.toString.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }

  def litLong(e: Expression, what: String): Long = e match {
    case Literal(v, _) => v.toString.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be a literal, got $other")
  }

  def litStr(e: Expression, what: String): String = e match {
    case Literal(v: UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  def litDoubleArray(e: Expression, what: String): Array[Double] = e match {
    case Literal(a: ArrayData, ArrayType(DoubleType, _)) => a.toDoubleArray()
    case other => throw new IllegalArgumentException(
      s"$what must be a literal array<double>, got $other")
  }

  /** Analysis-time guard for kernels that read 4-byte float slots.
    * Element nullability cannot be pinned here (lambda-built arrays are
    * marked nullable regardless of values), so kernels additionally owe
    * a loud runtime rejection of actual null elements where one matters. */
  def floatArrayCheck(prettyName: String,
                      inputs: (String, DataType)*): TypeCheckResult = {
    val bad = inputs.collectFirst {
      case (argName, dt) if !dt.isInstanceOf[ArrayType] ||
        dt.asInstanceOf[ArrayType].elementType != FloatType =>
        s"$prettyName expects array<float> for $argName, got ${dt.sql}"
    }
    bad.map(TypeCheckResult.TypeCheckFailure).getOrElse(
      TypeCheckResult.TypeCheckSuccess)
  }
}
