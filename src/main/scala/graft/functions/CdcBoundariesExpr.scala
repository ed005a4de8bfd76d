package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundary positions (FastCDC-lite): the 0-based
  * end positions where the Rabin–Karp hash of the trailing `w`-char
  * window satisfies `H % div == 0`. A boundary is decided ONLY by the
  * `w` characters ending at it, so an edit anywhere in a document can
  * perturb at most the boundaries whose windows overlap the edit — all
  * chunks outside that radius keep their identity, which is what makes
  * chunk-level dedup robust to insertions where fixed-offset chunking
  * is not. Expected chunk length ≈ `div` chars.
  *
  * All arithmetic is reduced mod M = 1,000,003 (prime, 2^20-ish) at
  * every step, so H also equals the TERM-WISE-mod sum
  * Σ (c_{i−j}·(B^j mod M)) mod M — the form a SQL oracle (DuckDB list
  * comprehension over the window) can restate exactly in 64-bit
  * integers. Single compiled pass, O(n) time; `doGenCode` emits a
  * static kernel call so the expression stays inside whole-stage
  * codegen (SURVEY.md §7.4 kernel discipline). */
case class CdcBoundariesExpr(child: Expression, w: Int, div: Long)
    extends UnaryExpression {
  require(w > 0 && div > 0, "w and div must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_boundaries"

  private val Base = CdcBoundariesExpr.Base
  private val Mod = CdcBoundariesExpr.Mod
  private lazy val Bw: Long = { // Base^(w-1) mod Mod, for the remove step
    var r = 1L; var i = 0
    while (i < w - 1) { r = r * Base % Mod; i += 1 }
    r
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.cdcBoundaries(
      input.asInstanceOf[UTF8String], w, Base, Mod, div, Bw)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.cdcBoundaries($v, $w, ${Base}L, ${Mod}L, ${div}L, ${Bw}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcBoundariesExpr =
    copy(child = newChild)
}

object CdcBoundariesExpr {
  /** Small enough that every intermediate product fits a long even for
    * arbitrary UTF-16 code units (65535·M·B^0 and M·B both ≪ 2^63). */
  final val Base = 257L
  final val Mod = 1000003L

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    RegisterOnce(spark, "CdcBoundariesExpr")(doRegister(spark))
  private def doRegister(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cdc_boundaries",
      { exprs =>
        require(exprs.length == 3, "graft_cdc_boundaries(text, w, div)")
        CdcBoundariesExpr(exprs.head, ExprLits.litInt(exprs(1), "w"),
          ExprLits.litLong(exprs(2), "div"))
      },
      "built-in")
}
