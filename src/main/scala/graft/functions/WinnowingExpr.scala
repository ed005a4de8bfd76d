package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
  * every k-char gram with a Rabin-Karp ROLLING hash (one multiply-add
  * per character, not per gram·char), then keep the minimum hash of each
  * sliding window of `w` consecutive grams (rightmost on ties), distinct.
  *
  * Guarantee: two documents sharing any substring of length ≥ w + k - 1
  * share at least one fingerprint — which is what makes fingerprints a
  * bucketable join key for containment/overlap detection at corpus
  * scale (candidates only ever form under a shared fingerprint).
  *
  * Single compiled pass, O(n) time, O(w) extra space via a monotone
  * deque — the same kernel discipline as the MinHash/SimHash
  * expressions (SURVEY.md §7.4); `doGenCode` calls the static kernel so
  * the expression stays inside whole-stage codegen. */
case class WinnowingExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnowing"

  private val B = 0x100000001b3L // rolling base (FNV prime)
  private lazy val Bk: Long = { // B^(k-1) for the remove step
    var r = 1L; var i = 0
    while (i < k - 1) { r *= B; i += 1 }
    r
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.winnowing(input.asInstanceOf[UTF8String], k, w, Bk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.winnowing($v, $k, $w, ${Bk}L)")

  override protected def withNewChildInternal(newChild: Expression): WinnowingExpr =
    copy(child = newChild)
}

object WinnowingExpr {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    RegisterOnce(spark, "WinnowingExpr")(doRegister(spark))
  private def doRegister(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnowing",
      { exprs =>
        require(exprs.length == 3, "graft_winnowing(text, k, w)")
        WinnowingExpr(exprs.head, ExprLits.litInt(exprs(1), "k"),
          ExprLits.litInt(exprs(2), "w"))
      },
      "built-in")
}
