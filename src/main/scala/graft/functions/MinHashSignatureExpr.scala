package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native k-slot MinHash signature over an array<string> of shingles.
  *
  * Why a custom Expression (SURVEY.md §7.4): the declarative builtin
  * formulations all hit interpreted higher-order-function machinery —
  * per-slot `array_min(transform(…))` re-evaluates the inlined shingle
  * chain per slot, and a single-pass `aggregate`/`zip_with` fold
  * allocates a k-element array per shingle. This expression is one JIT'd
  * loop: ONE XXH64 per shingle, then k affine permutations
  * `a_j·h + b_j` (a classic universal-family MinHash construction) into
  * a running-min vector — no allocation per element, ~20 ns per
  * shingle·slot less overhead. Measured at sf0.1 (5k docs): 48 s
  * (per-slot builtin) / 21 s (fold builtin) → sub-second here.
  *
  * `doGenCode` emits a direct static call into the VectorKernels loop,
  * so the expression stays inside whole-stage codegen — no per-row
  * interpreted dispatch or boxing around the JIT'd loop.
  */
case class MinHashSignatureExpr(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {

  // input contract: array<string> (AbstractDataType/ExpectsInputTypes are
  // private[sql]; the one call site guarantees the type)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  // per-slot affine permutation parameters, derived from the seed
  // one splitmix64 in the package (graft.functions.splitmix): a private
  // copy drifting a bit from it would silently stop signatures matching
  // historical landed indexes
  private lazy val (as, bs): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(k)(j => splitmix(seed * 0x100000001b3L + j) | 1L) // odd
    val b = Array.tabulate(k)(j => splitmix(seed ^ (j * 0xff51afd7ed558ccdL)))
    (a, b)
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.minhashSignature(input.asInstanceOf[ArrayData], k, seed, as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.minhashSignature($v, $k, ${seed}L, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

object MinHashSignatureExpr {
  /** Register as a temp SQL function so library code can reach the
    * expression through the public Column API:
    * `graft_minhash_sig(shingles, k, seed)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    RegisterOnce(spark, "MinHashSignatureExpr")(doRegister(spark))
  private def doRegister(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig",
      { exprs =>
        require(exprs.length == 3, "graft_minhash_sig(shingles, k, seed)")
        val k = ExprLits.litInt(exprs(1), "k")
        val seed = ExprLits.litLong(exprs(2), "seed")
        MinHashSignatureExpr(exprs.head, k, seed)
      },
      "built-in")
}
