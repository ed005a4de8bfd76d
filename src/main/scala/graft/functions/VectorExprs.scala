package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Compiled vector/sketch kernels for the pipeline operators.
  *
  * Same rationale as MinHashSignatureExpr (SURVEY.md §7.4): the
  * declarative `aggregate`/`zip_with` formulations of per-element math
  * run on interpreted higher-order-function machinery — fine for one
  * pass over a few elements, pathological when the expression sits in a
  * join hot path (p07 scored millions of candidate pairs through an
  * interpreted 64-dim cosine fold: 16 s at sf0.1, sub-second compiled).
  *
  * Each expression implements `doGenCode` as a direct call into the
  * static VectorKernels loop — inside whole-stage codegen, no boxing,
  * no interpreted dispatch (the CodegenFallback versions paid a per-row
  * virtual eval + Object boxing around the JIT'd loop). Parameter
  * tables (weights, permutation coefficients) ride along as codegen
  * reference objects.
  *
  * Accumulation order in cosine matches the declarative fold (sequential
  * left-to-right from 0.0, float widened to double per element) so
  * results are bit-identical and the DuckDB oracle comparison is
  * unaffected; zero-norm inputs yield 0.0 instead of NaN.
  */
object splitmix {
  def apply(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

/** cosine(a, b) over two array<float> columns, accumulated in double. */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprLits.floatArrayCheck(prettyName,
      "left" -> left.dataType, "right" -> right.dataType)

  override def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

/** Multi-table hyperplane-LSH bucket ids for an array<float> embedding:
  * element t of the result is table t's bucket — the sign pattern of
  * `planes` pseudo-random projections. Weights are deterministic
  * functions of (seed, table, plane, dim) via splitmix64, uniform in
  * [-1, 1], precomputed once per operator instance. */
case class HyperplaneBucketsExpr(child: Expression, dims: Int, planes: Int,
                                 tables: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_hyperplane_buckets"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprLits.floatArrayCheck(prettyName, "embedding" -> child.dataType)

  // weights(t*planes + p)(d) ∈ [-1, 1]
  private lazy val weights: Array[Array[Double]] =
    Array.tabulate(tables * planes) { tp =>
      Array.tabulate(dims) { d =>
        val h = splitmix(seed + tp.toLong * 0x9E3779B97F4A7C15L + d * 0xff51afd7ed558ccdL)
        (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
      }
    }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneBuckets(input.asInstanceOf[ArrayData],
      dims, planes, tables, weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.hyperplaneBuckets($v, $dims, $planes, $tables, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucketsExpr =
    copy(child = newChild)
}

/** 63-bit SimHash over an array<string> token column: one XXH64 per
  * token, then 63 sign votes from odd-multiplier affine permutations of
  * that hash (a balanced bit family, same construction as the MinHash
  * permutations). Bit 63 unused so the value stays a positive long. */
case class SimHash64Expr(child: Expression, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  private lazy val (as, bs): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(63)(j => splitmix(seed * 0x100000001b3L + j) | 1L)
    val b = Array.tabulate(63)(j => splitmix(seed ^ (j * 0xc2b2ae3d27d4eb4fL)))
    (a, b)
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.simhash64(input.asInstanceOf[ArrayData], seed, as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("simhashAs", as, "long[]")
    val bRef = ctx.addReferenceObj("simhashBs", bs, "long[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.simhash64($v, ${seed}L, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** Per-vector int8 quantization scale of an array<float> embedding. */
case class Int8ScaleExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_int8_scale"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprLits.floatArrayCheck(prettyName, "embedding" -> child.dataType)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.int8Scale(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VectorKernels.int8Scale($v)")
  override protected def withNewChildInternal(newChild: Expression): Int8ScaleExpr =
    copy(child = newChild)
}

/** Cosine of an embedding against its int8 quantize→dequantize round
  * trip — the quantization-quality metric, computed in one fused pass
  * (the quantized array never materializes). */
case class Int8CosQExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_int8_cosq"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprLits.floatArrayCheck(prettyName, "embedding" -> left.dataType)
  override def nullSafeEval(emb: Any, scale: Any): Any =
    VectorKernels.int8CosQ(emb.asInstanceOf[ArrayData], scale.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.int8CosQ($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8CosQExpr =
    copy(left = l, right = r)
}

/** |a ∩ b| of two SORTED-ascending array<long> by linear merge — the
  * allocation-free closure kernel of [[graft.pipeline.Graphs]]'
  * triangle count (array_intersect hashes + materializes an output
  * array per pair when only the count is needed). Inputs MUST be
  * sorted ascending (the adjacency build sorts once). */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"
  // Analysis-time guard, same hazard class the r8 ADVICE caught in
  // graft_vec_sum: the kernel reads 8-byte long slots, so an array<int>
  // input (integer literals!) would stride wrong under UnsafeArrayData
  // and return silently garbage counts. Element NULLABILITY cannot be
  // pinned here (lambda-built arrays are marked nullable even when
  // value-free of nulls), so actual null elements are rejected at
  // runtime by the kernel instead of read as garbage zeros.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.VectorKernels.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCountExpr =
    copy(left = l, right = r)
}

/** Mean |x - dequant(x)| of the int8 round trip. */
case class Int8MaeQExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_int8_maeq"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprLits.floatArrayCheck(prettyName, "embedding" -> left.dataType)
  override def nullSafeEval(emb: Any, scale: Any): Any =
    VectorKernels.int8MaeQ(emb.asInstanceOf[ArrayData], scale.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.int8MaeQ($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Int8MaeQExpr =
    copy(left = l, right = r)
}

/** [1, x, upper-triangle xᵢxⱼ] second-moment vector of an embedding —
  * the one-scan covariance input for Ann.whiten / p99's whiteness
  * proof (pairs with graft_vec_sum for dims²-bounded aggregate state). */
case class MomentVectorExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_moments"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.momentVector(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.momentVector($v, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): MomentVectorExpr =
    copy(child = newChild)
}

/** [x, ‖x‖₂, 1] accumulator vector — pairs with graft_vec_sum for
  * one-pass grouped centroid + mean-norm + count statistics. */
case class VecStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_stats"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.vecStats(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.vecStats($v, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): VecStatsExpr =
    copy(child = newChild)
}

/** round₆(W·(x−μ)) — the ZCA whitening apply with the d×d literal
  * matrix riding as a codegen reference object. */
case class WhitenApplyExpr(child: Expression, w: Array[Double], mu: Array[Double])
    extends UnaryExpression {
  require(w.length == mu.length * mu.length,
    s"W must be d×d row-major (got ${w.length} vs d=${mu.length})")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    ExprLits.floatArrayCheck(prettyName, "embedding" -> child.dataType)
  override def prettyName: String = "graft_whiten_apply"

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    VectorKernels.whitenApply(input.asInstanceOf[ArrayData], isFloat, w, mu)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("whitenW", w, "double[]")
    val muRef = ctx.addReferenceObj("whitenMu", mu, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorKernels.whitenApply($v, $isFloat, $wRef, $muRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): WhitenApplyExpr =
    copy(child = newChild)
}

object VectorExprs {

  /** Register the kernels as temp SQL functions reachable through the
    * public Column API via `functions.call_function`. */
  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "VectorExprs")(doRegister(spark))
  private def doRegister(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_cosine",
      { exprs =>
        require(exprs.length == 2, "graft_cosine(a, b)")
        CosineSimExpr(exprs(0), exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_hyperplane_buckets",
      { exprs =>
        require(exprs.length == 5, "graft_hyperplane_buckets(emb, dims, planes, tables, seed)")
        HyperplaneBucketsExpr(exprs.head, ExprLits.litInt(exprs(1), "dims"),
          ExprLits.litInt(exprs(2), "planes"), ExprLits.litInt(exprs(3), "tables"),
          ExprLits.litLong(exprs(4), "seed"))
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_simhash64",
      { exprs =>
        require(exprs.length == 2, "graft_simhash64(tokens, seed)")
        SimHash64Expr(exprs.head, ExprLits.litLong(exprs(1), "seed"))
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_sorted_intersect_count",
      { exprs =>
        require(exprs.length == 2, "graft_sorted_intersect_count(a, b)")
        SortedIntersectCountExpr(exprs(0), exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_int8_scale",
      { exprs =>
        require(exprs.length == 1, "graft_int8_scale(emb)")
        Int8ScaleExpr(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_int8_cosq",
      { exprs =>
        require(exprs.length == 2, "graft_int8_cosq(emb, scale)")
        Int8CosQExpr(exprs(0), exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_int8_maeq",
      { exprs =>
        require(exprs.length == 2, "graft_int8_maeq(emb, scale)")
        Int8MaeQExpr(exprs(0), exprs(1))
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_vec_stats",
      { exprs =>
        require(exprs.length == 1, "graft_vec_stats(vec)")
        VecStatsExpr(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_moments",
      { exprs =>
        require(exprs.length == 1, "graft_moments(vec)")
        MomentVectorExpr(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction("graft_whiten_apply",
      { exprs =>
        require(exprs.length == 3, "graft_whiten_apply(vec, wFlat, mu)")
        WhitenApplyExpr(exprs.head,
          ExprLits.litDoubleArray(exprs(1), "wFlat"), ExprLits.litDoubleArray(exprs(2), "mu"))
      }, "built-in")
  }
}
