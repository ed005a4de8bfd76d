package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** KLL quantile sketch (Karnin–Lang–Liberty 2016, the datasketches-java
  * implementation Spark already ships) as a TRUE mergeable aggregate —
  * the quantile member of the library's composable-sketch family
  * (Roaring64 bitmaps, HLL, KMV bottom-k). `approx_percentile` is also
  * a sketch inside, but it never exposes its state; these expressions
  * return the SERIALIZED sketch, so group-level sketches compose into a
  * corpus-level one with [[KllMergeAggExpr]] without touching the data
  * again — the property a 100 TB profile store needs (per-partition /
  * per-day sketches rolled up on demand).
  *
  * 100 TB properties: O(k·log(n/k)) state per group (k=200 ≈ a few KB),
  * update amortized O(1), merge linear in sketch size; partials combine
  * map-side like any TypedImperativeAggregate. Rank error ≤
  * `KllDoublesSketch.getNormalizedRankError(k, false)` with 99%
  * confidence — the s11 query pins estimates inside the exact rank
  * envelope at 2× that bound.
  */
object Kll {
  def empty(k: Int): KllDoublesSketch = KllDoublesSketch.newHeapInstance(k)

  def fromBytes(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  /** 99%-confidence two-sided normalized rank error for parameter k. */
  def rankError(k: Int): Double =
    org.apache.datasketches.kll.KllSketch.getNormalizedRankError(k, false)
}

/** graft_kll(value, k) → binary: the serialized KLL doubles sketch of
  * the group's non-null values. */
case class KllAggExpr(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  require(k >= 8, s"need k >= 8, got $k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): KllDoublesSketch = Kll.empty(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    child.eval(input) match {
      case null => ()
      case d: java.lang.Double => buffer.update(d.doubleValue)
      case f: java.lang.Float => buffer.update(f.doubleValue)
      case d: org.apache.spark.sql.types.Decimal => buffer.update(d.toDouble)
      case n: java.lang.Number => buffer.update(n.doubleValue)
      case other => throw new IllegalArgumentException(
        s"graft_kll expects a numeric value, got ${other.getClass.getName}")
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(storageFormat: Array[Byte]): KllDoublesSketch = {
    // heapified compact images are read-only in datasketches 6; merge
    // into a fresh updatable heap sketch so later update() calls work
    val s = Kll.empty(k)
    s.merge(Kll.fromBytes(storageFormat))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllAggExpr =
    copy(child = newChild)
}

/** graft_kll_merge(sketchBinary, k) → binary: union of already-built
  * sketches from their serialized images ALONE — the rollup face
  * (group → corpus, shard → table) that needs no second data pass. */
case class KllMergeAggExpr(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  require(k >= 8, s"need k >= 8, got $k")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_merge"

  override def createAggregationBuffer(): KllDoublesSketch = Kll.empty(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    child.eval(input) match {
      case null => ()
      case b: Array[Byte] => buffer.merge(Kll.fromBytes(b))
      case other => throw new IllegalArgumentException(
        s"graft_kll_merge expects a serialized sketch, got ${other.getClass.getName}")
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(storageFormat: Array[Byte]): KllDoublesSketch = {
    val s = Kll.empty(k)
    s.merge(Kll.fromBytes(storageFormat))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAggExpr =
    copy(child = newChild)
}

/** graft_kll_quantiles(sketchBinary, array(q…)) → array<double>: the
  * INCLUSIVE-rank quantile estimates (each an actual retained data
  * value, so rank-envelope guards are meaningful). Null for an empty
  * sketch. Scalar — runs once per GROUP row, never per data row. */
case class KllQuantilesExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with BinaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantiles"

  override protected def nullSafeEval(sketchBytes: Any, qsArr: Any): Any = {
    val sk = Kll.fromBytes(sketchBytes.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) return null
    val qs = qsArr.asInstanceOf[ArrayData].toDoubleArray()
    new GenericArrayData(qs.map(q => sk.getQuantile(q): Any))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantilesExpr =
    copy(left = newLeft, right = newRight)
}

object KllAgg {
  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "KllAgg")(doRegister(spark))
  private def doRegister(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_kll",
      { exprs =>
        require(exprs.length == 2, "graft_kll(value, k)")
        KllAggExpr(exprs.head, ExprLits.litInt(exprs(1), "k")).toAggregateExpression()
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_kll_merge",
      { exprs =>
        require(exprs.length == 2, "graft_kll_merge(sketch, k)")
        KllMergeAggExpr(exprs.head, ExprLits.litInt(exprs(1), "k")).toAggregateExpression()
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_kll_quantiles",
      { exprs =>
        require(exprs.length == 2, "graft_kll_quantiles(sketch, qs)")
        KllQuantilesExpr(exprs.head, exprs(1))
      }, "built-in")
  }
}
