package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.roaringbitmap.longlong.Roaring64NavigableMap

/** True mergeable-bitmap aggregate semantics for the Doris BITMAP type
  * (reference models it as a value loaded via `bitmap_from_array`,
  * `/root/reference/src/gendata.go:170-172`; Doris's BITMAP column +
  * `bitmap_union_count` family is the query-side surface). q31 models
  * the trio with ArrayType columns; these expressions are the SKETCH
  * parity path: a compressed Roaring64 bitmap that aggregates with
  * map-side partial merge — the representation a 100 TB exact-distinct
  * rollup actually needs, because partials are kilobytes instead of
  * shuffled value sets, and re-aggregating saved group sketches
  * (`graft_bitmap_union_agg`) never rescans the fact table.
  *
  * `TypedImperativeAggregate` is the Catalyst-native mechanism: the
  * buffer is a live Roaring64NavigableMap, serialized portably only at
  * partial-exchange boundaries. The HLL side of the same story uses
  * Spark's built-in datasketches functions (`hll_sketch_agg`,
  * `hll_union_agg`) — built-in beats custom where it exists.
  */
object BitmapOps {
  def ser(bm: Roaring64NavigableMap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    bm.serializePortable(new DataOutputStream(bos))
    bos.toByteArray
  }

  def deser(bytes: Array[Byte]): Roaring64NavigableMap = {
    val bm = new Roaring64NavigableMap()
    bm.deserializePortable(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  def count(bytes: Array[Byte]): Long = deser(bytes).getLongCardinality

  def and(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = deser(a); x.and(deser(b)); ser(x)
  }

  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val x = deser(a); x.or(deser(b)); ser(x)
  }

  def contains(bytes: Array[Byte], v: Long): Boolean = deser(bytes).contains(v)
}

/** bitmap_agg(longCol) → serialized Roaring64 bitmap of the distinct
  * values (exact). Partial aggregation merges bitmaps map-side. */
case class BitmapAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap_agg requires a BIGINT column, got ${children.map(_.dataType.catalogString).mkString(", ")}")


  override def createAggregationBuffer(): Roaring64NavigableMap = new Roaring64NavigableMap()

  override def update(buffer: Roaring64NavigableMap, input: InternalRow): Roaring64NavigableMap = {
    val v = child.eval(input)
    if (v != null) buffer.addLong(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Roaring64NavigableMap, other: Roaring64NavigableMap): Roaring64NavigableMap = {
    buffer.or(other); buffer
  }

  override def eval(buffer: Roaring64NavigableMap): Any = BitmapOps.ser(buffer)
  override def serialize(buffer: Roaring64NavigableMap): Array[Byte] = BitmapOps.ser(buffer)
  override def deserialize(storageFormat: Array[Byte]): Roaring64NavigableMap = BitmapOps.deser(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapAggExpr =
    copy(child = newChild)
}

/** bitmap_union_agg(binaryCol) → union of already-serialized bitmaps —
  * re-aggregation of saved per-group sketches without touching raw data. */
case class BitmapUnionAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64NavigableMap]
  with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_union_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap_union_agg requires a BINARY bitmap column, got ${children.map(_.dataType.catalogString).mkString(", ")}")


  override def createAggregationBuffer(): Roaring64NavigableMap = new Roaring64NavigableMap()

  override def update(buffer: Roaring64NavigableMap, input: InternalRow): Roaring64NavigableMap = {
    val v = child.eval(input)
    if (v != null) buffer.or(BitmapOps.deser(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Roaring64NavigableMap, other: Roaring64NavigableMap): Roaring64NavigableMap = {
    buffer.or(other); buffer
  }

  override def eval(buffer: Roaring64NavigableMap): Any = BitmapOps.ser(buffer)
  override def serialize(buffer: Roaring64NavigableMap): Array[Byte] = BitmapOps.ser(buffer)
  override def deserialize(storageFormat: Array[Byte]): Roaring64NavigableMap = BitmapOps.deser(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapUnionAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapUnionAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapUnionAggExpr =
    copy(child = newChild)
}

/** bitmap_count(bin) → exact cardinality. Codegen'd static call. */
case class BitmapCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_count"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap_count requires a BINARY bitmap, got ${children.map(_.dataType.catalogString).mkString(", ")}")

  override def nullSafeEval(input: Any): Any =
    BitmapOps.count(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.BitmapOps.count($v)")
  override protected def withNewChildInternal(newChild: Expression): BitmapCountExpr =
    copy(child = newChild)
}

/** bitmap_and(a, b) → serialized intersection. */
case class BitmapAndExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bitmap_and"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap_and requires two BINARY bitmaps, got ${children.map(_.dataType.catalogString).mkString(", ")}")

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.and(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitmapOps.and($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapAndExpr =
    copy(left = l, right = r)
}

/** bitmap_or(a, b) → serialized union. */
case class BitmapOrExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bitmap_or"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap_or requires two BINARY bitmaps, got ${children.map(_.dataType.catalogString).mkString(", ")}")

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.or(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitmapOps.or($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapOrExpr =
    copy(left = l, right = r)
}

/** bitmap_contains(bin, v) → membership test. */
case class BitmapContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bitmap_contains"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bitmap_contains requires (BINARY bitmap, BIGINT value), got ${children.map(_.dataType.catalogString).mkString(", ")}")

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.contains(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.BitmapOps.contains($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BitmapContainsExpr =
    copy(left = l, right = r)
}

object BitmapExprs {
  /** Register as temp SQL functions (used via `call_function`). */
  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "BitmapExprs")(doRegister(spark))
  private def doRegister(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def one(name: String, f: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, f, "built-in")
    one("graft_bitmap_agg", { e =>
      require(e.length == 1, "graft_bitmap_agg(col)")
      BitmapAggExpr(e.head).toAggregateExpression()
    })
    one("graft_bitmap_union_agg", { e =>
      require(e.length == 1, "graft_bitmap_union_agg(bin)")
      BitmapUnionAggExpr(e.head).toAggregateExpression()
    })
    one("graft_bitmap_count", { e =>
      require(e.length == 1, "graft_bitmap_count(bin)")
      BitmapCountExpr(e.head)
    })
    one("graft_bitmap_and", { e =>
      require(e.length == 2, "graft_bitmap_and(a, b)")
      BitmapAndExpr(e(0), e(1))
    })
    one("graft_bitmap_or", { e =>
      require(e.length == 2, "graft_bitmap_or(a, b)")
      BitmapOrExpr(e(0), e(1))
    })
    one("graft_bitmap_contains", { e =>
      require(e.length == 2, "graft_bitmap_contains(bin, v)")
      BitmapContainsExpr(e(0), e(1))
    })
  }
}
