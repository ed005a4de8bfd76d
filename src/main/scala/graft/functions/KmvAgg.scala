package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** KMV (k-minimum-values / bottom-k) distinct-count sketch — Bar-Yossef
  * et al. 2002, Beyer et al. 2007. State = the k smallest DISTINCT unit
  * hashes seen; estimator ndv̂ = (k−1)/h_(k) once the sketch fills,
  * exact below k. The complement to HLL (`approx_count_distinct`):
  * ~the same accuracy per byte is worse, but the sketch VALUES compose —
  * bottom-k of a union is computable from the two bottom-k sets alone,
  * which also yields set-operation estimates (Jaccard via the union
  * sketch) that HLL registers cannot give exactly.
  *
  * 100 TB properties: O(k) state per group regardless of cardinality;
  * update is a bounded sorted-set insert; MERGE is union-then-trim, so
  * partials combine map-side like any TypedImperativeAggregate. The
  * estimator is a deterministic function of the input hash set — no RNG
  * in the engine, so a DuckDB oracle reproduces it bit-for-bit from the
  * same md5-derived unit hashes.
  */
object Kmv {
  /** Bounded sorted set of the k smallest distinct doubles. */
  final class Sketch(val k: Int) {
    val mins: java.util.TreeSet[java.lang.Double] = new java.util.TreeSet()

    def offer(u: Double): Unit = {
      if (mins.size < k) { mins.add(u); () }
      else if (u < mins.last()) {
        if (mins.add(u)) mins.pollLast()
        ()
      }
    }

    def merge(other: Sketch): Unit = {
      val it = other.mins.iterator()
      while (it.hasNext) offer(it.next())
    }

    /** (number of hashes held, kth smallest — null until the sketch fills). */
    def result: (Long, Option[Double]) =
      (mins.size.toLong,
        if (mins.size >= k) Some(mins.last().doubleValue) else None)
  }

  def ser(s: Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.k); out.writeInt(s.mins.size)
    val it = s.mins.iterator()
    while (it.hasNext) out.writeDouble(it.next())
    bos.toByteArray
  }

  def deser(bytes: Array[Byte]): Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new Sketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { s.mins.add(in.readDouble()); i += 1 }
    s
  }
}

/** graft_kmv(unitHashCol, k) → struct<n_min: bigint, kth: double> —
  * n_min = hashes held (= exact distinct count while < k), kth = the
  * k-th smallest unit hash (null until the sketch fills). The caller
  * derives ndv̂ = CASE WHEN n_min < k THEN n_min ELSE (k-1)/kth END,
  * keeping the estimator arithmetic visible to the oracle. */
case class KmvAggExpr(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Sketch]
  with UnaryLike[Expression] {

  require(k >= 2, s"need k >= 2, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("n_min", LongType, nullable = false),
    StructField("kth", DoubleType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): Kmv.Sketch = new Kmv.Sketch(k)

  override def update(buffer: Kmv.Sketch, input: InternalRow): Kmv.Sketch = {
    child.eval(input) match {
      case null => ()
      case d: java.lang.Double => buffer.offer(d.doubleValue)
      case d: org.apache.spark.sql.types.Decimal => buffer.offer(d.toDouble)
      case f: java.lang.Float => buffer.offer(f.doubleValue)
      case other => throw new IllegalArgumentException(
        s"graft_kmv expects a DOUBLE unit hash, got ${other.getClass.getName}")
    }
    buffer
  }

  override def merge(buffer: Kmv.Sketch, other: Kmv.Sketch): Kmv.Sketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: Kmv.Sketch): Any = {
    val (n, kth) = buffer.result
    InternalRow(n, kth.map(Double.box).orNull)
  }

  override def serialize(buffer: Kmv.Sketch): Array[Byte] = Kmv.ser(buffer)
  override def deserialize(storageFormat: Array[Byte]): Kmv.Sketch =
    Kmv.deser(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAggExpr =
    copy(child = newChild)
}

/** graft_kmv_mins(unitHashCol, k) → array<double>: the held minima,
  * ascending. This is the sketch VALUE view that makes KMV composable —
  * bottom-k of a union is computable from two bottom-k arrays alone, and
  * any union element belonging to set A must appear in A's array
  * (h ≤ h_(k)(A∪B) ≤ h_(k)(A)), so intersection membership is decidable
  * from sketches. [[KmvAggExpr]] stays the compact (n, kth) view. */
case class KmvMinsAggExpr(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Sketch]
  with UnaryLike[Expression] {

  require(k >= 2, s"need k >= 2, got $k")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_mins"

  override def createAggregationBuffer(): Kmv.Sketch = new Kmv.Sketch(k)

  override def update(buffer: Kmv.Sketch, input: InternalRow): Kmv.Sketch = {
    child.eval(input) match {
      case null => ()
      case d: java.lang.Double => buffer.offer(d.doubleValue)
      case d: org.apache.spark.sql.types.Decimal => buffer.offer(d.toDouble)
      case f: java.lang.Float => buffer.offer(f.doubleValue)
      case other => throw new IllegalArgumentException(
        s"graft_kmv_mins expects a DOUBLE unit hash, got ${other.getClass.getName}")
    }
    buffer
  }

  override def merge(buffer: Kmv.Sketch, other: Kmv.Sketch): Kmv.Sketch = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: Kmv.Sketch): Any = {
    val arr = new Array[Any](buffer.mins.size)
    val it = buffer.mins.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().doubleValue; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buffer: Kmv.Sketch): Array[Byte] = Kmv.ser(buffer)
  override def deserialize(storageFormat: Array[Byte]): Kmv.Sketch =
    Kmv.deser(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinsAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinsAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMinsAggExpr =
    copy(child = newChild)
}

object KmvAgg {
  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "KmvAgg")(doRegister(spark))
  private def doRegister(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_kmv",
      { exprs =>
        require(exprs.length == 2, "graft_kmv(unitHash, k)")
        KmvAggExpr(exprs.head, ExprLits.litInt(exprs(1), "k")).toAggregateExpression()
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_kmv_mins",
      { exprs =>
        require(exprs.length == 2, "graft_kmv_mins(unitHash, k)")
        KmvMinsAggExpr(exprs.head, ExprLits.litInt(exprs(1), "k")).toAggregateExpression()
      }, "built-in")
  }
}
