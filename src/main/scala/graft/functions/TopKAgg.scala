package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters summary — the engine-side analog of Doris's
  * `TOPN(expr, k[, space_expand_rate])` aggregate (the classic
  * Metwally/Agrawal/El Abbadi algorithm Doris itself uses). A bounded
  * map of `capacity` counters; overflow evicts the minimum counter and
  * charges its count as the newcomer's error bound. Properties that
  * matter at 100 TB:
  *   - the summary is MERGEABLE (counts add, then trim to capacity
  *     keeping the largest), so partials combine map-side like any
  *     other TypedImperativeAggregate;
  *   - state is O(capacity) regardless of input cardinality;
  *   - when a group's true distinct count ≤ capacity the result is
  *     EXACT (no eviction ever fires) — which is what lets a DuckDB
  *     oracle compare real counts; the approximate regime is covered by
  *     the unit test's error-bound check (est - err ≤ true ≤ est).
  */
object SpaceSaving {
  /** counters: value → (count, err). Deterministic eviction: among
    * minimum-count entries the lexicographically LARGEST value is
    * evicted, so results don't depend on hash-map iteration order.
    *
    * An ordered eviction INDEX ((count asc, value desc) TreeSet, kept in
    * lockstep with the map) makes eviction O(log capacity) — the naive
    * minBy scan was O(capacity) per non-resident row, which dominates
    * the aggregate once a high-cardinality group saturates the summary
    * (capacity · rows tuple comparisons); resident increments pay one
    * O(log capacity) re-index, a constant-factor trade the eviction
    * path repays at any real skew. */
  final class Summary(val capacity: Int) {
    val counters: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
    private val order = mutable.TreeSet.empty[(Long, String)](
      Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))

    /** Insert/overwrite keeping the index in lockstep (the ONLY mutation
      * path — ser/merge/deser all go through it). */
    private[SpaceSaving] def put(v: String, c: Long, e: Long): Unit = {
      counters.get(v).foreach { case (oc, _) => order.remove((oc, v)) }
      counters.update(v, (c, e))
      order.add((c, v))
    }

    private[SpaceSaving] def clearAll(): Unit = { counters.clear(); order.clear() }

    /** Minimum resident count (the merge charge when full) — O(log n). */
    private[SpaceSaving] def minCount: Long =
      if (counters.isEmpty) 0L else order.head._1

    def offer(v: String, weight: Long = 1L): Unit = counters.get(v) match {
      case Some((c, e)) => put(v, c + weight, e)
      case None if counters.size < capacity => put(v, weight, 0L)
      case None =>
        val (mc, mv) = order.head // smallest count, lexicographically largest value
        order.remove((mc, mv))
        counters.remove(mv)
        put(v, mc + weight, mc)
    }

    /** Mergeable-summaries combine (Agarwal et al.): a value ABSENT from
      * a FULL summary may still have appeared up to that summary's
      * minimum counter many times, so absence is charged (min, min) on
      * that side — this is what preserves `est ≥ true ≥ est − err`
      * across merges; a naive keep-the-top trim loses evicted mass and a
      * later re-insertion would restart below the true count. A summary
      * that never filled charges 0 (absence there really means 0). */
    def merge(other: Summary): Unit = {
      val thisMin = if (counters.size >= capacity) minCount else 0L
      val otherMin = if (other.counters.size >= capacity) other.minCount else 0L
      val merged = (counters.keySet ++ other.counters.keySet).toSeq.map { v =>
        val (c1, e1) = counters.getOrElse(v, (thisMin, thisMin))
        val (c2, e2) = other.counters.getOrElse(v, (otherMin, otherMin))
        v -> (c1 + c2, e1 + e2)
      }
      val keep = merged.sortBy { case (v, (c, _)) => (-c, v) }.take(capacity)
      clearAll()
      keep.foreach { case (v, (c, e)) => put(v, c, e) }
    }

    /** top-k rows ordered (count desc, value asc) — deterministic. */
    def topK(k: Int): Seq[(String, Long, Long)] =
      counters.toSeq.sortBy { case (v, (c, _)) => (-c, v) }
        .take(k).map { case (v, (c, e)) => (v, c, e) }
  }

  def ser(s: Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(s.capacity)
    out.writeInt(s.counters.size)
    s.counters.foreach { case (v, (c, e)) =>
      val b = v.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    bos.toByteArray
  }

  def deser(bytes: Array[Byte]): Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new Summary(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      s.put(new String(b, "UTF-8"), in.readLong(), in.readLong())
      i += 1
    }
    s
  }
}

/** graft_topn(strCol, k, capacity) → array<struct<value, cnt, err>>,
  * ordered (cnt desc, value asc). */
case class TopNAggExpr(
    child: Expression, k: Int, capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSaving.Summary]
  with UnaryLike[Expression] {

  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("cnt", LongType),
    StructField("err", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topn"

  override def createAggregationBuffer(): SpaceSaving.Summary =
    new SpaceSaving.Summary(capacity)

  override def update(buffer: SpaceSaving.Summary, input: InternalRow): SpaceSaving.Summary = {
    val v = child.eval(input)
    if (v != null) buffer.offer(v.toString)
    buffer
  }

  override def merge(buffer: SpaceSaving.Summary, other: SpaceSaving.Summary): SpaceSaving.Summary = {
    buffer.merge(other); buffer
  }

  override def eval(buffer: SpaceSaving.Summary): Any = {
    val rows = buffer.topK(k).map { case (v, c, e) =>
      InternalRow(UTF8String.fromString(v), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: SpaceSaving.Summary): Array[Byte] = SpaceSaving.ser(buffer)
  override def deserialize(storageFormat: Array[Byte]): SpaceSaving.Summary =
    SpaceSaving.deser(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopNAggExpr =
    copy(child = newChild)
}

object TopKAgg {
  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "TopKAgg")(doRegister(spark))
  private def doRegister(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_topn",
      { exprs =>
        require(exprs.length == 3, "graft_topn(col, k, capacity)")
        TopNAggExpr(exprs.head, ExprLits.litInt(exprs(1), "k"), ExprLits.litInt(exprs(2), "capacity"))
          .toAggregateExpression()
      }, "built-in")
}
