package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** graft_vec_sum(array<double>) → array<double>: ELEMENTWISE sum of
  * fixed-length vectors — the one-pass aggregate behind centroid /
  * moment math over embedding columns. The alternative (posexplode to
  * (pos, v) rows + groupBy(pos)) multiplies the row count by the vector
  * length before the map-side combine ever sees it — ×64 for a raw
  * embedding, ×2145 for whiten's [1, x, xᵢxⱼ] moment vector; this
  * aggregate walks the array in place, so state = ONE double[dims] per
  * partition and the shuffle ships numPartitions rows.
  *
  * Null rows are skipped; all non-null vectors must share one length
  * (ragged input is a loud error, matching whiten's dims contract).
  */
case class VecSumAggExpr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_sum"

  // ArrayData.getDouble reads 8-byte slots: calling it over an
  // array<float> (the raw embedding column's physical layout) would read
  // across element boundaries and return garbage, so the element type is
  // checked at analysis and float arrays take the getFloat path.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_vec_sum expects array<double> or array<float>, got ${other.sql}")
  }

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = null

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    child.eval(input) match {
      case null => buffer
      case a: ArrayData =>
        val n = a.numElements()
        val b = if (buffer == null) new Array[Double](n)
          else {
            require(buffer.length == n,
              s"graft_vec_sum: ragged input (${buffer.length} vs $n)")
            buffer
          }
        var i = 0
        if (isFloat) { while (i < n) { b(i) += a.getFloat(i); i += 1 } }
        else { while (i < n) { b(i) += a.getDouble(i); i += 1 } }
        b
      case other => throw new IllegalArgumentException(
        s"graft_vec_sum expects array<double> or array<float>, got ${other.getClass.getName}")
    }
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    if (other == null) buffer
    else if (buffer == null) other
    else {
      require(buffer.length == other.length,
        s"graft_vec_sum: ragged merge (${buffer.length} vs ${other.length})")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer == null) null
    else new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    if (buffer == null) out.writeInt(-1)
    else {
      out.writeInt(buffer.length)
      var i = 0
      while (i < buffer.length) { out.writeDouble(buffer(i)); i += 1 }
    }
    bos.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    if (n < 0) null
    else {
      val b = new Array[Double](n)
      var i = 0
      while (i < n) { b(i) = in.readDouble(); i += 1 }
      b
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAggExpr =
    copy(child = newChild)
}

object VecSumAgg {
  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "VecSumAgg")(doRegister(spark))
  private def doRegister(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_vec_sum",
      { exprs =>
        require(exprs.length == 1, "graft_vec_sum(vec)")
        VecSumAggExpr(exprs.head).toAggregateExpression()
      }, "built-in")
  }
}
