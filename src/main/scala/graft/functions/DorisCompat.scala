package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Literal, Size, SortArray, XxHash64}
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Doris-dialect function compatibility (SURVEY.md §2.7 X-BH): the
  * bitmap/hll trio the reference emits into generated load SQL
  * (reference: src/gendata.go:170-178) plus the counting companions, so
  * replayed Doris statements using them execute unchanged.
  *
  * Modeling (SURVEY.md §7.4): a bitmap is a sorted-distinct
  * `array<bigint>` — set semantics without a native roaring type; an HLL
  * value is its 64-bit element hash — `count(distinct hll_hash(x))` and
  * `approx_count_distinct(x)` are the exact/approx cardinality paths. All
  * pure Catalyst expression builders, no UDFs.
  */
object DorisCompat {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("bitmap_from_array",
      { exprs =>
        require(exprs.length == 1, "bitmap_from_array(arr)")
        SortArray(ArrayDistinct(exprs.head), Literal(true))
      }, "built-in")
    reg.createOrReplaceTempFunction("bitmap_count",
      { exprs =>
        require(exprs.length == 1, "bitmap_count(bitmap)")
        Size(exprs.head)
      }, "built-in")
    reg.createOrReplaceTempFunction("bitmap_empty",
      { exprs =>
        require(exprs.isEmpty, "bitmap_empty()")
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false))
      }, "built-in")
    reg.createOrReplaceTempFunction("hll_hash",
      { exprs =>
        require(exprs.length == 1, "hll_hash(v)")
        new XxHash64(exprs)
      }, "built-in")
    reg.createOrReplaceTempFunction("hll_empty",
      { exprs =>
        require(exprs.isEmpty, "hll_empty()")
        Literal.create(null, LongType)
      }, "built-in")
  }
}
