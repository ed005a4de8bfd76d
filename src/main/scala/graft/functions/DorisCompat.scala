package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, ArrayDistinct, ArrayPosition, Cast, CaseWhen, Ceil, Coalesce, CreateArray, DateAdd, DateDiff, Divide, Floor, FormatNumber, GreaterThanOrEqual, Literal, Multiply, Pow, Size, SortArray, Subtract, XxHash64}
import org.apache.spark.sql.types.{ArrayType, DateType, DoubleType, IntegerType, LongType}

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

  def register(spark: SparkSession): Unit =
    RegisterOnce(spark, "DorisCompat")(doRegister(spark))
  private def doRegister(spark: SparkSession): Unit = {
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

    // ---- MySQL/Doris scalar functions Spark lacks by name, so replayed
    //      statements run unchanged (Doris docs are the spec; each is a
    //      pure expression tree — codegen'd, no UDFs) -------------------
    // money_format(x) → '1,234,567.89'
    reg.createOrReplaceTempFunction("money_format",
      { exprs =>
        require(exprs.length == 1, "money_format(x)")
        FormatNumber(Cast(exprs.head, DoubleType), Literal(2))
      }, "built-in")
    // truncate(x, d): toward-zero decimal truncation
    reg.createOrReplaceTempFunction("truncate",
      { exprs =>
        require(exprs.length == 2, "truncate(x, d)")
        val x = Cast(exprs.head, DoubleType)
        val p = Pow(Literal(10.0), Cast(exprs(1), DoubleType))
        CaseWhen(
          Seq((GreaterThanOrEqual(x, Literal(0.0)),
            Divide(Cast(Floor(Multiply(x, p)), DoubleType), p))),
          Some(Divide(Cast(Ceil(Multiply(x, p)), DoubleType), p)))
      }, "built-in")
    // field(str, s1, s2, …): 1-based index of str in the list, 0 if
    // absent AND 0 for a NULL search value — MySQL/Doris FIELD(NULL,…)
    // is 0, but ArrayPosition(…, NULL) is NULL, which would give NULL
    // sort keys and NULL→false predicates where the emulated dialect
    // sorts/compares with 0
    reg.createOrReplaceTempFunction("field",
      { exprs =>
        require(exprs.length >= 2, "field(str, s1, ...)")
        Coalesce(Seq(ArrayPosition(CreateArray(exprs.tail), exprs.head),
          Literal(0L)))
      }, "built-in")
    // to_days(date): days since year 0 (MySQL epoch: 1970-01-01 = 719528)
    reg.createOrReplaceTempFunction("to_days",
      { exprs =>
        require(exprs.length == 1, "to_days(d)")
        Add(Cast(DateDiff(Cast(exprs.head, DateType),
          Cast(Literal("1970-01-01"), DateType)), LongType), Literal(719528L))
      }, "built-in")
    // from_days(n): inverse of to_days
    reg.createOrReplaceTempFunction("from_days",
      { exprs =>
        require(exprs.length == 1, "from_days(n)")
        DateAdd(Cast(Literal("1970-01-01"), DateType),
          Cast(Subtract(Cast(exprs.head, LongType), Literal(719528L)), IntegerType))
      }, "built-in")
  }
}
