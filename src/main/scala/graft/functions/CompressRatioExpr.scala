package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate compression ratio of a text — the classic cheap
  * machine-generated/boilerplate detector (used by Gopher-style quality
  * filtering alongside repetition metrics): templated or repetitive text
  * compresses far below natural prose, and a near-1.0 ratio flags
  * high-entropy noise (base64 blobs, minified code, random strings).
  * Complements the exact repetition metrics in QualityQueries, which
  * count specific n-gram pathologies; deflate is the catch-all
  * "something is un-prose-like here" signal.
  *
  * ratio = deflated_bytes / utf8_bytes over the raw UTF-8 bytes, with
  * deflate level 6 (zlib default), NO_WRAP off (zlib header included —
  * a fixed +11-byte overhead that keeps short-string ratios > 1,
  * harmless because the signal is ordinal). Deterministic for a given
  * JDK's zlib (same input → same bytes), computed in a static JVM
  * kernel invoked from `doGenCode`, so the expression stays inside
  * whole-stage codegen — scan-local, zero shuffle, the 100 TB shape of
  * every per-document quality signal in this repo.
  *
  * No DuckDB oracle exists for zlib, so the driver records the weaker
  * rows-only check for queries built on this; the SPEC carries the
  * correctness load (determinism, repetitive ≪ prose < random ordering,
  * empty-input contract). */
object CompressKernels {
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }
}

case class DeflateRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_deflate_ratio"
  override def nullSafeEval(input: Any): Any =
    CompressKernels.deflateRatio(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.CompressKernels.deflateRatio($v)")
  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

object CompressRatioExpr {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_deflate_ratio",
      { exprs =>
        require(exprs.length == 1, "graft_deflate_ratio(text)")
        DeflateRatioExpr(exprs.head)
      },
      "built-in")
  }
}
