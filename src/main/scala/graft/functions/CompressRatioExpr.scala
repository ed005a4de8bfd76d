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

  /** EXACT count of distinct character k-grams — the engine-portable
    * compressibility face beside the zlib ratio: `1 − distinct/total`
    * (the repeated-gram mass) tracks what deflate's LZ77 match pass
    * exploits, and unlike zlib it is restatable in any SQL engine
    * (`count(DISTINCT substr(text, i, k))`), so the p93 entry it feeds
    * is fully oracle-checkable. Character = Unicode code point, matching
    * SQL `substr`/`len` semantics in both Spark and DuckDB.
    *
    * Scan-local and allocation-lean: ASCII text with k ≤ 8 packs each
    * window into one long (the packed value IS the gram — exact, not a
    * hash) and dedups in an open-addressed long set; anything else falls
    * back to exact code-point substring windows in a HashSet. */
  def distinctGrams(s: UTF8String, k: Int): Long = {
    require(k >= 1, s"k-gram size must be >= 1, got $k")
    val nChars = s.numChars()
    if (nChars < k) return 0L
    if (k <= 8 && s.numBytes() == nChars) { // pure-ASCII fast path
      val b = s.getBytes
      val total = b.length - k + 1
      // 2^29 gram positions ≈ a 512 MiB single document — beyond any sane
      // per-row payload, and past it cap<<=1 would overflow Int and spin
      require(total <= (1 << 29),
        s"document too large for per-row k-gram dedup ($total gram positions)")
      val keyMask = if (k == 8) -1L else (1L << (8 * k)) - 1
      var cap = 16
      while (cap < total * 2) cap <<= 1
      val table = new Array[Long](cap) // 0 = empty slot; NUL-gram tracked apart
      val mask = cap - 1
      var count = 0L
      var hasZero = false
      var key = 0L
      var j = 0
      while (j < k - 1) { key = (key << 8) | (b(j) & 0xffL); j += 1 }
      var i = 0
      while (i < total) {
        key = ((key << 8) | (b(i + k - 1) & 0xffL)) & keyMask
        if (key == 0L) {
          if (!hasZero) { hasZero = true; count += 1 }
        } else {
          val h = key * 0x9E3779B97F4A7C15L
          var idx = ((h ^ (h >>> 32)) & mask).toInt
          while (table(idx) != 0L && table(idx) != key) idx = (idx + 1) & mask
          if (table(idx) == 0L) { table(idx) = key; count += 1 }
        }
        i += 1
      }
      count
    } else { // exact general path: windows over code points
      val cps = s.toString.codePoints().toArray
      val total = cps.length - k + 1
      if (total <= 0) return 0L
      // same bound as the ASCII path: past 2^29 gram positions the doc is
      // beyond any sane per-row payload — fail loudly instead of growing
      // an unbounded HashSet toward executor OOM (and `total * 2` below
      // would overflow Int for >1G-codepoint inputs)
      require(total <= (1 << 29),
        s"document too large for per-row k-gram dedup ($total gram positions)")
      val set = new java.util.HashSet[String](total * 2)
      var i = 0
      while (i < total) { set.add(new String(cps, i, k)); i += 1 }
      set.size.toLong
    }
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

case class DistinctKgramsExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_distinct_kgrams"
  override def nullSafeEval(input: Any): Any =
    CompressKernels.distinctGrams(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.CompressKernels.distinctGrams($v, $k)")
  override protected def withNewChildInternal(newChild: Expression): DistinctKgramsExpr =
    copy(child = newChild)
}

object CompressRatioExpr {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    RegisterOnce(spark, "CompressRatioExpr")(doRegister(spark))
  private def doRegister(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_deflate_ratio",
      { exprs =>
        require(exprs.length == 1, "graft_deflate_ratio(text)")
        DeflateRatioExpr(exprs.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_distinct_kgrams",
      { exprs =>
        require(exprs.length == 2 && exprs(1).foldable,
          "graft_distinct_kgrams(text, k) with a literal k")
        val k = exprs(1).eval().asInstanceOf[Number].intValue()
        require(k >= 1, s"k must be >= 1, got $k")
        DistinctKgramsExpr(exprs.head, k)
      },
      "built-in")
  }
}
