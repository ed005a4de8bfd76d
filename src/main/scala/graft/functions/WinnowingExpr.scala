package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
  * every k-char gram with a Rabin-Karp ROLLING hash (one multiply-add
  * per character, not per gram·char), then keep the minimum hash of each
  * sliding window of `w` consecutive grams (rightmost on ties), distinct.
  *
  * Guarantee: two documents sharing any substring of length ≥ w + k - 1
  * share at least one fingerprint — which is what makes fingerprints a
  * bucketable join key for containment/overlap detection at corpus
  * scale (candidates only ever form under a shared fingerprint).
  *
  * Single compiled pass, O(n) time, O(w) extra space via a monotone
  * deque — the same kernel discipline as the MinHash/SimHash
  * expressions (SURVEY.md §7.4). */
case class WinnowingExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0, "k and w must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnowing"

  private val B = 0x100000001b3L // rolling base (FNV prime)
  private lazy val Bk: Long = { // B^(k-1) for the remove step
    var r = 1L; var i = 0
    while (i < k - 1) { r *= B; i += 1 }
    r
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.toLowerCase
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val nGrams = n - k + 1
    // rolling k-gram hashes
    val hs = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hs(0) = finalize(h)
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * Bk) * B + s.charAt(i)
      hs(i - k + 1) = finalize(h)
      i += 1
    }
    // sliding-window minimum via monotone deque, rightmost-min tie rule
    val out = new java.util.LinkedHashSet[Long]()
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // indices into hs, increasing, values increasing
    var j = 0
    while (j < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(j)) tail -= 1 // rightmost on ties
      deque(tail) = j; tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1 || j == nGrams - 1) out.add(hs(deque(head)))
      j += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    new GenericArrayData(arr)
  }

  /** Avalanche the raw polynomial hash so window minima are unbiased. */
  private def finalize(h: Long): Long = splitmix(h)

  override protected def withNewChildInternal(newChild: Expression): WinnowingExpr =
    copy(child = newChild)
}

object WinnowingExpr {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnowing",
      { exprs =>
        require(exprs.length == 3, "graft_winnowing(text, k, w)")
        def litInt(e: Expression) = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
          case other => throw new IllegalArgumentException(s"literal expected, got $other")
        }
        WinnowingExpr(exprs.head, litInt(exprs(1)), litInt(exprs(2)))
      },
      "built-in")
}
