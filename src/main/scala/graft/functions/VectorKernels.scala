package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** The per-row loops of the compiled kernels, as static-forwarder
  * methods generated Java can call directly — `doGenCode` in the
  * expression classes emits `graft.functions.VectorKernels.cosine(a, b)`
  * style calls, so the kernels run INSIDE whole-stage codegen with no
  * boxing and no interpreted expression-tree dispatch (the round-3
  * CodegenFallback versions paid a per-row virtual eval + Object boxing
  * around an otherwise JIT'd loop). Parameter tables (hyperplane
  * weights, permutation coefficients) are passed in by the caller, which
  * owns deriving them from the seed. */
object VectorKernels {

  /** Cosine over two array<float>, accumulated in double left-to-right
    * (bit-identical to the declarative fold the oracle mirrors).
    * Zero-norm vectors yield 0.0, not NaN — a NaN neither sorts nor
    * compares, which silently poisons top-k ranking downstream. */
  def cosine(l: ArrayData, r: ArrayData): Double = {
    // ragged input is a LOUD error (the graft_vec_sum contract): a
    // min-length truncation returns a plausible but wrong similarity
    // that passes every sanity bound
    if (l.numElements() != r.numElements())
      throw new IllegalArgumentException(
        s"graft_cosine: ragged input (${l.numElements()} vs ${r.numElements()} dims)")
    val n = l.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = l.getFloat(i).toDouble
      val y = r.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Multi-table hyperplane-LSH buckets; weights(t*planes+p)(d) ∈ [-1,1]. */
  def hyperplaneBuckets(input: ArrayData, dims: Int, planes: Int,
                        tables: Int, weights: Array[Array[Double]]): ArrayData = {
    val n = math.min(input.numElements(), dims)
    val x = new Array[Double](n)
    var i = 0
    while (i < n) { x(i) = input.getFloat(i).toDouble; i += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val w = weights(t * planes + p)
        var dot = 0.0
        var d = 0
        while (d < n) { dot += x(d) * w(d); d += 1 }
        if (dot > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** 63-bit SimHash over array<string> tokens: one XXH64 per token, 63
    * affine sign votes. */
  def simhash64(arr: ArrayData, seed: Long, as: Array[Long], bs: Array[Long]): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](63)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h0 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
        var j = 0
        while (j < 63) {
          if (as(j) * h0 + bs(j) < 0) votes(j) -= 1 else votes(j) += 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 63) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** k-slot MinHash signature over array<string> shingles: one XXH64 per
    * shingle, k affine permutations into a running-min vector. */
  def minhashSignature(arr: ArrayData, k: Int, seed: Long,
                       as: Array[Long], bs: Array[Long]): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h0 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
        var j = 0
        while (j < k) {
          val h = as(j) * h0 + bs(j)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Per-vector symmetric int8 scale: max|x| / 127 with a 1e-12 floor
    * (zero vectors would otherwise divide by zero). */
  def int8Scale(emb: ArrayData): Double = {
    val n = emb.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(emb.getFloat(i).toDouble)
      if (a > m) m = a
      i += 1
    }
    math.max(m, 1e-12) / 127.0
  }

  /** Cosine between the original vector and its int8 round-trip
    * (`floor(x/scale + 0.5) * scale` — floor+0.5 instead of round so the
    * halfway rule is engine-unambiguous). Same accumulation shape as
    * `cosine`, one pass, no materialized quantized array. */
  def int8CosQ(emb: ArrayData, scale: Double): Double = {
    val n = emb.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = emb.getFloat(i).toDouble
      val y = math.floor(x / scale + 0.5) * scale
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Mean absolute error of the int8 round-trip, sequential left fold. */
  def int8MaeQ(emb: ArrayData, scale: Double): Double = {
    val n = emb.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = emb.getFloat(i).toDouble
      s += math.abs(x - math.floor(x / scale + 0.5) * scale)
      i += 1
    }
    if (n == 0) 0.0 else s / n
  }

  /** Content-defined chunk boundaries: 0-based END positions i (i ≥ w−1)
    * where the w-char window hash H(i) = Σ_{j<w} c_{i−j}·base^j (mod M)
    * satisfies H % div == 0. Maintained incrementally (one mul-add and
    * one mul-sub per char, O(n) total), with every intermediate reduced
    * into [0, M) — so the rolling value equals the term-wise-mod sum a
    * SQL oracle can restate without bignum arithmetic. `bw` is
    * base^(w−1) mod M, owned by the caller. */
  def cdcBoundaries(input: UTF8String, w: Int, base: Long, mod: Long,
                    div: Long, bw: Long): ArrayData = {
    val s = input.toString
    val n = s.length
    if (n < w) return new GenericArrayData(Array.empty[Int])
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var h = 0L
    var i = 0
    while (i < w) { h = (h * base + s.charAt(i)) % mod; i += 1 }
    if (h % div == 0) out += (w - 1)
    i = w
    while (i < n) {
      h = (((h - s.charAt(i - w) * bw) % mod + mod) % mod * base
            + s.charAt(i)) % mod
      if (h % div == 0) out += i
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private final val B = 0x100000001b3L // rolling base (FNV prime)

  /** Winnowing fingerprints: Rabin-Karp rolling k-gram hashes, sliding
    * window-of-w minima (rightmost on ties) via a monotone deque,
    * distinct, in first-seen order. */
  /** Distinct hashed word n-gram shingles — see ShingleHashesExpr.
    * Token hash = XXH64 over the token's UTF-8 bytes (seed 42, the
    * xxhash64 builtin's seed); shingle hash = FNV-prime polynomial of
    * the n token hashes, splitmix-finalized. Returns a SORTED distinct
    * long array (set semantics — consumers only intersect/size). */
  def shingleHashes(input: UTF8String, n: Int): ArrayData = {
    // Locale.ROOT for the same reason as `winnowing` below
    val s = input.toString.toLowerCase(java.util.Locale.ROOT)
    // Tokens = maximal nonempty `\s+`-delimited runs, matching
    // TextOps.tokens and the oracle's duckToks exactly (r12 ADVICE: the
    // previous String.trim stripped ALL chars <= U+0020 — including
    // non-\s controls like \x01 — so a doc framed by such bytes
    // tokenized differently here than in the string-shingle chain).
    // Java's split already drops trailing empties; only a leading empty
    // token (text starting with whitespace) needs dropping.
    val raw = s.split("\\s+")
    val toks =
      if (raw.nonEmpty && raw(0).isEmpty) java.util.Arrays.copyOfRange(raw, 1, raw.length)
      else raw
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val b = toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      th(i) = XXH64.hashUnsafeBytes(b,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      i += 1
    }
    val m = toks.length - n + 1
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = -3750763034362895579L // FNV-1a offset basis
      var j = 0
      while (j < n) { h = h * 0x100000001b3L + th(i + j); j += 1 }
      out(i) = splitmix(h)
      i += 1
    }
    java.util.Arrays.sort(out)
    var u = 1
    i = 1
    while (i < m) {
      if (out(i) != out(u - 1)) { out(u) = out(i); u += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, u))
  }

  def winnowing(input: UTF8String, k: Int, w: Int, bk: Long): ArrayData = {
    // Locale.ROOT: the default-locale overload is locale-SENSITIVE
    // (tr_TR lowercases "I" to dotless ı), so fingerprints would differ
    // across JVMs/executors with different default locales — silently
    // breaking dedup joins and the oracle comparison
    val s = input.toString.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val nGrams = n - k + 1
    val hs = new Array[Long](nGrams)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hs(0) = splitmix(h)
    i = k
    while (i < n) {
      h = (h - s.charAt(i - k) * bk) * B + s.charAt(i)
      hs(i - k + 1) = splitmix(h)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0
    var j = 0
    while (j < nGrams) {
      while (tail > head && hs(deque(tail - 1)) >= hs(j)) tail -= 1
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

  /** Second-moment vector [1, x₀…x_{d−1}, upper-triangle xᵢxⱼ (i≤j,
    * row-major)] — one tight loop instead of the nested
    * transform/flatten lambdas (higher-order functions are
    * CodegenFallback, so at d=64 the declarative form pays ~2k
    * interpreted closure calls + array allocations per row). Linear
    * index of (i,j): 1 + d + i·(2d−i−1)/2 + j. */
  def momentVector(x: ArrayData, isFloat: Boolean): ArrayData = {
    val d = x.numElements()
    val xs = new Array[Double](d)
    var i = 0
    while (i < d) {
      xs(i) = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      i += 1
    }
    val m = new Array[Double](1 + d + d * (d + 1) / 2)
    m(0) = 1.0
    var p = 1 + d
    i = 0
    while (i < d) {
      m(1 + i) = xs(i)
      var j = i
      while (j < d) { m(p) = xs(i) * xs(j); p += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(m)
  }

  /** [x₀…x_{d−1}, ‖x‖₂, 1] — the per-vector accumulator row for
    * grouped centroid/norm statistics: graft_vec_sum of this vector
    * yields per-dim sums, the summed L2 norm, and the count in ONE
    * bounded-state aggregate (no posexplode row blow-up, no
    * interpreted norm fold). */
  def vecStats(x: ArrayData, isFloat: Boolean): ArrayData = {
    val d = x.numElements()
    val m = new Array[Double](d + 2)
    var nrm = 0.0
    var i = 0
    while (i < d) {
      val v = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      m(i) = v
      nrm += v * v
      i += 1
    }
    m(d) = math.sqrt(nrm)
    m(d + 1) = 1.0
    new GenericArrayData(m)
  }

  /** y = round₆(W·(x−μ)) with W row-major d×d — the whitening apply as
    * one fused kernel. Accumulation is left-to-right per output element
    * and rounding is BigDecimal.valueOf + HALF_UP, bit-matching the
    * zip_with/aggregate + round(…,6) pipeline it replaces. */
  def whitenApply(x: ArrayData, isFloat: Boolean,
                  w: Array[Double], mu: Array[Double]): ArrayData = {
    val d = mu.length
    // a ragged (shorter) vector would read past its end: AIOOBE on the
    // generic path, silently garbage slots on the unsafe path
    if (x.numElements() != d)
      throw new IllegalArgumentException(
        s"graft_whiten_apply: input has ${x.numElements()} dims, model has $d")
    val c = new Array[Double](d)
    var j = 0
    while (j < d) {
      c(j) = (if (isFloat) x.getFloat(j).toDouble else x.getDouble(j)) - mu(j)
      j += 1
    }
    val y = new Array[Double](d)
    var k = 0
    while (k < d) {
      var acc = 0.0
      var off = k * d
      j = 0
      while (j < d) { acc += c(j) * w(off + j); j += 1 }
      y(k) = java.math.BigDecimal.valueOf(acc)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      k += 1
    }
    new GenericArrayData(y)
  }

  /** |a ∩ b| for two SORTED-ascending long arrays by linear merge —
    * O(|a|+|b|), zero allocation. The triangle closure intersects two
    * out-neighbor lists per oriented edge; `array_intersect` builds a
    * hash set and an output array per PAIR, which is pure overhead when
    * only the count is needed and the inputs sort once at build. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      // null elements would read as garbage zeros through getLong —
      // reject loudly (the type check can't pin nullability: lambda-
      // built arrays are marked nullable regardless of their values).
      // One predictable never-taken branch per step on the hot path.
      if (a.isNullAt(i) || b.isNullAt(j))
        throw new IllegalArgumentException(
          "graft_sorted_intersect_count: null array element")
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}
