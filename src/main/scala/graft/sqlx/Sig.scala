package graft.sqlx

/** Significant-digit comparison form for magnitude-unbounded doubles.
  *
  * Round-5 (q41) and round-6 (s04) both died on the same class: a final
  * compared numeric whose MAGNITUDE is data-dependent (covar_samp ~1491
  * at sf0.01, ~1.7e-6 for near-independent columns) rounded at a fixed
  * ABSOLUTE grain. For any absolute grain there is a magnitude at which
  * cross-engine fp merge-order noise exceeds it (and below which the
  * round collapses to ±0.0, where DuckDB keeps the sign bit and Spark's
  * BigDecimal HALF_UP does not). The portable fix is RELATIVE precision:
  * compare (mantissa rounded to 6 significant digits, decimal exponent)
  * as two columns and never multiply them back together — recomposing
  * through power(10, e) would reintroduce a libm ulp (Java Math.pow is
  * 1-ulp, not correctly rounded, for negative exponents) AFTER the
  * rounding that was supposed to absorb it.
  *
  * The text is engine-portable SQL (CASE/abs/floor/log10/power/round
  * behave identically in Spark and DuckDB), so the SAME string is
  * embedded in the Spark query and the DuckDB oracle — the two sides
  * cannot drift. Known measure-zero edge: a raw value within one ulp of
  * an exact power of ten could floor(log10) differently per libm; the
  * compared quantities are continuous data statistics, which never land
  * there.
  */
object Sig {
  /** Mantissa in (-10,-1] ∪ [1,10), rounded to 6 significant digits
    * (5 decimals). NULL-safe; exact zero maps to +0.0 in both engines. */
  def mant(e: String): String =
    s"CASE WHEN ($e) IS NULL THEN CAST(NULL AS DOUBLE) " +
      s"WHEN ($e) = 0 THEN CAST(0 AS DOUBLE) " +
      s"ELSE round(($e) / power(10, floor(log10(abs($e)))), 5) END"

  /** Decimal exponent as BIGINT (floor(log10(|e|)); 0 for NULL-safe 0). */
  def exp(e: String): String =
    s"CASE WHEN ($e) IS NULL THEN CAST(NULL AS BIGINT) " +
      s"WHEN ($e) = 0 THEN CAST(0 AS BIGINT) " +
      s"ELSE CAST(floor(log10(abs($e))) AS BIGINT) END"
}
