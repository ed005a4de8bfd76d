package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-timestamp) join — an operator Spark's relational API
  * lacks natively. For each left row, attach the payload of the single
  * right row with the greatest `rightTs <= leftTs` (backward) or smallest
  * `rightTs >= leftTs` (forward) within the same key, optionally bounded
  * by a tolerance.
  *
  * Implementation is Spark-first and built for scale: instead of a range
  * join (O(n·m) candidates) or a broadcast (caps the right side), both
  * sides are UNIONED and a single window pass per key carries the most
  * recent right payload forward with `last(_, ignoreNulls)`. Cost = one
  * shuffle + sort keyed by `keys`, identical to any per-key window — no
  * join node at all, so it survives a 1000-executor 100 TB run as long as
  * single keys fit a partition (the same bound every sessionization or
  * gaps-and-islands query already has; salt hot keys upstream if not).
  *
  * At equal timestamps the right row sorts BEFORE the left row, so a
  * right row at exactly `leftTs` matches (inclusive >=, mirroring DuckDB
  * `ASOF JOIN ... ON l.ts >= r.ts`). Ties between multiple right rows at
  * the same (key, ts) are broken by `tieBreak` (latest wins) when given;
  * pre-aggregate the right side if a deterministic single row per
  * (key, ts) is required cross-engine.
  */
object AsofJoin {

  /** Backward as-of join (the common "most recent fact" lookup).
    *
    * @param payload   right-side columns carried to matched left rows;
    *                  emitted as `{prefix}{name}` (left columns all pass
    *                  through unchanged). Include `rightTs` itself to see
    *                  the matched timestamp.
    * @param toleranceSec match only if `leftTs - rightTs <= tolerance`;
    *                  unmatched rows keep null payload (left-outer
    *                  semantics — filter on a payload col for inner).
    * @param tieBreak  right-side column ordering ties at equal ts
    *                  (largest value wins).
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               toleranceSec: Option[Long] = None,
               tieBreak: Option[String] = None,
               prefix: String = "r_"): DataFrame =
    run(left, right, keys, leftTs, rightTs, payload, toleranceSec, tieBreak,
      prefix, forward = false)

  /** Forward as-of join: nearest right row AT or AFTER the left ts. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String, payload: Seq[String],
              toleranceSec: Option[Long] = None,
              tieBreak: Option[String] = None,
              prefix: String = "r_"): DataFrame =
    run(left, right, keys, leftTs, rightTs, payload, toleranceSec, tieBreak,
      prefix, forward = true)

  private def run(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String, payload: Seq[String],
                  toleranceSec: Option[Long], tieBreak: Option[String],
                  prefix: String, forward: Boolean): DataFrame = {
    val rType = (c: String) => right.schema(c).dataType
    val carried = payload ++ tieBreak.filterNot(payload.contains)
    val leftCols = left.columns.toSeq

    // The carried right row travels as ONE struct (ts + payload), and
    // `last(ignoreNulls)` fills the whole struct at once — per-column
    // fills would let a NULL payload field inherit a stale value from an
    // OLDER right row (mixing columns across rows and dodging the
    // tolerance check, which only sees the matched timestamp).
    val rStruct = struct(
      (col(rightTs).as("rts") +: carried.map(c => col(c).as(s"p_$c"))): _*)
    val nullStruct = lit(null).cast(
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("rts", rType(rightTs)) +:
          carried.map(c => org.apache.spark.sql.types.StructField(s"p_$c", rType(c)))))

    // one frame, two roles: left rows keep their columns, right rows keep
    // only key + ts + the carried struct (all other slots null)
    val lSel: Seq[Column] =
      leftCols.map(col) ++
        Seq(lit(1).as("__side"), col(leftTs).as("__t"), nullStruct.as("__r"))
    val rSel: Seq[Column] =
      leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(lit(0).as("__side"), col(rightTs).as("__t"), rStruct.as("__r"))

    val u = left.select(lSel: _*).unionByName(right.select(rSel: _*))

    // at equal __t the right row (side 0) precedes the left row → inclusive
    // match. Tie-break sorts ASC in both directions: `last` takes the
    // final row in window order, so ascending puts the largest tie-break
    // value last
    val ord: Seq[Column] =
      (if (forward) Seq(col("__t").desc, col("__side").asc)
       else Seq(col("__t").asc, col("__side").asc)) ++
        tieBreak.map(c => col("__r").getField(s"p_$c").asc_nulls_first).toSeq
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = u.withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))

    val matchTs = col("__m").getField("rts")
    val inTol: Column = toleranceSec match {
      case Some(sec) =>
        val gap =
          if (forward) unix_micros(matchTs) - unix_micros(col("__t"))
          else unix_micros(col("__t")) - unix_micros(matchTs)
        matchTs.isNotNull && gap <= sec * 1000000L
      case None => matchTs.isNotNull
    }

    filled.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => when(inTol, col("__m").getField(s"p_$c")).as(s"$prefix$c")): _*)
  }
}
