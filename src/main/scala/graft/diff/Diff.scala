package graft.diff

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Replay-result diff (SURVEY.md §2.3 J1, §2.9 D1–D2): a full-outer hash
  * join by queryId with rule columns, replacing the reference's
  * map-probe + per-line scan (reference: cmd/diff.go:97-340).
  *
  * Rules (diff2.result, cmd/diff.go:299-340):
  *   - err mismatch (always);
  *   - rows / hash mismatch (only when diffing two replays — a dump side
  *     has no rows/hash);
  *   - duration regression: right - left > minDurationDiffMs (default 100);
  *   - presence: queryId missing on either side.
  *
  * Scale: queryId is high-cardinality and unique per side, so the join is
  * an even shuffle with no skew; the result is a DataFrame you can filter/
  * aggregate/write without collecting to the driver.
  */
object Diff {

  /** Expected input schema per side (ReplayResult, reference:
    * src/replay.go:33-42): queryId, returnRows, returnRowsHash,
    * durationMs, err [, ts, stmt]. */
  def compare(r1: DataFrame, r2: DataFrame,
              minDurationDiffMs: Long = 100, vsDump: Boolean = false): DataFrame = {
    val l = r1.select(
      col("queryId"),
      col("returnRows").as("l_rows"), col("returnRowsHash").as("l_hash"),
      col("durationMs").as("l_ms"), coalesce(col("err"), lit("")).as("l_err"))
    val r = r2.select(
      col("queryId"),
      col("returnRows").as("r_rows"), col("returnRowsHash").as("r_hash"),
      col("durationMs").as("r_ms"), coalesce(col("err"), lit("")).as("r_err"))
    val joined = l.join(r, Seq("queryId"), "full_outer")
    val present = col("l_ms").isNotNull && col("r_ms").isNotNull
    def mismatch(a: Column, b: Column): Column =
      present && !(a <=> b)
    joined.select(
      col("queryId"),
      when(present, "both").when(col("l_ms").isNotNull, "left_only")
        .otherwise("right_only").as("presence"),
      mismatch(col("l_err"), col("r_err")).as("err_mismatch"),
      (if (vsDump) lit(false) else mismatch(col("l_rows"), col("r_rows"))).as("rows_mismatch"),
      (if (vsDump) lit(false) else mismatch(col("l_hash"), col("r_hash"))).as("hash_mismatch"),
      (present && (col("r_ms") - col("l_ms") > minDurationDiffMs)).as("duration_regressed"),
      col("l_rows"), col("r_rows"), col("l_ms"), col("r_ms"),
      col("l_err"), col("r_err"))
  }

  /** Only the rows a user would be shown (any rule fired). */
  def report(diffed: DataFrame): DataFrame =
    diffed.filter(col("presence") =!= "both" || col("err_mismatch") ||
      col("rows_mismatch") || col("hash_mismatch") || col("duration_regressed"))
}

/** Order-sensitive result digest (A3) mirroring the reference's row hash:
  * per row, columns joined by '\t' then '\n', digested over the first
  * `maxHashRows` rows (reference: src/replay.go:189-215; blake3 there,
  * SHA-256 here — the algorithm is engine-internal, both sides of a diff
  * use the same one).
  *
  * Determinism without single-threaded collection: rows are collected as
  * (sortKey, line) structs, array_sort'ed inside the aggregation, then
  * digested — arrival order (shuffle nondeterminism) cannot change the
  * result. The caller supplies the sort keys that define result order;
  * the rendered line itself is the final tiebreaker, so the digest is
  * total even when the keys alone are not unique.
  */
object RowDigest {
  def digest(df: DataFrame, sortKeys: Seq[String], maxHashRows: Int = 0): DataFrame = {
    val limited = if (maxHashRows > 0) {
      df.orderBy(sortKeys.map(col): _*).limit(maxHashRows)
    } else df
    val cols = limited.columns
    val line = concat_ws("\t", cols.map(c => coalesce(col(c).cast("string"), lit(""))).toIndexedSeq: _*)
    val keyed = limited.select(
      struct(sortKeys.map(col) :+ line.as("line"): _*).as("kv"))
    keyed.agg(
      sha2(concat_ws("", expr("transform(array_sort(collect_list(kv)), x -> concat(x.line, '\n'))")), 256)
        .as("rows_hash"),
      count(lit(1)).cast("long").as("n_rows"))
  }
}
