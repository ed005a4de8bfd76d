package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-series smoothing over event streams.
  *
  * Beyond-reference operator (the reference has no time-series pass at
  * all — SURVEY.md §2.11): monitoring any 100 TB ingest means smoothing
  * per-entity metrics and flagging outliers, and the scalable shape is
  * ONE window pass per key partition — shuffle once on the key, then
  * every smoothed value and residual is computed inside the partition
  * with no further exchange.
  */
object Series {

  /** Finite-window exponentially-weighted moving average + residual
    * anomaly flags.
    *
    * EWMA here is the W-tap truncated form: for row t,
    *   ewma_t = Σ_{i=0..W-1} (1−α)^i · x_{t−i}  /  Σ_{i=0..W-1} (1−α)^i
    * with missing taps (sequence head) dropped from BOTH sums, so the
    * first rows are exact averages of what exists rather than biased
    * toward zero. The truncation is deliberate: the infinite-horizon
    * recurrence ewma_t = α·x_t + (1−α)·ewma_{t−1} is a sequential
    * dependency no parallel engine evaluates as a window aggregate
    * without a prefix-scan trick whose (1−α)^{−rownumber} rescaling
    * overflows doubles after ~1000 rows; W explicit lag taps are
    * numerically exact, codegen'd, and cross-engine reproducible (the
    * DuckDB oracle states the identical lag algebra).
    *
    * The anomaly test compares x_t against the PRIOR-window smooth
    * (taps 1..W, current row excluded — an in-window outlier must not
    * vote for its own normality) and flags |x_t − ewma_prev| > tau.
    *
    * Scale: one `Window.partitionBy(key).orderBy(ts, tiebreak)` — a
    * single hash exchange on the key; every lag/sum is per-partition.
    * Rows per key are whatever one executor can sort, same bound as any
    * sessionization pass.
    *
    * Returns one row per input row:
    * (key, ts, tiebreak, x, ewma, ewma_prev, resid, is_anomaly).
    */
  def ewmaAnomaly(events: DataFrame, keyCol: String, tsCol: String,
                  tieCol: String, valCol: String,
                  alpha: Double = 0.4, taps: Int = 8,
                  tau: Double = 2.0): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    require(taps >= 2, s"need >=2 taps, got $taps")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val x = col("x") // the projected double value column below
    def wgt(i: Int): Double = math.pow(1.0 - alpha, i)
    // Σ present-tap weighted values / Σ present-tap weights, taps [from, until)
    def smooth(from: Int, until: Int): Column = {
      val num = (from until until).map(i =>
        coalesce(lag(x, i).over(w) * lit(wgt(i)), lit(0.0))).reduce(_ + _)
      val den = (from until until).map(i =>
        when(lag(x, i).over(w).isNotNull, lit(wgt(i))).otherwise(lit(0.0)))
        .reduce(_ + _)
      when(den > 0, num / den)
    }
    events.select(col(keyCol), col(tsCol), col(tieCol),
      col(valCol).cast("double").as("x"))
      .withColumn("ewma", smooth(0, taps))
      .withColumn("ewma_prev", smooth(1, taps + 1))
      .withColumn("resid",
        when(col("ewma_prev").isNotNull, col("x") - col("ewma_prev")))
      .withColumn("is_anomaly",
        coalesce(abs(col("resid")) > tau, lit(false)))
  }

  /** First-order Markov transition matrix over per-key event sequences —
    * the model behind next-step prediction, anomalous-path scoring, and
    * session simulation.
    *
    * One lag window per key partition (the same single-exchange shape as
    * [[ewmaAnomaly]]) emits (prev_state, state) transitions; one skinny
    * aggregate counts them; row-normalization with Laplace add-one
    * smoothing happens on the (states × states)-sized count table, not
    * the event stream: P(b|a) = (c_ab + 1) / (c_a· + |S|), so unseen
    * transitions get mass and every row sums to 1. |S| is the number of
    * distinct OBSERVED states (from the same aggregate, joined back
    * broadcast — it is a scalar).
    *
    * Returns one row per observed (a, b) transition:
    * (prev_state, state, n, p) — unobserved pairs carry only the smoothing
    * floor and are left implicit rather than densified. */
  def markovTransitions(events: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val trans = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(stateCol).as("state"))
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(col("prev_state").isNotNull)
      .groupBy("prev_state", "state").agg(count(lit(1)).as("n"))
    val nStates = events.select(col(stateCol).as("state")).distinct()
      .agg(count(lit(1)).as("n_states"))
    val rowTotals = trans.groupBy("prev_state").agg(sum(col("n")).as("row_n"))
    trans
      .join(rowTotals, "prev_state")
      .crossJoin(broadcast(nStates))
      .withColumn("p", round((col("n") + 1).cast("double") /
        (col("row_n") + col("n_states")).cast("double"), 6))
      .select("prev_state", "state", "n", "p")
  }

  /** POPULATION STABILITY INDEX between two snapshots of a numeric
    * column, per group — the binned drift score risk teams alarm on
    * (symmetrized discrete KL over fixed bins; conventional gates:
    * 0.1 watch, 0.2 act). Complements [[ksDrift]] (exact sup-gap on the
    * observed value grid) with the fixed-bin form whose cost is
    * independent of value cardinality — at 100 TB you run PSI on every
    * column every day and KS only where PSI alarms.
    *
    * Shape: one bounded PER-GROUP min/max aggregate fixes each group's
    * equal-width bin edges (per-group, not global: a group occupying a
    * narrow slice of the global domain would land in ONE global bin in
    * both snapshots and its PSI would read ~0 no matter how far it
    * drifted — exactly the alarm the operator exists to raise), then
    * ONE scan into a (group, snapshot, bin)-keyed map-side-combinable
    * count — state bounded by groups × bins × 2 regardless of corpus
    * size. A degenerate group (every value identical across both
    * snapshots) bins entirely to bin 0 on both sides and scores the
    * PSI it deserves: 0. The PSI algebra (Laplace-smoothed shares
    * p = (c + ½)/(n + ½·bins) so empty bins stay finite;
    * Σ (pₐ−p_b)·ln(pₐ/p_b) over the full bin grid) runs entirely on
    * that bounded table. `drifted` compares the UNROUNDED score (the
    * ksDrift lesson); psi is rounded for display.
    *
    * Groups present in only one snapshot are dropped (the p98 law — a
    * one-sided PSI is not a comparison). Returns
    * (g, n_a, n_b, psi, drifted). */
  def psiDrift(df: DataFrame, groupCol: String, valCol: String,
               snapshot: Column, bins: Int = 10,
               threshold: Double = 0.2): DataFrame = {
    require(bins >= 2, s"psiDrift: need >= 2 bins, got $bins")
    val base = df.select(col(groupCol).as("g"), snapshot.cast("int").as("snap"),
      col(valCol).cast("double").as("v")).filter(col("v").isNotNull)
    // per-group edges: one row per group, size-gated back onto the scan
    val ranges = base.groupBy("g")
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val binc = when(col("hi") === col("lo"), lit(0L)).otherwise(
      least(lit(bins - 1L), greatest(lit(0L),
        floor((col("v") - col("lo")) /
          ((col("hi") - col("lo")) / bins)).cast("long")))).as("b")
    // the one corpus-sized pass; bounded output fans out to the grid,
    // both snapshot sides, and the totals — persist it
    val counts = graft.operators.Broadcasts.trackedPersist(
      base.join(graft.operators.Broadcasts.sizeGated(ranges), "g")
        .groupBy(col("g"), col("snap"), binc).agg(count(lit(1)).as("c")))
    val totals = counts.groupBy("g", "snap").agg(sum(col("c")).as("n"))
    val grid = counts.select(col("g")).distinct()
      .select(col("g"), explode(sequence(lit(0L), lit(bins - 1L))).as("b"))
    def side(s: Int, cAs: String, nAs: String) =
      grid.join(counts.filter(col("snap") === s).select("g", "b", "c"),
        Seq("g", "b"), "left")
        .join(totals.filter(col("snap") === s).select(col("g"), col("n")), "g")
        .select(col("g"), col("b"),
          coalesce(col("c"), lit(0L)).as(cAs), col("n").as(nAs))
    val sm = 0.5
    val joined = side(0, "ca", "na").join(side(1, "cb", "nb"), Seq("g", "b"))
    val pa = (col("ca") + sm) / (col("na") + sm * bins)
    val pb = (col("cb") + sm) / (col("nb") + sm * bins)
    joined.groupBy("g").agg(
      max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
      sum((pa - pb) * log(pa / pb)).as("psi_raw"))
      .withColumn("drifted", col("psi_raw") > threshold)
      .select(col("g"), col("n_a"), col("n_b"),
        round(col("psi_raw"), 6).as("psi"), col("drifted"))
  }

  /** EXACT two-sample Kolmogorov–Smirnov distance per group vs the
    * global sample: D_g = sup_v |F_g(v) − F(v)| — the continuous-
    * distribution drift test complementing categorical divergences
    * (JS in Lm.sourceDrift). Both ECDFs jump only at observed values,
    * so the sup is attained on the global value grid, evaluated AFTER
    * each value's ties (right-continuous ECDF).
    *
    * Shape: two skinny (group, value)→count aggregates, a
    * grid×groups expansion joined left to per-group counts, and one
    * cumulative window per group. Cost is |distinct values| × |groups|
    * rows — fine whenever the value domain is bounded (prices, scores,
    * durations); for an unbounded continuous domain at 100 TB, swap the
    * exact grid for a fixed quantile grid (Stats quantile sketches) and
    * the same windows give a bounded-error D.
    *
    * Returns (group, n, d, drifted). */
  def ksDrift(df: DataFrame, groupCol: String, valCol: String,
              threshold: Double = 0.1): DataFrame = {
    // NULLs (and strings cast to null) are dropped up front, the psiDrift
    // convention — left in, they corrupt the two ECDFs INCONSISTENTLY
    // (n_all counts non-null while the grid cumsum kept a null row, and
    // the null grid key never joins back to a group's null count), which
    // inflates every group's sup-gap by its null share
    val base = df.select(col(groupCol).as("g"),
        col(valCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    val byVal = base.groupBy("g", "v").agg(count(lit(1)).as("c"))
    val globalByVal = base.groupBy("v").agg(count(lit(1)).as("cg"))
    val nGlobal = base.agg(count(col("v")).as("n_all"))
    val groups = base.select("g").distinct()
      .join(byVal.groupBy("g").agg(sum(col("c")).as("n_g")), "g")
    val wG = Window.partitionBy("g").orderBy("v")
    // global ECDF cumsum runs DISTRIBUTED (range-partitioned running
    // sum + offsets) — the value grid is distinct observed doubles,
    // unbounded on a continuous domain, so no single-partition window
    val grid = graft.operators.Ranks
      .globalCumSum(globalByVal, "cg", "cum_all", col("v"))
      .crossJoin(broadcast(nGlobal))
    val expanded = grid.crossJoin(broadcast(groups))
      .join(byVal, Seq("g", "v"), "left")
      .withColumn("cum_g", sum(coalesce(col("c"), lit(0L))).over(wG))
      .withColumn("gap", abs(
        col("cum_g").cast("double") / col("n_g") -
          col("cum_all").cast("double") / col("n_all")))
    // drifted compares the UNROUNDED sup gap to the threshold (the oracle
    // does the same); rounding first would flip the boolean for a true
    // gap inside (threshold, threshold + 5e-7). d is rounded for display
    // /hash-compare only.
    expanded.groupBy("g")
      .agg(max(col("n_g")).as("n"), max(col("gap")).as("d_raw"))
      .withColumn("drifted", col("d_raw") > threshold)
      .select(col("g"), col("n"), round(col("d_raw"), 6).as("d"),
        col("drifted"))
  }

  /** Markov removal-effect attribution (Anderl et al. 2016) — the
    * data-driven alternative to last-touch: model user journeys as a
    * Markov chain START → channels → {CONV, DROP}, score each channel
    * by how much total conversion probability DROPS when journeys
    * through it are cut (its removal redirects into DROP), and
    * normalize the removal effects into attribution shares.
    *
    * Distribution of work: the heavy pass is ONE windowed scan of the
    * event log building the transition-count table (paths truncated at
    * first conversion; START prefix; non-converting paths absorbed into
    * DROP). That table is |states|² ≤ a few dozen rows — bounded
    * METADATA, so the absorption arithmetic (finite-horizon power
    * iteration, `steps` rounds, one run per scenario) executes on the
    * driver like every other bounded collect in this repo (reservoirs,
    * centroids, quantile rows). The oracle unrolls the identical
    * finite-horizon recursion relationally — both sides compute the
    * same K-step absorbed mass, so convergence tolerance never enters
    * the compare.
    *
    * Returns one row per channel:
    * (channel, p_base, p_removed, removal_effect, share). */
  def markovAttribution(events: DataFrame, keyCol: String, tsCol: String,
                        tieCol: String, stateCol: String,
                        convState: String, steps: Int = 16): DataFrame = {
    val spark = events.sparkSession
    val w = Window.partitionBy("k").orderBy(col(tsCol), col(tieCol))
    val evs = events.select(col(keyCol).as("k"), col(tsCol), col(tieCol),
      when(col(stateCol) === convState, lit("CONV"))
        .otherwise(col(stateCol)).as("st"))
      .withColumn("rn", row_number().over(w))
    val firstConv = evs.filter(col("st") === "CONV")
      .groupBy("k").agg(min(col("rn")).as("prn"))
    // pe fans out THREE ways (lag stream, last-rn table, drop rows) and
    // evs two ways above it — unpersisted, the single collect below
    // re-runs the full windowed event scan ~5×, against the "ONE
    // windowed scan" shape this operator promises
    val pe = graft.operators.Broadcasts.trackedPersist(
      evs.join(firstConv, Seq("k"), "left")
        .filter(col("prn").isNull || col("rn") <= col("prn")))
    val w2 = Window.partitionBy("k").orderBy("rn")
    val steps1 = pe
      .withColumn("prev", lag(col("st"), 1).over(w2))
      .select(coalesce(col("prev"), lit("START")).as("a"), col("st").as("b"))
    val lastRn = pe.groupBy("k").agg(max(col("rn")).as("lrn"))
    val drops = pe.join(lastRn, "k").filter(col("rn") === col("lrn"))
      .filter(col("st") =!= "CONV")
      .select(col("st").as("a"), lit("DROP").as("b"))
    val counts = steps1.unionAll(drops).groupBy("a", "b")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // --- driver-side absorption over the bounded matrix ---------------
    val rowTotals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val p = counts.map { case (a, b, n) => (a, b, n.toDouble / rowTotals(a)) }
    val channels = counts.flatMap(c => Seq(c._1, c._2)).distinct
      .filterNot(Set("START", "CONV", "DROP")).sorted
    def absorbed(removed: Option[String]): Double = {
      val eff = p.map { case (a, b, pr) =>
        (a, if (removed.contains(b)) "DROP" else b, pr) }
      var mass = Map("START" -> 1.0, "CONV" -> 0.0, "DROP" -> 0.0)
        .withDefaultValue(0.0)
      for (_ <- 1 to steps) {
        val next = scala.collection.mutable.Map("CONV" -> mass("CONV"),
          "DROP" -> mass("DROP")).withDefaultValue(0.0)
        // removed channel's mass is dead weight: it re-routes to DROP
        next("DROP") += removed.map(mass(_)).getOrElse(0.0)
        eff.foreach { case (a, b, pr) =>
          if (!removed.contains(a)) next(b) += mass(a) * pr }
        mass = next.toMap.withDefaultValue(0.0)
      }
      mass("CONV")
    }
    val pBase = absorbed(None)
    val removals = channels.map(c => c -> absorbed(Some(c)))
    val totalRe = removals.map { case (_, pc) => math.max(0.0, pBase - pc) }.sum
    import spark.implicits._
    removals.map { case (c, pc) =>
      val re = math.max(0.0, pBase - pc)
      (c, round6(pBase), round6(pc), round6(re),
        round6(if (totalRe > 0) re / totalRe else 0.0))
    }.toSeq.toDF("channel", "p_base", "p_removed", "removal_effect", "share")
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
