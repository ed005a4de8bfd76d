package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics beyond [[Rank.pageRank]] and the
  * connected-components family in [[Dedup]].
  */
object Graphs {

  /** Exact triangle count + global transitivity by DEGREE ORIENTATION
    * (the node-iterator of Schank & Wagner 2005, as distributed in
    * Suri & Vassilvitskii's MapReduce formulation).
    *
    * The naive wedge join (all 2-paths probed against the edge set)
    * explodes on hubs: a degree-d node makes C(d,2) wedges, and real
    * graphs are power-law. The fix is a total order ≺ by (degree, id):
    * orient every edge low≺high, build wedges only from each node's
    * OUT-neighbors, and close them against oriented edges. Out-degree
    * is then bounded by O(√m) regardless of hubs (a node ranked above
    * d neighbors has degree ≥ each of theirs, so d ≤ √(2m)), which
    * bounds total wedges by m^{3/2} — the proven worst case for exact
    * triangle enumeration, hit only by degenerate graphs. Each triangle
    * {a≺b≺c} is emitted exactly once: from wedge (a→b, a→c) closed by
    * b→c.
    *
    * Plan shape: degrees = one skinny aggregate; orientation = two
    * broadcast-or-shuffle joins of (src,dst) against (node,deg); wedges
    * = one self equi-join on src; closure = one equi-join on (v,w).
    * Nothing wider than (long, long) tuples ever shuffles.
    *
    * `edges` must be undirected-canonical: one row per edge, u < v, no
    * self loops (use [[canonicalEdges]]).
    *
    * Returns one row: (n_nodes, n_edges, n_wedges, n_triangles,
    * transitivity) where n_wedges counts UNDIRECTED wedges Σ C(deg,2)
    * and transitivity = 3·triangles / wedges (NULL when wedge-free). */
  def triangleStats(edges: DataFrame): DataFrame = {
    val e = edges.select(col("u").cast("long").as("u"),
      col("v").cast("long").as("v"))
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // orient by (deg, id): src = the ≺-smaller endpoint. Persisted: the
    // oriented edge set is consumed THREE times (both wedge legs + the
    // closure probe) and its build re-runs two edge×degree joins per
    // consumer when recomputed — skinny (long,long,long) rows,
    // MEMORY_AND_DISK spills rather than OOMs.
    val oriented = e
      .join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
      .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"),
        // carry dst's degree so wedge pairs order by ≺ without re-joining
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("dv"))
          .otherwise(col("du")).as("dst_deg"))
      .transform(graft.operators.Broadcasts.trackedPersist)
    // wedges from each src's out-neighborhood, ordered by ≺ = (deg, id)
    val a = oriented.select(col("src"), col("dst").as("b"), col("dst_deg").as("db"))
    val c = oriented.select(col("src"), col("dst").as("c"), col("dst_deg").as("dc"))
    val wedges = a.join(c, "src")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
      .select(col("b"), col("c"))
    // The closure probes the WEDGE stream (m^{3/2} rows, the big side)
    // against the EDGE set (m rows). Shuffling m^{3/2} wedge rows to
    // meet m edges is the wrong asymmetry whenever the edge set fits a
    // broadcast — but an edge set is graph-linear, so the hint goes
    // through the measured size gate: under the cap the wedge stream
    // never shuffles at all; past it the planner shuffles both sides.
    val probe = graft.operators.Broadcasts.sizeGated(
      oriented.select(col("src").as("b"), col("dst").as("c")))
    val tri = wedges.join(probe, Seq("b", "c"))
      .agg(count(lit(1)).as("n_triangles"))
    // Integral `div`, not true division: sum(long)/2 goes through DOUBLE,
    // whose 53-bit mantissa silently truncates once sum(d*(d-1)) passes
    // 2^53 (one hub of degree ~1e8 suffices) — `div` stays in LongType.
    val degAgg = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(d) div 2").as("n_edges"),
      expr("sum(d * (d - 1)) div 2").as("n_wedges"))
    degAgg.crossJoin(tri)
      .withColumn("transitivity",
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)))
  }

  /** Canonicalize an edge list: undirected, deduped, u < v, no loops. */
  def canonicalEdges(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    pairs.select(
      least(col(aCol), col(bCol)).cast("long").as("u"),
      greatest(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") < col("v"))
      .distinct()
}
