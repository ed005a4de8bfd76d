package graft.replay

import scala.collection.mutable
import graft.SparkSpec
import graft.workload.{ReplayCodec, ReplayStatement}
import graft.diff.Diff

/** Process-wide call counter for the transient-failure UDF (local-mode
  * executors share the JVM, so the counter sees every call). */
object Flaky {
  val calls = new java.util.concurrent.atomic.AtomicInteger(0)
}

class ReplaySpec extends SparkSpec {

  private val fixtureDir = getClass.getResource("/fixture").getPath

  private def stmt(ts: Long, id: String, dur: Long, sql: String) =
    ReplayStatement(ts.toString, ts, "db", id, dur, sql)

  test("timing: (ts - prevTs - prevDur)/speed with <=2ms floor, per client") {
    val sleeps = mutable.ArrayBuffer.empty[Long]
    val sqls = Seq(
      stmt(1000, "q1", 50, "select 1 as a"),
      stmt(1300, "q2", 10, "select 2 as a"),   // (1300-1000-50)/2 = 125
      stmt(1302, "q3", 0, "select 3 as a"))    // (1302-1300-10)/2 < 0 -> no sleep
    val res = Replay.replay(spark, Map("c1" -> sqls), minTs = 900,
      Replay.Options(speed = 2.0), sleeper = ms => sleeps += ms)
    assert(sleeps == mutable.ArrayBuffer(50L, 125L)) // (1000-900-0)/2, then 125
    assert(res("c1").map(_.queryId) == Seq("q1", "q2", "q3"))
    assert(res("c1").forall(_.err.isEmpty))
    assert(res("c1").map(_.returnRows) == Seq(1L, 1L, 1L))
  }

  test("conn-idle recycling: a long gap drops the client session, keeps the db") {
    spark.sql("CREATE DATABASE IF NOT EXISTS rp_idle")
    var created = 0
    val sessions = mutable.ArrayBuffer.empty[org.apache.spark.sql.SparkSession]
    def factory(root: org.apache.spark.sql.SparkSession) = {
      created += 1
      val s = root.newSession()
      sessions += s
      s
    }
    val sqls = Seq(
      stmt(1000, "q1", 0, "create temporary view rp_tmp as select 1 as a")
        .copy(db = "rp_idle"),
      // 10 s gap > 5 s idle default -> recycle; temp view must be GONE
      stmt(11000, "q2", 0, "select * from rp_tmp").copy(db = "rp_idle"),
      stmt(11001, "q3", 0, "select current_database() as d").copy(db = "rp_idle"))
    val res = Replay.replay(spark, Map("c" -> sqls), minTs = 1000,
      Replay.Options(), sleeper = _ => (), sessionFor = factory)("c")
    assert(created == 2, s"expected one recycle, got $created session(s)")
    assert(res(0).err.isEmpty)
    assert(res(1).err.nonEmpty, "temp view must not survive the recycle (reconnect semantics)")
    assert(res(2).err.isEmpty, "current db must survive the recycle")
    assert(sessions.last.catalog.currentDatabase == "rp_idle")
    // <=0 disables recycling entirely
    var created2 = 0
    Replay.replay(spark, Map("c" -> sqls.take(2)), minTs = 1000,
      Replay.Options(maxConnIdleMs = 0), sleeper = _ => (),
      sessionFor = s => { created2 += 1; s.newSession() })
    assert(created2 == 1)
  }

  test("cluster routing pins the client's scheduler pool (db@cluster analog)") {
    // the pool property is thread-local to the client's replay thread —
    // the sleeper runs on that thread, so it can observe it directly
    val pools = mutable.ArrayBuffer.empty[String]
    val sqls = Seq(stmt(1000, "q1", 0, "select 1 as a"))
    val res = Replay.replay(spark, Map("c" -> sqls), minTs = 0,
      Replay.Options(cluster = Some("cloud_pool_1")),
      sleeper = _ => pools += spark.sparkContext.getLocalProperty("spark.scheduler.pool"))
    assert(res("c").head.err.isEmpty)
    assert(pools == mutable.ArrayBuffer("cloud_pool_1"))
    // without the option the pool is untouched
    val pools2 = mutable.ArrayBuffer.empty[String]
    Replay.replay(spark, Map("c" -> sqls), minTs = 0, Replay.Options(),
      sleeper = _ => pools2 += String.valueOf(
        spark.sparkContext.getLocalProperty("spark.scheduler.pool")))
    assert(pools2 == mutable.ArrayBuffer("null"))
  }

  test("replay fixture statements; unsupported ones record errors, not throws") {
    val decoded = ReplayCodec.decode(spark, s"$fixtureDir/replay.sql")
    val byClient = ReplayCodec.byClient(decoded)
    assert(byClient.nonEmpty)
    val res = Replay.replay(spark, byClient, minTs = 0,
      Replay.Options(speed = 1e9), sleeper = _ => ()) // no real sleeping
    val all = res.values.flatten.toSeq
    assert(all.nonEmpty)
    // trivial selects succeed with 1 row; SHOW VARIABLES LIKE is not
    // Spark SQL -> must be a recorded error, not an exception
    assert(all.exists(r => r.err.isEmpty && r.returnRows == 1))
    assert(all.forall(r => r.durationMs >= 0))
  }

  test("replay twice -> diff reports zero regressions (deterministic)") {
    val sqls = Seq(
      stmt(0, "q1", 0, "select 1 as a union all select 2"),
      stmt(0, "q2", 0, "select 'x' as s"),
      stmt(0, "q3", 0, "select bad syntax here from"))
    val opts = Replay.Options(speed = 1e9, maxHashRows = 10)
    val r1 = Replay.replay(spark, Map("c" -> sqls), 0, opts, _ => ())
    val r2 = Replay.replay(spark, Map("c" -> sqls), 0, opts, _ => ())
    val d1 = java.nio.file.Files.createTempDirectory("graft_rep1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_rep2").toString
    Replay.writeResults(d1, r1)
    Replay.writeResults(d2, r2)
    val df1 = Replay.readResults(spark, d1)
    val df2 = Replay.readResults(spark, d2)
    assert(df1.count() == 3)
    // durations jitter but stay under the 100ms regression threshold for
    // these trivial statements after warmup; rows/hash/err must agree
    val report = Diff.report(Diff.compare(df1, df2, minDurationDiffMs = 60000))
    assert(report.count() == 0)
    // the q3 parse error is recorded on both sides identically
    assert(df1.filter("queryId = 'q3' AND err IS NOT NULL").count() == 1)
  }

  test("R3: per-statement db context switches the client session database") {
    spark.sql("CREATE DATABASE IF NOT EXISTS replay_db")
    spark.sql("CREATE TABLE IF NOT EXISTS replay_db.rt (id BIGINT) USING parquet")
    spark.sql("INSERT OVERWRITE replay_db.rt VALUES (1), (2), (3)")
    try {
      val stmts = Seq(graft.workload.ReplayStatement(
        "2024-01-01 00:00:00", 0L, "replay_db", "qdb", 0L, "SELECT * FROM rt"))
      val results = Replay.replay(spark, Map("c1" -> stmts), minTs = 0L,
        Replay.Options(), sleeper = _ => ())
      val r = results("c1").head
      assert(r.err.isEmpty, s"err: ${r.err}")
      assert(r.returnRows == 3) // resolved rt through USE replay_db
    } finally {
      spark.sql("DROP TABLE IF EXISTS replay_db.rt")
      spark.sql("DROP DATABASE IF EXISTS replay_db")
    }
  }

  test("R2: a transiently-failing statement succeeds on retry") {
    Flaky.calls.set(0)
    // nondeterministic so Catalyst cannot constant-fold the 0-arg call
    // away at optimization time (which would absorb the planted failure)
    spark.udf.register("graft_flaky_once",
      org.apache.spark.sql.functions.udf(() => {
        if (Flaky.calls.incrementAndGet() == 1)
          throw new RuntimeException("transient boom")
        42L
      }).asNondeterministic())
    val stmts = Seq(graft.workload.ReplayStatement(
      "2024-01-01 00:00:00", 0L, "", "qr", 0L, "SELECT graft_flaky_once() AS v"))
    // the test UDF lives on the parent session, so replay on it directly
    // (child sessions get a fresh function registry)
    // maxHashRows forces row collection — a bare count() would let the
    // optimizer prune the projection and never evaluate the UDF
    val noRetry = Replay.replay(spark, Map("c" -> stmts), 0L,
      Replay.Options(retries = 0, maxHashRows = 10), sleeper = _ => (), sessionFor = identity)
    assert(noRetry("c").head.err.contains("boom")) // first call fails
    Flaky.calls.set(0)
    val withRetry = Replay.replay(spark, Map("c" -> stmts), 0L,
      Replay.Options(retries = 1, maxHashRows = 10), sleeper = _ => (), sessionFor = identity)
    assert(withRetry("c").head.err.isEmpty, withRetry("c").head.err)
    assert(withRetry("c").head.returnRows == 1)
    assert(graft.replay.Flaky.calls.get() == 2) // exactly one retry
  }

  // ---- R1 at scale (VERDICT r10 item 7): 1000 clients ------------------

  test("1000-client fake-clock replay: zero scheduling drift, bounded per-statement overhead") {
    // Every client gets the same 3-statement timeline; with every gap
    // above the floor, the inter-arrival formula compensates exactly, so
    // each client's granted sleeps must be EXACTLY (200, 200) ms — any
    // deviation is scheduler drift. Sleeps are recorded per thread (a
    // client runs serially on one dedicated thread), not slept, and the
    // statements are parse-fail no-ops (driver-only, R5 records the err,
    // no Spark job) so the probe measures the SCHEDULER: drift,
    // bookkeeping, thread fan-out — not DAGScheduler throughput (that
    // cost is measured separately below and in SCALE.md).
    val nClients = 1000
    val sqls = Seq(
      stmt(0, "q1", 100, "not sql §"),
      stmt(500, "q2", 100, "not sql §"),   // (500-0-100)/2 = 200
      stmt(1000, "q3", 100, "not sql §"))  // (1000-500-100)/2 = 200
    val granted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val clients = (1 to nClients).map(i => s"c$i" -> sqls).toMap
    val t0 = System.nanoTime()
    val res = Replay.replay(spark, clients, minTs = 0,
      Replay.Options(speed = 2.0),
      sleeper = granted.add(_),
      sessionFor = identity) // shared session: the probe targets the
                             // scheduler, not 1000 catalog clones
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(res.size == nClients)
    assert(res.values.forall(r => r.size == 3 && r.forall(_.err.nonEmpty)))
    // drift bound: exactly 2 sleeps per client were granted and every
    // one is exactly the ideal 200 ms — any other value or count is
    // scheduler drift. (Attribution is deliberately not per-thread: the
    // cached pool reuses a thread when one client finishes before
    // another starts; per-client serial order is covered by the timing
    // tests above, thread fan-out by the convoy test below.)
    val vals = granted.toArray.map(_.asInstanceOf[Long])
    assert(vals.length == 2 * nClients,
      s"expected ${2 * nClients} granted sleeps, got ${vals.length}")
    assert(vals.forall(_ == 200L),
      s"drift detected: ${vals.find(_ != 200L)}")
    val perStmtMs = wallSec * 1000 / (3 * nClients)
    info(f"1000-client scheduler probe: $wallSec%.2f s wall, $perStmtMs%.2f ms/stmt")
    // WALL-CLOCK bound (machine-dependent, unlike the exact-drift assert
    // above): strict only under SPARK_GRAFT_STRICT_TIMING — on a loaded
    // CI box thread fan-out + GC can breach 25 ms/stmt with a correct
    // scheduler. The unconditional bound is the convoy threshold.
    val strictTiming = sys.env.contains("SPARK_GRAFT_STRICT_TIMING")
    if (strictTiming)
      assert(perStmtMs < 25.0, f"per-statement scheduler overhead $perStmtMs%.1f ms")
    else
      assert(perStmtMs < 100.0, f"convoy-scale overhead $perStmtMs%.1f ms/stmt")
    // the REAL-statement cost at scale, for SCALE.md (no assert — it
    // measures local-mode DAGScheduler throughput, not this scheduler):
    // 200 clients x 1 trivial distributed statement
    val realClients = (1 to 200).map(i =>
      s"r$i" -> Seq(stmt(0, "q", 0, "select 1 as a"))).toMap
    val t1 = System.nanoTime()
    Replay.replay(spark, realClients, 0, Replay.Options(),
      sleeper = _ => (), sessionFor = identity)
    info(f"200 concurrent 'select 1' statements: ${(System.nanoTime() - t1) / 1e9}%.2f s")
  }

  test("1000 clients with REAL sleeps run on dedicated threads, not a convoy") {
    // One 600 ms arrival gap per client, real Thread.sleep, driver-only
    // statements. On a shared ~32-thread pool the sleeps serialize into
    // ceil(1000/32) ≈ 32 convoys ≈ 19 s; on dedicated threads all
    // clients sleep CONCURRENTLY and the wall is ~0.6 s + bookkeeping.
    // The bound sits well between the two (convoying lands ~19 s).
    val nClients = 1000
    val sqls = Seq(stmt(600, "q1", 0, "not sql §"))
    val clients = (1 to nClients).map(i => s"c$i" -> sqls).toMap
    val t0 = System.nanoTime()
    val res = Replay.replay(spark, clients, minTs = 0,
      Replay.Options(), sessionFor = identity) // default sleeper: real sleep
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(res.size == nClients)
    info(f"1000 concurrent 600ms-gap clients: $wallSec%.2f s wall")
    // a convoy on a ~32-thread pool lands ~19 s; 10 s (strict) and 15 s
    // (default, loaded-machine headroom) both sit well under it
    val bound = if (sys.env.contains("SPARK_GRAFT_STRICT_TIMING")) 10.0 else 15.0
    assert(wallSec < bound,
      f"convoy suspected: $wallSec%.1f s for a 0.6 s concurrent timeline")
  }

  test("result JSON shape matches the reference (omitempty fields)") {
    val r = Replay.Result("2024-08-06 23:44:11.041", "qid", 3, "", 12, "")
    assert(Replay.resultJson(r) ==
      """{"ts":"2024-08-06 23:44:11.041","queryId":"qid","returnRows":3,"durationMs":12}""")
    val rh = Replay.Result("", "qid", 2, "abc123", 5, "boom")
    assert(Replay.resultJson(rh) ==
      """{"queryId":"qid","returnRows":2,"returnRowsHash":"abc123","durationMs":5,"err":"boom"}""")
  }
}
