package graft.functions

import org.apache.spark.sql.SparkSession

/** Per-session idempotence guard for the graft_* function registrars.
  *
  * Every module's `register(spark)` used to call
  * `createOrReplaceTempFunction` unconditionally; query bodies call
  * `register` defensively (a query must work in a bare session), so a
  * bench pass over 238 queries re-registered each kernel hundreds of
  * times. That is correct but noisy: SimpleFunctionRegistry logs a WARN
  * per replacement, and in the r12 driver bench that spam was ~90% of
  * the stderr tail — the only log the driver keeps when a run is killed
  * (VERDICT r12 item 1d/2). Registering once per session keeps the
  * replace path cold and the tail carrying real signal.
  *
  * Keyed weakly on the session object: `newSession()` forks have their
  * own `functionRegistry`, get their own entry, and are collected with
  * the session.
  */
object RegisterOnce {
  private val perSession =
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]()

  /** Run `body` (the module's actual registration calls) only the first
    * time this (session, module) pair is seen. */
  def apply(spark: SparkSession, module: String)(body: => Unit): Unit = {
    val mods = perSession.synchronized {
      perSession.computeIfAbsent(
        spark, _ => java.util.concurrent.ConcurrentHashMap.newKeySet[String]())
    }
    if (mods.add(module)) body
  }
}
