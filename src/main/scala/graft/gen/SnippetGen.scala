package graft.gen

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, udf}

/** G9 `scala` generator — the full analog of the reference's user-code
  * (`golang`) generator (src/generator/golang.go:26-65: a Go snippet
  * `func gen() any` evaluated at runtime by the yaegi interpreter). Here
  * the snippet is Scala: a function literal `(idx: Long) => ...`,
  * compiled at runtime with the scala-compiler ToolBox.
  *
  * Distribution model: what ships to executors is the snippet SOURCE (a
  * plain string captured by the UDF closure) — a ToolBox-compiled class
  * lives in a driver-local classloader and cannot be serialized — and
  * each executor JVM compiles it once, lazily, into a per-JVM cache.
  * The snippet receives the row id and must be a pure function of it:
  * the reference's `gen()` takes no arguments and leans on process-local
  * randomness, which has no deterministic distributed equivalent; making
  * idx the seed keeps generation reproducible and partition-parallel.
  *
  * OPT-IN: compiling and running user code is gated behind
  * `spark.graft.gen.allowUserCode=true`. The reference runs snippets
  * unconditionally; an engine embedded in a long-lived service should
  * not. The cheaper, always-on escape hatch remains the `expr` generator
  * (an arbitrary SQL expression over `id` — codegen'd, no JVM compile).
  */
object SnippetGen {

  val EnableKey = "spark.graft.gen.allowUserCode"

  /** per-JVM compile cache: snippet source → compiled function. */
  private val cache = new ConcurrentHashMap[String, Long => Any]()

  private[gen] def compile(src: String): Long => Any =
    cache.computeIfAbsent(src, s => {
      import scala.reflect.runtime.{universe => ru}
      import scala.tools.reflect.ToolBox
      val tb = ru.runtimeMirror(getClass.getClassLoader).mkToolBox()
      val fn =
        try tb.eval(tb.parse(s"($s): (Long => Any)"))
        catch {
          case e: Throwable => throw new IllegalArgumentException(
            s"scala generator snippet failed to compile: ${e.getMessage}\n" +
              s"snippet (must be a `(idx: Long) => ...` function literal):\n$s", e)
        }
      fn.asInstanceOf[Long => Any]
    })

  /** Generator column: snippet applied to the row id, rendered through a
    * string round-trip (the snippet returns Any; the declared column
    * type is applied by the caller's cast, same contract as `format`). */
  def column(snippet: String): Column = {
    val spark = SparkSession.active
    require(spark.conf.getOption(EnableKey).contains("true"),
      s"the `scala` user-code generator is disabled; set $EnableKey=true " +
        "to opt in (or use the always-on `expr` SQL generator)")
    compile(snippet) // fail fast on the driver for syntax/type errors
    val f = udf { idx: Long =>
      val v = compile(snippet)(idx)
      if (v == null) null else v.toString
    }
    f(col("id"))
  }
}
