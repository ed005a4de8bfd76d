package graft.genrule

import java.time.LocalDate
import scala.jdk.CollectionConverters._

/** Generation-rule model: a recursive, YAML-shaped tree of per-column
  * knobs (null_frequency, min/max, length, gen.inc/enum/..., element/key/
  * value/fields sub-rules). Resolution precedence mirrors the reference
  * (reference: src/gendata.go:104-162, src/generator/generator_defaults.go:165-198):
  *
  *   column custom rule  >  stats-derived rule  >  global per-type default
  *
  * with NOT NULL DDL forcing null_frequency = 0, and the global
  * `null_frequency` copied into every type default that lacks one.
  */
object GenRules {

  /** A rule node: values are scalars, Seq[Any], or nested Rule maps. */
  type Rule = Map[String, Any]
  val empty: Rule = Map.empty

  /** Shallow per-key overwrite merge (src wins), mirroring the reference's
    * MergeGenRules with overwrite=true (values replaced whole, not
    * deep-merged) — reference: src/generator/misc.go:41-48. */
  def merge(dst: Rule, src: Rule): Rule = dst ++ src
  /** No-overwrite merge: keep dst's keys, add src's missing ones. */
  def mergeKeep(dst: Rule, src: Rule): Rule = src ++ dst

  def asRule(v: Any): Rule = v match {
    case r: Rule @unchecked if v.isInstanceOf[Map[_, _]] => r
    case null => empty
    case _ => empty
  }

  def toDouble(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case s: String => s.toDouble
    case d: LocalDate => d.toEpochDay.toDouble
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }
  def toLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case s: String => s.trim.toDouble.toLong
    case other => throw new IllegalArgumentException(s"not integral: $other")
  }
  def toInt(v: Any): Int = toLong(v).toInt

  /** Per-type defaults (reference: src/generator/generator_defaults.go:76-163).
    * DATE/DATETIME default to [today-10y, today]. */
  def defaultTypeRules(today: LocalDate = LocalDate.now()): Map[String, Rule] = {
    val len13: Rule = Map("length" -> Map("min" -> 1, "max" -> 3))
    val len110: Rule = Map("length" -> Map("min" -> 1, "max" -> 10))
    val dateRange: Rule = Map("min" -> today.minusYears(10).toString, "max" -> today.toString)
    Map(
      "ARRAY"    -> len13,
      "MAP"      -> len13,
      "JSON"     -> Map("structure" -> "STRUCT<col1:SMALLINT, col2:SMALLINT>"),
      "JSONB"    -> Map("structure" -> "STRUCT<col1:SMALLINT, col2:SMALLINT>"),
      "VARIANT"  -> Map("structure" -> "STRUCT<col1:SMALLINT, col2:SMALLINT>"),
      "BITMAP"   -> Map("length" -> 5, "min" -> 0L, "max" -> Int.MaxValue.toLong),
      "TEXT"     -> len110,
      "STRING"   -> len110,
      "VARCHAR"  -> len110,
      "CHAR"     -> len110,
      "TINYINT"  -> Map("min" -> 0L, "max" -> Byte.MaxValue.toLong),
      "SMALLINT" -> Map("min" -> 0L, "max" -> Short.MaxValue.toLong),
      "INT"      -> Map("min" -> 0L, "max" -> Int.MaxValue.toLong),
      "BIGINT"   -> Map("min" -> 0L, "max" -> Int.MaxValue.toLong),
      "LARGEINT" -> Map("min" -> 0L, "max" -> Int.MaxValue.toLong),
      "FLOAT"    -> Map("min" -> 0L, "max" -> Short.MaxValue.toLong),
      "DOUBLE"   -> Map("min" -> 0L, "max" -> Int.MaxValue.toLong),
      "DECIMAL"  -> Map("min" -> 0L, "max" -> Int.MaxValue.toLong),
      "DATE"     -> dateRange,
      "DATETIME" -> dateRange)
  }

  /** The resolved global rule environment for one genconf document. */
  case class Env(typeRules: Map[String, Rule], globalNullFrequency: Double,
                 tables: Map[String, TableRules]) {
    /** Type default with the global null_frequency filled in. */
    def typeDefault(baseType: String): Rule = {
      val r = typeRules.getOrElse(baseType, empty)
      if (r.contains("null_frequency")) r
      else r + ("null_frequency" -> globalNullFrequency)
    }
  }
  case class TableRules(rowCount: Option[Long], columns: Map[String, Rule])

  /** Build the Env from a parsed genconf document (or an empty one).
    * Mirrors SetupGenRules: global type overrides overwrite-merge into the
    * per-type defaults. */
  def buildEnv(conf: Rule, today: LocalDate = LocalDate.now()): Env = {
    val globalNull = conf.get("null_frequency").map(toDouble).getOrElse(0.0)
    val overrides = asRule(conf.getOrElse("type", empty)).map {
      case (k, v) => k.toUpperCase -> asRule(v)
    }
    val defaults = defaultTypeRules(today)
    val merged = (defaults.keySet ++ overrides.keySet).map { ty =>
      ty -> merge(defaults.getOrElse(ty, empty), overrides.getOrElse(ty, empty))
    }.toMap
    val tables = conf.get("tables") match {
      case Some(ts: Seq[Any] @unchecked) =>
        ts.map(asRule).flatMap { t =>
          t.get("name").map(_.toString).map { name =>
            val cols = t.get("columns") match {
              case Some(cs: Seq[Any] @unchecked) =>
                cs.map(asRule).flatMap(c => c.get("name").map(_.toString -> (c - "name"))).toMap
              case _ => Map.empty[String, Rule]
            }
            name -> TableRules(t.get("row_count").map(toLong), cols)
          }
        }.toMap
      case _ => Map.empty[String, TableRules]
    }
    Env(merged, globalNull, tables)
  }

  /** Resolve the rule for one column (reference: newColGenRule,
    * src/gendata.go:104-162): stats first, then custom rule overwrites,
    * then NOT NULL forces null_frequency=0. Type defaults are merged
    * no-overwrite at generator-build time. */
  def columnRule(
      stats: Option[ColumnStats], isStringType: Boolean, isCharType: Boolean,
      custom: Rule, notNull: Boolean): Rule = {
    var r: Rule = empty
    stats.foreach { st =>
      if (st.count > 0) {
        val nf = st.nullCount.toDouble / st.count
        if (nf >= 0 && nf < 1) r += ("null_frequency" -> nf)
      }
      if (isStringType) {
        val avgLen = st.avgSizeByte
        // the reference's ±5/10 string-length hack (gendata.go:122-139)
        if (!isCharType && st.min.length != st.max.length) {
          val extent = if (avgLen > 10) 10L else if (avgLen > 5) 5L else 0L
          r += ("length" -> Map("min" -> (avgLen - extent), "max" -> (avgLen + extent)))
        } else r += ("length" -> avgLen)
      } else {
        if (st.min.nonEmpty) r += ("min" -> st.min)
        if (st.max.nonEmpty) r += ("max" -> st.max)
      }
    }
    r = merge(r, custom)
    if (notNull) r += ("null_frequency" -> 0.0)
    r
  }

  // ---- YAML ----------------------------------------------------------

  /** Parse a (possibly multi-document, ---separated) genconf YAML into
    * rule trees; max 128 documents, mirroring the reference cap. */
  def parseYamlDocs(yaml: String): Seq[Rule] = {
    val loader = new org.yaml.snakeyaml.Yaml()
    loader.loadAll(yaml).asScala.toSeq.take(128).map(fromJava).map(asRule)
  }
  def parseYaml(yaml: String): Rule = parseYamlDocs(yaml).headOption.getOrElse(empty)

  private def fromJava(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) => k.toString -> fromJava(vv) }.toMap
    case l: java.util.List[_] => l.asScala.toSeq.map(fromJava)
    case d: java.util.Date =>
      d.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
    case other => other
  }
}

/** Per-column statistics (SURVEY.md §1.1; reference: src/db.go:78-94). */
case class ColumnStats(
    name: String, count: Long = 0, ndv: Long = 0, nullCount: Long = 0,
    dataSize: Long = 0, avgSizeByte: Long = 0, min: String = "", max: String = "",
    method: String = "")

case class TableStats(name: String, rowCount: Long, columns: Seq[ColumnStats]) {
  def col(n: String): Option[ColumnStats] = columns.find(_.name == n)
}
