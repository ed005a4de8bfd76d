package graft.ddl

import org.apache.spark.sql.types._

/** Doris DDL dialect — the type system and CREATE TABLE subset the engine
  * understands (SURVEY.md §1.2). Schemas are explicit and parsed, never
  * inferred from data, mirroring the reference's contract
  * (reference: src/gendata.go:32-38). OLAP-only clauses (ENGINE, keys,
  * distribution, PROPERTIES) are retained as opaque metadata.
  */
sealed trait DType { def sql: String }
object DType {
  case object DBoolean            extends DType { val sql = "boolean" }
  case object DTinyInt            extends DType { val sql = "tinyint" }
  case object DSmallInt           extends DType { val sql = "smallint" }
  case object DInt                extends DType { val sql = "int" }
  case object DBigInt             extends DType { val sql = "bigint" }
  case object DLargeInt           extends DType { val sql = "largeint" }
  case object DFloat              extends DType { val sql = "float" }
  case object DDouble             extends DType { val sql = "double" }
  case class  DDecimal(p: Int, s: Int) extends DType { def sql = s"decimal($p,$s)" }
  case object DDate               extends DType { val sql = "date" }
  case object DDatetime           extends DType { val sql = "datetime" }
  case class  DChar(n: Int)       extends DType { def sql = s"char($n)" }
  case class  DVarchar(n: Option[Int]) extends DType { def sql = n.fold("varchar")(l => s"varchar($l)") }
  case object DString             extends DType { val sql = "string" }
  /** JSON / JSONB / VARIANT — generated from a declared `structure`. */
  case class  DJson(kind: String) extends DType { def sql = kind.toLowerCase }
  case object DBitmap             extends DType { val sql = "bitmap" }
  case object DHll                extends DType { val sql = "hll" }
  case object DIpv4               extends DType { val sql = "ipv4" }
  case object DIpv6               extends DType { val sql = "ipv6" }
  case class  DArray(elem: DType) extends DType { def sql = s"array<${elem.sql}>" }
  case class  DMap(k: DType, v: DType) extends DType { def sql = s"map<${k.sql},${v.sql}>" }
  case class  DStruct(fields: Seq[(String, DType)]) extends DType {
    def sql = fields.map { case (n, t) => s"$n:${t.sql}" }.mkString("struct<", ",", ">")
  }

  /** Normalized base-type name used for generator-rule lookup (mirrors the
    * alias table, reference: src/generator/generator_defaults.go:23-34). */
  def baseType(t: DType): String = t match {
    case DBoolean      => "BOOLEAN"
    case DTinyInt      => "TINYINT"
    case DSmallInt     => "SMALLINT"
    case DInt          => "INT"
    case DBigInt       => "BIGINT"
    case DLargeInt     => "LARGEINT"
    case DFloat        => "FLOAT"
    case DDouble       => "DOUBLE"
    case _: DDecimal   => "DECIMAL"
    case DDate         => "DATE"
    case DDatetime     => "DATETIME"
    case _: DChar      => "CHAR"
    case _: DVarchar   => "VARCHAR"
    case DString       => "STRING"
    case j: DJson      => j.kind.toUpperCase
    case DBitmap       => "BITMAP"
    case DHll          => "HLL"
    case DIpv4         => "IPV4"
    case DIpv6         => "IPV6"
    case _: DArray     => "ARRAY"
    case _: DMap       => "MAP"
    case _: DStruct    => "STRUCT"
  }

  /** Spark physical type for a Doris logical type. BITMAP is modeled as
    * ARRAY<BIGINT> (loaded via bitmap_from_array at the sink boundary);
    * HLL/JSON/IP are strings; LARGEINT (int128) is DECIMAL(38,0). */
  def toSpark(t: DType): DataType = t match {
    case DBoolean      => BooleanType
    case DTinyInt      => ByteType
    case DSmallInt     => ShortType
    case DInt          => IntegerType
    case DBigInt       => LongType
    case DLargeInt     => DecimalType(38, 0)
    case DFloat        => FloatType
    case DDouble       => DoubleType
    case DDecimal(p, s)=> DecimalType(p, s)
    case DDate         => DateType
    case DDatetime     => TimestampType
    case _: DChar | _: DVarchar | DString | _: DJson | DHll | DIpv4 | DIpv6 => StringType
    case DBitmap       => ArrayType(LongType, containsNull = false)
    case DArray(e)     => ArrayType(toSpark(e))
    case DMap(k, v)    => MapType(toSpark(k), toSpark(v))
    case DStruct(fs)   => StructType(fs.map { case (n, ft) => StructField(n, toSpark(ft)) })
  }
}

case class ColumnDef(name: String, dtype: DType, nullable: Boolean,
                     defaultValue: Option[String] = None)

case class TableDef(name: String, columns: Seq[ColumnDef],
                    properties: Map[String, String] = Map.empty,
                    opaqueTail: String = "") {
  def schema: StructType =
    StructType(columns.map(c => StructField(c.name, DType.toSpark(c.dtype), c.nullable)))
  def column(n: String): Option[ColumnDef] = columns.find(_.name == n)
}

/** Hand-written recursive-descent parser for the Doris CREATE TABLE subset
  * (column name/type/nullability/default; INDEX/KEY entries skipped; ENGINE
  * and PROPERTIES kept opaque). Spark-first reimplementation of what the
  * reference delegates to its ANTLR grammar (reference:
  * src/parser/DorisParser.g4:1685-1738 for the type grammar).
  */
object DorisDdl {

  private val alias = Map(
    "INTEGER" -> "INT", "TEXT" -> "STRING", "BOOL" -> "BOOLEAN",
    "DECIMALV2" -> "DECIMAL", "DECIMALV3" -> "DECIMAL",
    "DATEV1" -> "DATE", "DATEV2" -> "DATE",
    "DATETIMEV1" -> "DATETIME", "DATETIMEV2" -> "DATETIME",
    "TIMESTAMP" -> "DATETIME")

  final class Cursor(val s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def peek: Char = s.charAt(i)
    def skipWs(): Unit = {
      while (!eof && (peek.isWhitespace || startsComment)) {
        if (startsComment) skipComment() else i += 1
      }
    }
    private def startsComment: Boolean =
      !eof && i + 1 < s.length &&
        ((peek == '-' && s.charAt(i + 1) == '-') || (peek == '/' && s.charAt(i + 1) == '*'))
    private def skipComment(): Unit = {
      if (peek == '-') { while (!eof && peek != '\n') i += 1 }
      else { i += 2; while (i + 1 < s.length && !(peek == '*' && s.charAt(i + 1) == '/')) i += 1; i = math.min(i + 2, s.length) }
    }
    /** Identifier, optionally backtick- or double-quote-quoted. */
    def ident(): String = {
      skipWs()
      if (eof) fail("identifier")
      peek match {
        case '`' | '"' =>
          val q = peek; i += 1; val b = new StringBuilder
          while (!eof && peek != q) { b += peek; i += 1 }
          if (eof) fail(s"closing $q"); i += 1
          b.toString
        case _ =>
          val b = new StringBuilder
          while (!eof && (peek.isLetterOrDigit || peek == '_' || peek == '$')) { b += peek; i += 1 }
          if (b.isEmpty) fail(s"identifier at '${s.substring(i, math.min(i + 20, s.length))}'")
          b.toString
      }
    }
    def tryConsume(tok: String): Boolean = {
      skipWs()
      if (s.regionMatches(true, i, tok, 0, tok.length)) {
        val after = i + tok.length
        val boundary = after >= s.length || !(s.charAt(after).isLetterOrDigit || s.charAt(after) == '_')
        val isWordTok = tok.last.isLetterOrDigit
        if (!isWordTok || boundary) { i = after; return true }
      }
      false
    }
    def consume(tok: String): Unit =
      if (!tryConsume(tok)) fail(s"'$tok' at '${s.substring(i, math.min(i + 30, s.length))}'")
    def int(): Int = {
      skipWs(); val b = new StringBuilder
      if (!eof && peek == '-') { b += '-'; i += 1 }
      while (!eof && peek.isDigit) { b += peek; i += 1 }
      if (b.isEmpty) fail("integer")
      b.toString.toInt
    }
    /** Single-quoted (or double-quoted) string literal with '' escape. */
    def stringLit(): String = {
      skipWs(); val q = peek
      if (q != '\'' && q != '"') fail("string literal")
      i += 1; val b = new StringBuilder
      while (!eof) {
        if (peek == q) {
          if (i + 1 < s.length && s.charAt(i + 1) == q) { b += q; i += 2 }
          else { i += 1; return b.toString }
        } else if (peek == '\\' && i + 1 < s.length) { b += s.charAt(i + 1); i += 2 }
        else { b += peek; i += 1 }
      }
      fail("closing quote")
    }
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"DDL parse error: expected $what near position $i")
  }

  /** Parse a bare type expression, e.g. "map<text,array<struct<a:int>>>".
    * Public because JSON `structure:` rules re-enter here. */
  def parseType(typeSql: String): DType = {
    val c = new Cursor(typeSql)
    val t = typeExpr(c)
    c.skipWs()
    t
  }

  private def typeExpr(c: Cursor): DType = {
    import DType._
    val raw = c.ident().toUpperCase
    val name = alias.getOrElse(raw, raw)
    name match {
      case "ARRAY" =>
        c.consume("<"); val e = typeExpr(c); c.consume(">"); DArray(e)
      case "MAP" =>
        c.consume("<"); val k = typeExpr(c); c.consume(","); val v = typeExpr(c); c.consume(">")
        DMap(k, v)
      case "STRUCT" =>
        c.consume("<")
        val fields = scala.collection.mutable.ArrayBuffer.empty[(String, DType)]
        var more = true
        while (more) {
          val fn = c.ident(); c.consume(":"); val ft = typeExpr(c)
          fields += ((fn, ft))
          more = c.tryConsume(",")
        }
        c.consume(">"); DStruct(fields.toSeq)
      case "DECIMAL" =>
        var (p, s) = (8, 0)  // reference default precision 8, scale 0
        if (c.tryConsume("(")) {
          p = c.int(); if (c.tryConsume(",")) s = c.int(); c.consume(")")
        }
        p = math.min(p, 38)
        if (s < 0 || s > p) s = 0
        DDecimal(p, s)
      case "CHAR" | "CHARACTER" =>
        var n = 1
        if (c.tryConsume("(")) { n = c.int(); c.consume(")") }
        DChar(math.min(math.max(1, n), 255))
      case "VARCHAR" =>
        var n: Option[Int] = None
        if (c.tryConsume("(")) { n = Some(c.int()); c.consume(")") }
        DVarchar(n)
      case "DATETIME" =>
        if (c.tryConsume("(")) { c.int(); c.consume(")") }  // precision ignored
        DDatetime
      case "TIME" =>
        if (c.tryConsume("(")) { c.int(); c.consume(")") }
        DDatetime
      case "BOOLEAN"  => DBoolean
      case "TINYINT"  => if (c.tryConsume("(")) { c.int(); c.consume(")") }; DTinyInt
      case "SMALLINT" => if (c.tryConsume("(")) { c.int(); c.consume(")") }; DSmallInt
      case "INT"      => if (c.tryConsume("(")) { c.int(); c.consume(")") }; DInt
      case "BIGINT"   => if (c.tryConsume("(")) { c.int(); c.consume(")") }; DBigInt
      case "LARGEINT" => DLargeInt
      case "FLOAT"    => DFloat
      case "DOUBLE"   => DDouble
      case "DATE"     => DDate
      case "STRING"   => DString
      case "JSON" | "JSONB" | "VARIANT" => DJson(name)
      case "BITMAP"   => DBitmap
      case "HLL"      => DHll
      case "IPV4"     => DIpv4
      case "IPV6"     => DIpv6
      case other => c.fail(s"known type (got '$other')")
    }
  }

  /** Parse one CREATE TABLE statement. */
  def parseCreateTable(ddl: String): TableDef = {
    val c = new Cursor(ddl)
    c.consume("CREATE")
    c.tryConsume("TEMPORARY")
    c.consume("TABLE")
    if (c.tryConsume("IF")) { c.consume("NOT"); c.consume("EXISTS") }
    var name = c.ident()
    while (c.tryConsume(".")) name = c.ident() // db.table → keep table part
    c.consume("(")

    val cols = scala.collection.mutable.ArrayBuffer.empty[ColumnDef]
    var done = false
    while (!done) {
      c.skipWs()
      // Skip non-column entries in the column list (indexes/constraints).
      val save = c.i
      val lead = try c.ident().toUpperCase catch { case _: Throwable => "" }
      if (Set("INDEX", "KEY", "CONSTRAINT", "PRIMARY", "UNIQUE").contains(lead)) {
        skipBalancedUntilCommaOrClose(c)
      } else {
        c.i = save
        cols += columnDef(c)
      }
      c.skipWs()
      if (c.tryConsume(",")) () else { c.consume(")"); done = true }
    }

    // Everything after the column list is opaque; PROPERTIES k=v extracted.
    val tail = c.s.substring(c.i)
    TableDef(name, cols.toSeq, parseProperties(tail), tail)
  }

  private def columnDef(c: Cursor): ColumnDef = {
    val name = c.ident()
    val t = typeExpr(c)
    var nullable = true
    var default: Option[String] = None
    var done = false
    while (!done) {
      c.skipWs()
      if (c.eof || c.peek == ',' || c.peek == ')') done = true
      else if (c.tryConsume("NOT")) { c.consume("NULL"); nullable = false }
      else if (c.tryConsume("NULL")) { /* explicit nullable */ }
      else if (c.tryConsume("DEFAULT")) {
        c.skipWs()
        default = Some(
          if (!c.eof && (c.peek == '\'' || c.peek == '"')) c.stringLit()
          else c.ident())
      }
      else if (c.tryConsume("COMMENT")) { c.stringLit(); () }
      else if (c.tryConsume("AUTO_INCREMENT")) ()
      else { // aggregate types (SUM/MAX/REPLACE/...) and other modifiers
        c.ident(); ()
      }
    }
    ColumnDef(name, t, nullable, default)
  }

  private def skipBalancedUntilCommaOrClose(c: Cursor): Unit = {
    var depth = 0
    while (!c.eof && !(depth == 0 && (c.peek == ',' || c.peek == ')'))) {
      c.peek match {
        case '('            => depth += 1; c.i += 1
        case ')'            => depth -= 1; c.i += 1
        case '\'' | '"'     => c.stringLit(); ()
        case _              => c.i += 1
      }
    }
  }

  private val propRe = """"([^"]+)"\s*=\s*"([^"]*)"""".r
  private def parseProperties(tail: String): Map[String, String] = {
    val idx = tail.toUpperCase.indexOf("PROPERTIES")
    if (idx < 0) Map.empty
    else propRe.findAllMatchIn(tail.substring(idx)).map(m => m.group(1) -> m.group(2)).toMap
  }
}
