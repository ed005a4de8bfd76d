package graft.gen

import java.time.{LocalDate, LocalDateTime, ZoneOffset}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.ddl.{DorisDdl, DType}
import graft.ddl.DType._
import graft.genrule.GenRules
import graft.genrule.GenRules.Rule

/** Compiles a (Doris type, generation rule) pair into a pure Catalyst
  * `Column` expression over `spark.range(n)`.
  *
  * Design decision (SURVEY.md §7.5 #3): the reference's generators are
  * stateful pull-based iterators (reference: src/generator/generator.go:39-42);
  * here every random draw is a *pure function* of
  * (seed, column path, purpose salt, row id, enclosing collection indices)
  * via codegen'd xxhash64 — so generation is reproducible, partition-layout
  * independent, and embarrassingly parallel at any scale: the same
  * (seed, rows) pair produces identical data on 1 core or 1000 executors.
  * No UDFs anywhere on this path — everything stays inside whole-stage
  * codegen.
  */
object ColumnGen {

  /** Deterministic draw context: `salts` carries the row-id column plus any
    * enclosing lambda variables (array index, map slot). `refValues` holds
    * the pre-sampled reservoirs for `gen.ref` targets, keyed "table.column"
    * (supplied by GenPlanner; shared across all refs to the same target,
    * mirroring the reference's shared reservoir). */
  case class Ctx(seed: Long, path: String, salts: Seq[Column],
                 refValues: Map[String, Seq[Any]] = Map.empty) {
    def child(sub: String, extraSalt: Seq[Column] = Nil): Ctx =
      Ctx(seed, s"$path.$sub", salts ++ extraSalt, refValues)
    /** 64-bit hash draw, unique per (seed, path, purpose, row, indices). */
    def h(purpose: String): Column =
      xxhash64((lit(seed) +: lit(path) +: lit(purpose) +: salts): _*)
    /** Uniform double in [0,1). */
    def u01(purpose: String): Column =
      pmod(h(purpose), lit(1L << 52)).cast("double") / lit((1L << 52).toDouble)
    /** Uniform long in [min,max] inclusive (range must fit in a long). */
    def uniform(purpose: String, min: Long, max: Long): Column =
      if (max <= min) lit(min) else pmod(h(purpose), lit(max - min + 1)) + lit(min)
  }

  private val Charset = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
  private val CharsetArr = lit(Charset.map(_.toString).toArray)

  private def rule(r: Rule, k: String): Option[Any] = r.get(k).filter(_ != null)

  /** (lenMin, lenMax) from a `length` rule that is either a scalar or a
    * {min,max} node (reference: generator.go GetLength). */
  private def lengthOf(r: Rule): (Int, Int) = rule(r, "length") match {
    case Some(m: Map[_, _]) =>
      val mm = GenRules.asRule(m)
      val mn = mm.get("min").map(GenRules.toInt).getOrElse(1)
      val mx = mm.get("max").map(GenRules.toInt).getOrElse(mn)
      if (mx < mn) (mx, mx) else (mn, mx)
    case Some(v) => val l = GenRules.toInt(v); (l, l)
    case None    => (1, 3)
  }

  private def minMaxLong(r: Rule, defMin: Long, defMax: Long): (Long, Long) = {
    val mn = rule(r, "min").map(GenRules.toLong).getOrElse(defMin)
    val mx = rule(r, "max").map(GenRules.toLong).getOrElse(defMax)
    if (mx < mn) (mn, mn) else (mn, mx)
  }
  private def minMaxDouble(r: Rule, defMin: Double, defMax: Double): (Double, Double) = {
    val mn = rule(r, "min").map(GenRules.toDouble).getOrElse(defMin)
    val mx = rule(r, "max").map(GenRules.toDouble).getOrElse(defMax)
    if (mx < mn) (mn, mn) else (mn, mx)
  }

  private def parseDate(v: Any): LocalDate = v match {
    case d: LocalDate => d
    case s: String => LocalDate.parse(s.trim.take(10))
    case other => LocalDate.parse(other.toString.take(10))
  }
  private def parseDateTime(v: Any): LocalDateTime = v match {
    case d: LocalDateTime => d
    case s: String =>
      val t = s.trim
      if (t.length <= 10) LocalDate.parse(t).atStartOfDay()
      else LocalDateTime.parse(t.replace(' ', 'T'))
    case other => parseDateTime(other.toString)
  }

  /** Build the generator expression for one column. `env` supplies type
    * defaults; `resolved` is the already stats/custom-merged column rule. */
  def build(dt: DType, resolved: Rule, ctx: Ctx, env: GenRules.Env): Column = {
    val base = DType.baseType(dt)
    val r = GenRules.mergeKeep(resolved, env.typeDefault(base))
    val genRule = rule(r, "gen").map(GenRules.asRule)
    val fmt = rule(r, "format").map(_.toString).filter(_.nonEmpty)
    // parts produce k sub-values spliced into the format's k %-verb tags;
    // everything else is a single generator, optionally format-wrapped
    val g: Column = (genRule, fmt) match {
      case (Some(cg), Some(f)) if cg.contains("parts") =>
        formatGen(f, partsGen(cg, ctx, env), ctx).cast(DType.toSpark(dt))
      case (Some(cg), None) if cg.contains("parts") =>
        throw new IllegalArgumentException(
          s"parts generator requires a 'format' rule for column '${ctx.path}'")
      case (maybeGen, maybeFmt) =>
        // type-substituted values stay RAW until after formatting (a %d
        // verb must see the substituted int, not its declared-type cast)
        val inner = maybeGen match {
          case Some(custom) => customGen(dt, custom, r, ctx, env)
          case None         => typeGen(dt, r, ctx, env)
        }
        maybeFmt match {
          case Some(f) =>
            // format returns NULL when the inner generator returns NULL
            when(inner.isNull, lit(null))
              .otherwise(formatGen(f, Seq(inner), ctx))
              .cast(DType.toSpark(dt))
          case None =>
            if (maybeGen.exists(_.contains("type"))) inner.cast(DType.toSpark(dt))
            else inner
        }
    }
    // null wrapper (skipped for BITMAP, mirroring the reference)
    val nullFreq = rule(r, "null_frequency").map(GenRules.toDouble).getOrElse(0.0)
    if (nullFreq > 0 && nullFreq <= 1 && base != "BITMAP")
      when(ctx.u01("null") < lit(nullFreq), lit(null)).otherwise(g)
    else g
  }

  // ---- custom generators (G3 inc, G4 enum, G5 ref, G7 type, G9 expr) --

  private val CustomGenKeys = Seq("inc", "enum", "enums", "ref", "type", "expr", "scala")

  private def customGen(dt: DType, gen: Rule, r: Rule, ctx: Ctx, env: GenRules.Env): Column = {
    val present = CustomGenKeys.filter(gen.contains)
    require(present.nonEmpty, s"Custom generator not found for column '${ctx.path}', " +
      s"expect one of ${CustomGenKeys.mkString(",")}")
    require(present.size == 1 || present == Seq("enum", "enums"),
      s"Multiple custom generators for column '${ctx.path}', only one allowed: ${present.mkString(",")}")
    if (gen.contains("inc")) incGen(dt, gen, ctx)
    else if (gen.contains("enum") || gen.contains("enums")) enumGen(dt, gen, r, ctx, env)
    else if (gen.contains("ref")) refGen(dt, gen, ctx)
    else if (gen.contains("type")) typeSubstGen(dt, gen, ctx, env)
    else if (gen.contains("scala")) SnippetGen.column(gen("scala").toString)
      .cast(DType.toSpark(dt))
    else exprGen(dt, gen)
  }

  /** G5 `ref`: value drawn uniformly from the pre-sampled reservoir of
    * another generated table.column (reference: src/generator/ref.go:40-137;
    * the reservoir itself is sampled by GenPlanner, ≤limit values,
    * default 1000). */
  private def refGen(dt: DType, gen: Rule, ctx: Ctx): Column = {
    val target = gen("ref").toString.trim
    val values = ctx.refValues.getOrElse(target,
      throw new IllegalArgumentException(
        s"ref '$target' for column '${ctx.path}' has no sampled values — " +
          "generate through GenPlanner so referenced tables are built first"))
    require(values.nonEmpty, s"ref '$target' sampled zero values for '${ctx.path}'")
    val arr = array(values.map(v => lit(v)): _*)
    element_at(arr, (ctx.uniform("ref", 0, values.size - 1) + lit(1)).cast("int"))
      .cast(DType.toSpark(dt))
  }

  /** G7 `type`: render this column with another type's generator; the
    * remaining keys of the gen rule configure the substituted generator
    * (reference: src/generator/type.go:19-41). Complex substituted values
    * targeting a string column are JSON-encoded. */
  private def typeSubstGen(dt: DType, gen: Rule, ctx: Ctx, env: GenRules.Env): Column = {
    val sub = DorisDdl.parseType(gen("type").toString)
    val inner = build(sub, (gen - "type") + ("null_frequency" -> 0.0), ctx.child("type"), env)
    sub match {
      // complex values render as JSON text (string-family targets)
      case DArray(_) | DMap(_, _) | DStruct(_) => to_json(inner)
      // primitives stay raw — build() casts to the declared type after
      // any format wrapper has consumed the typed value
      case _ => inner
    }
  }

  /** G9 `expr`: the always-on half of the user-code story — an arbitrary
    * SQL expression over the row-id column `id`, codegen'd and
    * distributed with zero runtime compilation. The full analog of the
    * reference's user-code (`golang`) generator
    * (src/generator/golang.go:26-65) is the opt-in `scala` generator
    * ([[SnippetGen]]: a runtime-compiled `(idx: Long) => Any` literal). */
  private def exprGen(dt: DType, gen: Rule): Column =
    expr(gen("expr").toString).cast(DType.toSpark(dt))

  /** G6+G8 format template: `{{%verb}}` tags consume `values` in order
    * (Go verbs; %v → %s), named tags draw from the built-in tag registry
    * (reference: src/generator/format.go:22-81, format_tags.go:39-86).
    * Literal text is %-escaped for java.util.Formatter. */
  private val TagPattern = "\\{\\{(.*?)\\}\\}".r

  private def formatGen(template: String, values: Seq[Column], ctx: Ctx): Column = {
    val sb = new StringBuilder
    val args = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    var vi = 0
    var occ = 0
    for (m <- TagPattern.findAllMatchIn(template)) {
      sb.append(template.substring(last, m.start).replace("%", "%%"))
      val tag = m.group(1).trim
      if (tag.startsWith("%")) {
        require(vi < values.size,
          s"format parts out of range: $vi, format: $template (column '${ctx.path}')")
        sb.append(if (tag == "%v") "%s" else tag)
        args += values(vi)
        vi += 1
      } else {
        sb.append("%s")
        args += fakerTag(tag, occ, ctx).getOrElse(
          throw new IllegalArgumentException(s"unknown format tag '$tag' in '${ctx.path}'"))
        occ += 1
      }
      last = m.end
    }
    sb.append(template.substring(last).replace("%", "%%"))
    format_string(sb.toString, args.toSeq: _*)
  }

  // ---- built-in format tags (G8) --------------------------------------

  private val FirstNames = Seq("alice", "bob", "carol", "dave", "erin", "frank",
    "grace", "heidi", "ivan", "judy", "mallory", "oscar", "peggy", "trent", "victor", "wendy")
  private val LastNames = Seq("smith", "jones", "miller", "davis", "garcia",
    "wilson", "moore", "taylor", "anderson", "thomas", "jackson", "white", "harris", "martin")
  private val Words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango")
  private val Domains = Seq("example.com", "example.org", "test.net", "mail.dev", "corp.io")
  private val Cities = Seq("springfield", "riverton", "lakeside", "hillview",
    "brookfield", "fairmont", "oakdale", "elmwood", "maplewood", "cedarville")
  private val Countries = Seq("argentina", "brazil", "canada", "denmark", "egypt",
    "france", "germany", "hungary", "india", "japan", "kenya", "mexico")
  private val Colors = Seq("red", "orange", "yellow", "green", "blue", "indigo",
    "violet", "black", "white", "gray")
  private val Months = Seq("January", "February", "March", "April", "May", "June",
    "July", "August", "September", "October", "November", "December")
  private val Weekdays = Seq("Monday", "Tuesday", "Wednesday", "Thursday",
    "Friday", "Saturday", "Sunday")

  private val NamePrefixes = Seq("Mr.", "Mrs.", "Ms.", "Dr.", "Prof.")
  private val NameSuffixes = Seq("Jr.", "Sr.", "II", "III", "PhD", "MD")
  private val Genders = Seq("male", "female")
  private val JobTitles = Seq("engineer", "analyst", "manager", "designer",
    "director", "consultant", "architect", "administrator", "developer", "specialist")
  private val Companies = Seq("Acme", "Globex", "Initech", "Umbrella", "Hooli",
    "Stark", "Wayne", "Wonka", "Tyrell", "Cyberdyne")
  private val CompanySuffixes = Seq("Inc", "LLC", "Ltd", "Group", "Corp", "Co")
  private val BuzzWords = Seq("synergy", "paradigm", "leverage", "pivot",
    "scalable", "holistic", "disruptive", "agile", "seamless", "robust")
  private val Nouns = Seq("table", "river", "engine", "signal", "garden",
    "window", "market", "bridge", "cloud", "forest")
  private val Verbs = Seq("run", "jump", "build", "carry", "write", "read",
    "move", "play", "open", "close")
  private val Adjectives = Seq("quick", "bright", "calm", "eager", "fancy",
    "gentle", "happy", "kind", "lively", "mighty")
  private val Adverbs = Seq("quickly", "slowly", "quietly", "loudly",
    "carefully", "eagerly", "rarely", "often", "nearly", "boldly")
  private val Prepositions = Seq("above", "below", "between", "under", "over",
    "through", "against", "within", "without", "beside")
  private val StatesAbr = Seq("AL", "CA", "CO", "FL", "GA", "IL", "NY", "OH",
    "TX", "WA")
  private val StreetPrefixes = Seq("North", "South", "East", "West", "Lake", "Old")
  private val StreetSuffixes = Seq("Street", "Avenue", "Boulevard", "Lane",
    "Road", "Drive", "Court", "Way")
  private val TimeZones = Seq("UTC", "EST", "CST", "MST", "PST", "CET", "JST", "IST")
  private val Languages = Seq("english", "spanish", "french", "german",
    "mandarin", "hindi", "arabic", "portuguese", "japanese", "swahili")
  private val LangAbbrs = Seq("en", "es", "fr", "de", "zh", "hi", "ar", "pt", "ja", "sw")
  private val HttpMethods = Seq("GET", "POST", "PUT", "PATCH", "DELETE", "HEAD", "OPTIONS")
  private val HttpStatuses = Seq("200", "201", "204", "301", "302", "400",
    "401", "403", "404", "500", "502", "503")
  private val HttpVersions = Seq("HTTP/1.0", "HTTP/1.1", "HTTP/2.0")
  private val FileExtensions = Seq("txt", "csv", "json", "parquet", "avro",
    "png", "jpg", "pdf", "html", "xml")
  private val MimeTypes = Seq("text/plain", "text/csv", "application/json",
    "application/pdf", "image/png", "image/jpeg", "text/html", "application/xml")
  private val AppNames = Seq("Notewise", "Fitloop", "Cashmap", "Snapdeck",
    "Tasker", "Mealmate", "Triply", "Chatter", "Skysync", "Podly")
  private val ProgLanguages = Seq("scala", "java", "python", "go", "rust",
    "ruby", "kotlin", "swift", "typescript", "haskell")
  private val SafeColors = Seq("black", "maroon", "green", "olive", "navy",
    "purple", "teal", "silver", "gray", "white")
  private val Dogs = Seq("labrador", "poodle", "beagle", "bulldog", "terrier",
    "collie", "boxer", "husky", "dachshund", "corgi")
  private val Cats = Seq("siamese", "persian", "bengal", "sphynx", "ragdoll",
    "birman", "bombay", "manx", "burmese", "tabby")
  private val Birds = Seq("sparrow", "eagle", "robin", "finch", "heron",
    "swallow", "owl", "wren", "crane", "magpie")
  private val FarmAnimals = Seq("cow", "pig", "sheep", "goat", "horse",
    "chicken", "duck", "goose", "donkey", "turkey")
  private val PetNames = Seq("buddy", "max", "bella", "charlie", "luna",
    "lucy", "cooper", "daisy", "rocky", "molly")
  private val Desserts = Seq("brownie", "cheesecake", "tiramisu", "eclair",
    "pudding", "sundae", "baklava", "trifle", "flan", "sorbet")
  private val Snacks = Seq("pretzel", "popcorn", "granola", "crackers",
    "trailmix", "chips", "jerky", "raisins", "nuts", "crisps")
  private val Breakfasts = Seq("pancakes", "omelette", "porridge", "waffles",
    "granola", "bagel", "frittata", "toast", "muesli", "crepes")
  private val Lunches = Seq("sandwich", "salad", "soup", "burrito", "wrap",
    "ramen", "quiche", "falafel", "pasta", "poke")
  private val Dinners = Seq("lasagna", "curry", "stew", "risotto", "tacos",
    "paella", "goulash", "stirfry", "roast", "gnocchi")
  private val Drinks = Seq("coffee", "tea", "lemonade", "smoothie", "cocoa",
    "juice", "soda", "cider", "kombucha", "water")
  private val Hobbies = Seq("reading", "hiking", "painting", "chess",
    "gardening", "cycling", "baking", "photography", "climbing", "origami")
  private val Emojis = Seq("😀", "🎉", "🚀", "🌟", "🔥", "🍀", "🌊", "🎈", "🐙", "🦉")
  private val UserAgents = Seq(
    "Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/115.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/17.0 Safari/605.1.15")
  private val Currencies = Seq("USD", "EUR", "GBP", "JPY", "CNY", "INR",
    "BRL", "CAD", "AUD", "CHF")

  private[gen] def pick(xs: Seq[String], purpose: String, ctx: Ctx): Column =
    element_at(array(xs.map(lit(_)): _*),
      (ctx.uniform(purpose, 0, xs.size - 1) + lit(1)).cast("int"))

  /** Deterministic per-row draw for a named tag occurrence. A curated
    * registry standing in for the reference's reflected gofakeit tag set;
    * unknown tags error, mirroring "unknown format tag". */
  private[gen] def fakerTag(tag: String, occ: Int, ctx: Ctx): Option[Column] = {
    val p = s"tag.$tag.$occ"
    tag match {
      case "year"       => Some(ctx.uniform(p, 1900, 2025))
      case "month"      => Some(pick(Months, p, ctx))
      case "monthnum"   => Some(ctx.uniform(p, 1, 12))
      case "day"        => Some(ctx.uniform(p, 1, 28))
      case "hour"       => Some(ctx.uniform(p, 0, 23))
      case "minute" | "second" => Some(ctx.uniform(p, 0, 59))
      case "weekday"    => Some(pick(Weekdays, p, ctx))
      case "firstname"  => Some(pick(FirstNames, p, ctx))
      case "lastname"   => Some(pick(LastNames, p, ctx))
      case "name"       => Some(concat_ws(" ", pick(FirstNames, p + ".f", ctx), pick(LastNames, p + ".l", ctx)))
      case "username"   => Some(concat(pick(FirstNames, p + ".f", ctx), ctx.uniform(p + ".n", 10, 9999)))
      case "email"      => Some(concat(pick(FirstNames, p + ".f", ctx), ctx.uniform(p + ".n", 10, 9999),
                                       lit("@"), pick(Domains, p + ".d", ctx)))
      case "domainname" => Some(pick(Domains, p, ctx))
      case "url"        => Some(concat(lit("https://"), pick(Domains, p + ".d", ctx),
                                       lit("/"), pick(Words, p + ".w", ctx)))
      case "uuid"       => Some(uuidTag(p, ctx))
      case "word"       => Some(pick(Words, p, ctx))
      case "city"       => Some(pick(Cities, p, ctx))
      case "country"    => Some(pick(Countries, p, ctx))
      case "color"      => Some(pick(Colors, p, ctx))
      case "phone"      => Some(format_string("%03d-%03d-%04d",
                                  ctx.uniform(p + ".1", 200, 999),
                                  ctx.uniform(p + ".2", 0, 999),
                                  ctx.uniform(p + ".3", 0, 9999)))
      case "digit"      => Some(ctx.uniform(p, 0, 9))
      case "letter"     => Some(element_at(CharsetArr, (ctx.uniform(p, 0, 25) + lit(1)).cast("int")))

      // ---- reference-faithful snake_case registry (the ~60 most-used of
      //      the reflected gofakeit set, src/generator/format_tags.go:39-86
      //      and src/generator/README.md's table), each a deterministic
      //      compiled Column — word-list pick, hash-uniform draw, or
      //      formatted composite; no UDFs --------------------------------
      case "first_name"    => Some(pick(FirstNames, p, ctx))
      case "last_name"     => Some(pick(LastNames, p, ctx))
      case "middle_name"   => Some(pick(FirstNames, p, ctx))
      case "name_prefix"   => Some(pick(NamePrefixes, p, ctx))
      case "name_suffix"   => Some(pick(NameSuffixes, p, ctx))
      case "gender"        => Some(pick(Genders, p, ctx))
      case "job_title"     => Some(pick(JobTitles, p, ctx))
      case "ssn"           => Some(format_string("%03d-%02d-%04d",
                                ctx.uniform(p + ".1", 100, 899),
                                ctx.uniform(p + ".2", 1, 99),
                                ctx.uniform(p + ".3", 1, 9999)))
      case "gamertag"      => Some(concat(pick(Adjectives, p + ".a", ctx),
                                pick(Nouns, p + ".n", ctx), ctx.uniform(p + ".d", 1, 999)))
      case "phone_formatted" => Some(format_string("(%03d) %03d-%04d",
                                ctx.uniform(p + ".1", 200, 999),
                                ctx.uniform(p + ".2", 0, 999),
                                ctx.uniform(p + ".3", 0, 9999)))
      case "company"        => Some(pick(Companies, p, ctx))
      case "company_suffix" => Some(pick(CompanySuffixes, p, ctx))
      case "buzz_word"      => Some(pick(BuzzWords, p, ctx))
      case "bs"             => Some(concat_ws(" ", pick(BuzzWords, p + ".1", ctx),
                                pick(Adjectives, p + ".2", ctx), pick(Nouns, p + ".3", ctx)))
      case "slogan"         => Some(concat_ws(" ", pick(Adjectives, p + ".1", ctx),
                                pick(Nouns, p + ".2", ctx), lit("for"), pick(Nouns, p + ".3", ctx)))
      case "noun"           => Some(pick(Nouns, p, ctx))
      case "verb"           => Some(pick(Verbs, p, ctx))
      case "adjective"      => Some(pick(Adjectives, p, ctx))
      case "adverb"         => Some(pick(Adverbs, p, ctx))
      case "preposition"    => Some(pick(Prepositions, p, ctx))
      case "vowel"          => Some(pick(Seq("a", "e", "i", "o", "u"), p, ctx))
      case "lorem_ipsum_word" => Some(pick(Words, p, ctx))
      case "phrase"         => Some(concat_ws(" ", pick(Verbs, p + ".1", ctx),
                                lit("the"), pick(Adjectives, p + ".2", ctx), pick(Nouns, p + ".3", ctx)))
      case "sentence_simple" => Some(concat_ws(" ", initcap(pick(Nouns, p + ".1", ctx)),
                                pick(Verbs, p + ".2", ctx), pick(Adverbs, p + ".3", ctx)))
      case "street_number"  => Some(ctx.uniform(p, 1, 9999))
      case "street_prefix"  => Some(pick(StreetPrefixes, p, ctx))
      case "street_suffix"  => Some(pick(StreetSuffixes, p, ctx))
      case "street_name"    => Some(concat_ws(" ", initcap(pick(Words, p + ".w", ctx)),
                                pick(StreetSuffixes, p + ".s", ctx)))
      case "street"         => Some(concat_ws(" ", ctx.uniform(p + ".n", 1, 9999),
                                pick(StreetPrefixes, p + ".p", ctx),
                                initcap(pick(Words, p + ".w", ctx)),
                                pick(StreetSuffixes, p + ".s", ctx)))
      case "state_abr"      => Some(pick(StatesAbr, p, ctx))
      case "latitude"       => Some(round(ctx.uniform(p, -90000000, 90000000).cast("double") / 1e6, 6))
      case "longitude"      => Some(round(ctx.uniform(p, -180000000, 180000000).cast("double") / 1e6, 6))
      case "time_zone"      => Some(pick(TimeZones, p, ctx))
      case "language"       => Some(pick(Languages, p, ctx))
      case "language_abbreviation" => Some(pick(LangAbbrs, p, ctx))
      case "domain_name"    => Some(pick(Domains, p, ctx))
      case "domain_suffix"  => Some(pick(Seq("com", "org", "net", "dev", "io"), p, ctx))
      case "mac_address"    => Some(format_string("%02x:%02x:%02x:%02x:%02x:%02x",
                                ctx.uniform(p + ".1", 0, 255), ctx.uniform(p + ".2", 0, 255),
                                ctx.uniform(p + ".3", 0, 255), ctx.uniform(p + ".4", 0, 255),
                                ctx.uniform(p + ".5", 0, 255), ctx.uniform(p + ".6", 0, 255)))
      case "http_method"    => Some(pick(HttpMethods, p, ctx))
      case "http_status_code" => Some(pick(HttpStatuses, p, ctx).cast("int"))
      case "http_version"   => Some(pick(HttpVersions, p, ctx))
      case "user_agent"     => Some(pick(UserAgents, p, ctx))
      case "file_extension" => Some(pick(FileExtensions, p, ctx))
      case "file_mime_type" => Some(pick(MimeTypes, p, ctx))
      case "app_name"       => Some(pick(AppNames, p, ctx))
      case "programming_language" => Some(pick(ProgLanguages, p, ctx))
      case "hex_color"      => Some(format_string("#%06x", ctx.uniform(p, 0, 0xFFFFFF)))
      case "safe_color"     => Some(pick(SafeColors, p, ctx))
      case "bool"           => Some((ctx.uniform(p, 0, 1) === 1).cast("boolean"))
      case "flip_a_coin"    => Some(pick(Seq("Heads", "Tails"), p, ctx))
      case "int_8"          => Some(ctx.uniform(p, Byte.MinValue, Byte.MaxValue).cast("int"))
      case "int_16"         => Some(ctx.uniform(p, Short.MinValue, Short.MaxValue).cast("int"))
      case "int_32" | "int" => Some(ctx.uniform(p, Int.MinValue, Int.MaxValue).cast("int"))
      case "int_64"         => Some(ctx.h(p)) // full-range 64-bit draw
      case "uint_8"         => Some(ctx.uniform(p, 0, 255).cast("int"))
      case "uint_16"        => Some(ctx.uniform(p, 0, 65535).cast("int"))
      case "uint_32" | "uint" => Some(ctx.uniform(p, 0, Int.MaxValue).cast("long"))
      case "month_string"   => Some(pick(Months, p, ctx))
      case "week_day"       => Some(pick(Weekdays, p, ctx))
      case "date"           => Some(date_format(
                                date_add(lit("2016-01-01").cast("date"),
                                  ctx.uniform(p, 0, 3650).cast("int")),
                                "yyyy-MM-dd"))
      case "past_date"      => Some(date_format(
                                date_sub(current_date(), (ctx.uniform(p, 1, 365)).cast("int")),
                                "yyyy-MM-dd"))
      case "credit_card_cvv" => Some(format_string("%03d", ctx.uniform(p, 0, 999)))
      case "credit_card_exp" => Some(format_string("%02d/%02d",
                                ctx.uniform(p + ".m", 1, 12), ctx.uniform(p + ".y", 26, 33)))
      case "currency_short" => Some(pick(Currencies, p, ctx))
      case "dog"            => Some(pick(Dogs, p, ctx))
      case "cat"            => Some(pick(Cats, p, ctx))
      case "bird"           => Some(pick(Birds, p, ctx))
      case "farm_animal"    => Some(pick(FarmAnimals, p, ctx))
      case "pet_name"       => Some(pick(PetNames, p, ctx))
      case "dessert"        => Some(pick(Desserts, p, ctx))
      case "snack"          => Some(pick(Snacks, p, ctx))
      case "breakfast"      => Some(pick(Breakfasts, p, ctx))
      case "lunch"          => Some(pick(Lunches, p, ctx))
      case "dinner"         => Some(pick(Dinners, p, ctx))
      case "drink"          => Some(pick(Drinks, p, ctx))
      case "hobby"          => Some(pick(Hobbies, p, ctx))
      case "emoji"          => Some(pick(Emojis, p, ctx))
      // the long tail of the README table lives in its own registry
      case other        => FakerTags.gen(other, p, ctx)
    }
  }

  /** Deterministic UUID-shaped string from two hash draws. */
  private def uuidTag(p: String, ctx: Ctx): Column = {
    val h1 = lower(lpad(hex(ctx.h(p + ".a")), 16, "0"))
    val h2 = lower(lpad(hex(ctx.h(p + ".b")), 16, "0"))
    concat_ws("-",
      h1.substr(1, 8), h1.substr(9, 4), h1.substr(13, 4),
      h2.substr(1, 4), h2.substr(5, 12))
  }

  /** G6 parts: k sub-generators (rule nodes, each may substitute its own
    * `type`) or literal values (reference: src/generator/parts.go:16-51). */
  private def partsGen(gen: Rule, ctx: Ctx, env: GenRules.Env): Seq[Column] = {
    val parts = gen.get("parts") match {
      case Some(ps: Seq[Any] @unchecked) if ps.nonEmpty => ps
      case _ => throw new IllegalArgumentException(s"parts is empty for '${ctx.path}'")
    }
    parts.zipWithIndex.map {
      case (m: Map[_, _], i) =>
        val pr = GenRules.asRule(m)
        val pdt = pr.get("type").map(t => DorisDdl.parseType(t.toString)).getOrElse(DType.DString)
        build(pdt, (pr - "type") + ("null_frequency" -> 0.0), ctx.child(s"parts.$i"), env)
      case (v, _) => lit(v)
    }
  }

  /** Auto-increment start/step as pure row-id arithmetic: exact, contiguous
    * and scale-independent (vs. stateful counters that can't parallelize;
    * reference semantics: src/generator/inc.go:16-38). Expects the row-id
    * column as the first salt. */
  private def incGen(dt: DType, gen: Rule, ctx: Ctx): Column = {
    val start = gen.get("start").map(GenRules.toLong).filter(_ != 0).getOrElse(1L)
    val step = gen.get("inc").map(GenRules.toLong).filter(_ != 0).getOrElse(1L)
    val id = ctx.salts.head
    (lit(start) + id * lit(step)).cast(DType.toSpark(dt))
  }

  /** Uniform or cumulative-weighted pick; elements may be literals or
    * nested generator rules (reference: src/generator/enum.go:24-97). */
  private def enumGen(dt: DType, gen: Rule, r: Rule, ctx: Ctx, env: GenRules.Env): Column = {
    val elems: Seq[Any] = gen.get("enum").orElse(gen.get("enums")) match {
      case Some(s: Seq[Any] @unchecked) if s.nonEmpty => s
      case _ => throw new IllegalArgumentException(s"enum is empty for '${ctx.path}'")
    }
    def elemCol(e: Any, i: Int): Column = e match {
      case m: Map[_, _] => // nested generator element
        build(dt, GenRules.merge(r - "gen", GenRules.asRule(m)), ctx.child(s"enum.$i"), env)
      case v => lit(v).cast(DType.toSpark(dt))
    }
    val weights = gen.get("weights").orElse(gen.get("weight")) match {
      case Some(ws: Seq[Any] @unchecked) => ws.map(GenRules.toDouble)
      case _ => Nil
    }
    if (weights.isEmpty) {
      if (elems.size == 1) elemCol(elems.head, 0)
      else {
        // when-chain on a uniform pick (supports heterogeneous/nested elems)
        val pick = ctx.uniform("enum", 0, elems.size - 1)
        elems.zipWithIndex.slice(1, elems.size - 1)
          .foldLeft(when(pick === lit(0), elemCol(elems.head, 0))) {
            case (w, (e, i)) => w.when(pick === lit(i), elemCol(e, i))
          }.otherwise(elemCol(elems.last, elems.size - 1))
      }
    } else {
      require(weights.size == elems.size, s"enum length != weights length for '${ctx.path}'")
      require(math.abs(weights.sum - 1.0) < 1e-6, s"sum of weights should be 1 for '${ctx.path}'")
      val cum = weights.scanLeft(0.0)(_ + _).tail.dropRight(1) // last bound = 1 implicit
      val u = ctx.u01("enumw")
      val first = when(u < lit(cum.headOption.getOrElse(1.0)), elemCol(elems.head, 0))
      val mid = cum.zipWithIndex.drop(1).foldLeft(first) {
        case (w, (c, i)) => w.when(u < lit(c), elemCol(elems(i), i))
      }
      mid.otherwise(elemCol(elems.last, elems.size - 1))
    }
  }

  // ---- type generators (G1) ------------------------------------------

  private def typeGen(dt: DType, r: Rule, ctx: Ctx, env: GenRules.Env): Column = dt match {
    case DBoolean => pmod(ctx.h("bool"), lit(2)) === lit(1L)

    case DTinyInt  => intLike(r, ctx, 0, Byte.MaxValue).cast("tinyint")
    case DSmallInt => intLike(r, ctx, 0, Short.MaxValue).cast("smallint")
    case DInt      => intLike(r, ctx, 0, Int.MaxValue).cast("int")
    case DBigInt   => intLike(r, ctx, 0, Int.MaxValue)
    case DLargeInt => intLike(r, ctx, 0, Int.MaxValue).cast(DType.toSpark(DLargeInt))

    case DFloat =>
      val (mn, mx) = minMaxDouble(r, 0, Short.MaxValue)
      (ctx.u01("f") * lit(mx - mn) + lit(mn)).cast("float")
    case DDouble =>
      val (mn, mx) = minMaxDouble(r, 0, Int.MaxValue)
      ctx.u01("d") * lit(mx - mn) + lit(mn)

    case DDecimal(p0, s0) => decimalGen(p0, s0, r, ctx)

    case DDate =>
      val mn = rule(r, "min").map(parseDate).getOrElse(LocalDate.now().minusYears(10))
      val mx0 = rule(r, "max").map(parseDate).getOrElse(LocalDate.now())
      val mx = if (mx0.isBefore(mn)) mn else mx0
      date_add(lit(java.sql.Date.valueOf(mn)),
        ctx.uniform("date", 0, mx.toEpochDay - mn.toEpochDay).cast("int"))

    case DDatetime =>
      val mn = rule(r, "min").map(parseDateTime).getOrElse(LocalDateTime.now().minusYears(10))
      val mx0 = rule(r, "max").map(parseDateTime).getOrElse(LocalDateTime.now())
      val mx = if (mx0.isBefore(mn)) mn else mx0
      val (a, b) = (mn.toEpochSecond(ZoneOffset.UTC), mx.toEpochSecond(ZoneOffset.UTC))
      timestamp_seconds(ctx.uniform("dt", a, b))

    case DString => randomStr(r, None, ctx)
    case DVarchar(n) => randomStr(r, n, ctx)
    case DChar(n) =>
      // CHAR(n) is exactly n chars (reference: generator.go CHAR case)
      val fixed: Rule = r + ("length" -> Map("min" -> n, "max" -> n))
      randomStr(fixed, Some(n), ctx)

    case DJson(_) =>
      val structure = rule(r, "structure").map(_.toString.trim).filter(_.nonEmpty)
        .getOrElse(throw new IllegalArgumentException(
          s"JSON/JSONB/VARIANT must have a 'structure' or 'gen' rule at '${ctx.path}'"))
      val innerType = DorisDdl.parseType(structure)
      to_json(build(innerType, r - "structure" - "null_frequency", ctx, env))

    case DBitmap =>
      val (lmn, lmx) = lengthOf(r)
      val (mn, mx) = minMaxLong(r, 0, Int.MaxValue)
      // greatest(len, 0) alone cannot fix len = 0: Spark's sequence(1, 0)
      // defaults to step -1 and yields [1, 0] — an explicit empty branch
      // keeps a `length: {min: 0}` rule honest (same for array/map below)
      val len = greatest(ctx.uniform("blen", lmn, lmx).cast("int"), lit(0))
      when(len <= 0, array().cast("array<bigint>")).otherwise(
      transform(sequence(lit(1), len),
        i => pmod(xxhash64(lit(ctx.seed), lit(ctx.path), lit("bit"), i, ctx.salts.head),
                  lit(mx - mn + 1)) + lit(mn)))

    case DHll =>
      rule(r, "from") match {
        case Some(from) => xxhash64(col(from.toString)) // derived at load (G10)
        case None       => lit("")
      }
    case DIpv4 =>
      format_string("%d.%d.%d.%d",
        ctx.uniform("ip1", 1, 255), ctx.uniform("ip2", 0, 255),
        ctx.uniform("ip3", 0, 255), ctx.uniform("ip4", 0, 255))
    case DIpv6 =>
      lower(concat_ws(":", (1 to 8).map(k =>
        lpad(hex(ctx.uniform(s"ip6$k", 0, 65535)), 4, "0")): _*))

    case DArray(elem) =>
      val (lmn, lmx) = lengthOf(r)
      val len = greatest(ctx.uniform("alen", lmn, lmx).cast("int"), lit(0))
      val elemRule = GenRules.asRule(r.getOrElse("element", GenRules.empty))
      val body = transform(sequence(lit(1), len),
        i => build(elem, elemRule, ctx.child("element", Seq(i)), env))
      when(len <= 0, slice(body, 1, 0)).otherwise(body)

    case DMap(k, v) =>
      val (lmn, lmx) = lengthOf(r)
      val len = greatest(ctx.uniform("mlen", lmn, lmx).cast("int"), lit(0))
      val keyRule = GenRules.asRule(r.getOrElse("key", GenRules.empty))
      val valRule = GenRules.asRule(r.getOrElse("value", GenRules.empty))
      val ks = transform(sequence(lit(1), len), i => build(k, keyRule, ctx.child("key", Seq(i)), env))
      val vs = transform(sequence(lit(1), len), i => build(v, valRule, ctx.child("value", Seq(i)), env))
      // Requires spark.sql.mapKeyDedupPolicy=LAST_WIN in the session (random
      // keys can collide); set in the engine's session builders.
      map_from_arrays(
        when(len <= 0, slice(ks, 1, 0)).otherwise(ks),
        when(len <= 0, slice(vs, 1, 0)).otherwise(vs))

    case DStruct(fields) =>
      val fieldRules: Map[String, Rule] = rule(r, "fields").orElse(rule(r, "field")) match {
        case Some(fs: Seq[Any] @unchecked) =>
          fs.map(GenRules.asRule)
            .flatMap(f => f.get("name").map(_.toString -> (f - "name"))).toMap
        case _ => Map.empty
      }
      struct(fields.map { case (fn, ft) =>
        build(ft, fieldRules.getOrElse(fn, GenRules.empty), ctx.child(fn), env).as(fn)
      }: _*)
  }

  private def intLike(r: Rule, ctx: Ctx, defMin: Long, defMax: Long): Column = {
    val (mn, mx) = minMaxLong(r, defMin, defMax)
    ctx.uniform("i", mn, mx)
  }

  /** DECIMAL(p,s) with the reference's precision/scale clamping
    * (reference: generator.go:252-325): rule precision/scale may only
    * narrow the DDL's; int part bounded by min(p-s, 18) digits; value
    * rendered as "<int>.<frac>" and cast — sign semantics match the
    * reference's "%d.%0*d" formatting. */
  private def decimalGen(p0: Int, s0: Int, r: Rule, ctx: Ctx): Column = {
    val p = math.min(math.min(
      rule(r, "precision").map(GenRules.toInt).getOrElse(p0), p0), 38)
    val s = math.max(0, math.min(
      rule(r, "scale").map(GenRules.toInt).getOrElse(s0), math.min(s0, p)))
    val intDigits = math.min(math.max(p - s, 0), 18)
    val bound = if (intDigits == 0) 0L else math.pow(10, intDigits).toLong - 1
    val (mn, mx) = minMaxLong(r, -bound, bound)
    val loClamp = math.max(mn, -bound)
    val hiClamp = math.min(mx, bound)
    val intPart: Column =
      if (intDigits == 0) lit(0L)
      else if (loClamp < 0)
        when(ctx.u01("dsign") < lit(0.5),
          -ctx.uniform("dneg", 0, -loClamp))
          .otherwise(ctx.uniform("dpos", math.max(0, loClamp), math.max(0, hiClamp)))
      else ctx.uniform("dpos", loClamp, hiClamp)
    val fracDigits = math.min(s, 18)
    val target = DType.toSpark(DDecimal(p, s))
    if (s == 0) intPart.cast(target)
    else {
      val frac = ctx.uniform("dfrac", 0, math.pow(10, fracDigits).toLong - 1)
      val fracStr =
        if (s > fracDigits) concat(lpad(frac.cast("string"), fracDigits, "0"), lit("0" * (s - fracDigits)))
        else lpad(frac.cast("string"), s, "0")
      concat(intPart.cast("string"), lit("."), fracStr).cast(target)
    }
  }

  /** Random alphanumeric string, length uniform in [lenMin,lenMax] (∧ the
    * DDL length cap for VARCHAR). 10 chars per 64-bit hash draw (6 bits
    * each over a 62-char set), assembled with builtin concat/substring so
    * the whole thing stays codegen'd. */
  private def randomStr(r: Rule, ddlLen: Option[Int], ctx: Ctx): Column = {
    var (lmn, lmx) = lengthOf(r)
    lmn = math.max(1, lmn); lmx = math.max(1, lmx)
    ddlLen.foreach { cap => if (cap < lmx) lmx = math.max(1, cap) }
    if (lmn > lmx) lmn = 1
    val len = ctx.uniform("slen", lmn, lmx).cast("int")
    val chunks = (lmx + 9) / 10
    val full = concat((0 until chunks).flatMap { j =>
      val h = ctx.h(s"str$j")
      (0 until 10).map { k =>
        element_at(CharsetArr,
          (pmod(shiftright(h, 6 * k), lit(62)) + lit(1)).cast("int"))
      }
    }: _*)
    full.substr(lit(1), len)
  }
}
