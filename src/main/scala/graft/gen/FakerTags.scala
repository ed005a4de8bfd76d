package graft.gen

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import ColumnGen.{Ctx, pick}

/** The LONG TAIL of the reference's format-tag registry: the reference
  * reflects the whole gofakeit function set (src/generator/format_tags.go:39-86)
  * and documents it as a 264-row table in src/generator/README.md.
  * [[ColumnGen.fakerTag]] holds the ~100 most-used tags; this registry
  * completes the README table, so the union covers every documented tag
  * (GenSpec asserts exactly that against the list). Word lists here are
  * ORIGINAL curated data authored for this repo — plausible, compact and
  * deterministic — not copies of gofakeit's data files; a tag's contract
  * is its name and value SHAPE, not a particular vocabulary.
  *
  * Every tag compiles to a pure Column (word-list pick, hash-uniform
  * draw, or formatted composite) over the deterministic per-row hash
  * stream — no UDFs, fully codegen'd, same discipline as the core set. */
private[gen] object FakerTags {

  // ------------------------------------------------------------ word data

  private val W: Map[String, Seq[String]] = Map(
    // grammar: nouns
    "noun_abstract" -> Seq("freedom", "wisdom", "courage", "patience", "honesty", "growth", "beauty", "luck"),
    "noun_collective_animal" -> Seq("herd", "flock", "pack", "swarm", "school", "pride", "colony", "pod"),
    "noun_collective_people" -> Seq("crowd", "team", "crew", "panel", "choir", "jury", "band", "audience"),
    "noun_collective_thing" -> Seq("bundle", "stack", "fleet", "cluster", "batch", "set", "heap", "array"),
    "noun_common" -> Seq("time", "way", "thing", "day", "world", "house", "hand", "part"),
    "noun_concrete" -> Seq("table", "stone", "river", "bridge", "engine", "window", "garden", "ladder"),
    "noun_countable" -> Seq("apple", "chair", "ticket", "bottle", "coin", "letter", "island", "wheel"),
    "noun_uncountable" -> Seq("water", "sand", "music", "advice", "traffic", "weather", "research", "salt"),
    "noun_determiner" -> Seq("this", "that", "these", "those", "each", "every", "some", "any"),
    "noun_proper" -> Seq("Avalon", "Eldoria", "Northbrook", "Silverton", "Brightwater", "Kestrel", "Marlowe", "Tallis"),
    // grammar: verbs
    "verb_action" -> Seq("run", "build", "throw", "paint", "carry", "launch", "write", "measure"),
    "verb_helping" -> Seq("can", "could", "may", "might", "shall", "should", "will", "would"),
    "verb_intransitive" -> Seq("arrive", "sleep", "vanish", "laugh", "exist", "fall", "happen", "wait"),
    "verb_linking" -> Seq("be", "seem", "become", "appear", "remain", "feel", "look", "stay"),
    "verb_transitive" -> Seq("bring", "take", "hold", "send", "make", "find", "keep", "show"),
    // grammar: adverbs
    "adverb_degree" -> Seq("quite", "almost", "barely", "deeply", "fairly", "highly", "nearly", "utterly"),
    "adverb_frequency_definite" -> Seq("daily", "weekly", "monthly", "yearly", "hourly", "nightly", "annually", "quarterly"),
    "adverb_frequency_indefinite" -> Seq("always", "often", "sometimes", "rarely", "never", "usually", "seldom", "frequently"),
    "adverb_manner" -> Seq("quickly", "softly", "bravely", "neatly", "calmly", "eagerly", "gently", "carefully"),
    "adverb_place" -> Seq("here", "there", "nearby", "upstairs", "outside", "inside", "everywhere", "abroad"),
    "adverb_time_definite" -> Seq("today", "tomorrow", "yesterday", "tonight", "now", "then", "later", "soon"),
    "adverb_time_indefinite" -> Seq("already", "recently", "lately", "eventually", "earlier", "finally", "previously", "afterward"),
    // grammar: adjectives
    "adjective_demonstrative" -> Seq("this", "that", "these", "those", "such", "former", "latter", "same"),
    "adjective_descriptive" -> Seq("bright", "quiet", "rugged", "smooth", "vivid", "sturdy", "gentle", "crisp"),
    "adjective_indefinite" -> Seq("few", "many", "several", "all", "any", "each", "either", "some"),
    "adjective_interrogative" -> Seq("what", "which", "whose"),
    "adjective_possessive" -> Seq("my", "your", "his", "her", "its", "our", "their"),
    "adjective_proper" -> Seq("Victorian", "Nordic", "Alpine", "Pacific", "Baltic", "Saharan", "Andean", "Arctic"),
    "adjective_quantitative" -> Seq("some", "much", "little", "enough", "whole", "sufficient", "ample", "sparse"),
    // grammar: pronouns
    "pronoun" -> Seq("I", "you", "he", "she", "it", "we", "they", "one"),
    "pronoun_demonstrative" -> Seq("this", "that", "these", "those"),
    "pronoun_indefinite" -> Seq("anyone", "everyone", "someone", "nobody", "each", "either", "many", "none"),
    "pronoun_interrogative" -> Seq("who", "whom", "whose", "what", "which"),
    "pronoun_object" -> Seq("me", "you", "him", "her", "it", "us", "them"),
    "pronoun_personal" -> Seq("I", "you", "he", "she", "it", "we", "they"),
    "pronoun_possessive" -> Seq("mine", "yours", "his", "hers", "ours", "theirs"),
    "pronoun_reflective" -> Seq("myself", "yourself", "himself", "herself", "itself", "ourselves", "themselves"),
    "pronoun_relative" -> Seq("who", "whom", "whose", "which", "that"),
    // grammar: prepositions & connectives
    "preposition_simple" -> Seq("at", "by", "in", "of", "on", "to", "up", "with"),
    "preposition_double" -> Seq("into", "onto", "upon", "within", "without", "throughout", "inside", "underneath"),
    "preposition_compound" -> Seq("according to", "because of", "next to", "in front of", "instead of", "on top of", "out of", "prior to"),
    "connective" -> Seq("and", "but", "or", "so", "yet", "for", "nor", "while"),
    "connective_casual" -> Seq("because", "since", "as", "therefore", "thus", "hence", "consequently", "so that"),
    "connective_comparative" -> Seq("likewise", "similarly", "whereas", "conversely", "in contrast", "equally", "by comparison", "on the other hand"),
    "connective_complaint" -> Seq("although", "though", "however", "nevertheless", "despite", "even so", "still", "regardless"),
    "connective_examplify" -> Seq("for example", "for instance", "namely", "such as", "in particular", "notably", "specifically", "to illustrate"),
    "connective_listing" -> Seq("first", "second", "third", "next", "then", "finally", "lastly", "meanwhile"),
    "connective_time" -> Seq("before", "after", "when", "until", "once", "whenever", "as soon as", "during"),
    "interjection" -> Seq("wow", "oh", "hey", "ouch", "hooray", "alas", "whew", "aha"),
    "hipster_word" -> Seq("artisan", "vinyl", "kombucha", "fixie", "letterpress", "sustainable", "heirloom", "small-batch"),
    // animals & food
    "animal" -> Seq("fox", "otter", "badger", "lynx", "heron", "moose", "hare", "raven"),
    "animal_type" -> Seq("mammal", "bird", "reptile", "amphibian", "fish", "insect"),
    "fruit" -> Seq("apple", "pear", "plum", "mango", "cherry", "grape", "peach", "kiwi"),
    "vegetable" -> Seq("carrot", "leek", "kale", "beet", "pepper", "spinach", "turnip", "celery"),
    // beer
    "beer_name" -> Seq("Harbor Lights", "Old Quarry", "Night Signal", "Copper Field", "First Frost", "Long Meadow", "Iron Gate", "River Bend"),
    "beer_style" -> Seq("Pale Ale", "Stout", "Porter", "Pilsner", "Saison", "Lager", "Wheat Beer", "Amber Ale"),
    "beer_hop" -> Seq("Cascade", "Citra", "Saaz", "Fuggle", "Galaxy", "Mosaic", "Simcoe", "Amarillo"),
    "beer_malt" -> Seq("Pale", "Munich", "Vienna", "Caramel", "Chocolate", "Roasted barley", "Wheat", "Rye"),
    "beer_yeast" -> Seq("Ale", "Lager", "Wit", "Saison", "Abbey", "Kolsch", "Hefeweizen", "Wild"),
    // cars
    "car_maker" -> Seq("Toyota", "Ford", "Honda", "Volvo", "Fiat", "Subaru", "Mazda", "Peugeot"),
    "car_model" -> Seq("Vertex", "Solara", "Pioneer", "Mirage", "Cadence", "Summit", "Horizon", "Atlas"),
    "car_type" -> Seq("sedan", "hatchback", "wagon", "coupe", "pickup", "van", "convertible", "suv"),
    "car_fuel_type" -> Seq("gasoline", "diesel", "electric", "hybrid", "ethanol", "lpg", "cng", "hydrogen"),
    "car_transmission_type" -> Seq("manual", "automatic", "cvt", "dual-clutch"),
    // media & genres
    "book_genre" -> Seq("mystery", "fantasy", "biography", "history", "romance", "thriller", "poetry", "science fiction"),
    "book_title" -> Seq("The Quiet Harbor", "A Field of Doors", "Winter Arithmetic", "The Glass Orchard", "Maps of Nowhere", "The Last Ferry", "Salt and Smoke", "The Paper City"),
    "movie_genre" -> Seq("action", "comedy", "drama", "horror", "documentary", "animation", "western", "musical"),
    "movie_name" -> Seq("Northern Signal", "The Long Detour", "Paper Lanterns", "Midnight Cartography", "The Seventh Tide", "Echo Valley", "A Minor Kingdom", "Stolen Daylight"),
    "song_genre" -> Seq("rock", "jazz", "folk", "electronic", "hip hop", "classical", "country", "blues"),
    "song_name" -> Seq("Glass Rivers", "Another Monday", "Wire and String", "Low Tide", "Orchard Lights", "Static Hearts", "Half Past Blue", "Gravel Road"),
    // hacker
    "hacker_abbreviation" -> Seq("TCP", "HTTP", "SQL", "RAM", "SSD", "API", "CLI", "GPU"),
    "hacker_adjective" -> Seq("virtual", "neural", "redundant", "distributed", "encrypted", "asynchronous", "stateless", "quantum"),
    "hacker_noun" -> Seq("firewall", "protocol", "interface", "payload", "daemon", "kernel", "socket", "checksum"),
    "hacker_verb" -> Seq("compress", "encrypt", "override", "reboot", "index", "parse", "synthesize", "quantify"),
    "hackering_verb" -> Seq("compressing", "encrypting", "overriding", "rebooting", "indexing", "parsing", "synthesizing", "quantifying"),
    // minecraft-style survival game vocabulary
    "minecraft_animal" -> Seq("cow", "pig", "sheep", "chicken", "rabbit", "horse", "wolf", "cat"),
    "minecraft_armor_part" -> Seq("helmet", "chestplate", "leggings", "boots"),
    "minecraft_armor_tier" -> Seq("leather", "chainmail", "iron", "gold", "diamond", "netherite"),
    "minecraft_biome" -> Seq("plains", "forest", "desert", "taiga", "swamp", "jungle", "savanna", "tundra"),
    "minecraft_dye" -> Seq("white", "orange", "magenta", "light blue", "yellow", "lime", "pink", "cyan"),
    "minecraft_food" -> Seq("bread", "apple", "carrot", "potato", "beef", "porkchop", "melon", "cookie"),
    "minecraft_mob_boss" -> Seq("ender dragon", "wither", "elder guardian", "warden"),
    "minecraft_mob_hostile" -> Seq("zombie", "skeleton", "creeper", "spider", "witch", "slime", "phantom", "pillager"),
    "minecraft_mob_neutral" -> Seq("enderman", "piglin", "bee", "iron golem", "llama", "panda", "polar bear", "dolphin"),
    "minecraft_mob_passive" -> Seq("villager", "cow", "sheep", "chicken", "squid", "bat", "turtle", "fox"),
    "minecraft_ore" -> Seq("coal", "iron", "copper", "gold", "redstone", "lapis", "diamond", "emerald"),
    "minecraft_tool" -> Seq("pickaxe", "axe", "shovel", "hoe", "shears", "fishing rod", "flint and steel", "compass"),
    "minecraft_villager_job" -> Seq("farmer", "librarian", "blacksmith", "cleric", "fletcher", "butcher", "cartographer", "mason"),
    "minecraft_villager_level" -> Seq("novice", "apprentice", "journeyman", "expert", "master"),
    "minecraft_villager_station" -> Seq("composter", "lectern", "anvil", "brewing stand", "fletching table", "smoker", "cartography table", "stonecutter"),
    "minecraft_weapon" -> Seq("sword", "bow", "crossbow", "trident", "axe", "shield"),
    "minecraft_weather" -> Seq("clear", "rain", "thunder", "snow"),
    "minecraft_wood" -> Seq("oak", "spruce", "birch", "jungle", "acacia", "dark oak", "mangrove", "cherry"),
    // products
    "product_category" -> Seq("electronics", "kitchen", "outdoors", "office", "toys", "garden", "fitness", "lighting"),
    "product_feature" -> Seq("waterproof", "foldable", "rechargeable", "wireless", "adjustable", "stackable", "insulated", "portable"),
    "product_material" -> Seq("oak", "steel", "bamboo", "ceramic", "canvas", "aluminum", "walnut", "glass"),
    "product_benefit" -> Seq("saves space", "cuts setup time", "reduces noise", "lasts longer", "improves posture", "lowers energy use", "simplifies cleanup", "boosts comfort"),
    "product_suffix" -> Seq("Pro", "Lite", "Max", "Mini", "Plus", "Ultra", "Go", "Prime"),
    "product_use_case" -> Seq("camping", "daily commute", "home office", "meal prep", "travel", "workshop", "studio", "classroom"),
    // jobs & people
    "job_descriptor" -> Seq("Senior", "Lead", "Principal", "Regional", "Global", "Associate", "Chief", "Staff"),
    "job_level" -> Seq("Engineering", "Marketing", "Operations", "Finance", "Design", "Research", "Support", "Logistics"),
    "input_name" -> Seq("first_name", "last_name", "email", "address", "phone", "message", "password", "username"),
    // places
    "state" -> Seq("Ohio", "Texas", "Oregon", "Maine", "Nevada", "Kansas", "Vermont", "Georgia"),
    "country_abr" -> Seq("US", "GB", "DE", "FR", "JP", "BR", "IN", "AU"),
    "school" -> Seq("Northbrook High School", "Silverton University", "Brightwater Academy", "Kestrel College", "Eldoria Institute", "Marlowe Preparatory School", "Tallis Technical College", "Avalon State University"),
    // time zones
    "time_zone_abv" -> Seq("UTC", "EST", "PST", "CET", "JST", "IST", "GMT", "MST"),
    "time_zone_full" -> Seq("(UTC+00:00) Coordinated Universal Time", "(UTC-05:00) Eastern Time", "(UTC-08:00) Pacific Time", "(UTC+01:00) Central European Time", "(UTC+09:00) Japan Time", "(UTC+05:30) India Time", "(UTC+10:00) Eastern Australia Time", "(UTC-07:00) Mountain Time"),
    "time_zone_region" -> Seq("America/New_York", "Europe/Berlin", "Asia/Tokyo", "Australia/Sydney", "America/Los_Angeles", "Asia/Kolkata", "Europe/London", "America/Sao_Paulo"),
    // finance
    "credit_card_type" -> Seq("Visa", "Mastercard", "American Express", "Discover", "JCB", "UnionPay"),
    "currency_long" -> Seq("United States Dollar", "Euro", "British Pound", "Japanese Yen", "Chinese Yuan", "Indian Rupee", "Brazilian Real", "Canadian Dollar"),
    // emoji
    "emoji_alias" -> Seq(":smile:", ":rocket:", ":tada:", ":bug:", ":fire:", ":star:", ":heart:", ":zap:"),
    "emoji_category" -> Seq("Smileys & Emotion", "Animals & Nature", "Food & Drink", "Travel & Places", "Activities", "Objects", "Symbols", "Flags"),
    "emoji_description" -> Seq("grinning face", "rocket", "party popper", "bug", "fire", "white star", "red heart", "high voltage"),
    "emoji_tag" -> Seq("happy", "space", "celebration", "insect", "hot", "night", "love", "electric"),
    // language
    "language_bcp" -> Seq("en-US", "en-GB", "de-DE", "fr-FR", "ja-JP", "pt-BR", "hi-IN", "zh-CN"),
    // errors
    "error" -> Seq("something went wrong", "operation failed", "invalid state", "resource unavailable", "unexpected end of input", "permission denied", "not implemented", "timeout exceeded"),
    "error_database" -> Seq("connection refused", "deadlock detected", "unique constraint violated", "relation does not exist", "transaction aborted", "too many connections", "syntax error in statement", "lock wait timeout"),
    "error_grpc" -> Seq("rpc error: code = Unavailable", "rpc error: code = DeadlineExceeded", "rpc error: code = NotFound", "rpc error: code = PermissionDenied", "rpc error: code = ResourceExhausted", "rpc error: code = Unimplemented", "rpc error: code = Internal", "rpc error: code = InvalidArgument"),
    "error_http" -> Seq("400 Bad Request", "401 Unauthorized", "403 Forbidden", "404 Not Found", "408 Request Timeout", "429 Too Many Requests", "500 Internal Server Error", "503 Service Unavailable"),
    "error_http_client" -> Seq("400 Bad Request", "401 Unauthorized", "403 Forbidden", "404 Not Found", "405 Method Not Allowed", "409 Conflict", "410 Gone", "429 Too Many Requests"),
    "error_http_server" -> Seq("500 Internal Server Error", "501 Not Implemented", "502 Bad Gateway", "503 Service Unavailable", "504 Gateway Timeout", "505 HTTP Version Not Supported", "507 Insufficient Storage", "511 Network Authentication Required"),
    "error_object" -> Seq("nil pointer dereference", "index out of range", "type assertion failed", "map key not found", "slice bounds out of range", "division by zero", "stack overflow", "invalid memory address"),
    "error_runtime" -> Seq("out of memory", "segmentation fault", "goroutine leak", "channel closed", "context canceled", "panic recovered", "signal received", "watchdog expired"),
    "error_validation" -> Seq("field is required", "value out of range", "invalid email format", "string too long", "unknown enum value", "date in the past", "checksum mismatch", "pattern not matched"),
    // user agents (original strings, plausible shapes)
    "chrome_user_agent" -> Seq(
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/121.0.0.0 Safari/537.36",
      "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36",
      "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36"),
    "firefox_user_agent" -> Seq(
      "Mozilla/5.0 (X11; Linux x86_64; rv:122.0) Gecko/20100101 Firefox/122.0",
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) Gecko/20100101 Firefox/121.0",
      "Mozilla/5.0 (Macintosh; Intel Mac OS X 14.2; rv:120.0) Gecko/20100101 Firefox/120.0"),
    "safari_user_agent" -> Seq(
      "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Safari/605.1.15",
      "Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.2 Mobile/15E148 Safari/604.1"),
    "opera_user_agent" -> Seq(
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 OPR/105.0.0.0",
      "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/118.0.0.0 Safari/537.36 OPR/104.0.0.0"),
    // celebrity stand-ins (fictional names — same shape, nobody real)
    "celebrity_actor" -> Seq("Rowan Ashford", "Mira Castellan", "Dev Okafor", "Lena Marchetti", "Theo Lindqvist", "Priya Venkat", "Jonah Reyes", "Clara Whitmore"),
    "celebrity_business" -> Seq("Aldous Trent", "Sana Qureshi", "Viktor Halvorsen", "Beatriz Campos", "Nolan Pierce", "Ingrid Solberg", "Ravi Shenoy", "Maeve Callahan"),
    "celebrity_sport" -> Seq("Dario Ventura", "Kofi Mensah", "Elsa Bergstrom", "Mateo Ibarra", "Yuki Tanabe", "Aisha Diallo", "Brock Tanner", "Nina Petrova"))

  // ----------------------------------------------------------- generators

  /** Tail-registry lookup; None = genuinely unknown tag (the caller then
    * errors, mirroring the reference's unknown-tag failure). */
  def gen(tag: String, p: String, ctx: Ctx): Option[Column] = {
    W.get(tag).map(xs => pick(xs, p, ctx)).orElse(composite(tag, p, ctx))
  }

  private def composite(tag: String, p: String, ctx: Ctx): Option[Column] = {
    def u(sub: String, lo: Long, hi: Long) = ctx.uniform(p + sub, lo, hi)
    def w(sub: String, key: String) = pick(W(key), p + sub, ctx)
    tag match {
      // people-ish composites
      case "app_author" => Some(concat_ws(" ", w(".f", "noun_proper"), w(".l", "celebrity_actor")))
      case "app_version" => Some(format_string("%d.%d.%d", u(".a", 0, 9), u(".b", 0, 20), u(".c", 0, 99)))
      case "book_author" => Some(w("", "celebrity_actor"))
      case "song_artist" => Some(concat_ws(" ", initcap(w(".a", "adjective_descriptive")), initcap(w(".n", "noun_concrete"))))
      // finance / identifiers
      case "ach_account" => Some(format_string("%012d", u("", 0, 999999999999L)))
      case "ach_routing" => Some(format_string("%09d", u("", 10000000, 999999999)))
      case "bitcoin_address" => Some(concat(lit("1"),
        lower(lpad(hex(ctx.h(p + ".a")), 16, "0")),
        lower(lpad(hex(ctx.h(p + ".b")), 16, "0")).substr(1, 17)))
      case "bitcoin_private_key" => Some(concat(lit("5"),
        lower(lpad(hex(ctx.h(p + ".a")), 16, "0")),
        lower(lpad(hex(ctx.h(p + ".b")), 16, "0")),
        lower(lpad(hex(ctx.h(p + ".c")), 16, "0")).substr(1, 18)))
      case "cusip" => Some(concat(format_string("%06d", u(".n", 0, 999999)),
        w(".a", "pronoun_interrogative").substr(1, 1), format_string("%d", u(".c", 0, 9))))
      case "isin" => Some(format_string("US%09d%d", u(".n", 0, 999999999), u(".c", 0, 9)))
      // beer numerics
      case "beer_alcohol" => Some(format_string("%d.%d%%", u(".a", 4, 9), u(".b", 0, 9)))
      case "beer_ibu" => Some(format_string("%d IBU", u("", 10, 120)))
      case "beer_blg" => Some(format_string("%d.%d°Blg", u(".a", 8, 20), u(".b", 0, 9)))
      // sentences & text shapes
      case "blurb" => Some(concat_ws(" ", initcap(w(".a", "adjective_descriptive")), w(".n", "noun_abstract")))
      case "comment" => Some(concat_ws(" ", lit("This"), w(".n", "noun_common"), lit("is"), w(".a", "adjective_descriptive")))
      case "question" => Some(concat(initcap(w(".q", "pronoun_interrogative")), lit(" "),
        w(".v", "verb_action"), lit(" the "), w(".n", "noun_concrete"), lit("?")))
      case "quote" => Some(concat(lit("\""), initcap(w(".a", "adverb_manner")), lit(" "),
        w(".v", "verb_action"), lit(" the "), w(".n", "noun_uncountable"), lit(".\"")))
      case "phrase_adverb" => Some(concat_ws(" ", w(".d", "adverb_degree"), w(".m", "adverb_manner")))
      case "phrase_noun" => Some(concat_ws(" ", lit("the"), w(".a", "adjective_descriptive"), w(".n", "noun_concrete")))
      case "phrase_preposition" => Some(concat_ws(" ", w(".p", "preposition_simple"), lit("the"), w(".n", "noun_concrete")))
      case "phrase_verb" => Some(concat_ws(" ", w(".v", "verb_transitive"), lit("the"), w(".n", "noun_countable")))
      case "hacker_phrase" => Some(concat_ws(" ", initcap(w(".v", "hackering_verb")), lit("the"),
        w(".a", "hacker_adjective"), w(".n", "hacker_noun"), lit("should"), w(".v2", "hacker_verb"),
        lit("the"), w(".n2", "hacker_noun")))
      // products
      case "product_name" => Some(concat_ws(" ", initcap(w(".m", "product_material")),
        initcap(w(".n", "noun_concrete")), w(".s", "product_suffix")))
      case "product_description" => Some(concat_ws(" ", lit("A"), w(".f", "product_feature"),
        w(".m", "product_material"), w(".n", "noun_concrete"), lit("that"), w(".b", "product_benefit")))
      case "product_dimension" => Some(format_string("%d x %d x %d cm",
        u(".a", 1, 99), u(".b", 1, 99), u(".c", 1, 99)))
      case "product_upc" => Some(format_string("%012d", u("", 0, 999999999999L)))
      // web & net
      case "http_status_code_simple" => Some(pick(Seq("200", "301", "404", "500"), p, ctx).cast("int"))
      case "i_pv_4_address" => Some(format_string("%d.%d.%d.%d",
        u(".1", 1, 254), u(".2", 0, 255), u(".3", 0, 255), u(".4", 1, 254)))
      case "i_pv_6_address" => Some(format_string("%x:%x:%x:%x:%x:%x:%x:%x",
        u(".1", 0, 65535), u(".2", 0, 65535), u(".3", 0, 65535), u(".4", 0, 65535),
        u(".5", 0, 65535), u(".6", 0, 65535), u(".7", 0, 65535), u(".8", 0, 65535)))
      // numbers & time
      case "float_32" => Some(ctx.u01(p).cast("float"))
      case "float_64" => Some(ctx.u01(p))
      case "uint_64" => Some(abs(ctx.h(p)))
      case "nano_second" => Some(u("", 0, 999999999).cast("int"))
      case "future_date" => Some(date_format(
        date_add(current_date(), u("", 1, 365).cast("int")), "yyyy-MM-dd"))
      case "time_zone_offset" => Some(u("", -12, 14).cast("double"))
      case "zip" => Some(format_string("%05d", u("", 501, 99950)))
      case _ => None
    }
  }
}
