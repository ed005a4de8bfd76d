package graft.queries

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.io.StreamLoad

/** The live stream-load sink (S11) on the VERIFIED path: an in-process
  * HTTP peer plays the engine's _stream_load endpoint, `nation` goes up
  * the wire from executor partitions (loadDataset — the cluster-scale
  * path, no driver disk round-trip), and the query's OUTPUT is what the
  * peer received, parsed back from the CSV wire shape. The DuckDB
  * oracle reads the same table straight from parquet, so any corruption
  * in wire formatting, separator handling, null encoding, or lost/dup
  * partition uploads breaks the row/hash compare.
  */
object IoQueries extends QueryModule {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "io01_streamload_roundtrip" -> ((s, dir) => {
      val received = new java.lang.StringBuilder
      val server = com.sun.net.httpserver.HttpServer.create(
        new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/", { ex =>
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        received.synchronized { received.append(body) }
        val reply = """{"Status": "Success"}""".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, reply.length)
        ex.getResponseBody.write(reply)
        ex.close()
      })
      server.start()
      try {
        val cfg = StreamLoad.Config("127.0.0.1", server.getAddress.getPort)
        val df = Tables.t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        StreamLoad.loadDataset(df.repartition(4), cfg, "graft", "nation")
        // parse the wire bytes back: ☆-separated lines
        val lines = received.synchronized { received.toString }
          .split("\n").filter(_.nonEmpty).toSeq
        import s.implicits._
        lines.toDF("line")
          .select(split(col("line"), StreamLoad.ColumnSeparator).as("f"))
          .select(
            element_at(col("f"), 1).cast("int").as("n_nationkey"),
            element_at(col("f"), 2).as("n_name"),
            element_at(col("f"), 3).cast("int").as("n_regionkey"))
          .orderBy("n_nationkey")
      } finally server.stop(0)
    }),

    // Z-order layout (io/ZOrder.scala) on the VERIFIED path: lineitem is
    // laid out on the Morton code of (l_partkey, l_suppkey), landed, and
    // read back. The in-query guard measures the file-skipping property
    // itself — the mean per-file bounding-box area over BOTH clustered
    // columns must be a small fraction of the full key space (a linear
    // sort leaves the second column's boxes at ~full width; z-order
    // keeps every file a compact rectangle). The oracle recomputes the
    // exact interleave bit arithmetic in DuckDB on a key sample, so the
    // z-values themselves — not just the layout — are cross-checked.
    "io02_zorder_layout" -> ((s, dir) => {
      import graft.io.ZOrder
      // min/max-normalize both keys to the full 16-bit range before
      // interleaving — an unnormalized Morton code is dominated by the
      // wider-range column's high bits and degenerates to a linear sort
      val li0 = Tables.t(s, dir, "lineitem")
      val Seq(na, nb) = ZOrder.normalizedAll(li0, Seq("l_partkey", "l_suppkey"), 16)
      val li = li0.select(col("l_orderkey"), col("l_linenumber"),
        na.as("a"), nb.as("b"))
      val out = s"${graft.Land.root}/zorder/lineitem"
      li.withColumn("zv", ZOrder.zValue2(col("a"), col("b"), bits = 16))
        .repartitionByRange(8, col("zv"))
        .sortWithinPartitions("zv")
        .write.mode("overwrite").parquet(out)
      val landed = s.read.parquet(out)
      // locality guard: BOTH clustered columns' mean per-file spans must
      // be a fraction of their global span (a linear sort can bound only
      // one); spans are measured against the columns' actual ranges
      val g = landed.agg(
        (max(col("a")) - min(col("a"))).cast("double"),
        (max(col("b")) - min(col("b"))).cast("double")).head()
      val (gA, gB) = (math.max(g.getDouble(0), 1.0), math.max(g.getDouble(1), 1.0))
      val spans = landed.groupBy(input_file_name().as("f")).agg(
          ((max(col("a")) - min(col("a"))).cast("double") / gA).as("sa"),
          ((max(col("b")) - min(col("b"))).cast("double") / gB).as("sb"))
        .agg(avg(col("sa")), avg(col("sb"))).head()
      val (sa, sb) = (spans.getDouble(0), spans.getDouble(1))
      require(sa <= 0.75 && sb <= 0.75,
        f"z-order locality regression: mean per-file spans ($sa%.3f, $sb%.3f)")
      landed.filter(col("l_orderkey") <= 300)
        .select(col("l_orderkey"), col("l_linenumber"), col("zv"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // JSONL corpus sink/source roundtrip: documents go out through
    // Spark's line-delimited JSON writer (per-partition streaming — no
    // driver funnel; the interchange format every curation pipeline
    // exports to), come back through the JSON reader with the ORIGINAL
    // schema pinned (no sampling inference at scale), and the query
    // output is a per-source digest of the re-read rows. The DuckDB
    // oracle reads the SAME landed .json files with its own newline-
    // delimited reader, so escaping, unicode, null encoding, and
    // lost/duplicated partitions all break the compare — a true
    // cross-engine wire-format check, not a self-roundtrip.
    "io03_jsonl_roundtrip" -> ((s, dir) => {
      val d = Tables.t(s, dir, "documents")
      val out = s"${graft.Land.root}/io/jsonl_docs"
      d.write.mode("overwrite").json(out)
      s.read.schema(d.schema).json(out)
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(length(col("text")).cast("long")).as("sum_text_len"),
          min(md5(col("text"))).as("min_md5"),
          max(md5(col("text"))).as("max_md5"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("source")
    }),

    // Hive-style PARTITIONED layout (the 100 TB default for time/
    // language/source-sliced corpora): documents land partitioned by
    // lang, the read-back filter must prune at the DIRECTORY level —
    // the in-query guard asserts the scan carries a lang partition
    // filter (not a post-scan one), i.e. the 'en' query never opens the
    // other languages' files. The oracle recomputes the same accounting
    // from the unpartitioned source table.
    "io04_partitioned_layout" -> ((s, dir) => {
      val d = Tables.t(s, dir, "documents")
      val out = s"${graft.Land.root}/io/part_docs"
      d.write.mode("overwrite").partitionBy("lang").parquet(out)
      val filtered = s.read.parquet(out).filter(col("lang") === "en")
      val scans = filtered.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      require(scans.nonEmpty, "partitioned read planned no file scan")
      require(scans.head.partitionFilters
          .exists(_.references.exists(_.name == "lang")),
        "lang filter did not reach the scan's PARTITION filters — " +
          "the layout is not pruning directories")
      filtered.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("source")
    }),

    // SCHEMA EVOLUTION across landed batches (the 100 TB reality:
    // yesterday's shards lack the column added today): two batches with
    // different column sets, read back under mergeSchema — the union
    // schema must surface, absent columns as nulls. The guard pins the
    // merged schema; DuckDB reads the SAME landed files with its own
    // union_by_name reader, so both engines' null semantics agree.
    "io05_schema_evolution" -> ((s, dir) => {
      val d = Tables.t(s, dir, "documents")
      val root = s"${graft.Land.root}/io/evolve"
      d.filter(col("doc_id") % 2 === 0).select("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$root/batch_a")
      d.filter(col("doc_id") % 2 === 1).select("doc_id", "text", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$root/batch_b")
      val merged = s.read.option("mergeSchema", "true")
        .parquet(s"$root/batch_a", s"$root/batch_b")
      require(merged.columns.toSet ==
          Set("doc_id", "text", "lang", "source", "n_chars"),
        s"mergeSchema lost columns: ${merged.columns.mkString(",")}")
      merged.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
        .orderBy("lang", "source")
    }),

    // SMALL-FILE COMPACTION (the lakehouse maintenance op every 100 TB
    // table needs: streaming ingest leaves thousands of KB-sized files,
    // and scan cost is dominated by file-open overhead): land the corpus
    // deliberately shattered (64 round-robin shards), then rewrite at a
    // target file size — file count = ceil(bytes/target), sized from the
    // LANDED bytes, never a guess. The result row cross-proves the
    // rewrite in both engines: Spark counts distinct input_file_name()
    // per layout, DuckDB counts distinct filenames reading the SAME
    // landed dirs, and rows/char-mass must survive the rewrite exactly.
    "io06_compaction" -> ((s, dir) => {
      val d = Tables.t(s, dir, "documents")
      val root = s"${graft.Land.root}/io/compact"
      d.repartition(64).write.mode("overwrite").parquet(s"$root/small")
      val smallBytes = new java.io.File(s"$root/small").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.length).sum
      val target = 128L * 1024
      val nOut = math.max(1, math.ceil(smallBytes.toDouble / target).toInt)
      // round-robin repartition: even output sizes regardless of key skew
      // (compaction has no co-location contract to preserve)
      s.read.parquet(s"$root/small").repartition(nOut)
        .write.mode("overwrite").parquet(s"$root/compacted")
      val small = s.read.parquet(s"$root/small")
        .select(col("_metadata.file_path").as("fname"))
        .agg(countDistinct(col("fname")).as("n_files_small"),
          count(lit(1)).as("n_rows_small"))
      val compacted = s.read.parquet(s"$root/compacted")
        .select(col("_metadata.file_path").as("fname"), col("n_chars"))
        .agg(countDistinct(col("fname")).as("n_files_compacted"),
          count(lit(1)).as("n_rows_compacted"),
          sum(col("n_chars")).as("sum_chars"))
      val out = small.crossJoin(compacted)
      val r = out.head()
      require(r.getAs[Long]("n_files_compacted") < r.getAs[Long]("n_files_small"),
        "compaction did not reduce the file count")
      out
    }),

    // TOTAL-ORDER (range-partitioned) layout — the terasort shape and
    // io02's single-key complement: repartitionByRange samples boundary
    // keys and performs ONE range exchange (no single-reducer global
    // sort), each task writes a sorted run, and because equal keys never
    // split across range partitions the per-file [min,max] key envelopes
    // are pairwise DISJOINT — which is exactly what lets a reader prune
    // whole files on a range predicate. The result IS the proof: both
    // engines read the same landed files and recompute per-file
    // envelopes, ranks, and the strict prev.max < cur.min law; rows are
    // conserved by an in-query guard. Skew note: a single hot key stays
    // in one file by design (co-location beats balance for pruning).
    "io07_range_layout" -> ((s, dir) => {
      val root = s"${graft.Land.root}/io/range"
      val li = Tables.t(s, dir, "lineitem")
      val nSrc = li.count()
      li.repartitionByRange(16, col("l_shipdate"))
        .sortWithinPartitions("l_shipdate", "l_orderkey", "l_linenumber")
        .write.mode("overwrite").parquet(root)
      val per = s.read.parquet(root)
        .select(regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1).as("fname"),
          col("l_shipdate"))
        .groupBy("fname")
        .agg(count(lit(1)).as("n_rows"),
          min(col("l_shipdate")).as("key_min"),
          max(col("l_shipdate")).as("key_max"))
      // the proof table is one row per FILE (~16) — the window is tiny
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(0)).orderBy("key_min", "fname")
      val out = per.select(
        row_number().over(w).cast("long").as("file_rank"),
        col("n_rows"), col("key_min"), col("key_max"),
        coalesce(lag(col("key_max"), 1).over(w) < col("key_min"), lit(true))
          .as("range_ok"))
        .orderBy("file_rank")
      val bad = out.filter(!col("range_ok")).count()
      require(bad == 0, s"$bad file ranges overlap — total order broken")
      val tot = out.agg(sum(col("n_rows"))).head().getLong(0)
      require(tot == nSrc, s"row conservation broken: $tot != $nSrc")
      out
    }),

    // DYNAMIC partition overwrite — the incremental re-land every
    // partitioned 100 TB table depends on: rewriting one partition must
    // not touch (or even list-rewrite) the others. Full land, then a
    // modified lang=en batch overwritten with the WRITER-level
    // partitionOverwriteMode=dynamic option (no session-conf mutation —
    // Verify shares the session across queries). Proof, in-query:
    // (1) every non-en partition's file set is BYTE-IDENTICAL (names +
    // sizes) before and after; (2) en's values moved by exactly the
    // transformation. The emitted rows come from reading the final tree,
    // which DuckDB re-reads hive-partitioned for the hash compare.
    "io09_dynamic_overwrite" -> ((s, dir) => {
      val root = s"${graft.Land.root}/io/dynover"
      val d = Tables.t(s, dir, "documents")
      d.write.mode("overwrite").partitionBy("lang").parquet(root)
      def fileSet(): Map[String, Set[(String, Long)]] = {
        val base = new java.io.File(root)
        base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("lang="))
          .map(p => p.getName ->
            p.listFiles().filter(_.getName.endsWith(".parquet"))
              .map(f => (f.getName, f.length)).toSet).toMap
      }
      val before = fileSet()
      val origEn = d.filter(col("lang") === "en")
        .agg(count(lit(1)), coalesce(sum(col("n_chars")), lit(0L)))
        .head()
      d.filter(col("lang") === "en")
        .withColumn("n_chars", col("n_chars") + 1000000L)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang").parquet(root)
      val after = fileSet()
      for ((part, files) <- before if part != "lang=en")
        require(after.get(part).contains(files),
          s"dynamic overwrite disturbed untouched partition $part")
      val out = s.read.parquet(root)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
        .orderBy("lang")
      val en = out.filter(col("lang") === "en")
        .select("n_docs", "sum_chars").head()
      require(en.getLong(0) == origEn.getLong(0) &&
        en.getLong(1) == origEn.getLong(1) + 1000000L * origEn.getLong(0),
        "en partition does not carry exactly the rewritten batch")
      out
    }),

    // ORC round-trip (second columnar format beside parquet): lineitem
    // lands as ORC and is read BACK for the aggregate, while the oracle
    // computes the same aggregate from the original parquet — hash
    // equality proves type fidelity (longs, doubles, strings, µs
    // timestamps) across the format boundary. Decimal-exact sums, so
    // any value corruption (not just dropped rows) breaks the compare.
    "io08_orc_roundtrip" -> ((s, dir) => {
      val root = s"${graft.Land.root}/io/orc"
      Tables.t(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag", "l_shipdate")
        .write.mode("overwrite").orc(root)
      s.read.orc(root)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          min(col("l_orderkey")).as("min_key"),
          max(col("l_orderkey")).as("max_key"),
          min(col("l_shipdate")).cast("timestamp_ntz").as("first_ship"),
          max(col("l_shipdate")).cast("timestamp_ntz").as("last_ship"))
        .orderBy("l_returnflag")
    }),

    // Bucketed co-located join layout: both sides land bucketed AND
    // sorted on the join key (external tables, so the files live under
    // Land.root where the oracle reads them), and the join then runs
    // with ZERO exchanges — the scan itself carries the co-location
    // contract. This is the 100 TB lever for repeated fact-fact joins:
    // pay the key shuffle ONCE at land time, amortize it over every
    // later join on that key. Pre-repartitioning on the bucket column
    // with the bucket count gives one file per bucket (Spark's
    // repartition hash == its bucket hash), so the landed sort order
    // also satisfies the merge-join's ordering requirement. The
    // in-query guard asserts the executed join plan is a SortMergeJoin
    // with NO Exchange anywhere; broadcast is disabled for the check so
    // toy-scale table sizes can't route around the claim being proven.
    "io10_bucketed_join" -> ((s, dir) => {
      val root = s"${graft.Land.root}/io/bucketed"
      val nb = 8
      s.sql("DROP TABLE IF EXISTS io10_cust")
      s.sql("DROP TABLE IF EXISTS io10_ord")
      Tables.t(s, dir, "customer").select("c_custkey", "c_nationkey")
        .repartition(nb, col("c_custkey"))
        .write.mode("overwrite")
        .bucketBy(nb, "c_custkey").sortBy("c_custkey")
        .option("path", s"$root/cust").saveAsTable("io10_cust")
      Tables.t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartition(nb, col("o_custkey"))
        .write.mode("overwrite")
        .bucketBy(nb, "o_custkey").sortBy("o_custkey")
        .option("path", s"$root/ord").saveAsTable("io10_ord")
      val prevThresh = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val bare = s.table("io10_cust")
          .join(s.table("io10_ord"), col("c_custkey") === col("o_custkey"))
        val plan = bare.queryExecution.executedPlan.toString
        require(plan.contains("SortMergeJoin"),
          s"bucketed join must sort-merge:\n${plan.take(2000)}")
        require(!plan.contains("Exchange"),
          s"bucketed join must not shuffle:\n${plan.take(2000)}")
        bare.groupBy(col("c_nationkey").cast("bigint").as("c_nationkey"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
              .as("sum_price"),
            countDistinct(col("c_custkey")).as("n_custs"))
          .orderBy("c_nationkey")
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }),

    // CSV round-trip fidelity on the HARD cases: values with embedded
    // quotes, separators, and newlines, plus a distinguishable null
    // encoding (`\N`, the same wire convention as the reference's CSV
    // sink — S10). Spark lands RFC-4180-style CSV (escape = quote, so
    // quotes double instead of backslash-escaping, the dialect every
    // other engine parses), reads it back with multiLine=true, and the
    // oracle parses the SAME files with DuckDB's CSV reader — the
    // decimal-exact sums and per-row char accounting break on any
    // quoting, escaping, newline, null, or date formatting divergence.
    "io11_csv_roundtrip" -> ((s, dir) => {
      val root = s"${graft.Land.root}/io/csv"
      Tables.t(s, dir, "orders")
        .where(col("o_orderkey") <= 2000)
        .select(col("o_orderkey"),
          concat(lit("v\""), col("o_orderpriority"), lit(",x"),
            when(col("o_orderkey") % 3 === 0, lit("\nNL")).otherwise(lit("")))
            .as("tricky"),
          when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("o_orderstatus")).as("maybe_null"),
          col("o_totalprice"), col("o_orderdate"))
        .coalesce(2)
        .write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .option("nullValue", "\\N")
        .csv(root)
      s.read
        .option("header", "true").option("escape", "\"")
        .option("nullValue", "\\N").option("multiLine", "true")
        .schema("o_orderkey BIGINT, tricky STRING, maybe_null STRING, " +
          "o_totalprice DOUBLE, o_orderdate DATE")
        .csv(root)
        .agg(count(lit(1)).as("n"),
          sum(length(col("tricky"))).as("sum_tricky_chars"),
          sum(when(col("tricky").contains("\n"), 1L).otherwise(0L))
            .as("n_embedded_nl"),
          sum(when(col("maybe_null").isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col("maybe_null")).as("n_statuses"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          min(col("o_orderdate")).as("first_date"),
          max(col("o_orderdate")).as("last_date"))
    }),

    // NESTED schema pruning: a document lands with a struct (3 fields)
    // plus an array column; the read-back query touches two struct
    // LEAVES, and the in-query guard asserts the parquet ReadSchema
    // carries ONLY those leaves — not the untouched sibling field, not
    // the array. At 100 TB, nested pruning is the difference between
    // reading 2 leaf column chunks and decoding every row's full struct
    // + array; a regression here is silent (results stay correct, IO
    // multiplies), which is exactly why the guard reads the PLAN, and
    // the oracle re-derives the values from the flat source columns.
    "io12_nested_pruning" -> ((s, dir) => {
      val root = s"${graft.Land.root}/io/nested"
      Tables.t(s, dir, "documents")
        .select(col("doc_id"),
          struct(col("lang").as("l"), col("source").as("src"),
            col("n_chars").as("c")).as("meta"),
          array(col("n_chars"), col("n_chars") * 2).as("arr"))
        .write.mode("overwrite").parquet(root)
      val rb = s.read.parquet(root)
        .groupBy(col("meta.l").as("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("meta.c")).as("sum_chars"))
        .orderBy("lang")
      val scan = rb.queryExecution.executedPlan.toString
      val readSchema = scan.linesIterator
        .find(_.contains("ReadSchema")).getOrElse("")
      require(readSchema.contains("meta") && readSchema.contains("c:") &&
        !readSchema.contains("src") && !readSchema.contains("arr"),
        s"nested pruning regressed — scan reads untouched leaves: $readSchema")
      rb
    }),

    // Keyed MERGE/upsert (io/Merge.scala) on the VERIFIED path: documents
    // land hive-partitioned by lang, an update batch upserts into the
    // 'en' partition (matched keys replaced) and inserts a brand-new
    // 'xx' partition; the merge is PARTITION-SCOPED (only en+xx
    // rewritten — the in-query guard proves every other partition's
    // files stayed byte-identical) and row conservation (after = before
    // + inserted) is required inside mergeInto. The oracle restates the
    // merge as update ∪ (target ANTI JOIN update) over the original
    // parquet, so any lost/duplicated/mis-merged row breaks the hash.
    "io13_merge_upsert" -> ((s, dir) => {
      val root = s"${graft.Land.root}/io/merge"
      val d = Tables.t(s, dir, "documents")
      d.write.mode("overwrite").partitionBy("lang").parquet(root)
      def fileSet(): Map[String, Set[(String, Long)]] = {
        val base = new java.io.File(root)
        base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("lang="))
          .map(p => p.getName ->
            p.listFiles().filter(_.getName.endsWith(".parquet"))
              .map(f => (f.getName, f.length)).toSet).toMap
      }
      val before = fileSet()
      // insert-key offset derived from the corpus, not a fixed literal:
      // doc_ids are dense from 0, so a constant offset collides with
      // real ids once the corpus outgrows it (and mergeInto's own
      // guards would then abort the query at exactly the large scale
      // factors the partition-scoped story targets). max+1 is one
      // column-stats aggregate; the oracle recomputes the same scalar.
      val off = d.agg(max(col("doc_id"))).head().getLong(0) + 1L
      val updates = d
        .filter(col("doc_id") % 7 === 0 && col("lang") === "en")
        .withColumn("n_chars", col("n_chars") + lit(5000L))
        .unionByName(d.filter(col("doc_id") % 13 === 0)
          .withColumn("doc_id", col("doc_id") + lit(off))
          .withColumn("lang", lit("xx"))
          .withColumn("source", lit("merge"))
          .withColumn("n_chars", col("doc_id") % 997))
      val st = graft.io.Merge.mergeInto(s, root, updates,
        keyCols = Seq("doc_id"), partCol = "lang")
      val after = fileSet()
      val touched = st.touchedPartitions.map("lang=" + _).toSet
      for ((part, files) <- before if !touched.contains(part))
        require(after.get(part).contains(files),
          s"merge disturbed untouched partition $part")
      s.read.parquet(root)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    })
  )

  val oracles: Map[String, String] = Map(
    "io01_streamload_roundtrip" ->
      """SELECT CAST(n_nationkey AS INT) AS n_nationkey, n_name,
        |       CAST(n_regionkey AS INT) AS n_regionkey
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    // the same min/max normalization and magic-number Morton spread,
    // step by step, in DuckDB (identical double arithmetic, so the
    // z-values compare bit-for-bit)
    "io02_zorder_layout" -> """
      WITH st AS (
        SELECT CAST(min(l_partkey) AS DOUBLE) AS alo,
               greatest(CAST(max(l_partkey) AS DOUBLE)
                        - CAST(min(l_partkey) AS DOUBLE), 1e-12) AS aspan,
               CAST(min(l_suppkey) AS DOUBLE) AS blo,
               greatest(CAST(max(l_suppkey) AS DOUBLE)
                        - CAST(min(l_suppkey) AS DOUBLE), 1e-12) AS bspan
        FROM lineitem),
      src AS (
        SELECT l_orderkey, l_linenumber,
               CAST(least(floor((CAST(l_partkey AS DOUBLE) - st.alo)
                 / st.aspan * 65536.0), 65535.0) AS BIGINT) AS a,
               CAST(least(floor((CAST(l_suppkey AS DOUBLE) - st.blo)
                 / st.bspan * 65536.0), 65535.0) AS BIGINT) AS b
        FROM lineitem, st WHERE l_orderkey <= 300),
      s1 AS (SELECT l_orderkey, l_linenumber,
               (a | (a << 16)) & 281470681808895 AS a1,
               (b | (b << 16)) & 281470681808895 AS b1 FROM src),
      s2 AS (SELECT l_orderkey, l_linenumber,
               (a1 | (a1 << 8)) & 71777214294589695 AS a2,
               (b1 | (b1 << 8)) & 71777214294589695 AS b2 FROM s1),
      s3 AS (SELECT l_orderkey, l_linenumber,
               (a2 | (a2 << 4)) & 1085102592571150095 AS a3,
               (b2 | (b2 << 4)) & 1085102592571150095 AS b3 FROM s2),
      s4 AS (SELECT l_orderkey, l_linenumber,
               (a3 | (a3 << 2)) & 3689348814741910323 AS a4,
               (b3 | (b3 << 2)) & 3689348814741910323 AS b4 FROM s3),
      s5 AS (SELECT l_orderkey, l_linenumber,
               (a4 | (a4 << 1)) & 6148914691236517205 AS a5,
               (b4 | (b4 << 1)) & 6148914691236517205 AS b5 FROM s4)
      SELECT l_orderkey, l_linenumber, a5 | (b5 << 1) AS zv
      FROM s5 ORDER BY l_orderkey, l_linenumber""",

    // reads the Spark-landed .json files with DuckDB's own ndjson
    // reader (types pinned — DuckDB SUM(BIGINT) widens to HUGEINT, so
    // every SUM is cast back to the sanctioned BIGINT)
    "io03_jsonl_roundtrip" -> s"""
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(length(text)) AS BIGINT) AS sum_text_len,
             MIN(md5(text)) AS min_md5,
             MAX(md5(text)) AS max_md5,
             MIN(doc_id) AS min_id,
             MAX(doc_id) AS max_id
      FROM read_json('${graft.Land.root}/io/jsonl_docs/*.json',
             format = 'newline_delimited',
             columns = {doc_id: 'BIGINT', text: 'VARCHAR', lang: 'VARCHAR',
                        source: 'VARCHAR', n_chars: 'BIGINT'})
      GROUP BY source ORDER BY source""",

    "io04_partitioned_layout" -> """
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             MIN(doc_id) AS min_id,
             MAX(doc_id) AS max_id
      FROM documents
      WHERE lang = 'en'
      GROUP BY source ORDER BY source""",

    "io05_schema_evolution" -> s"""
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars,
             MIN(doc_id) AS min_id
      FROM read_parquet(
             ['${graft.Land.root}/io/evolve/batch_a/*.parquet',
              '${graft.Land.root}/io/evolve/batch_b/*.parquet'],
             union_by_name = true)
      GROUP BY 1, 2 ORDER BY 1, 2""",

    "io06_compaction" -> s"""
      SELECT
        (SELECT CAST(COUNT(DISTINCT filename) AS BIGINT)
         FROM read_parquet('${graft.Land.root}/io/compact/small/*.parquet',
                           filename = true)) AS n_files_small,
        (SELECT CAST(COUNT(*) AS BIGINT)
         FROM read_parquet('${graft.Land.root}/io/compact/small/*.parquet'))
          AS n_rows_small,
        (SELECT CAST(COUNT(DISTINCT filename) AS BIGINT)
         FROM read_parquet('${graft.Land.root}/io/compact/compacted/*.parquet',
                           filename = true)) AS n_files_compacted,
        (SELECT CAST(COUNT(*) AS BIGINT)
         FROM read_parquet('${graft.Land.root}/io/compact/compacted/*.parquet'))
          AS n_rows_compacted,
        (SELECT CAST(SUM(n_chars) AS BIGINT)
         FROM read_parquet('${graft.Land.root}/io/compact/compacted/*.parquet'))
          AS sum_chars""",

    // same landed files, same per-file envelope/rank/disjointness law
    "io07_range_layout" -> s"""
      WITH per AS (
        SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               MIN(l_shipdate) AS key_min, MAX(l_shipdate) AS key_max
        FROM read_parquet('${graft.Land.root}/io/range/*.parquet',
                          filename = true)
        GROUP BY 1)
      SELECT CAST(row_number() OVER (ORDER BY key_min, fname) AS BIGINT) AS file_rank,
             n_rows, key_min, key_max,
             coalesce(lag(key_max) OVER (ORDER BY key_min, fname) < key_min, TRUE)
               AS range_ok
      FROM per ORDER BY file_rank""",

    // DuckDB re-reads the final landed tree hive-partitioned: matching
    // hashes prove both engines see the post-overwrite state (in-query
    // guards prove that state IS "original others + rewritten en")
    "io09_dynamic_overwrite" -> s"""
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             MIN(doc_id) AS min_id
      FROM read_parquet('${graft.Land.root}/io/dynover/*/*.parquet',
                        hive_partitioning = true)
      GROUP BY lang ORDER BY lang""",

    // the SAME aggregate from the original parquet — equality proves the
    // ORC write+read preserved every value
    "io08_orc_roundtrip" -> """
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             MIN(l_orderkey) AS min_key,
             MAX(l_orderkey) AS max_key,
             MIN(l_shipdate) AS first_ship,
             MAX(l_shipdate) AS last_ship
      FROM lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag""",

    // Replays the join over the LANDED bucketed files (the bucket layout
    // is transparent parquet) — row loss, duplication, or key corruption
    // in the bucketed land path breaks the compare
    "io10_bucketed_join" -> s"""
      SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price,
             CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_custs
      FROM read_parquet('${graft.Land.root}/io/bucketed/cust/*.parquet') c
      JOIN read_parquet('${graft.Land.root}/io/bucketed/ord/*.parquet') o
        ON c.c_custkey = o.o_custkey
      GROUP BY 1 ORDER BY 1""",

    // DuckDB parses the SAME landed CSV files (RFC quoting, \N nulls,
    // embedded newlines) — both engines must read identical values
    "io11_csv_roundtrip" -> s"""
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(length(tricky)) AS BIGINT) AS sum_tricky_chars,
             CAST(SUM(CASE WHEN tricky LIKE '%' || chr(10) || '%'
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_embedded_nl,
             CAST(SUM(CASE WHEN maybe_null IS NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT maybe_null) AS BIGINT) AS n_statuses,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price,
             MIN(o_orderdate) AS first_date,
             MAX(o_orderdate) AS last_date
      FROM read_csv('${graft.Land.root}/io/csv/*.csv', header = true,
                    quote = '"', escape = '"', nullstr = '\\N',
                    columns = {'o_orderkey': 'BIGINT', 'tricky': 'VARCHAR',
                               'maybe_null': 'VARCHAR',
                               'o_totalprice': 'DOUBLE',
                               'o_orderdate': 'DATE'})""",

    // values re-derived from the FLAT source columns the struct was
    // built from — the landed nesting must be value-preserving
    "io12_nested_pruning" -> """
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY lang ORDER BY lang""",

    // the merge restated from the ORIGINAL parquet as update ∪ anti-join
    // — equality with the engine's read-back of the merged table proves
    // upsert semantics row for row
    "io13_merge_upsert" -> """
      WITH off AS (SELECT max(doc_id) + 1 AS o FROM documents),
      upd AS (
        SELECT doc_id, 'en' AS lang, n_chars + 5000 AS n_chars
        FROM documents WHERE doc_id % 7 = 0 AND lang = 'en'
        UNION ALL
        SELECT doc_id + off.o, 'xx', (doc_id + off.o) % 997
        FROM documents, off WHERE doc_id % 13 = 0),
      merged AS (
        SELECT doc_id, lang, n_chars FROM upd
        UNION ALL
        SELECT d.doc_id, d.lang, d.n_chars FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.doc_id = d.doc_id))
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      FROM merged GROUP BY lang ORDER BY lang"""
  )
}
