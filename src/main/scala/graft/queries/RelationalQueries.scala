package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY.md §2 relational operator inventory over the TPC-H-ish tables.
  * Every query is deterministic (total ORDER BY, ties broken by keys) and
  * has a DuckDB oracle twin with identical column names and types.
  * Query keys carry the §2 operator ids they exercise. */
object RelationalQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** J1 `np_get_closest` (utils/utils.py:561-581): nearest-neighbor snap of a
    * value column to a small sorted broadcast grid via binary search —
    * never a shuffle join. Tie → smaller grid value. */
  private val grid: Array[Double] = Array(1.0, 5.0, 10.0, 25.0, 50.0)

  /** Nearest-grid snap as a pure codegen `when`-chain over the sorted grid's
    * midpoints: `v <= (g(i)+g(i+1))/2` snaps to `g(i)` (a midpoint tie has
    * equal distance to both neighbors and snaps to the SMALLER value, so the
    * boundary comparison is `<=`). Stays inside whole-stage codegen — no
    * ScalaUDF on the path (the last one, removed per round-2 verdict #7). */
  private def closestGrid(v: Column): Column =
    grid.init.zip(grid.tail).foldRight(lit(grid.last): Column) {
      case ((lo, hi), acc) => when(v <= lit((lo + hi) / 2.0), lit(lo)).otherwise(acc)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1+S3: projection + predicate pushdown to the parquet scan
    "q_s1_scan_prune" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("lang").isin("en", "de"))
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")),

    // F1: range predicate (pitch-range filter analog)
    "q_f1_filter_range" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity").between(10, 20) &&
          col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")),

    // F6+F7: column re-projection (grid snap via floor arithmetic)
    "q_f7_reproject" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          (floor(col("value") / 10) * 10).cast("double").as("value_bin"),
          floor(col("value")).cast("long").as("value_floor"))
        .orderBy("event_id")),

    // J1: as-of / nearest-neighbor join against a broadcast sorted grid
    "q_j1_closest_grid" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          closestGrid(col("l_quantity")).as("q_snap"))
        .orderBy("l_orderkey", "l_linenumber")),

    // J2: range join — event time matched to the containing section
    "q_j2_range_join" -> ((s, d) => {
      import s.implicits._
      val sections = (0 until 10)
        .map(i => (i, java.sql.Timestamp.valueOf(f"2024-01-${3 * i + 1}%02d 00:00:00"),
          java.sql.Timestamp.valueOf(f"2024-01-${3 * i + 4}%02d 00:00:00")))
        .toDF("section_id", "lo", "hi")
      t(s, d, "events")
        .join(broadcast(sections), col("ts") >= col("lo") && col("ts") < col("hi"), "inner")
        .select(col("event_id"), col("section_id"))
        .orderBy("event_id")
    }),

    // J3: broadcast-hash dictionary lookup join (vocab[token])
    "q_j3_dict_join" -> ((s, d) => {
      import s.implicits._
      val tok = graft.tokenize.Tokenizers.default
      val tokens = graft.corpus.Pages.cleaned(graft.corpus.Pages.withInjections(s, d))
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .flatMap { case (id, tx) => tok.tokenize(tx).map { case (tm, p) => (id, p, tm) } }
        .toDF("doc_id", "pos", "term")
      val dict = IndexCache.handle(s, d).dictionary.toDF()
        .select(col("term"), col("termId").as("term_id"))
      tokens.join(broadcast(dict), Seq("term"), "inner")
        .select(col("doc_id"), col("pos"), col("term_id"))
        .orderBy("doc_id", "pos")
    }),

    // J3 anti flavor: OOV = tokens left-anti the dictionary head (top-10 df)
    "q_j3_anti_oov" -> ((s, d) => {
      import s.implicits._
      val tok = graft.tokenize.Tokenizers.default
      val tokens = graft.corpus.Pages.cleaned(graft.corpus.Pages.withInjections(s, d))
        .select(col("text")).as[String]
        .flatMap(tx => tok.terms(tx))
        .toDF("term")
      val head = IndexCache.handle(s, d).dictionary.toDF()
        .filter(col("termId") < 10).select("term")
      tokens.join(broadcast(head), Seq("term"), "left_anti")
        .distinct()
        .orderBy("term")
    }),

    // J4: merge collections sharing a key (group → sort → concat)
    "q_j4_group_merge" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(array_join(array_sort(collect_list(col("doc_id"))), ",").as("doc_ids"),
          count(lit(1)).as("n"))
        .orderBy("lang")),

    // A4: keep latest row per group (url-dedup shape: max warc_ts)
    "q_a4_latest_per_key" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .orderBy("o_custkey")
    }),

    // A5: duplicate removal (distinct on a projection)
    "q_a5_distinct_pairs" -> ((s, d) =>
      t(s, d, "events").select("user_id", "event_type").distinct()
        .orderBy("user_id", "event_type")),

    // A10: exact distinct counts (BM25 df must be exact — no approx)
    "q_a10_count_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // A9-extra: rollup. Sums emitted as round(..., 2) DOUBLE — a decimal
    // output column stringifies differently in the driver's hasher than in
    // DuckDB (r1 lesson: q_a9_rollup was the one hash-red row).
    "q_a9_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity").cast("double")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("sum_qty"), col("n"))
        .orderBy("rf", "ls")),

    // W1: lag delta over an ordered partition (pitch-interval analog)
    "q_w1_lag_delta" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"), (col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .orderBy("event_id")
    }),

    // W2+W3: change detection — flag rows whose event_type differs from prev
    "q_w3_change_flags" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"),
          (lag(col("event_type"), 1).over(w).isNull ||
            lag(col("event_type"), 1).over(w) =!= col("event_type")).as("changed"))
        .orderBy("event_id")
    }),

    // W4: running max over preceding rows (previous-note-end analog)
    "q_w4_running_max" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, d, "events")
        .select(col("event_id"), max(col("value")).over(w).as("prev_max"))
        .orderBy("event_id")
    }),

    // W5: bar/position assignment — row_number → fixed-size block id
    "q_w5_block_assign" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"), row_number().over(w).as("rn"))
        .withColumn("block", ((col("rn") - 1) / 5).cast("long"))
        .orderBy("event_id")
    }),

    // W6+W7: range-frame window — events within the next 60s per user
    "q_w6_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(0, 60000000L)
      t(s, d, "events")
        .withColumn("us", unix_micros(col("ts").cast("timestamp")))
        .select(col("event_id"), count(lit(1)).over(w).as("n_next_minute"))
        .orderBy("event_id")
    }),

    // W8: ntile binning (repetition-similarity bins analog). Two-phase
    // range-partitioned binning — a bare Window.orderBy ntile would move
    // every row through ONE partition (the r1 verdict's scale flag).
    "q_w8_ntile" -> ((s, d) => {
      val sums = t(s, d, "events").groupBy("user_id")
        .agg(round(sum(col("value")), 6).as("total"))
      graft.plans.GlobalRank
        .ntileBins(sums, Seq(col("total").desc, col("user_id")), 4, "bin")
        .select(col("user_id"), col("bin"))
        .orderBy("user_id")
    }),

    // O2: deterministic multi-key sort + limit
    "q_o2_multisort_limit" -> ((s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .limit(50)),

    // O5: top-k per group with deterministic tie-break
    "q_o5_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"))
        .orderBy("o_custkey", "rk")
    }),

    // O6: argmax per group (max_by with explicit tie-break)
    "q_o6_argmax" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").desc, col("l_linenumber").desc)
      t(s, d, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
        .orderBy("l_returnflag")
    }),

    // U1: union-all of two filtered projections (merge_scores analog)
    "q_u1_union_all" -> ((s, d) => {
      val e = t(s, d, "events")
      e.filter(col("event_type") === "error").select(col("event_id"), lit("e").as("src"))
        .unionByName(
          e.filter(col("event_type") === "purchase").select(col("event_id"), lit("p").as("src")))
        .orderBy("event_id", "src")
    }),

    // U2: dedup-union (special-token vocab merge analog)
    "q_u2_union_distinct" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents").select(col("lang"))
        .union(Seq("xx", "en").toDF("lang"))
        .distinct()
        .orderBy("lang")
    }),

    // U3: except (set difference)
    "q_u3_except" -> ((s, d) => {
      val docs = t(s, d, "documents")
      docs.select("doc_id")
        .except(docs.filter(col("lang") === "en").select("doc_id"))
        .orderBy("doc_id")
    }),

    // X1-X3: string scalar functions (token format/parse analogs)
    "q_x_string" -> ((s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          concat_ws("_", col("p_brand"), col("p_type")).as("brand_type"),
          split(col("p_name"), " ").getItem(0).as("first_word"),
          upper(col("p_name")).as("upper_name"),
          substring(col("p_name"), 1, 3).as("prefix3"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("int").as("brand_num"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey")),

    // X4+X9: math scalar functions
    "q_x_math" -> ((s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          round(log2(col("p_size").cast("double")), 6).as("log2_size"),
          round(sqrt(col("p_retailprice")), 6).as("sqrt_price"),
          round(pow(col("p_size").cast("double"), 2.0), 6).as("size_sq"),
          round(lit(60000000.0) / col("p_retailprice"), 6).as("inv_scaled"))
        .orderBy("p_partkey")),

    // X10: date/timestamp functions (warc_ts handling)
    "q_x_datetime" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          (weekday(col("o_orderdate")) + 1).as("isodow"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since"))
        .orderBy("o_orderkey")),

    // X11: array ops (slice/size/join — TokSequence slicing analog)
    "q_x_array" -> ((s, d) =>
      t(s, d, "documents")
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).as("n_tokens"),
          array_join(slice(split(col("text"), " "), 1, 3), " ").as("first3"),
          element_at(split(col("text"), " "), -1).as("last_token"))
        .orderBy("doc_id")),

    // X12+X13: JSON map access (props parsing)
    "q_x_json" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")),

    // X6: greedy decomposition generator (one-to-many flatMap, the
    // time-ticks-to-tokens analog, midi_tokenizer.py:2531-2569)
    "q_x6_greedy_decompose" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity").cast("int").as("q"))
        .as[(Long, Int, Int)]
        .flatMap { case (ok, ln, q0) =>
          val denoms = Array(25, 10, 5, 1)
          var q = q0
          denoms.iterator.flatMap { dn =>
            val c = q / dn
            q = q % dn
            if (c > 0) Iterator.single((ok, ln, dn, c)) else Iterator.empty
          }
        }
        .toDF("l_orderkey", "l_linenumber", "denom", "cnt")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("denom").desc)
    }),

    // Gap-based sessionization (30-min gap): the batch window-function form
    // of the streaming flatMapGroupsWithState operator (see EventStreams)
    "q_sessionize" -> ((s, d) =>
      graft.streaming.EventStreams.sessionize(t(s, d, "events"), 30)
        .orderBy("event_id")),

    // Streaming-shaped batch query: tumbling 1h window agg (the Structured
    // Streaming pipeline computes the identical result; see StreamingSpec)
    "q_stream_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))
        .orderBy("window_start", "event_type"))
  )

  val oracles: Map[String, String] = Map(
    "q_s1_scan_prune" ->
      "SELECT doc_id, lang, n_chars FROM documents WHERE lang IN ('en','de') ORDER BY doc_id",
    "q_f1_filter_range" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem " +
        "WHERE l_quantity BETWEEN 10 AND 20 AND l_shipdate < TIMESTAMP '1998-01-01' " +
        "ORDER BY l_orderkey, l_linenumber"),
    "q_f7_reproject" ->
      ("SELECT event_id, floor(value / 10) * 10 AS value_bin, " +
        "CAST(floor(value) AS BIGINT) AS value_floor FROM events ORDER BY event_id"),
    "q_j1_closest_grid" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "(SELECT CAST(g AS DOUBLE) FROM (VALUES (1.0),(5.0),(10.0),(25.0),(50.0)) t(g) " +
        " ORDER BY abs(g - l_quantity), g LIMIT 1) AS q_snap " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber"),
    "q_j2_range_join" -> {
      val vals = (0 until 10)
        .map(i => f"($i, TIMESTAMP '2024-01-${3 * i + 1}%02d 00:00:00', TIMESTAMP '2024-01-${3 * i + 4}%02d 00:00:00')")
        .mkString(", ")
      s"""WITH sections(section_id, lo, hi) AS (VALUES $vals)
         |SELECT e.event_id, s.section_id FROM events e
         |JOIN sections s ON e.ts >= s.lo AND e.ts < s.hi
         |ORDER BY e.event_id""".stripMargin
    },
    "q_j3_dict_join" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0
        |),
        |tok AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS term,
        |         unnest(generate_series(1, len(string_split(lower(text), ' ')))) AS pos
        |  FROM corpus
        |),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |dict AS (SELECT term, CAST(row_number() OVER (ORDER BY df DESC, term) - 1 AS INTEGER) AS term_id FROM dft)
        |SELECT t.doc_id, CAST(t.pos AS INTEGER) AS pos, d.term_id
        |FROM tok t JOIN dict d ON d.term = t.term
        |ORDER BY t.doc_id, t.pos""".stripMargin,
    "q_j3_anti_oov" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0
        |),
        |tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM corpus),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |dict AS (SELECT term, row_number() OVER (ORDER BY df DESC, term) - 1 AS term_id FROM dft),
        |head AS (SELECT term FROM dict WHERE term_id < 10)
        |SELECT DISTINCT term FROM tok WHERE term NOT IN (SELECT term FROM head)
        |ORDER BY term""".stripMargin,
    "q_j4_group_merge" ->
      ("SELECT lang, string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids, count(*) AS n " +
        "FROM documents GROUP BY lang ORDER BY lang"),
    "q_a4_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q_a5_distinct_pairs" ->
      "SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type",
    "q_a10_count_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, " +
        "count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_a9_rollup" ->
      ("SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls, " +
        "round(sum(CAST(l_quantity AS DOUBLE)), 2) AS sum_qty, count(*) AS n " +
        "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus) ORDER BY rf, ls"),
    "q_w1_lag_delta" ->
      ("SELECT event_id, value - lag(value, 1) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS delta FROM events ORDER BY event_id"),
    "q_w3_change_flags" ->
      ("SELECT event_id, (lag(event_type, 1) OVER w IS NULL OR " +
        "lag(event_type, 1) OVER w <> event_type) AS changed FROM events " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) ORDER BY event_id"),
    "q_w4_running_max" ->
      ("SELECT event_id, max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max " +
        "FROM events ORDER BY event_id"),
    "q_w5_block_assign" ->
      ("SELECT event_id, CAST(rn AS INTEGER) AS rn, CAST((rn - 1) // 5 AS BIGINT) AS block FROM (" +
        "SELECT event_id, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn " +
        "FROM events) ORDER BY event_id"),
    "q_w6_range_frame" ->
      ("SELECT event_id, count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) " +
        "RANGE BETWEEN CURRENT ROW AND 60000000 FOLLOWING) AS n_next_minute " +
        "FROM events ORDER BY event_id"),
    "q_w8_ntile" ->
      ("SELECT user_id, CAST(ntile(4) OVER (ORDER BY total DESC, user_id) AS INTEGER) AS bin FROM (" +
        "SELECT user_id, round(sum(value), 6) AS total FROM events GROUP BY user_id) " +
        "ORDER BY user_id"),
    "q_o2_multisort_limit" ->
      ("SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 50"),
    "q_o5_topk_per_group" ->
      """SELECT o_custkey, CAST(rk AS INTEGER) AS rk, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey, row_number() OVER (PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_o6_argmax" ->
      """SELECT l_returnflag, l_orderkey, l_extendedprice FROM (
        |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
        |         ORDER BY l_extendedprice DESC, l_orderkey DESC, l_linenumber DESC) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "q_u1_union_all" ->
      ("SELECT event_id, 'e' AS src FROM events WHERE event_type = 'error' " +
        "UNION ALL SELECT event_id, 'p' AS src FROM events WHERE event_type = 'purchase' " +
        "ORDER BY event_id, src"),
    "q_u2_union_distinct" ->
      ("SELECT DISTINCT lang FROM (SELECT lang FROM documents " +
        "UNION ALL SELECT * FROM (VALUES ('xx'), ('en')) t(lang)) ORDER BY lang"),
    "q_u3_except" ->
      ("SELECT doc_id FROM documents EXCEPT " +
        "SELECT doc_id FROM documents WHERE lang = 'en' ORDER BY doc_id"),
    "q_x_string" ->
      ("SELECT p_partkey, p_brand || '_' || p_type AS brand_type, " +
        "string_split(p_name, ' ')[1] AS first_word, upper(p_name) AS upper_name, " +
        "substr(p_name, 1, 3) AS prefix3, " +
        "CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS INTEGER) AS brand_num, " +
        "CAST(length(p_name) AS INTEGER) AS name_len " +
        "FROM part ORDER BY p_partkey"),
    "q_x_math" ->
      ("SELECT p_partkey, round(log2(CAST(p_size AS DOUBLE)), 6) AS log2_size, " +
        "round(sqrt(p_retailprice), 6) AS sqrt_price, " +
        "round(pow(CAST(p_size AS DOUBLE), 2.0), 6) AS size_sq, " +
        "round(60000000.0 / p_retailprice, 6) AS inv_scaled " +
        "FROM part ORDER BY p_partkey"),
    "q_x_datetime" ->
      ("SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS y, " +
        "CAST(month(o_orderdate) AS INTEGER) AS m, " +
        "CAST(isodow(o_orderdate) AS INTEGER) AS isodow, " +
        "date_trunc('month', o_orderdate) AS month_start, " +
        "CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since " +
        "FROM orders ORDER BY o_orderkey"),
    "q_x_array" ->
      ("SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens, " +
        "array_to_string(string_split(text, ' ')[1:3], ' ') AS first3, " +
        "string_split(text, ' ')[-1] AS last_token " +
        "FROM documents WHERE text IS NOT NULL AND length(text) > 0 ORDER BY doc_id"),
    "q_x_json" ->
      ("SELECT event_id, CAST(props->>'k' AS INTEGER) AS k FROM events ORDER BY event_id"),
    "q_x6_greedy_decompose" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INTEGER) AS q FROM lineitem
        |),
        |parts AS (
        |  SELECT l_orderkey, l_linenumber, 25 AS denom, q // 25 AS cnt FROM base
        |  UNION ALL SELECT l_orderkey, l_linenumber, 10, (q % 25) // 10 FROM base
        |  UNION ALL SELECT l_orderkey, l_linenumber, 5, ((q % 25) % 10) // 5 FROM base
        |  UNION ALL SELECT l_orderkey, l_linenumber, 1, ((q % 25) % 10) % 5 FROM base
        |)
        |SELECT l_orderkey, l_linenumber, CAST(denom AS INTEGER) AS denom, CAST(cnt AS INTEGER) AS cnt
        |FROM parts WHERE cnt > 0
        |ORDER BY l_orderkey, l_linenumber, denom DESC""".stripMargin,
    "q_sessionize" ->
      """SELECT event_id, user_id, CAST(session_id AS BIGINT) AS session_id FROM (
        |  SELECT event_id, user_id,
        |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |           CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
        |                  OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 1800000000
        |                THEN 1 ELSE 0 END AS new_session
        |    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |) ORDER BY event_id""".stripMargin,
    "q_stream_window" ->
      ("SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n, " +
        "round(sum(value), 4) AS total FROM events GROUP BY 1, 2 ORDER BY 1, 2")
  )
}
