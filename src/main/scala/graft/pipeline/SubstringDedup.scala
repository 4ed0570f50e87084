package graft.pipeline

import graft.tokenize.Tokenizers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level deduplication: find every maximal token span that
  * is part of some `w`-token window occurring more than once in the corpus,
  * and optionally scrub those spans from the text (the "dedup the
  * SUBSTRINGS, not just the documents" training-data operator — document-
  * level dedup misses boilerplate shared by otherwise-distinct pages, which
  * at web scale is most of the duplication).
  *
  * Reference analog: MidiTok's chunking splits documents at content-defined
  * boundaries (`utils/split.py:243-360`) but has no cross-document
  * duplicate-content notion; this operator is part of the engine's
  * LLM-training-data extension family (with [[Dedup]] and [[Components]]).
  *
  * Pipeline shape, designed for the 10^12-doc scan:
  *
  *  1. `windowHashes`: ONE flatMap pass over the corpus emitting
  *     `(doc_id, start, h)` per `w`-token window, where `h` is a 64-bit
  *     Rabin-Karp rolling hash over per-token FNV-1a hashes — O(tokens)
  *     per document, no per-window string materialization, no shuffle.
  *  2. duplicate-hash detection: `groupBy(h).count`, KEEP count > 1. The
  *     partial (map-side) aggregate absorbs exactly the high-frequency
  *     boilerplate windows that make web corpora skewed; the shuffled
  *     rows are (h, partialCount) pairs, never window content. No
  *     collect_list of occurrences — a boilerplate window repeated 10^9
  *     times is ONE group row here, not a 10^9-element array.
  *  3. candidate restriction: windows ⋈ duplicate-hash set on `h` (inner
  *     hash join; the dup set has one row per hash, so a hot hash fans
  *     out only to its own occurrences).
  *  4. exact verification: candidates re-derive their window CONTENT by
  *     joining back to the token arrays (shuffle bounded by candidate
  *     count, i.e. true duplicates + vanishing 64-bit collisions) and a
  *     window count over `(h, content)` keeps only content occurring > 1
  *     time — hash collisions can therefore never corrupt the output,
  *     they only cost verify work.
  *  5. span assembly: per-document gaps-and-islands over duplicated
  *     window starts (windows at starts p, p' with p' ≤ p + w overlap or
  *     touch → one covered span) — a `Window.partitionBy(doc_id)` running
  *     sum, no global sort.
  *
  * All thresholds/semantics are mirrored by the DuckDB oracle SQL in
  * [[graft.queries.PipelineQueries]] (which verifies by window content
  * string — re-derivable independently of the engine's hash choice). */
object SubstringDedup {

  /** Default window width in tokens (the published substring-dedup
    * operating point for web-scale training data; driver queries use a
    * smaller `w` so the toy fixtures exercise span merging). */
  final val DefaultWindow = 50

  /** 64-bit FNV-1a over a token's UTF-16 units — the per-token seed of the
    * rolling window hash. Collisions are harmless (stage 4 verifies by
    * content); speed and determinism are what matter. */
  def tokenHash(term: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < term.length) {
      h ^= term.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Rolling window hashes of one document: `h(p) = Σ th(p+i)·B^(w-1-i)`
    * in Z/2^64 (Long overflow), updated in O(1) per position. */
  def docWindowHashes(terms: Array[String], w: Int): Array[Long] = {
    val n = terms.length
    if (n < w) return Array.empty
    val B = 0x100000001b3L
    // B^(w-1) mod 2^64
    var bPow = 1L
    var i = 0
    while (i < w - 1) { bPow *= B; i += 1 }
    val th = new Array[Long](n)
    i = 0
    while (i < n) { th(i) = tokenHash(terms(i)); i += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * B + th(i); i += 1 }
    out(0) = h
    var p = 1
    while (p + w <= n) {
      h = (h - th(p - 1) * bPow) * B + th(p + w - 1)
      out(p) = h
      p += 1
    }
    out
  }

  /** Corpus token arrays: `(doc_id, ts)` via the default word tokenizer
    * (one row per doc; the reusable input of stages 1 and 4). */
  def tokenArrays(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, Tokenizers.default.terms(text)) }
      .toDF("doc_id", "ts")
  }

  /** Stage 1: one window row per (doc, start), 1-based starts. */
  def windowHashes(tokenArrs: DataFrame, w: Int): DataFrame = {
    val spark = tokenArrs.sparkSession
    import spark.implicits._
    tokenArrs.as[(Long, Array[String])]
      .flatMap { case (id, ts) =>
        val hs = docWindowHashes(ts, w)
        Iterator.tabulate(hs.length)(p => (id, p + 1, hs(p)))
      }
      .toDF("doc_id", "start", "h")
  }

  /** Stages 2-4: duplicated windows `(doc_id, start)` — every window whose
    * exact `w`-token content occurs more than once in the corpus.
    *
    * Caching discipline (the "ONE pass" claim made real): `tokenArrs` feeds
    * the window pass AND the content re-join (and the caller's later
    * stages), and the window rows feed both the hash count and the
    * candidate join — callers ([[duplicatedSpans]], [[scrub]]) persist the
    * token arrays around the whole derivation, and the window pass is
    * eagerly checkpointed here, so the corpus is tokenized and
    * rolling-hashed exactly once per query instead of once per consumer. */
  def duplicatedWindows(tokenArrs: DataFrame, w: Int): DataFrame = {
    val wins = windowHashes(tokenArrs, w).localCheckpoint(true)
    val dupHashes = wins.groupBy("h").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1).select("h")
    val cand = wins.join(dupHashes, Seq("h"))
    val withContent = cand
      .join(tokenArrs, Seq("doc_id"))
      .withColumn("content", array_join(slice(col("ts"), col("start"), lit(w)), " "))
      .select("doc_id", "start", "h", "content")
    withContent
      .withColumn("n_exact", count(lit(1)).over(Window.partitionBy("h", "content")))
      .filter(col("n_exact") > 1)
      .select("doc_id", "start")
  }

  /** Stage 5: maximal merged spans of duplicated windows per document:
    * `(doc_id, span_start, span_end, span_len)`, token positions 1-based
    * inclusive. Two duplicated windows starting at p ≤ p' merge iff
    * p' ≤ p + w (their covered token ranges overlap or touch). */
  def duplicatedSpans(tokenArrs: DataFrame, w: Int): DataFrame = {
    val ta = tokenArrs.persist()
    try spansOf(ta, w).localCheckpoint(true) // eager: span rows only (small)
    finally { ta.unpersist(); () }
  }

  private def spansOf(tokenArrs: DataFrame, w: Int): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("start")
    duplicatedWindows(tokenArrs, w)
      .withColumn("pstart", lag("start", 1).over(byDoc))
      .withColumn("new_grp",
        when(col("pstart").isNull || col("start") > col("pstart") + w, 1).otherwise(0))
      .withColumn("grp", sum("new_grp")
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "grp")
      .agg(min("start").as("span_start"), (max("start") + w - 1).as("span_end"))
      .withColumn("span_len", col("span_end") - col("span_start") + 1)
      .select(col("doc_id"),
        col("span_start").cast("int").as("span_start"),
        col("span_end").cast("int").as("span_end"),
        col("span_len").cast("int").as("span_len"))
  }

  /** Scrub: remove every duplicated span from every document's token
    * stream (the "aggressive" removal mode — no canonical copy is kept;
    * pair it with document-level [[Dedup]] when one copy should survive).
    * One row per input doc: `(doc_id, kept_len, removed_len, clean_text)`
    * where `clean_text` re-joins the surviving tokens — the scrub operates
    * on the NORMALIZED token stream (the same stream the index ingests),
    * not the raw bytes.
    *
    * The token arrays are persisted around the whole derivation (they feed
    * the span derivation plus the keep-filter and length stages) and the
    * scrubbed output is eagerly checkpointed before they unpersist — one
    * tokenize pass total, at the cost of materializing the cleaned corpus
    * once in executor block storage (the caller's sink write was going to
    * materialize it anyway). */
  def scrub(tokenArrs: DataFrame, w: Int): DataFrame = {
    val ta = tokenArrs.persist()
    try scrubOf(ta, w).localCheckpoint(true)
    finally { ta.unpersist(); () }
  }

  private def scrubOf(tokenArrs: DataFrame, w: Int): DataFrame = {
    val spans = spansOf(tokenArrs, w).localCheckpoint(true) // small; reused per stage
    val toks = tokenArrs
      .select(col("doc_id"), posexplode(col("ts")).as(Seq("pos0", "term")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("term"))
    val kept = toks.join(spans,
      toks("doc_id") === spans("doc_id") &&
        col("pos") >= col("span_start") && col("pos") <= col("span_end"),
      "left_anti")
    val keptAgg = kept.groupBy("doc_id").agg(
      count(lit(1)).cast("int").as("kept_len"),
      array_join(
        expr("transform(array_sort(collect_list(struct(pos, term))), s -> s.term)"),
        " ").as("clean_text"))
    tokenArrs.select(col("doc_id"), size(col("ts")).as("doc_len"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("kept_len"), lit(0)).cast("int").as("kept_len"),
        (col("doc_len") - coalesce(col("kept_len"), lit(0))).cast("int").as("removed_len"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
