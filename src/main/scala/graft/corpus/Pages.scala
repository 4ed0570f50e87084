package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Common-Crawl-style `pages` table (exact `input_hint` shape:
  * url, warc_ts, html, text, lang) derived DETERMINISTICALLY from the
  * driver-generated `documents.parquet` — no external data, mirroring the
  * reference's fixed fixture corpus strategy (tests/MIDIs_one_track/ +
  * the corrupted fixture tests/MIDIs_corrupted/ValueError_Control168.mid).
  *
  * Injections (all pure functions of doc_id so the DuckDB oracle can
  * replicate them in SQL):
  *  - stale duplicate url  (doc_id % 97 == 7):  same url, warc_ts - 5000 s,
  *    text prefixed "stale " → the url-dedup path must drop it
  *    (analog of tempo/TS dedup A4, midi_tokenizer.py:784-807);
  *  - corrupted row        (doc_id % 199 == 13): url suffixed "#c",
  *    NULL text → the corrupted-input skip path S2
  *    (analog of SCORE_LOADING_EXCEPTION handling, constants.py:12-19).
  *
  * `doc_id` is kept as a provenance column and reused as the engine docId:
  * it is already dense and stable. At 10^12-row scale the same role is
  * played by a 64-bit url fingerprint or an ingest-assigned id — never a
  * global row_number (single-partition window).
  */
object Pages {

  /** 2026-01-01T00:00:00Z, the warc_ts epoch. */
  val EpochSeconds: Long = 1767225600L

  /** Base pages (one row per document), no injections. */
  def base(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id"),
      concat(lit("https://example.org/42/"), col("doc_id")).as("url"),
      timestamp_seconds(lit(EpochSeconds) + col("doc_id")).as("warc_ts"),
      encode(coalesce(col("text"), lit("")), "UTF-8").as("html"),
      col("text"),
      col("lang")
    )
  }

  /** Full pages table with the deterministic dup/corrupt injections. */
  def withInjections(spark: SparkSession, sfDir: String): DataFrame = {
    val b = base(spark, sfDir)
    val stale = b
      .filter(col("doc_id") % 97 === 7)
      .withColumn("warc_ts", timestamp_seconds(unix_timestamp(col("warc_ts")) - 5000))
      .withColumn("text", concat(lit("stale "), col("text")))
    val corrupt = b
      .filter(col("doc_id") % 199 === 13)
      .withColumn("url", concat(col("url"), lit("#c")))
      .withColumn("text", lit(null).cast("string"))
    b.unionByName(stale).unionByName(corrupt)
  }

  /** Cleaning stage: url-dedup keeping max(warc_ts) per url, then drop
    * corrupted (null-text) rows, then optional lang allowlist.
    *
    * Dedup is a window `row_number` over (url, warc_ts desc) — at scale this
    * is one hash exchange on url; AQE handles stragglers. `max_by` would be
    * equivalent but row_number keeps a deterministic tie-break (warc_ts desc,
    * then text asc) so reruns are bit-identical.
    */
  def cleaned(pages: DataFrame, langs: Set[String] = Set.empty): DataFrame = {
    val w = Window.partitionBy(col("url")).orderBy(col("warc_ts").desc, col("text").asc_nulls_last)
    val dedup = pages
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .filter(col("text").isNotNull && length(col("text")) > 0)
    if (langs.isEmpty) dedup else dedup.filter(col("lang").isin(langs.toSeq: _*))
  }
}
