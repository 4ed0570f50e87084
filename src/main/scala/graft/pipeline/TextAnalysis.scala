package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID (stopword heuristic), quality scoring, token counting,
  * document fingerprinting. All pure `functions._` column expressions
  * (whole-stage codegen; no UDFs) over a `text` column, so they run at
  * scan speed on a 100 TB corpus. */
object TextAnalysis {

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deterministic fixed literals (SQL-replicable). */
  val stoplists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu", "in"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "de"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "de")
  )

  private def toks(text: Column): Column = split(lower(text), " ")

  /** Count of tokens present in a fixed list (duplicates counted). */
  private def stopCount(tokens: Column, list: Seq[String]): Column =
    size(filter(tokens, t => array_contains(lit(list.toArray), t)))

  /** Language-ID: argmax over per-lang stopword hit counts, tie → lexical
    * smallest lang, no hits → "und" (undetermined). */
  def langId(text: Column): Column = {
    val tokens = toks(text)
    // build (score, lang) structs, pick max by (score, reversed lang)
    val scored = array(stoplists.map { case (lang, list) =>
      struct(stopCount(tokens, list).as("score"), lit(lang).as("lang"))
    }: _*)
    // array_max on structs orders lexicographically by fields: max score,
    // then max lang — we want min lang on ties, so compare with negated rank
    val best = aggregate(
      scored,
      struct(lit(-1).as("score"), lit("zz").as("lang")),
      (acc, x) =>
        when(x.getField("score") > acc.getField("score") ||
          (x.getField("score") === acc.getField("score") &&
            x.getField("lang") < acc.getField("lang")), x).otherwise(acc)
    )
    when(best.getField("score") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Quality features: token count, char count, mean token length,
    * stopword ratio (en), distinct-token ratio — rounded to 6 for
    * cross-engine float stability. */
  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    val tokens = toks(text)
    df.withColumn("n_tokens", size(tokens))
      .withColumn("n_chars", length(text))
      .withColumn("mean_tok_len",
        round((length(text) - size(tokens) + 1).cast("double") / size(tokens), 6))
      .withColumn("stopword_ratio",
        round(stopCount(tokens, stoplists.head._2).cast("double") / size(tokens), 6))
      .withColumn("distinct_ratio",
        round(size(array_distinct(tokens)).cast("double") / size(tokens), 6))
  }

  /** Token counting two ways: whitespace split and BPE-ish alnum-run regex. */
  def tokenCounts(df: DataFrame, text: Column): DataFrame =
    df.withColumn("ws_tokens", size(split(text, " ")))
      .withColumn("alnum_runs",
        size(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)))

  /** Document fingerprint: the native rolling-hash expression. */
  def fingerprint(text: Column): Column =
    org.apache.spark.sql.GraftExpressionBridge.column(
      graft.functions.RollingHash(
        org.apache.spark.sql.GraftExpressionBridge.expression(text)))
}
