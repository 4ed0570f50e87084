package graft.tokenize

/** Tokenization configuration — the engine analog of MidiTok's
  * `TokenizerConfig` (reference: classes.py:334-994, ~45-field config that
  * governs which token types exist). Ours governs the text→term stream.
  *
  * The config grid in tests mirrors the reference's combinatorial
  * flag grid (tests/test_tokenize.py:102-145).
  *
  * @param lowercase     case folding (analog of pitch normalization F6)
  * @param minTermLen    drop terms shorter than this (analog of pitch-range
  *                      filter F1, midi_tokenizer.py:676-694)
  * @param stripPunct    keep only letter/digit runs (analog of the
  *                      unsupported-time-signature filter F4)
  * @param langs         language allowlist; empty = all (analog of the
  *                      program/track filter F2, midi_tokenizer.py:544-553)
  */
final case class TokenizerConfig(
    lowercase: Boolean = true,
    minTermLen: Int = 1,
    stripPunct: Boolean = true,
    langs: Set[String] = Set.empty
) extends Serializable

/** Pluggable tokenization strategy — the engine analog of MidiTok's
  * `_add_time_events` strategy hook (midi_tokenizer.py:1593-1607) with nine
  * concrete tokenizations; here one text strategy suffices (SURVEY.md §2.11).
  * Implementations MUST be deterministic pure functions of (config, text).
  */
trait TokenizerStrategy extends Serializable {
  def config: TokenizerConfig

  /** text → positional term stream (term, 1-based position). */
  def tokenize(text: String): Array[(String, Int)]

  /** text → just the terms, in order. */
  def terms(text: String): Array[String]
}

/** Unicode word tokenizer: splits on non-letter/digit runs, optional case
  * fold, min-length filter. The "REMI" of this engine — the one concrete
  * strategy (reference: remi.py:188-335 as the canonical strategy impl).
  *
  * Semantics are deliberately SQL-replicable so the DuckDB oracle can
  * reproduce them: on whitespace-separated lowercase corpora this equals
  * `string_split(text, ' ')`.
  */
final class UnicodeWordTokenizer(val config: TokenizerConfig)
    extends TokenizerStrategy {

  // Split on runs of anything that is not a Unicode letter or digit when
  // stripPunct; otherwise split on whitespace only.
  @transient private lazy val splitRe =
    if (config.stripPunct) "[^\\p{L}\\p{N}]+".r else "\\s+".r

  override def terms(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val base = if (config.lowercase) text.toLowerCase(java.util.Locale.ROOT) else text
    splitRe
      .split(base)
      .iterator
      .filter(t => t.length >= math.max(1, config.minTermLen))
      .toArray
  }

  override def tokenize(text: String): Array[(String, Int)] = {
    val ts = terms(text)
    val out = new Array[(String, Int)](ts.length)
    var i = 0
    while (i < ts.length) { out(i) = (ts(i), i + 1); i += 1 }
    out
  }
}

object Tokenizers {
  val default: TokenizerStrategy = new UnicodeWordTokenizer(TokenizerConfig())

  def apply(cfg: TokenizerConfig): TokenizerStrategy = new UnicodeWordTokenizer(cfg)
}
