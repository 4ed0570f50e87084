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

  // Token chars: Unicode letters/digits when stripPunct (≡ splitting on
  // [^\p{L}\p{N}]+ runs); anything non-whitespace otherwise (≡ \s+ split).
  // Hand-rolled code-point scanner instead of a regex: this runs inside the
  // hot flatMap on every corpus pass, and the regex engine plus split-array
  // churn dominated tokenize profiles.
  @inline private def isTokenCp(cp: Int): Boolean =
    if (config.stripPunct) Character.isLetterOrDigit(cp)
    else !Character.isWhitespace(cp)

  override def terms(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val base = if (config.lowercase) text.toLowerCase(java.util.Locale.ROOT) else text
    val minLen = math.max(1, config.minTermLen)
    val out = Array.newBuilder[String]
    val n = base.length
    var i = 0
    var start = -1
    while (i < n) {
      val cp = base.codePointAt(i)
      val w = Character.charCount(cp)
      if (isTokenCp(cp)) { if (start < 0) start = i }
      else if (start >= 0) {
        if (i - start >= minLen) out += base.substring(start, i)
        start = -1
      }
      i += w
    }
    if (start >= 0 && n - start >= minLen) out += base.substring(start, n)
    out.result()
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
