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
  * @param strategy      which concrete tokenization to run — "word"
  *                      (UnicodeWordTokenizer) or "chargram"
  *                      (CharNgramTokenizer); the config-selected strategy
  *                      is the engine analog of the reference's
  *                      interchangeable tokenization classes behind one
  *                      config surface (REMI/TSD/MIDILike/..., registry in
  *                      miditok/__init__.py)
  * @param ngram         character n-gram width for the chargram strategy
  */
final case class TokenizerConfig(
    lowercase: Boolean = true,
    minTermLen: Int = 1,
    stripPunct: Boolean = true,
    langs: Set[String] = Set.empty,
    strategy: String = "word",
    ngram: Int = 3
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

  /** Number of terms `terms(text)` would emit, REQUIRED to equal
    * `terms(text).length` (TokenizerSpec pins it across the config grid).
    * Strategies override it with allocation-free scans — the docstats
    * stage runs this over the whole corpus, and at 100 TB the difference
    * between counting runs and materializing every token string is a
    * memory-bandwidth-bound stage's whole budget. */
  def termCount(text: String): Int = terms(text).length
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

  /** Allocation-free run counter — the same code-point scan as [[terms]]
    * (including the case fold, whose Unicode edge cases can MOVE token
    * boundaries, e.g. U+0130 → i + combining dot) minus every substring
    * and builder allocation. */
  override def termCount(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val base = if (config.lowercase) text.toLowerCase(java.util.Locale.ROOT) else text
    val minLen = math.max(1, config.minTermLen)
    val n = base.length
    var count = 0
    var i = 0
    var start = -1
    while (i < n) {
      val cp = base.codePointAt(i)
      val w = Character.charCount(cp)
      if (isTokenCp(cp)) { if (start < 0) start = i }
      else if (start >= 0) {
        if (i - start >= minLen) count += 1
        start = -1
      }
      i += w
    }
    if (start >= 0 && n - start >= minLen) count += 1
    count
  }
}

/** Character n-gram (subword) tokenizer: each word (per the word strategy
  * under the same config) emits its sliding character n-grams — words
  * shorter than n are emitted whole. The second concrete strategy of the
  * §2.11 family: the SAME index build, WAND, phrase, decode, and trainer
  * machinery runs unchanged on a subword vocabulary (the reference's
  * interchangeable-strategy property, nine tokenizations behind one
  * tokenizer surface).
  *
  * Positions number the emitted n-gram stream 1..k (not the source words),
  * keeping the positional-index invariants (strictly increasing, 1-based,
  * docLen = stream length) intact. N-grams slice UTF-16 units; the oracle's
  * `substr` counts characters — identical on BMP text (the fixtures are),
  * documented caveat for astral code points. */
final class CharNgramTokenizer(val config: TokenizerConfig)
    extends TokenizerStrategy {
  private val word = new UnicodeWordTokenizer(config)
  private val n = math.max(1, config.ngram)

  override def terms(text: String): Array[String] = {
    val ws = word.terms(text)
    val out = Array.newBuilder[String]
    var i = 0
    while (i < ws.length) {
      val w = ws(i)
      if (w.length < n) out += w
      else {
        var j = 0
        while (j + n <= w.length) { out += w.substring(j, j + n); j += 1 }
      }
      i += 1
    }
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

  /** Config-dispatched strategy selection (the reference's registry of
    * interchangeable tokenizations behind one config surface). */
  def apply(cfg: TokenizerConfig): TokenizerStrategy = cfg.strategy match {
    case "word"     => new UnicodeWordTokenizer(cfg)
    case "chargram" => new CharNgramTokenizer(cfg)
    case other      => throw new IllegalArgumentException(
      s"unknown tokenizer strategy '$other' (expected word|chargram)")
  }
}
