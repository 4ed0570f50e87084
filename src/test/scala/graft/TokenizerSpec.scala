package graft

import graft.tokenize.{TokenizerConfig, Tokenizers}
import org.scalatest.funsuite.AnyFunSuite

/** Config-grid tokenizer tests, mirroring the reference's combinatorial
  * flag grid (tests/test_tokenize.py:102-145) and the preprocessing
  * idempotence property (tests/test_preprocess.py:27-44). */
class TokenizerSpec extends AnyFunSuite {

  private val grid = for {
    lc <- Seq(true, false)
    ml <- Seq(1, 2)
    sp <- Seq(true, false)
  } yield TokenizerConfig(lowercase = lc, minTermLen = ml, stripPunct = sp)

  test("whitespace-only corpus: equals simple split for every config with minLen=1") {
    val text = "the fast key order sort table scan"
    grid.filter(_.minTermLen == 1).foreach { cfg =>
      val tok = Tokenizers(cfg)
      assert(tok.terms(text).toSeq == text.split(" ").toSeq, s"cfg=$cfg")
    }
  }

  test("termCount == terms().length on every config × adversarial inputs (both strategies)") {
    val inputs = Seq(
      "the fast key order sort table scan",
      "  leading   runs\tand\nnewlines  ",
      "punct,.;:!?marks--and(parens)",
      "a ab abc abcd", "x", "", "   ",
      "Ünïcode Grüße straße İstanbul ΣΟΦΟΣ", // case-fold edge cases incl. U+0130
      "mixed 123 alnum42 7x7 #hash $99.99")
    for (cfg <- grid; strat <- Seq("word", "chargram")) {
      val tok = Tokenizers(cfg.copy(strategy = strat))
      inputs.foreach { s =>
        assert(tok.termCount(s) == tok.terms(s).length,
          s"cfg=$cfg strat=$strat input='$s'")
      }
      assert(tok.termCount(null) == 0)
    }
  }

  test("case folding") {
    val t = Tokenizers(TokenizerConfig(lowercase = true))
    assert(t.terms("Spark JOIN Merge").toSeq == Seq("spark", "join", "merge"))
    val t2 = Tokenizers(TokenizerConfig(lowercase = false))
    assert(t2.terms("Spark JOIN Merge").toSeq == Seq("Spark", "JOIN", "Merge"))
  }

  test("punctuation stripping") {
    val t = Tokenizers(TokenizerConfig(stripPunct = true))
    assert(t.terms("hello, world! foo-bar 42").toSeq == Seq("hello", "world", "foo", "bar", "42"))
    val t2 = Tokenizers(TokenizerConfig(stripPunct = false))
    assert(t2.terms("hello, world!").toSeq == Seq("hello,", "world!"))
  }

  test("min term length filter") {
    val t = Tokenizers(TokenizerConfig(minTermLen = 2))
    assert(t.terms("a bb ccc d ee").toSeq == Seq("bb", "ccc", "ee"))
  }

  test("null / empty / whitespace inputs yield no terms (corrupted-input path S2)") {
    grid.foreach { cfg =>
      val t = Tokenizers(cfg)
      assert(t.terms(null).isEmpty)
      assert(t.terms("").isEmpty)
      assert(t.terms("   \t\n ").isEmpty)
    }
  }

  test("positions are 1-based and dense") {
    val t = Tokenizers(TokenizerConfig())
    assert(t.tokenize("x y z").toSeq == Seq(("x", 1), ("y", 2), ("z", 3)))
  }

  test("tokenization is idempotent on its own output (normalization is a projection)") {
    grid.foreach { cfg =>
      val t = Tokenizers(cfg)
      val once = t.terms("The  Quick,, brown FOX!! jumps 9 times")
      val again = t.terms(once.mkString(" "))
      assert(once.toSeq == again.toSeq, s"cfg=$cfg")
    }
  }

  test("unicode letters survive") {
    val t = Tokenizers(TokenizerConfig())
    assert(t.terms("über café 東京 test").toSeq == Seq("über", "café", "東京", "test"))
  }
}
