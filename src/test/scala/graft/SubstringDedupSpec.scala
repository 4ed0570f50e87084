package graft

import graft.pipeline.SubstringDedup
import graft.tokenize.Tokenizers
import org.scalatest.funsuite.AnyFunSuite

/** Substring-level exact dedup: engine spans/scrub vs an independent
  * brute-force reference (window content strings, no hashing), on a
  * crafted fixture that exercises cross-doc boilerplate, within-doc
  * repetition, span merging, multi-span docs, and short docs — plus a
  * whole-corpus equivalence run on the sf0.001 documents table. */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val W = 4

  // ---- independent reference: content-keyed, collection-based ----------

  private def bruteSpans(docs: Seq[(Long, String)], w: Int): Set[(Long, Int, Int)] = {
    val toks = docs.map { case (id, t) => id -> Tokenizers.default.terms(t) }
    val occ = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for ((_, ts) <- toks; p <- 0 to ts.length - w)
      occ(ts.slice(p, p + w).mkString(" ")) += 1
    val spans = scala.collection.mutable.Set.empty[(Long, Int, Int)]
    for ((id, ts) <- toks) {
      val starts = (0 to ts.length - w)
        .filter(p => occ(ts.slice(p, p + w).mkString(" ")) > 1)
        .map(_ + 1) // 1-based
      var i = 0
      while (i < starts.length) {
        val s0 = starts(i)
        var end = starts(i) + w - 1
        while (i + 1 < starts.length && starts(i + 1) <= starts(i) + w) {
          i += 1; end = starts(i) + w - 1
        }
        spans += ((id, s0, end))
        i += 1
      }
    }
    spans.toSet
  }

  private val boiler = "x1 x2 x3 x4 x5"
  private val fixture: Seq[(Long, String)] = Seq(
    1L -> "a1 a2 a3 a4 a5 a6 a7 a8",                    // unique, untouched
    2L -> s"b1 b2 $boiler b3 b4",                       // boilerplate mid-doc
    3L -> s"$boiler c1 c2 c3 c4 c5 c6",                 // boilerplate at start
    4L -> "p q r s t p q r s t",                        // self-repetition
    5L -> "z1 z2 z3",                                   // shorter than W
    6L -> s"$boiler g1 g2 g3 g4 g5 g6 g7 g8 g9 y1 y2 y3 y4", // two spans, gap > W
    7L -> "h1 h2 y1 y2 y3 y4 h3 h4"                     // second boilerplate
  )

  private def fixtureDf = {
    import spark.implicits._
    fixture.toDF("doc_id", "text")
  }

  test("rolling window hash == direct polynomial recompute") {
    val ts = "p q r s t p q r s onemore t".split(" ")
    val rolled = SubstringDedup.docWindowHashes(ts, W)
    val direct = (0 to ts.length - W).map { p =>
      var h = 0L
      for (i <- 0 until W) h = h * 0x100000001b3L + SubstringDedup.tokenHash(ts(p + i))
      h
    }
    assert(rolled.toSeq == direct)
    assert(SubstringDedup.docWindowHashes(Array("a", "b"), W).isEmpty)
  }

  test("duplicated spans == brute-force reference on the crafted fixture") {
    val got = SubstringDedup
      .duplicatedSpans(SubstringDedup.tokenArrays(fixtureDf), W)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val want = bruteSpans(fixture, W)
    assert(got.map(t => (t._1, t._2, t._3)).toSet == want,
      s"got ${got.toSeq.sortBy(t => (t._1, t._2))}, want ${want.toSeq.sorted}")
    assert(got.forall(t => t._4 == t._3 - t._2 + 1), "span_len must equal end-start+1")
    // shape pins: doc 1 (unique) and doc 5 (short) emit nothing; doc 4's
    // self-repetition merges to one full-cover span; doc 6 has TWO spans
    val byDoc = got.groupBy(_._1)
    assert(!byDoc.contains(1L) && !byDoc.contains(5L))
    assert(byDoc(4L).toSeq == Seq((4L, 1, 10, 10)), s"doc 4: ${byDoc(4L).toSeq}")
    assert(byDoc(6L).length == 2, s"doc 6 must have two separate spans: ${byDoc(6L).toSeq}")
  }

  test("scrub removes exactly the span-covered tokens, keeps everything else") {
    val spans = SubstringDedup
      .duplicatedSpans(SubstringDedup.tokenArrays(fixtureDf), W)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val covered: Map[Long, Set[Int]] = spans.groupBy(_._1)
      .map { case (id, ss) => id -> ss.flatMap(s => s._2 to s._3).toSet }
    val got = SubstringDedup.scrub(SubstringDedup.tokenArrays(fixtureDf), W)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == fixture.map(_._1).sorted, "one row per input doc")
    for ((id, keptLen, removedLen, cleanText) <- got) {
      val ts = Tokenizers.default.terms(fixture.toMap.apply(id))
      val cov = covered.getOrElse(id, Set.empty)
      val expect = ts.zipWithIndex.collect { case (t, i) if !cov.contains(i + 1) => t }
      assert(cleanText == expect.mkString(" "), s"doc $id clean_text")
      assert(keptLen == expect.length && removedLen == ts.length - expect.length, s"doc $id lens")
    }
    // doc 4 is fully covered → empty survivor text, still present
    val d4 = got.find(_._1 == 4L).get
    assert(d4._2 == 0 && d4._4 == "")
  }

  test("whole-corpus equivalence on sf0.001 documents (w = 8)") {
    val docsDf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter("text IS NOT NULL AND length(text) > 0")
    val corpus = docsDf.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = SubstringDedup
      .duplicatedSpans(SubstringDedup.tokenArrays(docsDf), 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got == bruteSpans(corpus, 8))
    assert(got.nonEmpty, "sf0.001 should contain planted duplicated substrings")
  }
}
