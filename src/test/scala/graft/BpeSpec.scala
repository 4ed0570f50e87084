package graft

import graft.index.PhraseVocab
import graft.tokenize.Tokenizers
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** BPE merge-loop determinism: the distributed trainer must produce the
  * EXACT merge table of a single-threaded reference implementation — the
  * engine analog of the reference's train-twice equality tests
  * (tests/test_train.py:59-250). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpusDocs(sfDir: String) = {
    import spark.implicits._
    val tok = Tokenizers.default
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, tok.terms(t)) }
  }

  test("hand-computed merge sequence") {
    val corpus = Seq("a b a b c", "a b").map(_.split(" "))
    val m = PhraseVocab.trainLocal(corpus, 3)
    assert(m.map(s => (s.left, s.right, s.count)) ==
      Seq(("a", "b", 3L)))
    // after merging a_b: docs = [a_b a_b c, a_b]; best pair (a_b,a_b):1 < 2 → stop
  }

  test("applyMerge is leftmost non-overlapping") {
    assert(PhraseVocab.applyMerge("a a a".split(" "), "a", "a", "aa").toSeq == Seq("aa", "a"))
    assert(PhraseVocab.applyMerge("a a a a".split(" "), "a", "a", "aa").toSeq == Seq("aa", "aa"))
  }

  test("distributed trainer == single-threaded reference on the real corpus") {
    val docs = corpusDocs("/root/testdata/sf0.001")
    val (distributed, finalDocs, release) = PhraseVocab.train(docs, 8)
    val local = PhraseVocab.trainLocal(docs.collect().toSeq.sortBy(_._1).map(_._2), 8)
    assert(distributed == local)
    // rewritten corpus contains merged units and no longer contains the pair
    val (l, r, m) = (distributed.head.left, distributed.head.right, distributed.head.merged)
    val bad = finalDocs.filter { case (_, ts) =>
      (0 until ts.length - 1).exists(i => ts(i) == l && ts(i + 1) == r)
    }.count()
    assert(bad == 0, s"first merged pair ($l,$r) still present")
    release()
  }

  test("merged units get termIds and real posting lists (encode_token_ids analog)") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val (merges, handle) = graft.queries.MergedIndexCache.get(spark, sfDir)
    assert(merges.nonEmpty)
    val dict = handle.dictMap
    merges.foreach(m => assert(dict.contains(m.merged), s"${m.merged} missing from merged dictionary"))
    // postings of every merged unit decode to exactly the docs containing it
    var docs = corpusDocs(sfDir).collect().toSeq
    merges.foreach { m =>
      docs = docs.map { case (id, ts) => (id, PhraseVocab.applyMerge(ts, m.left, m.right, m.merged)) }
    }
    merges.foreach { m =>
      val tid = dict(m.merged).termId
      val postDocs = handle.postings
        .filter(col("termId") === tid).as[graft.index.PostingBlock]
        .flatMap(b => graft.codec.VByte.decodeDocIds(b.docIdGaps))
        .collect().toSet
      val want = docs.filter(_._2.contains(m.merged)).map(_._1).toSet
      assert(postDocs == want, s"postings for ${m.merged}: got ${postDocs.size} docs want ${want.size}")
      assert(dict(m.merged).df == want.size.toLong)
    }
  }

  test("applyFuseSet: leftmost-greedy over a SET of pairs, incl. mixed chains") {
    val q = Set(("a", "b"), ("b", "c"), ("c", "d"))
    // (a,b) wins the overlap with (b,c); then (c,d) fuses
    assert(PhraseVocab.applyFuseSet("a b c d".split(" "), q).toSeq == Seq("a_b", "c_d"))
    // chain where the first pair does NOT qualify: b c fuses, a stays
    assert(PhraseVocab.applyFuseSet("x b c".split(" "), q).toSeq == Seq("x", "b_c"))
    assert(PhraseVocab.applyFuseSet("a".split(" "), q).toSeq == Seq("a"))
  }

  test("Unigram EM: E-step fuses exactly the positive-PMI pairs") {
    // corpus: 'a b' always adjacent (high joint), 'x'/'y' independent-ish
    val corpus = Seq("a b x", "a b y", "a b x y", "x y a b").map(_.split(" "))
    val (steps, seg) = PhraseVocab.trainUnigramLocal(corpus, 1, 100)
    assert(steps.nonEmpty && steps.head >= 1)
    // every a..b adjacency must be fused after one E-step
    assert(!seg.exists(ts => (0 until ts.length - 1).exists(i => ts(i) == "a" && ts(i + 1) == "b")))
    assert(seg.exists(_.contains("a_b")))
  }

  test("distributed Unigram trainer == single-threaded reference on the real corpus") {
    import spark.implicits._
    val docs = corpusDocs("/root/testdata/sf0.001")
    val (dSteps, dFinal, uniRelease) = PhraseVocab.trainUnigram(docs, 3, 100)
    val (lSteps, lFinal) = PhraseVocab.trainUnigramLocal(
      docs.collect().toSeq.sortBy(_._1).map(_._2), 3, 100)
    assert(dSteps == lSteps, s"per-step candidate counts differ: $dSteps vs $lSteps")
    val dCounts = dFinal.flatMap { case (_, ts) => ts.iterator }
      .toDF("t").groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val lCounts = lFinal.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(dCounts == lCounts, "final segmented unit tables differ")
    uniRelease()
  }

  test("WordPiece: likelihood argmax diverges from the count argmax where it should") {
    // "a b" dominates by raw count (BPE's pick) but a and b are frequent
    // elsewhere, so its likelihood is diluted; x and y occur ONLY together —
    // count 3, score 3/(3·3) = 1/3 beats 10/(14·14)
    val corpus = (Seq.fill(10)("a b") ++ Seq.fill(4)("a c b") ++ Seq.fill(3)("x y"))
      .map(_.split(" "))
    val bpe = PhraseVocab.trainLocal(corpus, 1)
    val wp = PhraseVocab.trainLocalWordPiece(corpus, 1)
    assert(bpe.head.left == "a" && bpe.head.right == "b")
    assert(wp.head.left == "x" && wp.head.right == "y")
    assert(wp.head.count == 3L && math.abs(wp.head.score - 1.0 / 3.0) < 1e-15)
  }

  test("distributed WordPiece trainer == single-threaded reference on the real corpus") {
    val docs = corpusDocs("/root/testdata/sf0.001")
    val (distributed, _, wpRelease) = PhraseVocab.trainWordPiece(docs, 6)
    wpRelease()
    val local = PhraseVocab.trainLocalWordPiece(docs.collect().toSeq.sortBy(_._1).map(_._2), 6)
    assert(distributed == local) // includes bit-exact score equality
    assert(distributed.nonEmpty)
  }

  test("train twice yields identical merges (determinism / resume analog)") {
    val docs = corpusDocs("/root/testdata/sf0.001")
    val (m1, _, rel1) = PhraseVocab.train(docs, 4)
    rel1()
    val (m2, _, rel2) = PhraseVocab.train(docs, 4)
    rel2()
    assert(m1 == m2)
  }
}
