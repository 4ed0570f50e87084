package graft

import graft.query.Bm25
import org.scalatest.funsuite.AnyFunSuite

/** The block-max safety invariant in isolation (SURVEY.md §7 "hard parts"):
  * blocks store (maxTf, minDocLen) and the query derives the upper bound
  * impact(maxTf, minDocLen) under the CURRENT (idf, avgdl). BM25 impact is
  * monotone increasing in tf and decreasing in docLen, so the derived bound
  * must dominate every member's exact impact — in doubles, with no float
  * rounding, and regardless of how corpus stats drift under append. */
class BlockMaxSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("impact(maxTf, minDocLen) dominates every member impact, 100k random blocks") {
    for (_ <- 1 to 100000) {
      val nDocs = 1L + rnd.nextLong(1L << 40)
      val df = 1L + (math.abs(rnd.nextLong()) % nDocs)
      val idf = Bm25.idf(nDocs, df)
      val avgdl = 1.0 + rnd.nextDouble() * 4000.0
      val nMembers = 1 + rnd.nextInt(16)
      val members = Array.fill(nMembers) {
        val tf = 1 + rnd.nextInt(1000)
        val docLen = tf + rnd.nextInt(4096)
        (tf, docLen)
      }
      val maxTf = members.map(_._1).max
      val minDl = members.map(_._2).min
      val bound = Bm25.scoreWithIdf(idf, maxTf, minDl, avgdl)
      members.foreach { case (tf, dl) =>
        val exact = Bm25.scoreWithIdf(idf, tf, dl, avgdl)
        assert(exact <= bound,
          s"member (tf=$tf,dl=$dl) impact $exact exceeds bound $bound (maxTf=$maxTf,minDl=$minDl)")
      }
    }
  }

  test("the bound stays valid when avgdl/idf drift (append scenario)") {
    // same block metadata, different corpus stats: the derived bound under
    // the NEW stats still dominates members scored under the NEW stats
    for (_ <- 1 to 10000) {
      val members = Array.fill(1 + rnd.nextInt(8)) {
        val tf = 1 + rnd.nextInt(100)
        (tf, tf + rnd.nextInt(500))
      }
      val maxTf = members.map(_._1).max
      val minDl = members.map(_._2).min
      // stats after an append: arbitrary new values
      val nDocs2 = 1L + rnd.nextLong(1L << 30)
      val df2 = 1L + (math.abs(rnd.nextLong()) % nDocs2)
      val idf2 = Bm25.idf(nDocs2, df2)
      val avgdl2 = 1.0 + rnd.nextDouble() * 1000.0
      val bound = Bm25.scoreWithIdf(idf2, maxTf, minDl, avgdl2)
      members.foreach { case (tf, dl) =>
        assert(Bm25.scoreWithIdf(idf2, tf, dl, avgdl2) <= bound)
      }
    }
  }
}
