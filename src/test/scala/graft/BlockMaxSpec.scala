package graft

import graft.query.Bm25
import org.scalatest.funsuite.AnyFunSuite

/** The block-max safety invariant in isolation (SURVEY.md §7 "hard parts"):
  * the float upper bound stored per block must dominate the exact double
  * impact of every member, including at float-rounding boundaries —
  * guaranteed by Math.nextUp after the double→float cast. */
class BlockMaxSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("nextUp(score.toFloat) strictly dominates the exact double, 100k random cases") {
    for (_ <- 1 to 100000) {
      val nDocs = 1L + rnd.nextLong(1L << 40)
      val df = 1L + (math.abs(rnd.nextLong()) % nDocs)
      val tf = 1 + rnd.nextInt(1000)
      val docLen = tf + rnd.nextInt(4096)
      val avgdl = 1.0 + rnd.nextDouble() * 4000.0
      val exact = Bm25.score(tf, docLen, df, nDocs, avgdl)
      val bound = Math.nextUp(exact.toFloat).toDouble
      assert(bound > exact,
        s"bound $bound does not dominate exact $exact (tf=$tf len=$docLen df=$df N=$nDocs)")
    }
  }

  test("plain toFloat would NOT be safe (the rounding-down case exists)") {
    // demonstrate the hazard nextUp protects against: find a score whose
    // float rounding is below the exact double
    val hazard = (1 to 1000000).exists { i =>
      val x = 1.0 + i * 1e-7
      x.toFloat.toDouble < x
    }
    assert(hazard, "expected at least one round-down case in the sweep")
  }
}
