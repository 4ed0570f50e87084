package graft.query

import org.scalatest.funsuite.AnyFunSuite

/** [[Wand.CollapseTopK]] — the group-collapsed bounded collector — fuzzed
  * against the from-the-definition reference: group every offered doc by
  * its key, keep each group's best (score desc, docId asc) doc, rank the
  * group bests (score desc, docId asc), take k. The fuzz drives small
  * domains (few groups, coarse score grid) so eviction, re-entry of an
  * evicted group via a later better doc, stale-heap purging, and exact
  * score ties all occur constantly. */
class CollapseTopKSpec extends AnyFunSuite {

  private def reference(offers: Seq[(Double, Long, String)], k: Int): Array[(Double, Long)] =
    offers.groupBy(_._3).values.map(_.minBy { case (s, d, _) => (-s, d) })
      .toArray.sortBy { case (s, d, _) => (-s, d) }.take(k)
      .map { case (s, d, _) => (s, d) }

  test("fuzz: ranked == grouped brute force (2000 random cases)") {
    val rnd = new scala.util.Random(0x5eed)
    for (caseNo <- 1 to 2000) {
      val k = 1 + rnd.nextInt(6)
      val nGroups = 1 + rnd.nextInt(8)
      val nDocs = rnd.nextInt(60)
      // distinct docIds; coarse score grid forces exact ties
      val docs = rnd.shuffle((0L until 200L).toVector).take(nDocs)
      val offers = docs.map { d =>
        (rnd.nextInt(8).toDouble, d, s"g${rnd.nextInt(nGroups)}")
      }
      val ck = new Wand.CollapseTopK(k)
      offers.foreach { case (s, d, g) => ck.offer(s, d, g) }
      val got = ck.ranked.toSeq
      val want = reference(offers, k).toSeq
      assert(got == want, s"case $caseNo (k=$k): got $got want $want")
    }
  }

  test("threshold is the kth-best group-best, -inf below capacity") {
    val ck = new Wand.CollapseTopK(2)
    assert(ck.threshold == Double.NegativeInfinity)
    ck.offer(5.0, 1L, "a")
    assert(ck.threshold == Double.NegativeInfinity) // 1 group < k
    ck.offer(3.0, 2L, "b")
    assert(ck.threshold == 3.0)
    // same-group improvement moves the group's best, not the group count
    ck.offer(4.0, 3L, "b")
    assert(ck.threshold == 4.0)
    // a new group evicts the worst; threshold rises
    ck.offer(6.0, 4L, "c")
    assert(ck.threshold == 5.0)
    // the evicted group re-enters when a later doc beats the threshold
    ck.offer(7.0, 5L, "b")
    assert(ck.threshold == 6.0)
    assert(ck.ranked.toSeq == Seq((7.0, 5L), (6.0, 4L)))
  }
}
