package graft

import graft.codec.VByte
import org.scalatest.funsuite.AnyFunSuite

/** Codec exactness — the analog of the reference's id round-trip tests
  * (tests/test_train.py:140-157): decode(encode(x)) == x, always.
  * Property-style with a seeded RNG (deterministic, like the reference's
  * fixed seed in tests/utils_tests.py:37). */
class VByteSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("round-trip: arbitrary non-negative longs, 500 random arrays") {
    for (_ <- 1 to 500) {
      val n = rnd.nextInt(200)
      val a = Array.fill(n)(rnd.nextLong(Long.MaxValue))
      assert(VByte.decode(VByte.encode(a)).sameElements(a))
    }
  }

  test("round-trip: docIds via delta-gap (strictly increasing)") {
    for (_ <- 1 to 500) {
      val n = 1 + rnd.nextInt(300)
      val gaps = Array.fill(n)(1L + rnd.nextLong(1L << 40))
      val docIds = gaps.scanLeft(0L)(_ + _).drop(1)
      assert(VByte.decodeDocIds(VByte.encodeDocIds(docIds)).sameElements(docIds))
    }
  }

  test("round-trip: block position streams (concatenated per-posting gap runs)") {
    for (_ <- 1 to 500) {
      val nPostings = 1 + rnd.nextInt(40)
      val posLists = Array.fill(nPostings) {
        val tf = 1 + rnd.nextInt(30)
        val gaps = Array.fill(tf)(1 + rnd.nextInt(5000))
        gaps.scanLeft(0)(_ + _).drop(1) // strictly increasing, 1-based
      }
      val out = new java.io.ByteArrayOutputStream()
      posLists.foreach(ps => VByte.putPositions(out, ps))
      val decoded = VByte.decodePositions(out.toByteArray, posLists.map(_.length))
      assert(decoded.length == nPostings)
      posLists.indices.foreach(j => assert(decoded(j).sameElements(posLists(j))))
    }
  }

  test("decodePositions rejects a truncated/mismatched stream") {
    val out = new java.io.ByteArrayOutputStream()
    VByte.putPositions(out, Array(1, 3, 7))
    intercept[IllegalArgumentException] {
      VByte.decodePositions(out.toByteArray, Array(2)) // sum(tfs) != stream length
    }
  }

  test("round-trip: ints (term frequencies)") {
    for (_ <- 1 to 500) {
      val a = Array.fill(rnd.nextInt(200))(rnd.nextInt(Int.MaxValue))
      assert(VByte.decodeInts(VByte.encodeInts(a)).sameElements(a))
    }
  }

  test("boundary values round-trip") {
    val edges = Array(0L, 1L, 127L, 128L, 129L, 16383L, 16384L, Int.MaxValue.toLong,
      (1L << 35) - 1, 1L << 35, Long.MaxValue)
    assert(VByte.decode(VByte.encode(edges)).sameElements(edges))
  }

  test("gaps are rejected when not strictly increasing") {
    intercept[IllegalArgumentException] { VByte.deltaGaps(Array(5L, 5L)) }
    intercept[IllegalArgumentException] { VByte.deltaGaps(Array(5L, 4L)) }
  }

  test("single-byte encoding for small values") {
    assert(VByte.encode(Array(0L)).length == 1)
    assert(VByte.encode(Array(127L)).length == 1)
    assert(VByte.encode(Array(128L)).length == 2)
  }

  test("truncated stream is rejected") {
    val full = VByte.encode(Array(300L))
    intercept[IllegalArgumentException] { VByte.decode(full.dropRight(1)) }
  }
}
