package graft

import graft.pipeline.Components
import org.scalatest.funsuite.AnyFunSuite

/** Connected components: distributed min-label propagation must equal a
  * local union-find on graphs that exercise transitivity beyond pairs —
  * chains (long diameter), cycles, merged stars, self-loops, duplicates. */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Components.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains, cycles, merged stars, self-loops, duplicate edges == union-find") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),        // chain, diameter 4
      (10L, 11L), (11L, 12L), (12L, 10L),             // cycle
      (20L, 21L), (20L, 22L), (23L, 21L), (23L, 24L), // two stars merged via 21
      (30L, 30L),                                     // self-loop singleton
      (40L, 41L), (41L, 40L), (40L, 41L)              // duplicates both ways
    )
    val got = run(edges)
    val want = unionFind(edges)
    assert(got == want, s"diff: ${(got.toSet diff want.toSet).take(5)} / ${(want.toSet diff got.toSet).take(5)}")
    assert(got(5L) == 1L, "chain did not propagate across 4 hops")
    assert(got(24L) == 20L, "merged stars did not unify")
  }

  test("adversarial 512-chain converges in O(log n) rounds (star contraction, not diameter)") {
    import spark.implicits._
    val n = 512L
    val edges = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Components.connectedComponentsWithRounds(edges)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to n).forall(got(_) == 1L), "chain not fully unified")
    // plain min-label propagation would need ~n rounds here; the star
    // contraction must stay logarithmic (2·log₂ n + slack)
    val bound = 2 * (64 - java.lang.Long.numberOfLeadingZeros(n - 1)) + 2
    assert(rounds <= bound, s"$rounds rounds for a $n-chain (bound $bound) — not logarithmic")
    info(s"chain n=$n converged in $rounds rounds (bound $bound)")
  }

  test("deterministic across runs and input order") {
    val edges = Seq((7L, 3L), (3L, 9L), (9L, 1L), (50L, 60L))
    assert(run(edges) == run(scala.util.Random.shuffle(edges)))
  }

  test("planted near-dup pairs yield (base, base+offset) components") {
    val d = "/root/testdata/sf0.001"
    val pairs = graft.pipeline.Similarity.lshNearDupPairs(
      graft.pipeline.Similarity.withPlantedNearDups(graft.pipeline.Similarity.embeddings(spark, d)), 0.99)
    val comps = Components.connectedComponents(pairs.select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.nonEmpty)
    // every jittered copy must land in its base's component
    comps.foreach { case (id, c) =>
      if (id >= graft.pipeline.Similarity.PlantOffset)
        assert(c <= id - graft.pipeline.Similarity.PlantOffset,
          s"copy $id not grouped with a base (component $c)")
    }
  }
}
