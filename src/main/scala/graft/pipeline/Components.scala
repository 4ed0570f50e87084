package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the dedup-GROUP
  * operator a training-data pipeline needs on top of near-dup PAIRS
  * (keep one representative per component, drop the rest; the component
  * id IS the canonical keep-min representative).
  *
  * Algorithm: alternating LARGE-STAR / SMALL-STAR contraction (the
  * map-reduce CC construction of Kiveris et al.), not plain min-label
  * propagation: propagation needs one round per component DIAMETER, so an
  * adversarial near-dup chain (A≈B≈C≈…, each pair within LSH reach) costs
  * O(chain length) shuffles. The star operations contract greedily —
  * large-star hangs every larger neighbor directly under the
  * neighborhood's minimum, small-star re-hangs the smaller ones — and the
  * edge set converges to per-component STARS rooted at the component
  * minimum in O(log² n) rounds worst-case (O(log n) observed; the chain
  * spec asserts the log-like bound). Each half-round is one groupBy + one
  * edge-bounded join; min is order-free, so the result is deterministic
  * and keeps the exact keep-min semantics of the previous implementation.
  *
  * Iterations materialize through `localCheckpoint` (GC-reclaimed), so
  * rounds neither leak cache entries nor replay the whole lineage.
  */
object Components {

  /** edges: two long columns (`id_a`, `id_b`), undirected, self-loops and
    * duplicates tolerated. Returns (id, component) for every vertex that
    * appears in any edge, where component = min vertex id reachable. */
  def connectedComponents(edges: DataFrame): DataFrame =
    connectedComponentsWithRounds(edges)._1

  /** Same, also reporting the number of alternation rounds taken — the
    * chain-graph spec pins the O(log n) convergence with it. */
  def connectedComponentsWithRounds(edges: DataFrame): (DataFrame, Int) = {
    // canonical form: src > dst, no self-loops, deduped
    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    /** large-star: for every node u, hang every LARGER neighbor off
      * m = min(Γ(u) ∪ {u}). Processes each undirected edge from both
      * endpoints (symmetrized), so connectivity is preserved. */
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("src"), col("dst"))
        .unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      val mins = sym.groupBy("src").agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      canon(sym.filter(col("dst") > col("src"))
        .join(mins, "src")
        .select(col("dst").as("src"), col("m").as("dst")))
    }

    /** small-star: orient each edge toward its larger endpoint; for every
      * node u re-hang its smaller neighbors (and u itself) off their
      * minimum. */
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(col("src"), col("dst")) // canonical: src > dst
      val mins = oriented.groupBy("src").agg(min(col("dst")).as("m"))
      val rehung = oriented.join(mins, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
      canon(rehung.unionByName(mins.select(col("src"), col("m").as("dst"))))
    }

    val vertices = edges
      .select(col("id_a").cast("long").as("id"))
      .unionByName(edges.select(col("id_b").cast("long").as("id")))
      .distinct()
      .localCheckpoint(true)
    var cur = canon(edges.select(col("id_a").cast("long").as("src"),
        col("id_b").cast("long").as("dst")))
      .localCheckpoint(true)
    var rounds = 0
    var converged = cur.isEmpty
    while (!converged) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      rounds += 1
      // fixpoint: same canonical edge set, decided in ONE action — both
      // sides are distinct by construction, so in the unioned multiset an
      // edge appears twice iff it is on both sides; any count-1 group is a
      // difference in either direction (replaces the two-action count() +
      // anti-join probe: halves the per-round job count at O(log n) rounds)
      converged = next.unionByName(cur)
        .groupBy("src", "dst").count()
        .filter(col("count") === 1)
        .isEmpty
      cur = next
    }
    // at fixpoint the edges are stars rooted at each component's minimum:
    // every non-root vertex carries exactly one (vertex, root) edge
    val labels = vertices
      .join(cur.select(col("src").as("id"), col("dst").as("component")), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
    (labels, rounds)
  }
}
