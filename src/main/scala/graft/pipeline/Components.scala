package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the dedup-GROUP
  * operator a training-data pipeline needs on top of near-dup PAIRS
  * (keep one representative per component, drop the rest; the component
  * id IS the canonical keep-min representative).
  *
  * Algorithm: iterative min-label propagation to fixpoint. Every vertex
  * starts labeled with its own id; each round every vertex takes the min
  * of its own label and its neighbors' labels; stop when no label changes.
  * Deterministic (min is order-free), exact, and each round is one
  * edge-bounded shuffle — rounds are bounded by the component DIAMETER,
  * which for near-dup graphs (LSH clusters are clique-ish) is tiny. The
  * same shape underlies the alternating star contractions of the
  * map-reduce CC literature; plain propagation is chosen because dup
  * graphs are shallow and the per-round plan stays one join + one agg.
  *
  * Iterations materialize through `localCheckpoint` (GC-reclaimed), so a
  * long-diameter graph neither leaks cache entries nor replays the whole
  * lineage per round.
  */
object Components {

  /** edges: two long columns (`id_a`, `id_b`), undirected, self-loops and
    * duplicates tolerated. Returns (id, component) for every vertex that
    * appears in any edge, where component = min vertex id reachable. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true) // re-joined every round
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      val neighborLabels = sym
        .join(labels.select(col("id").as("dst"), col("component")), "dst")
        .select(col("src").as("id"), col("component"))
      val next = neighborLabels.unionByName(labels)
        .groupBy("id").agg(min(col("component")).as("component"))
        .localCheckpoint(true)
      changed = next
        .join(labels.select(col("id"), col("component").as("prev")), "id")
        .filter(col("component") < col("prev"))
        .count()
      labels = next
    }
    labels
  }
}
