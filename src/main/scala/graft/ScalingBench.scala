package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors;
  * sandbox evidence per driver directive: the SAME job on the SAME input at
  * two parallelism levels).
  *
  * Measurement design for a noisy shared VM (observed: identical-config
  * runs vary 2-4× across JVMs; parallel CPU burn fluctuates ±25%):
  *  - ONE JVM; JIT warmed by a small build+query pass first (production
  *    executors are long-lived and warm);
  *  - then alternating sessions local[N] / local[4N], `reps` times each,
  *    seconds apart so host noise correlates across configs;
  *  - best-of-reps per config (best filters host interference; it cannot
  *    manufacture parallelism that isn't there).
  * Prints every raw sample plus the best-of summary JSON.
  * Knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_FACTOR, SPARK_GRAFT_N (=4),
  * SPARK_GRAFT_REPS (=3). */
object ScalingBench {

  private def sessionAt(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    Bench.session(cpus.toString)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "200").toInt
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "4").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val n4 = n * 4

    // global JIT warm-up (small corpus) — not timed
    {
      val s = sessionAt(n4)
      Bench.measure(s, sfDir, math.max(1, factor / 10), "jitwarm")
      s.stop()
    }

    case class Sample(cpus: Int, dps: Double, qps: Double)
    val samples = scala.collection.mutable.ArrayBuffer.empty[Sample]
    for (r <- 1 to reps; cpus <- Seq(n, n4)) {
      val s = sessionAt(cpus)
      try {
        val (docs, buildSec, dps, nq, qSec, qps) = Bench.measure(s, sfDir, factor, s"scale_${cpus}_$r")
        println(f"""{"metric":"scaling_sample","rep":$r,"cpus":$cpus,"docs":$docs,"build_sec":$buildSec%.2f,"docs_per_sec":$dps%.1f,"bm25_sec":$qSec%.2f,"bm25_qps":$qps%.1f}""")
        samples += Sample(cpus, dps, qps)
      } finally s.stop()
    }
    val bestN = samples.filter(_.cpus == n)
    val best4N = samples.filter(_.cpus == n4)
    val dpsN = bestN.map(_.dps).max;  val dps4N = best4N.map(_.dps).max
    val qpsN = bestN.map(_.qps).max;  val qps4N = best4N.map(_.qps).max
    val effBuild = (dps4N / n4) / (dpsN / n)
    val effQuery = (qps4N / n4) / (qpsN / n)
    println(
      f"""{"metric":"scaling","sf":"$sfDir","factor":$factor,"n":$n,"reps":$reps,"docs_per_sec_n":$dpsN%.1f,"docs_per_sec_4n":$dps4N%.1f,"build_speedup":${dps4N / dpsN}%.2f,"build_scaling_efficiency":$effBuild%.3f,"bm25_qps_n":$qpsN%.1f,"bm25_qps_4n":$qps4N%.1f,"query_speedup":${qps4N / qpsN}%.2f,"query_scaling_efficiency":$effQuery%.3f}""")
  }
}
