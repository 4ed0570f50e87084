package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors;
  * sandbox evidence per driver directive: the SAME job on the SAME input at
  * local[8] vs local[32]). Prints one JSON line and a markdown table row.
  * Run: sbt "runMain graft.ScalingBench" (optionally SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_SCALE_FACTOR). */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "60").toInt

    def runAt(cpus: Int): (Long, Double, Double, Long, Double, Double) = {
      val spark = Bench.session(cpus.toString)
      try Bench.measure(spark, sfDir, factor, s"scale_$cpus")
      finally {
        spark.stop()
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    }

    val (docs8, build8, dps8, nq, qsec8, qps8) = runAt(8)
    val (docs32, build32, dps32, _, qsec32, qps32) = runAt(32)
    require(docs8 == docs32)
    // efficiency: throughput-per-core ratio between 4N and N
    val effBuild = (dps32 / 32.0) / (dps8 / 8.0)
    val effQuery = (qps32 / 32.0) / (qps8 / 8.0)
    println(
      f"""{"metric":"scaling","sf":"$sfDir","factor":$factor,"docs":$docs8,"build_sec_8":$build8%.2f,"build_sec_32":$build32%.2f,"docs_per_sec_8":$dps8%.1f,"docs_per_sec_32":$dps32%.1f,"build_scaling_efficiency":$effBuild%.3f,"bm25_queries":$nq,"bm25_qps_8":$qps8%.1f,"bm25_qps_32":$qps32%.1f,"query_scaling_efficiency":$effQuery%.3f}""")
    println(
      f"""| $docs8 | local[8] → local[32] | build $dps8%.0f → $dps32%.0f docs/s (eff $effBuild%.2f) | query $qps8%.1f → $qps32%.1f q/s (eff $effQuery%.2f) |""")
  }
}
