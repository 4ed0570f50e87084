package graft

/** One isolated measurement (fresh JVM per run — no cross-session JIT/GC
  * contamination): `runMain graft.BenchOne <cpus> [factor]`. Used by the
  * scaling-efficiency evidence runs (local[N] vs local[4N]). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val factor = if (args.length > 1) args(1).toInt else 60
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session(cpus)
    val (nDocs, buildSec, dps, nq, querySec, qps) = Bench.measure(spark, sfDir, factor, s"one_$cpus")
    println(
      f"""{"metric":"bench_one","cpus":$cpus,"factor":$factor,"docs":$nDocs,"build_sec":$buildSec%.2f,"docs_per_sec":$dps%.1f,"bm25_queries":$nq,"bm25_sec":$querySec%.2f,"bm25_qps":$qps%.1f}""")
    spark.stop()
  }
}
