package graft

import java.nio.file.{Files, Paths}

/** Subset correctness dump for the optimization loop: like [[Verify]] but
  * only for the named queries (fast inner-loop oracle checks after touching
  * one operator; the frozen [[Verify]] dumps all ~117 and takes minutes).
  * Usage: `runMain graft.VerifySubset <sfDir> <outDir> <q names...>`, then
  * `python3 tools/compare.py <sfDir> <outDir>`. */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Bench.session(cpus)
    graft.index.Store.mkdirs(outDir)
    val all = SparkEntry.queries
    names.foreach { name =>
      val fn = all.getOrElse(name, sys.error(s"unknown query $name"))
      fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
