package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-query isolation harness (guide §1.4/§1.5): times named SparkEntry
  * queries one at a time with a job listener, printing per query its wall
  * seconds, Spark JOB COUNT and per-job wall time — the diagnosis tool for
  * job-count-bound rows (tiny fixture corpora make per-job overhead, not
  * data volume, the cost driver). Results go to OPTIMIZATION_r06.md; the
  * frozen graft.Bench harness is untouched.
  *
  * Usage: `runMain graft.BenchExtra q_serp q_wildcard ...` (no args = a
  * default hot set). Env knobs match Bench (SPARK_GRAFT_SF_DIR/_CPUS).
  */
object BenchExtra {

  final class JobLog extends SparkListener {
    case class J(id: Int, desc: String, start: Long, var end: Long = 0L)
    val jobs = new scala.collection.mutable.ArrayBuffer[J]()
    override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
      jobs += J(js.jobId, Option(js.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse(""),
        System.nanoTime())
    }
    override def onJobEnd(je: SparkListenerJobEnd): Unit = synchronized {
      jobs.find(_.id == je.jobId).foreach(_.end = System.nanoTime())
    }
    def reset(): Unit = synchronized { jobs.clear() }
    /** Consistent copy — the listener bus may still be appending. */
    def snapshot(): Seq[(Int, String, Long, Long)] = synchronized {
      jobs.toSeq.map(j => (j.id, j.desc, j.start, j.end))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_serp", "q_wildcard", "q_near", "q_validate", "q_vocab_cap")
    val spark = Bench.session(cpus)
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)
    val all = SparkEntry.queries
    names.foreach { name =>
      val fn = all.getOrElse(name, sys.error(s"unknown query $name"))
      log.reset()
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      Thread.sleep(200) // let listener events drain
      val js = log.snapshot()
      println(f"== $name: $sec%.2f s, rows=$n, jobs=${js.size}")
      js.foreach { case (id, desc, start, end) =>
        val d = if (end > 0) (end - start) / 1e9 else -1.0
        println(f"   job $id%4d ${d}%7.3f s  ${desc.take(100)}")
      }
    }
    spark.stop()
  }
}
