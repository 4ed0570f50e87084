package graft

import graft.corpus.Pages
import org.apache.spark.sql.functions._

/** Round-6 plan dumps: the build-internal plans the optimization round
  * changed (the declared queries' own result frames are driver-assembled
  * local relations whose plans did not change — the round's wins are in
  * orchestration job counts, evidenced by the BenchExtra listener logs in
  * plans/r06/). Each section prints `.explain("formatted")` text; run with
  * `runMain graft.ExplainR06 <outDir>`. */
object ExplainR06 {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "plans/r06"
    val spark = Bench.session("8")
    val sfDir = "/root/testdata/sf0.01"
    graft.index.Store.mkdirs(outDir)

    def dump(name: String, header: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val txt = s"# $header\n\n" + df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$name"), txt)
      println(s"wrote $outDir/$name")
    }

    val pages = Pages.withInjections(spark, sfDir)
    // BEFORE (r5): buildFrom cached Pages.cleaned(pages) with every input
    // column — the html binary payload rode the cleaning window's exchange
    // and the cache
    dump("build_cleaned_cache_before.txt",
      "r5 buildFrom cache input: Pages.cleaned(pages) — note html in the " +
        "window exchange / cache schema",
      Pages.cleaned(pages))
    // AFTER (r6): projected to the three columns the build reads
    dump("build_cleaned_cache_after.txt",
      "r6 buildFrom cache input: Pages.cleaned(pages).select(doc_id, url, " +
        "text) — html pruned below the window exchange",
      Pages.cleaned(pages).select(col("doc_id"), col("url"), col("text")))

    spark.stop()
  }
}
