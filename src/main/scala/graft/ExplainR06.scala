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

    // --- dictionary ranking, small-vocab fast path (second r6 pass) ------
    val tok = graft.tokenize.Tokenizers.default
    val cleaned = Pages.cleaned(pages).select(col("doc_id"), col("url"), col("text"))
    val stats = graft.index.IndexBuilder.termDocs(cleaned, tok)
      .groupBy("term").agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    // BEFORE: distributed GlobalRank — Exchange rangepartitioning (with its
    // sampling pass) + Window feed the dictionary write
    val ranked = graft.plans.GlobalRank.withRowNumber(
      stats, Seq(col("df").desc, col("term").asc), "rn", 8)
    dump("build_dict_rank_before.txt",
      "r5/early-r6 dictionary ranking: GlobalRank over term stats — " +
        "Exchange rangepartitioning + Window below the dictionary write",
      ranked.df.select((col("rn") - 1).cast("int").as("termId"),
        col("term"), col("df").cast("long"), col("cf").cast("long")))
    ranked.release()
    // AFTER: vocabularies under broadcastVocabMax rank on the driver (the
    // same bound under which the posting-build broadcast map was already
    // collected) — the write input is a LocalTableScan + one clustering
    // exchange; no rangepartitioning, no sampling pass, no window
    val fakeEntries = Seq(graft.index.TermEntry(0, "the", 3L, 5L),
      graft.index.TermEntry(1, "a", 2L, 2L))
    import spark.implicits._
    dump("build_dict_rank_after.txt",
      "r6 dictionary ranking, small-vocab path: driver-ranked entries — " +
        "LocalTableScan + one clustering exchange below the dictionary write",
      fakeEntries.toDF("termId", "term", "df", "cf")
        .repartition(2, (col("termId") / lit(1)).cast("long"))
        .sortWithinPartitions(col("termId")))

    // --- merge dictionary v(N+1), small-source fast path (second r6 pass) —
    // two tiny indexes so the real dictionary parquets feed the plans
    val mroot = "/tmp/graft_explain_merge"
    graft.queries.IndexCache.deleteRecursively(new java.io.File(mroot))
    val mcfg = graft.index.IndexConfig()
    graft.index.IndexBuilder.buildFrom(spark,
      pages.filter(col("doc_id") < 100), s"$mroot/low", mcfg)
    graft.index.IndexBuilder.buildFrom(spark,
      pages.filter(col("doc_id") >= 100 && col("doc_id") < 200), s"$mroot/high", mcfg)
    val dictA = spark.read.parquet(s"$mroot/low/dictionary/v00000")
    val dictB = spark.read.parquet(s"$mroot/high/dictionary/v00000")
      .select(col("term"), col("termId").as("srcTermId"),
        col("df").as("s_df"), col("cf").as("s_cf"))
    // BEFORE: full-outer shuffle join of the two dictionaries (both sides
    // exchanged) feeding updated ∪ GlobalRank-ranked fresh
    dump("merge_dict_before.txt",
      "r5/early-r6 merge dictionary: dictA FULL OUTER dictB — both " +
        "corpus-vocabulary relations exchanged for the join",
      dictA.select(col("termId"), col("term"), col("df"), col("cf"))
        .join(dictB, Seq("term"), "full_outer"))
    // AFTER: the destination dictionary streams ONCE through a broadcast
    // term map (mapPartitions — no join exchange); fresh terms are a
    // driver-local union input
    val bSrc = spark.sparkContext.broadcast(Map("the" -> ((1L, 1L))))
    dump("merge_dict_after.txt",
      "r6 merge dictionary, small-source path: dictA streams through a " +
        "broadcast term map (SerializeFromObject/MapPartitions over ONE " +
        "scan — no join exchange); fresh terms union in as a LocalTableScan",
      dictA.select(col("termId"), col("term"), col("df"), col("cf"))
        .as[graft.index.TermEntry].mapPartitions { it =>
          val d = bSrc.value
          it.map(e => d.get(e.term) match {
            case Some((sdf, scf)) => e.copy(df = e.df + sdf, cf = e.cf + scf)
            case None             => e
          })
        }.toDF()
        .unionByName(fakeEntries.toDF("termId", "term", "df", "cf")))

    spark.stop()
  }
}
