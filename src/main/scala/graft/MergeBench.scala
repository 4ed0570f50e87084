package graft

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import graft.query.{IndexReader, Wand}
import org.apache.spark.sql.functions._

/** Merge + federation benchmark. Two questions a sharded deployment asks:
  *
  *  1. Incorporating an already-built shard into another index — how does
  *     [[IndexBuilder.merge]] (a termId remap over compressed blocks, no
  *     text, no re-encode) compare with re-ingesting that shard's pages
  *     (what an append/rebuild pays)?
  *  2. What does FEDERATED search ([[Wand.topKSharded]], global stats
  *     derived at query time) cost relative to querying the merged index?
  *
  * Prints ONE JSON line. Knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_BENCH_FACTOR (corpus replication, default 200),
  * SPARK_GRAFT_BENCH_DIR, SPARK_GRAFT_LOCAL_DIR (tmpfs). */
object MergeBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val factor = sys.env.getOrElse("SPARK_GRAFT_BENCH_FACTOR", "200").toInt
    val spark = Bench.session(cpus)
    val cfg = IndexConfig(nChunks = 1, postingsBuckets = 32, bucketRange = 2048)
    val root = s"${Bench.benchDir}/merge_$cpus"
    graft.queries.IndexCache.deleteRecursively(new java.io.File(root))

    // JIT/codegen warm-up (small corpus, includes one merge) — not timed
    {
      val wPages = CorpusGen.scaledPages(spark, sfDir, math.max(1, factor / 10))
      val wMid = wPages.agg(max(col("doc_id"))).head().getLong(0) / 2
      IndexBuilder.buildFrom(spark, wPages.filter(col("doc_id") <= wMid), s"$root/wlow", cfg)
      IndexBuilder.buildFrom(spark, wPages.filter(col("doc_id") > wMid), s"$root/whigh", cfg)
      IndexBuilder.merge(spark, s"$root/wlow", s"$root/whigh")
      val wh = IndexReader.load(spark, s"$root/wlow")
      Wand.topK(wh, Bench.queryBatch(wh.dictMap.keys.toArray.sorted, 64), 10)
      graft.queries.IndexCache.deleteRecursively(new java.io.File(s"$root/wlow"))
      graft.queries.IndexCache.deleteRecursively(new java.io.File(s"$root/whigh"))
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val pages = CorpusGen.scaledPages(spark, sfDir, factor)
    val mid = pages.agg(max(col("doc_id"))).head().getLong(0) / 2
    val (mLow, lowSec) =
      timed(IndexBuilder.buildFrom(spark, pages.filter(col("doc_id") <= mid), s"$root/low", cfg))
    val (mHigh, highSec) =
      timed(IndexBuilder.buildFrom(spark, pages.filter(col("doc_id") > mid), s"$root/high", cfg))
    val (mFull, fullSec) =
      timed(IndexBuilder.buildFrom(spark, pages, s"$root/full", cfg))

    // federated query throughput over the UNMERGED shards (before the merge
    // mutates the low index), vs the merged single index
    val shards = Seq(IndexReader.load(spark, s"$root/low"), IndexReader.load(spark, s"$root/high"))
    val vocab = shards.flatMap(_.dictMap.keys).distinct.sorted.toArray
    val queries = Bench.queryBatch(vocab, Bench.nQueries)
    Wand.topKSharded(shards, queries.take(8), 10) // warm
    val (fedRes, fedSec) = timed(Wand.topKSharded(shards, queries, 10))
    require(fedRes.values.count(_.nonEmpty) > queries.size / 2, "federated queries mostly empty")

    val (mMerged, mergeSec) = timed(IndexBuilder.merge(spark, s"$root/low", s"$root/high"))
    require(mMerged.nDocs == mFull.nDocs, s"merge lost docs: ${mMerged.nDocs} != ${mFull.nDocs}")
    val merged = IndexReader.load(spark, s"$root/low")
    Wand.topK(merged, queries.take(8), 10) // warm
    val (mRes, mergedSec) = timed(Wand.topK(merged, queries, 10))
    require(mRes.values.count(_.nonEmpty) > queries.size / 2, "merged queries mostly empty")

    println(
      f"""{"metric":"merge_bench","sf":"$sfDir","cpus":"$cpus","bench_factor":$factor,""" +
      f""""docs_full":${mFull.nDocs},"docs_high":${mHigh.nDocs},""" +
      f""""build_low_sec":$lowSec%.2f,"build_high_sec":$highSec%.2f,"build_full_sec":$fullSec%.2f,""" +
      f""""merge_sec":$mergeSec%.2f,""" +
      f""""merge_speedup_vs_reingest":${highSec / mergeSec}%.2f,""" +
      f""""sharded_path_sec":${lowSec + highSec + mergeSec}%.2f,""" +
      f""""fed_qps":${queries.size / fedSec}%.1f,"merged_qps":${queries.size / mergedSec}%.1f,""" +
      f""""fed_vs_merged":${(queries.size / fedSec) / (queries.size / mergedSec)}%.3f,""" +
      f""""low_docs_per_sec":${mLow.nDocs / lowSec}%.1f}""")
    spark.stop()
  }
}
