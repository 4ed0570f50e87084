package graft

import graft.corpus.Pages
import graft.index.{IndexBuilder, IndexConfig, IndexValidator, Manifest}
import graft.query.IndexReader
import graft.streaming.DedupIngest
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Streaming ingest with inline dedup — the crawl loop: per micro-batch,
  * near-dups of committed corpus docs (and of smaller-id batch docs) are
  * dropped by signature-estimated Jaccard against the persisted dedup
  * index, survivors append to the inverted index, and the dedup index
  * grows so LATER batches dedup against EARLIER batches' survivors. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val cfg = IndexConfig(blockSize = 16, bucketRange = 64, nChunks = 1, postingsBuckets = 2)

  private def copyOf(src: Long, newId: Long) = {
    val base = Pages.base(spark, sfDir)
    base.filter(col("doc_id") === src)
      .select(lit(newId).as("doc_id"),
        concat(lit("https://copy/"), lit(newId)).as("url"),
        col("warc_ts"), col("html"), col("text"), col("lang"))
  }

  test("two batches: cross-corpus dups, in-batch dups, and cross-BATCH dups all drop; " +
    "survivors == rebuild; replay is a no-op") {
    val root = "/tmp/graft_test_index/stream_dedup"
    graft.queries.IndexCache.deleteRecursively(new java.io.File(root))
    val indexDir = s"$root/index"
    val dedupDir = s"$root/dedup"
    val inputDir = s"$root/incoming"

    val pages = Pages.withInjections(spark, sfDir).persist()
    val bootstrapPages = pages.filter(col("doc_id") < 192)
    IndexBuilder.buildFrom(spark, bootstrapPages, indexDir, cfg)
    DedupIngest.bootstrap(spark, bootstrapPages, dedupDir, cfg)

    val base = Pages.base(spark, sfDir)
    // batch 1: fresh docs 200..249 + copy of corpus doc 5 (id 260) +
    // in-batch copy of fresh doc 200 (id 261) + copy of corpus doc 6 (262)
    base.filter(col("doc_id") >= 200 && col("doc_id") < 250)
      .unionByName(copyOf(5L, 260L))
      .unionByName(copyOf(200L, 261L))
      .unionByName(copyOf(6L, 262L))
      .coalesce(1).write.mode("overwrite").parquet(s"$inputDir/part1")
    Thread.sleep(1100) // distinct mtimes → deterministic file-source order
    // batch 2: copy of BATCH-1 survivor 210 (id 300, must hit the grown
    // dedup index) + genuinely fresh doc (301 = corpus row 490's text,
    // never indexed)
    copyOf(210L, 300L)
      .unionByName(copyOf(490L, 301L))
      .coalesce(1).write.mode("append").parquet(s"$inputDir/part2")

    val m = DedupIngest.ingestAvailable(spark, s"$inputDir/*", indexDir, dedupDir, cfg,
      maxFilesPerTrigger = 1)

    // ground truth: rebuild over bootstrap ∪ the expected survivors
    val expectedSurvivors = base
      .filter((col("doc_id") >= 200 && col("doc_id") < 250))
      .unionByName(copyOf(490L, 301L))
    val full = s"$root/full"
    IndexBuilder.buildFrom(spark, bootstrapPages.unionByName(expectedSurvivors), full, cfg)
    val mf = Manifest.read(s"$full/manifest.json")
    assert(m.nDocs == mf.nDocs && m.totalLen == mf.totalLen,
      s"survivor set differs: (${m.nDocs},${m.totalLen}) vs rebuild (${mf.nDocs},${mf.totalLen})")
    val dict = IndexReader.load(spark, indexDir).dictionary.collect()
      .map(e => (e.term, e.df, e.cf)).filter(_._2 > 0).toSet
    val dictFull = IndexReader.load(spark, full).dictionary.collect()
      .map(e => (e.term, e.df, e.cf)).filter(_._2 > 0).toSet
    assert(dict == dictFull,
      s"dict diff: ${(dict -- dictFull).take(5)} / ${(dictFull -- dict).take(5)}")
    // the dropped ids never made it in; 301 did
    val docIds = IndexReader.load(spark, indexDir).docstats.collect().map(_.docId).toSet
    assert(!docIds.contains(260L) && !docIds.contains(261L) &&
      !docIds.contains(262L) && !docIds.contains(300L), "a near-dup survived ingest")
    assert(docIds.contains(301L) && docIds.contains(249L), "a fresh doc was wrongly dropped")
    assert(IndexValidator.validate(IndexReader.load(spark, indexDir)).collect().isEmpty)

    // drained-stream re-run: checkpoint + cursor make it a pure no-op
    val after = DedupIngest.ingestAvailable(spark, s"$inputDir/*", indexDir, dedupDir, cfg,
      maxFilesPerTrigger = 1)
    assert(after == m, "drained dedup-ingest re-run modified the index")
    pages.unpersist()
  }

  test("mixing plain and dedup streaming on one index fails loudly (mode marker)") {
    // self-contained: a fresh index dir stamped with the dedup mode
    val indexDir = "/tmp/graft_test_index/stream_dedup_mode"
    graft.queries.IndexCache.deleteRecursively(new java.io.File(indexDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(indexDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$indexDir/_ingest_mode"), "dedup")
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingIngest.ingestAvailable(
        spark, s"$indexDir/incoming/*", indexDir, cfg)
    }
    assert(e.getMessage.contains("ingest"), s"unexpected error: ${e.getMessage}")
  }

  test("purge: re-crawled deleted content is admissible even after index compaction; " +
    "without purge the stale signature would veto it") {
    import spark.implicits._
    def setup(root: String, doPurge: Boolean): Long = {
      graft.queries.IndexCache.deleteRecursively(new java.io.File(root))
      val indexDir = s"$root/index"
      val dedupDir = s"$root/dedup"
      val bootstrapPages = Pages.withInjections(spark, sfDir).filter(col("doc_id") < 192)
      IndexBuilder.buildFrom(spark, bootstrapPages, indexDir, cfg)
      DedupIngest.bootstrap(spark, bootstrapPages, dedupDir, cfg)
      // delete doc 5, then COMPACT (clears the index's own tombstones)
      IndexBuilder.delete(spark, indexDir, Seq(5L))
      if (doPurge) DedupIngest.purge(spark, dedupDir, Seq(5L).toDF("doc_id"))
      IndexBuilder.compact(spark, indexDir)
      // re-crawl of doc 5's content at a fresh id
      DedupIngest.applyBatch(spark, copyOf(5L, 400L), indexDir, dedupDir, cfg, batchId = 1L)
      IndexReader.load(spark, indexDir).docstats.filter(col("docId") === 400L).count()
    }
    assert(setup("/tmp/graft_test_index/stream_dedup_purge", doPurge = true) == 1L,
      "purged content's re-crawl must be admitted")
    assert(setup("/tmp/graft_test_index/stream_dedup_nopurge", doPurge = false) == 0L,
      "fixture: without purge the stale signature should veto the re-crawl " +
        "(this is exactly why purge exists)")
  }

  test("replayed batch id (at-least-once delivery) is a committed no-op for BOTH indexes") {
    val root = "/tmp/graft_test_index/stream_dedup_replay"
    graft.queries.IndexCache.deleteRecursively(new java.io.File(root))
    val indexDir = s"$root/index"
    val dedupDir = s"$root/dedup"
    val pages = Pages.withInjections(spark, sfDir)
    val bootstrapPages = pages.filter(col("doc_id") < 192)
    IndexBuilder.buildFrom(spark, bootstrapPages, indexDir, cfg)
    DedupIngest.bootstrap(spark, bootstrapPages, dedupDir, cfg)
    val batch = Pages.base(spark, sfDir)
      .filter(col("doc_id") >= 200 && col("doc_id") < 230)
      .unionByName(copyOf(5L, 290L))
    val m1 = DedupIngest.applyBatch(spark, batch, indexDir, dedupDir, cfg, batchId = 3L)
    assert(m1.lastBatchId == 3L)
    val bandsBefore = spark.read.parquet(s"$dedupDir/bands").count()
    val m2 = DedupIngest.applyBatch(spark, batch, indexDir, dedupDir, cfg, batchId = 3L)
    assert(m2 == m1, "replayed batch changed the manifest")
    assert(spark.read.parquet(s"$dedupDir/bands").count() == bandsBefore,
      "replayed batch grew the dedup index")
  }
}
