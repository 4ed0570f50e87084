package graft

import graft.corpus.Pages
import graft.index.{IndexBuilder, IndexConfig, IndexValidator, Manifest, Store}
import graft.query.{IndexReader, Wand}
import graft.queries.{IndexCache, QuerySet}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** LSM maintenance policy ([[IndexBuilder.maintain]]): the segment count is
  * bounded by size-tiered adjacent merges, each a slice-local compactRange —
  * content, docstats and WAND results must be IDENTICAL to a fresh build,
  * untouched segments' files must stay physically untouched, and the verb
  * must be a pure no-op when the index is already within budget. */
class MaintainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  // multi-bucket geometry: docIds < 480 span buckets 0..7 at range 64
  private def cfg = IndexConfig(blockSize = 16, bucketRange = 64, nChunks = 2,
    postingsBuckets = 2)

  /** crawl-shaped fixture: 2-chunk base + two appends = 4 live segments. */
  private def buildCrawl(dir: String): Unit = {
    IndexCache.deleteRecursively(new java.io.File(dir))
    val pages = Pages.withInjections(spark, sfDir)
    IndexBuilder.buildFrom(spark, pages.filter(col("doc_id") < 160), dir, cfg)
    IndexBuilder.append(spark, pages.filter(col("doc_id") >= 160 && col("doc_id") < 320), dir, cfg)
    IndexBuilder.append(spark, pages.filter(col("doc_id") >= 320 && col("doc_id") < 480), dir, cfg)
  }

  private def decodedContent(h: graft.query.IndexHandle): Map[String, Seq[(Long, Int, Seq[Int])]] = {
    val terms = h.dictionary.collect().map(e => e.termId -> e.term).toMap
    h.postings.collect()
      .flatMap { b =>
        val ids = graft.codec.VByte.decodeDocIds(b.docIdGaps)
        val tfs = graft.codec.VByte.decodeInts(b.tfs)
        val poss = graft.codec.VByte.decodePositions(b.positions, tfs)
        ids.indices.map(j => (terms(b.termId), ids(j), tfs(j), poss(j).toSeq))
      }
      .groupBy(_._1)
      .map { case (t, rows) => t -> rows.sortBy(_._2).map(r => (r._2, r._3, r._4)).toSeq }
  }

  /** relative path → size under a segment dir (the byte-identity probe). */
  private def fileSizes(root: String): Map[String, Long] = {
    val base = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(base)) Map.empty
    else {
      val out = scala.collection.mutable.Map.empty[String, Long]
      java.nio.file.Files.walk(base).forEach { p =>
        if (java.nio.file.Files.isRegularFile(p))
          out(base.relativize(p).toString) = java.nio.file.Files.size(p)
      }
      out.toMap
    }
  }

  private lazy val freshHandle = {
    val d = "/tmp/graft_maintain_spec/fresh"
    IndexCache.deleteRecursively(new java.io.File(d))
    IndexBuilder.buildFrom(spark,
      Pages.withInjections(spark, sfDir).filter(col("doc_id") < 480), d, cfg)
    IndexReader.load(spark, d)
  }

  test("partial maintain folds only the cheapest run; other segments' files untouched") {
    val dir = "/tmp/graft_maintain_spec/partial"
    buildCrawl(dir)
    val before = Manifest.read(s"$dir/manifest.json")
    assert(before.segments.length == 4, s"fixture: ${before.segments}")
    val sizesBefore = before.segments
      .map(s => s.name -> fileSizes(IndexBuilder.segmentDir(dir, s))).toMap

    val after = IndexBuilder.maintain(spark, dir, maxSegments = 3, fanIn = 2)
    assert(after.segments.length <= 3 && after.segments.length < before.segments.length)
    // segments surviving the merge are byte-identical on disk
    val survivors = after.segments.toSet.intersect(before.segments.toSet)
    assert(survivors.nonEmpty, "a partial maintain must leave some segment untouched")
    survivors.foreach { s =>
      assert(fileSizes(IndexBuilder.segmentDir(dir, s)) == sizesBefore(s.name),
        s"segment ${s.name} files changed across an unrelated merge")
    }
    // still a snapshot commit: id advanced, operation recorded
    assert(after.snapshotId > before.snapshotId && after.operation == "compact")
  }

  test("maintain to one segment == fresh build: content, docstats, WAND, validator") {
    val dir = "/tmp/graft_maintain_spec/full"
    buildCrawl(dir)
    val m = IndexBuilder.maintain(spark, dir, maxSegments = 1)
    assert(m.segments.length == 1, s"got ${m.segments}")
    val h = IndexReader.load(spark, dir)
    assert(decodedContent(h) == decodedContent(freshHandle), "postings content drifted")
    val gotStats = h.docstats.collect().map(s => (s.docId, s.docLen)).sortBy(_._1).toSeq
    val wantStats = freshHandle.docstats.collect().map(s => (s.docId, s.docLen)).sortBy(_._1).toSeq
    assert(gotStats == wantStats, "docstats drifted")
    assert(IndexValidator.validate(h).count() == 0)
    // EXACT double equality vs the from-definition scorer under the
    // maintained index's OWN dictionary (termIds are append-order-dependent
    // by design, so a fresh build sums impacts in a different order — the
    // last-ulp drift is the dictionary's, not the merge's; content equality
    // above already proves payload identity)
    val cleaned = Pages.cleaned(Pages.withInjections(spark, sfDir))
      .filter(col("doc_id") < 480)
    val td = IndexBuilder.termDocs(cleaned, graft.tokenize.Tokenizers.default)
    val oracle = graft.query.OracleScorer.build(td, h.dictMap, m.nDocs, m.avgdl)
    val got = Wand.topK(h, QuerySet.queries, 10)
    QuerySet.queries.foreach { q =>
      val want = oracle.topK(q.terms, 10)
      assert(got(q.queryId).toSeq == want.toSeq, s"q=${q.terms}")
    }

    // within budget → pure no-op: same manifest, no snapshot churn
    val again = IndexBuilder.maintain(spark, dir, maxSegments = 1)
    assert(again == m, "maintain within budget must be a no-op")
  }

  test("maintain drops in-span tombstones (merge + compaction compose)") {
    val dir = "/tmp/graft_maintain_spec/tombed"
    buildCrawl(dir)
    import spark.implicits._
    val ids = IndexReader.load(spark, dir).docstats
      .filter(col("docId") >= 200 && col("docId") < 250).map(_.docId).collect().toSeq
    assert(ids.nonEmpty)
    IndexBuilder.delete(spark, dir, ids)
    val m = IndexBuilder.maintain(spark, dir, maxSegments = 1)
    assert(m.segments.length == 1)
    assert(m.tombVersion == -1, "full-span maintain must clear tombstones")
    // content == fresh build minus the deleted docs
    val reb = "/tmp/graft_maintain_spec/tombed_rebuilt"
    IndexCache.deleteRecursively(new java.io.File(reb))
    IndexBuilder.buildFrom(spark,
      Pages.withInjections(spark, sfDir)
        .filter(col("doc_id") < 480 && !col("doc_id").cast("long").isin(ids.map(Long.box): _*)),
      reb, cfg)
    val h = IndexReader.load(spark, dir)
    val hr = IndexReader.load(spark, reb)
    assert(decodedContent(h) == decodedContent(hr))
    assert(IndexValidator.validate(h).count() == 0)
  }

  test("Store.sizeOf sums segment bytes (the policy's metadata-only probe)") {
    val dir = "/tmp/graft_maintain_spec/partial" // built by the first test
    val m = Manifest.read(s"$dir/manifest.json")
    m.segments.foreach { s =>
      val d = IndexBuilder.segmentDir(dir, s)
      assert(Store.sizeOf(d) == fileSizes(d).values.sum, s"sizeOf mismatch for ${s.name}")
    }
    assert(Store.sizeOf(s"$dir/definitely_absent") == 0L)
  }
}
