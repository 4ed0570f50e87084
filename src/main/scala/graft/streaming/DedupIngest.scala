package graft.streaming

import graft.corpus.Pages
import graft.index.{IndexBuilder, IndexConfig, IndexManifest, Manifest}
import graft.pipeline.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming ingest with INLINE dedup — the production crawl loop. Each
  * micro-batch:
  *
  *  1. signs itself (one map pass: shingles → MinHash signature + bands);
  *  2. probes the PERSISTED dedup index (bands + signatures — the corpus
  *     is never re-read, never re-signed, and no corpus text is needed:
  *     similarity is the standard signature ESTIMATOR, the matching-
  *     minhash fraction, an unbiased estimate of Jaccard);
  *  3. drops batch docs whose estimate vs any committed corpus doc — or
  *     vs a SMALLER-id doc of the same batch — reaches the threshold;
  *  4. appends the survivors to the inverted index, and the survivors'
  *     bands/signatures to the dedup index under overwrite-idempotent
  *     `part=b<batchId>` partitions.
  *
  * Exactly-once rides the SAME manifest cursor as [[StreamingIngest]]:
  * a batchId at or below `lastBatchId` is skipped outright; a crash
  * mid-batch replays derive-and-overwrite writes bit-identically; and the
  * probe reads only COMMITTED corpus rows (`doc_id <= base maxDocId`), so
  * a crashed attempt's own partial partitions can never make a batch
  * match itself on replay.
  *
  * Docs too short to shingle (< n-gram width) carry no signature and are
  * never near-dup candidates — they always survive (documented; exact
  * dedup of trivial docs belongs to the md5 path). */
object DedupIngest {

  final val DefaultThreshold = 0.9

  private def bandsDir(dedupDir: String) = s"$dedupDir/bands"
  private def sigsDir(dedupDir: String) = s"$dedupDir/sigs"

  /** Write one partition of the dedup index (bands clustered by (band,
    * key) for probe-join pruning; signatures are doc-keyed and tiny). */
  private def writeParts(spark: SparkSession, sigs: org.apache.spark.sql.Dataset[graft.pipeline.DocSignature],
      dedupDir: String, part: String, buckets: Int): Unit = {
    import spark.implicits._
    Dedup.bandRelation(sigs)
      .repartition(buckets, col("band"), col("key"))
      .sortWithinPartitions(col("band"), col("key"))
      .write.mode("overwrite").parquet(s"${bandsDir(dedupDir)}/part=$part")
    sigs.filter(_.nShingles > 0).map(s => (s.docId, s.sig)).toDF("doc_id", "sig")
      .repartition(buckets, col("doc_id"))
      .write.mode("overwrite").parquet(s"${sigsDir(dedupDir)}/part=$part")
  }

  /** Bootstrap the dedup index for an existing corpus (pages are cleaned
    * with the same stage as the index build, so both indexes describe the
    * same document set). */
  def bootstrap(spark: SparkSession, corpusPages: DataFrame, dedupDir: String,
      buckets: Int = 8): Unit = {
    val cleaned = Pages.cleaned(corpusPages)
    writeParts(spark,
      Dedup.signaturesOf(cleaned.select(col("doc_id"), col("text"))),
      dedupDir, "base", buckets)
  }

  /** Signature-estimated Jaccard: fraction of agreeing minhash slots. */
  private def estCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    size(filter(zip_with(a, b, (x, y) => x === y), x => x)).cast("double") /
      lit(Dedup.NumHashes.toDouble)

  /** One micro-batch, idempotently: dedup → append → grow the dedup index.
    * Also the batch-mode entry point (streaming wraps it in foreachBatch). */
  def applyBatch(spark: SparkSession, batch: DataFrame, indexDir: String, dedupDir: String,
      cfg: IndexConfig, batchId: Long, threshold: Double = DefaultThreshold,
      buckets: Int = 8): IndexManifest = {
    import spark.implicits._
    val old = Manifest.read(s"$indexDir/manifest.json")
    if (batchId <= old.lastBatchId) return old // committed-batch replay: no-op

    val cleaned = Pages.cleaned(batch, cfg.langs).persist()
    val sigs = Dedup.signaturesOf(cleaned.select(col("doc_id"), col("text"))).persist()
    val bands = Dedup.bandRelation(sigs).localCheckpoint(true) // probe + self-join + survivors
    val bSigs = sigs.filter(_.nShingles > 0)
      .map(s => (s.docId, s.sig)).toDF("batch_doc", "b_sig")
      .localCheckpoint(true) // both estimator joins

    // COMMITTED corpus rows only: the maxDocId guard excludes a crashed
    // attempt's own part=b<batchId> partitions on replay
    val corpusBands = spark.read.parquet(bandsDir(dedupDir))
      .filter(col("doc_id") <= old.maxDocId)
    val corpusSigs = spark.read.parquet(sigsDir(dedupDir))
      .filter(col("doc_id") <= old.maxDocId)
      .select(col("doc_id").as("corpus_doc"), col("sig").as("c_sig"))

    // batch vs corpus: LSH candidates → signature-estimated Jaccard
    val crossDups = bands.as("b").join(corpusBands.as("c"),
        col("b.band") === col("c.band") && col("b.key") === col("c.key"))
      .select(col("b.doc_id").as("batch_doc"), col("c.doc_id").as("corpus_doc"))
      .distinct()
      .join(bSigs, "batch_doc")
      .join(corpusSigs, "corpus_doc")
      .filter(estCol(col("b_sig"), col("c_sig")) >= threshold)
      .select("batch_doc")

    // within-batch: any doc near a SMALLER-id batch doc drops (keep-min,
    // deterministic; chains dedup aggressively like every keep-min pass)
    val selfDups = bands.as("l").join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("keep_doc"), col("r.doc_id").as("batch_doc"))
      .distinct()
      .join(bSigs.select(col("batch_doc").as("keep_doc"), col("b_sig").as("k_sig")), "keep_doc")
      .join(bSigs, "batch_doc")
      .filter(estCol(col("k_sig"), col("b_sig")) >= threshold)
      .select("batch_doc")

    val dups = crossDups.unionByName(selfDups).distinct()
      .withColumnRenamed("batch_doc", "doc_id")
    val survivors = cleaned.join(dups, Seq("doc_id"), "left_anti")

    // dedup-index growth FIRST (overwrite-idempotent partition), the
    // inverted-index append LAST (it commits the manifest cursor)
    val survSigs = sigs.toDF()
      .join(survivors.select(col("doc_id").cast("long").as("docId")), Seq("docId"), "left_semi")
      .as[graft.pipeline.DocSignature]
    writeParts(spark, survSigs, dedupDir, s"b$batchId", buckets)
    val m = IndexBuilder.append(spark, survivors, indexDir, cfg, Some(batchId))
    sigs.unpersist(); cleaned.unpersist()
    m
  }

  /** Drain all available input files: one dedup+append per micro-batch. */
  def ingestAvailable(
      spark: SparkSession,
      inputDir: String,
      indexDir: String,
      dedupDir: String,
      cfg: IndexConfig,
      threshold: Double = DefaultThreshold,
      maxFilesPerTrigger: Int = 1024
  ): IndexManifest = {
    val stream = spark.readStream
      .schema(StreamingIngest.pagesSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    val q = stream.writeStream
      .queryName(s"graft-dedup-ingest-${System.nanoTime()}")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$indexDir/_dedup_stream_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          applyBatch(spark, batch, indexDir, dedupDir, cfg, batchId, threshold); ()
        }
      }
      .start()
    q.awaitTermination()
    Manifest.read(s"$indexDir/manifest.json")
  }
}
