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
  *  3. drops batch docs whose estimate vs any LIVE committed corpus doc —
  *     or vs a smaller-id cross-surviving doc of the same batch — reaches
  *     the threshold (tombstone-deleted docs are EXCLUDED from the probe:
  *     a re-crawl of deleted content must be admissible again);
  *  4. appends the survivors (RAW rows — append itself cleans and counts
  *     corrupt rows, exactly like plain ingest) to the inverted index, and
  *     the survivors' bands/signatures to the dedup index under
  *     overwrite-idempotent `part=b<batchId>` partitions.
  *
  * Exactly-once rides the manifest cursor: a batchId at or below
  * `lastBatchId` is skipped outright; a crash mid-batch replays
  * derive-and-overwrite writes bit-identically; the probe reads only
  * COMMITTED corpus rows (`doc_id <= base maxDocId`), so a crashed
  * attempt's own partial partitions can never make a batch match itself;
  * and the append-order precondition is validated BEFORE any side effect.
  * Because plain [[StreamingIngest]] and this path each run their own
  * checkpoint (independent batchId sequences) over ONE shared cursor,
  * mixing them on one index would silently skip batches — an
  * `_ingest_mode` marker makes that a loud error instead.
  *
  * Docs too short to shingle (< n-gram width) carry no signature and are
  * never near-dup candidates — they always survive (documented; exact
  * dedup of trivial docs belongs to the md5 path). */
object DedupIngest {

  final val DefaultThreshold = 0.9

  private def bandsDir(dedupDir: String) = s"$dedupDir/bands"
  private def sigsDir(dedupDir: String) = s"$dedupDir/sigs"

  /** One streaming lineage per index: the checkpointed batchId sequence is
    * only monotone WITHIN one ingest mode, so the first streaming writer
    * stamps its mode and every later one must match. */
  private[streaming] def claimMode(indexDir: String, mode: String): Unit = {
    val p = java.nio.file.Paths.get(s"$indexDir/_ingest_mode")
    if (java.nio.file.Files.exists(p)) {
      val existing = java.nio.file.Files.readString(p).trim
      require(existing == mode,
        s"index at $indexDir already streams via '$existing' ingest; mixing with '$mode' " +
          "would interleave two independent batchId sequences over one cursor and silently " +
          "skip batches — use one streaming mode per index")
    } else java.nio.file.Files.writeString(p, mode)
  }

  /** Write one partition of the dedup index (bands via the SAME writer as
    * the batch-side LSH index; signatures are doc-keyed and tiny). */
  private def writeParts(spark: SparkSession,
      sigs: org.apache.spark.sql.Dataset[graft.pipeline.DocSignature],
      dedupDir: String, part: String, buckets: Int): Unit = {
    import spark.implicits._
    Dedup.writeLshIndex(sigs, s"${bandsDir(dedupDir)}/part=$part", buckets)
    sigs.filter(_.nShingles > 0).map(s => (s.docId, s.sig)).toDF("doc_id", "sig")
      .repartition(buckets, col("doc_id"))
      .write.mode("overwrite").parquet(s"${sigsDir(dedupDir)}/part=$part")
  }

  /** Bootstrap the dedup index for an existing corpus — cleaned with the
    * SAME config (incl. the language allowlist) as the index build, so
    * both indexes describe the same document set. */
  def bootstrap(spark: SparkSession, corpusPages: DataFrame, dedupDir: String,
      cfg: IndexConfig = IndexConfig(), buckets: Int = 8): Unit = {
    val cleaned = Pages.cleaned(corpusPages, cfg.langs)
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
    try {
      // append's docId-order precondition, validated BEFORE any side
      // effect (append would also catch it, but only after the dedup-index
      // partition write — no orphan partitions on misordered batches)
      val minNew = cleaned.agg(coalesce(min(col("doc_id").cast("long")), lit(Long.MaxValue)))
        .head().getLong(0)
      require(minNew > old.maxDocId,
        s"dedup-ingest batch docIds must exceed maxDocId=${old.maxDocId}, got min=$minNew " +
          "(no side effects were taken)")

      val bands = Dedup.bandRelation(sigs).localCheckpoint(true) // self-join + survivors
      val bSigs = sigs.filter(_.nShingles > 0)
        .map(s => (s.docId, s.sig)).toDF("batch_doc", "b_sig")
        .localCheckpoint(true) // both estimator joins

      // batch vs LIVE committed corpus: the maxDocId guard excludes a
      // crashed attempt's own part=b<batchId> partitions on replay, and
      // tombstone-deleted docs are excluded so re-crawled content is
      // admissible again
      val tombs: Option[DataFrame] =
        if (old.tombVersion < 0) None
        else Some(spark.read
          .parquet(IndexBuilder.tombDirFor(indexDir, old.tombVersion)).toDF("doc_id"))
      def liveCommitted(df: DataFrame): DataFrame = {
        val committed = df.filter(col("doc_id") <= old.maxDocId)
        tombs.fold(committed)(t => committed.join(t, Seq("doc_id"), "left_anti"))
      }
      val corpusSigs = liveCommitted(spark.read.parquet(sigsDir(dedupDir)))
        .select(col("doc_id").as("corpus_doc"), col("sig").as("c_sig"))
      val crossDups = Dedup
        .probeLshIndex(spark, bandsDir(dedupDir), sigs, liveCommitted)
        .join(bSigs, "batch_doc")
        .join(corpusSigs, "corpus_doc")
        .filter(estCol(col("b_sig"), col("c_sig")) >= threshold)
        .select("batch_doc")
        .localCheckpoint(true) // cross-survivor filter + final dup union

      // within-batch, among CROSS-SURVIVORS only (a doc must never be
      // dropped on account of a keeper that itself was dropped): any doc
      // near a smaller-id cross-surviving doc drops (keep-min chains —
      // deterministic, the minimum of a chain always survives)
      val survBands = bands
        .join(crossDups.withColumnRenamed("batch_doc", "doc_id"), Seq("doc_id"), "left_anti")
      val selfDups = survBands.as("l").join(survBands.as("r"),
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
        .localCheckpoint(true) // survivors filter + survivor-sigs semi-join
      // survivors as RAW batch rows: append cleans them itself (ONE
      // cleaning pass on the commit path) and counts corrupt rows into
      // skippedCorrupt exactly like plain ingest / a full rebuild
      val survivors = batch
        .join(dups.select(col("doc_id").cast(batch.schema("doc_id").dataType)),
          Seq("doc_id"), "left_anti")

      // dedup-index growth FIRST (overwrite-idempotent partition), the
      // inverted-index append LAST (it commits the manifest cursor)
      val survSigs = sigs.toDF()
        .join(dups.select(col("doc_id").cast("long").as("docId")), Seq("docId"), "left_anti")
        .as[graft.pipeline.DocSignature]
      writeParts(spark, survSigs, dedupDir, s"b$batchId", buckets)
      IndexBuilder.append(spark, survivors, indexDir, cfg, Some(batchId))
    } finally {
      sigs.unpersist(); cleaned.unpersist(); ()
    }
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
    claimMode(indexDir, "dedup")
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
