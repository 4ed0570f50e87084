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
  * dedup of trivial docs belongs to the md5 path).
  *
  * SEMANTICS NOTE (online vs global dedup): admission is the standard
  * ONLINE policy — dedup against committed docs, then keep-min among the
  * batch's cross-survivors. A doc whose only near-dup neighbor was itself
  * cross-dropped survives here, whereas a GLOBAL rebuild through the
  * connected-components keep-min (`q_dedup_groups`) would drop it:
  * streaming admission is inherently arrival-order-dependent, and the
  * online policy guarantees only that (a) the minimum of any within-batch
  * chain survives and (b) nothing similar to a live committed doc enters.
  *
  * DELETE lifecycle: the dedup index keeps its OWN tombstone table
  * (`dedupDir/tombstones`), written by [[purge]] — deleting docs from a
  * dedup-ingested corpus should call `IndexBuilder.delete*` AND `purge`
  * together, so re-crawled content stays admissible even after the
  * inverted index's compaction clears ITS tombstones. The probe also
  * honors the inverted index's live tombstones as a safety net. */
object DedupIngest {

  final val DefaultThreshold = 0.9

  private def bandsDir(dedupDir: String) = s"$dedupDir/bands"
  private def sigsDir(dedupDir: String) = s"$dedupDir/sigs"
  private def tombsPath(dedupDir: String) = s"$dedupDir/tombstones"

  /** Remove docs from the dedup index's PROBE surface (their bands/sigs
    * rows stay physical, like index tombstones pre-compaction): the
    * delete-side companion of `IndexBuilder.delete`. Idempotent
    * (overwrite of the union). */
  def purge(spark: SparkSession, dedupDir: String, ids: DataFrame): Unit = {
    val fresh = ids.select(col(ids.columns.head).cast("long").as("doc_id")).distinct()
    val p = java.nio.file.Paths.get(tombsPath(dedupDir))
    val merged =
      if (java.nio.file.Files.exists(p))
        spark.read.parquet(tombsPath(dedupDir)).unionByName(fresh).distinct()
      else fresh
    // two-phase overwrite: the source is also the destination
    val tmp = s"${tombsPath(dedupDir)}_next"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(tombsPath(dedupDir))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(tmp))
  }

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

  /** Bootstrap the dedup index for an existing corpus — `cfg` is REQUIRED
    * and must be the index build's config (incl. the language allowlist),
    * so both indexes describe the same document set. */
  def bootstrap(spark: SparkSession, corpusPages: DataFrame, dedupDir: String,
      cfg: IndexConfig, buckets: Int = 8): Unit = {
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
    // batch-mode callers advance the same cursor as the streams — stamp
    // the mode here too, so direct applyBatch use can never interleave
    // with a plain stream's independent batchId sequence
    claimMode(indexDir, "dedup")
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
      // crashed attempt's own part=b<batchId> partitions on replay;
      // deleted docs are excluded via the dedup index's OWN tombstones
      // (purge — survives index compaction) plus the inverted index's
      // live tombstones as a safety net, so re-crawled deleted content is
      // admissible again
      val tombTables: Seq[DataFrame] = Seq(
        if (old.tombVersion < 0) None
        else Some(spark.read
          .parquet(IndexBuilder.tombDirFor(indexDir, old.tombVersion)).toDF("doc_id")),
        if (!java.nio.file.Files.exists(java.nio.file.Paths.get(tombsPath(dedupDir)))) None
        else Some(spark.read.parquet(tombsPath(dedupDir)))
      ).flatten
      def liveCommitted(df: DataFrame): DataFrame = {
        val committed = df.filter(col("doc_id") <= old.maxDocId)
        tombTables.foldLeft(committed)((d, t) => d.join(t, Seq("doc_id"), "left_anti"))
      }
      val corpusSigs = liveCommitted(spark.read.parquet(sigsDir(dedupDir)))
        .select(col("doc_id").as("corpus_doc"), col("sig").as("c_sig"))
      val crossDups = Dedup
        .probeLshIndexBands(spark, bandsDir(dedupDir), bands, liveCommitted)
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
      // survivors from the CLEANED batch (the rows the dedup decisions
      // were actually made on — subtracting ids from the raw batch could
      // resurrect a same-url sibling that was never probed), PLUS the raw
      // corrupt rows so append's skippedCorrupt accounting matches plain
      // ingest / a full rebuild (append re-drops them, counted)
      val survivors = cleaned
        .join(dups.select(col("doc_id").cast(cleaned.schema("doc_id").dataType)),
          Seq("doc_id"), "left_anti")
        .unionByName(batch.filter(col("text").isNull).select(cleaned.columns.map(col): _*))

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
