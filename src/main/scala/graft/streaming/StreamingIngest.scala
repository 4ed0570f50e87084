package graft.streaming

import graft.index.{IndexBuilder, IndexConfig, IndexManifest, Manifest}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming incremental indexing: a Structured Streaming file source over
  * an arriving-pages directory, each micro-batch folded into the existing
  * index via [[IndexBuilder.append]] (`foreachBatch` + Trigger.AvailableNow
  * — the "process what's there, then stop" shape that maps onto Iceberg
  * incremental scans at production).
  *
  * Exactly-once = checkpoint replay (at-least-once delivery) × idempotent
  * apply: `foreachBatch`'s batchId is threaded into [[IndexBuilder.append]],
  * which (a) skips batches at or below the manifest's committed
  * `lastBatchId` cursor outright, and (b) makes every write of an
  * in-flight batch an overwrite of a destination derived from the base
  * manifest (docstats `part=` partition, dictionary version N+1, postings
  * chunk), committing the manifest last — so a crash at ANY point inside or
  * after a batch replays to identical state, never double-applies df/cf.
  * One stream lineage per index: the checkpoint lives inside the index dir
  * and batchIds are monotone within it.
  *
  * This is the streaming face of the reference's re-runnable
  * `tokenize_dataset` over a grown corpus (midi_tokenizer.py:3084-3198),
  * the same role as the hidden-hash idempotent skip (utils/split.py:98-104).
  * Batches must arrive in ascending-docId order (the append contract); the
  * default maxFilesPerTrigger coalesces many files into one batch, so
  * same-instant files cannot be split across batches in the wrong order —
  * append validates BEFORE any side effect and fails with an actionable
  * message otherwise. */
object StreamingIngest {

  /** input_hint pages schema for the streaming source. */
  val pagesSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)
  ))

  /** Drain all available input files into the index, one append per
    * micro-batch; returns the final manifest. The index at `indexDir` must
    * already exist (bootstrap with a batch [[IndexBuilder.buildFrom]]). */
  def ingestAvailable(
      spark: SparkSession,
      inputDir: String,
      indexDir: String,
      cfg: IndexConfig,
      maxFilesPerTrigger: Int = 1024
  ): IndexManifest = {
    // plain and dedup streaming each run their OWN checkpoint (independent
    // batchId sequences) over the one manifest cursor — mixing them on an
    // index would silently skip batches, so the first writer stamps the
    // mode and any later mismatch fails loudly
    DedupIngest.claimMode(indexDir, "plain")
    val stream = spark.readStream
      .schema(pagesSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    val q = stream.writeStream
      .queryName(s"graft-ingest-${System.nanoTime()}")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$indexDir/_stream_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { IndexBuilder.append(spark, batch, indexDir, cfg, Some(batchId)); () }
      }
      .start()
    q.awaitTermination()
    Manifest.read(s"$indexDir/manifest.json")
  }
}
