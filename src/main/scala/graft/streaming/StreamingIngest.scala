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
  * This is the streaming face of the reference's re-runnable
  * `tokenize_dataset` over a grown corpus (midi_tokenizer.py:3084-3198):
  * the checkpoint guarantees each input file is appended exactly once
  * across restarts, the same role as the hidden-hash idempotent skip
  * (utils/split.py:98-104). Batches must arrive in ascending-docId order
  * (the append contract); the file source's discovery order provides that
  * for chronologically landed files. */
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
      maxFilesPerTrigger: Int = 1
  ): IndexManifest = {
    val stream = spark.readStream
      .schema(pagesSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(inputDir)
    val q = stream.writeStream
      .queryName(s"graft-ingest-${System.nanoTime()}")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", s"$indexDir/_stream_checkpoint")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { IndexBuilder.append(spark, batch, indexDir, cfg); () }
      }
      .start()
    q.awaitTermination()
    Manifest.read(s"$indexDir/manifest.json")
  }
}
