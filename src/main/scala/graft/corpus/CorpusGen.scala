package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for throughput benchmarks: replicate the
  * driver-generated documents table `factor` times with offset doc_ids
  * (text unchanged → same Zipf term distribution, same head-term skew;
  * deterministic — the data-augmentation analog, data_augmentation.py:27-183).
  * Test/bench inputs always derive from /root/testdata — no external data. */
object CorpusGen {

  def scaledDocuments(spark: SparkSession, sfDir: String, factor: Int): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    if (factor <= 1) docs
    else {
      // parallelism comes from the range side (defaultParallelism partitions);
      // the small base table is broadcast — a single-file parquet input would
      // otherwise serialize the whole generation map side into one task
      val copies = spark.range(factor.toLong).withColumnRenamed("id", "copy")
        .repartition(spark.sparkContext.defaultParallelism)
      copies.join(broadcast(docs))
        .withColumn("doc_id", col("doc_id") + col("copy") * n)
        .drop("copy")
    }
  }

  /** Scaled pages table (input_hint shape) for the index-build benchmark. */
  def scaledPages(spark: SparkSession, sfDir: String, factor: Int): DataFrame = {
    val docs = scaledDocuments(spark, sfDir, factor)
    docs.select(
      col("doc_id"),
      concat(lit("https://example.org/42/"), col("doc_id")).as("url"),
      timestamp_seconds(lit(Pages.EpochSeconds) + col("doc_id")).as("warc_ts"),
      encode(coalesce(col("text"), lit("")), "UTF-8").as("html"),
      col("text"),
      col("lang"))
  }
}
