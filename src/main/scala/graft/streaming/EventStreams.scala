package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Streaming-shaped operators over the events table.
  *
  * The reference is strictly batch (SURVEY.md §2.9) — these cover the
  * engine-side streaming surface: tumbling-window aggregation via
  * Structured Streaming (verified equal to the batch plan in
  * StreamingSpec) and gap-based sessionization (batch, window-function
  * form; the micro-batch form would use flatMapGroupsWithState with an
  * event-time timeout at production scale). */
object EventStreams {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)
  ))

  /** Tumbling 1-hour window agg — batch form. */
  def hourlyAggBatch(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total"))

  /** Same plan as a Structured Streaming query over a file source;
    * returns the in-memory result table after processing all available
    * input (Trigger.AvailableNow semantics via processAllAvailable). */
  def hourlyAggStreaming(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val stream = spark.readStream
      .schema(eventSchema)
      .parquet(dir)
    val agg = hourlyAggBatch(stream)
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }

  /** Gap-based sessionization: a new session starts when the gap from the
    * user's previous event exceeds `gapMinutes`. session_id = running count
    * of session starts (deterministic: ties broken by event_id). */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes.toLong * 60L * 1000000L
    events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(w) > gapUs || lag(col("us"), 1).over(w).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("user_id"), col("session_id"))
  }
}
