package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a term stream — the "novel sketch" operator class:
  * a (Depth × Width) grid of counters where row r counts terms by
  * `rollingHash("r<r>:" || term) mod Width`, and a point estimate is the
  * MIN over rows of the term's counters. Classic guarantees: estimates
  * never undercount (every counter the term maps to received all its
  * occurrences), and overcount is bounded by collisions.
  *
  * Everything is a deterministic integer function of the data (fixed seeds
  * via the per-row prefix, the codegen'd rolling-hash expression), so BOTH
  * the sketch table and the estimates are hash-asserted against a DuckDB
  * SQL replica — unusual for a sketch, and exactly why this construction
  * was chosen over seeded-random hashing.
  *
  * Scale shape: building the sketch is one map (explode ×Depth) + one
  * partial+final hash aggregation into at most Depth·Width cells — the
  * natural distributed-sketch pattern (per-partition partial grids merged
  * by cell-wise sum, which IS what Spark's partial aggregation does here). */
object Sketches {

  final val Depth = 4
  final val Width = 64L

  private def rowsCol: Column = explode(array((0 until Depth).map(lit): _*))

  /** bucket of `term` in row `row`. */
  private def bucket(row: Column, term: Column): Column =
    pmod(TextAnalysis.fingerprint(concat(lit("r"), row.cast("string"), lit(":"), term)), lit(Width))

  /** The sketch table (row, bucket, cnt) over a one-column term relation. */
  def countMin(terms: DataFrame, term: Column): DataFrame =
    terms.select(term.as("term"))
      .select(col("term"), rowsCol.as("row"))
      .withColumn("bucket", bucket(col("row"), col("term")))
      .groupBy("row", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for the given terms: min over rows of the mapped
    * counters (0 for never-seen buckets). */
  def estimate(spark: SparkSession, sketch: DataFrame, terms: Seq[String]): DataFrame = {
    import spark.implicits._
    terms.toDF("term")
      .select(col("term"), rowsCol.as("row"))
      .withColumn("bucket", bucket(col("row"), col("term")))
      .join(sketch, Seq("row", "bucket"), "left_outer")
      .na.fill(0L, Seq("cnt"))
      .groupBy("term")
      .agg(min(col("cnt")).as("cms_estimate"))
  }
}
