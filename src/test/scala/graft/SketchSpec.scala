package graft

import graft.pipeline.Sketches
import graft.tokenize.Tokenizers
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Count-Min sketch guarantees on the real corpus: never undercounts any
  * term, the grid is bounded by Depth×Width, and construction is
  * deterministic. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tokens = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("text")).as[String]
      .flatMap(Tokenizers.default.terms(_))
      .toDF("term")
  }

  test("estimate >= true count for EVERY corpus term; grid bounded; deterministic") {
    import spark.implicits._
    val toks = tokens.localCheckpoint(true)
    val sketch = Sketches.countMin(toks, col("term")).localCheckpoint(true)
    assert(sketch.count() <= Sketches.Depth * Sketches.Width)
    // per-row counter sums must each equal the total token count (each row
    // is a partition of the stream)
    val rowSums = sketch.groupBy("row").agg(sum("cnt").as("s")).collect()
      .map(r => r.getLong(1)).toSet
    val total = toks.count()
    assert(rowSums == Set(total), s"row sums $rowSums != total $total")
    val vocab = toks.distinct().as[String].collect().toSeq
    val est = Sketches.estimate(spark, sketch, vocab)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = toks.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (t, cf) =>
      assert(est(t) >= cf, s"CMS undercounted '$t': ${est(t)} < $cf")
    }
    // determinism: rebuild yields the identical grid
    val again = Sketches.countMin(toks, col("term")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val first = sketch.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == first)
  }

  test("unseen terms can only collide upward, never error downward (>= 0)") {
    import spark.implicits._
    val sketch = Sketches.countMin(tokens, col("term"))
    val est = Sketches.estimate(spark, sketch, Seq("zzzoov", "qqq_never_seen"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.values.foreach(v => assert(v >= 0L))
  }
}
