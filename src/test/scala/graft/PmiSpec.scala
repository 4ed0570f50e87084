package graft

import graft.queries.PipelineQueries
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q_pmi_pairs' fanout bound: the min-df filter must be applied BELOW the
  * pair self-join, so a pathological document with thousands of hapax
  * terms contributes ZERO join fanout instead of a quadratic explosion. */
class PmiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("min-df cap bounds per-doc pair fanout (long-doc fixture)") {
    import spark.implicits._
    // doc 0: 200 hapax terms (df = 1 each); docs 1..5: 4 shared terms
    val hapax = (0 until 200).map(i => (0L, f"rare$i%03d"))
    val common = (1L to 5L).flatMap(d => Seq("alpha", "beta", "gamma", "delta").map(t => (d, t)))
    val toks = (hapax ++ common).toDF("doc_id", "term")
    val dfs = toks.groupBy("term").agg(count(lit(1)).as("df"))

    val uncapped = PipelineQueries.pmiPairs(toks, dfs, minDf = 1L).agg(sum("n_ab")).head().getLong(0)
    val capped = PipelineQueries.pmiPairs(toks, dfs, minDf = 3L)
    val cappedPairs = capped.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))

    // uncapped: the hapax doc alone emits C(200,2) = 19900 co-occurrences
    assert(uncapped >= 19900L + 30L, s"uncapped fanout should explode, got $uncapped")
    // capped: only the 4 common terms (df = 5) survive → C(4,2) = 6 pairs,
    // each co-occurring in 5 docs
    assert(cappedPairs.length == 6, s"expected 6 pairs, got ${cappedPairs.toSeq}")
    assert(cappedPairs.forall(_._3 == 5L), s"each pair must co-occur in 5 docs: ${cappedPairs.toSeq}")
    assert(!cappedPairs.exists(p => p._1.startsWith("rare") || p._2.startsWith("rare")),
      "a hapax term leaked through the min-df filter")
  }
}
