package graft

import graft.corpus.Pages
import graft.queries.{IndexQueries, QuerySet}
import graft.tokenize.Tokenizers
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dirichlet query-likelihood scorer: the index-backed factored computation
  * (present-term deltas + per-query constant + length normalizer) must be
  * rank- and score-identical to a direct from-the-definition recomputation
  * over the raw corpus: score = sum_t ln((tf + mu*p_t)/(dl + mu)). */
class QlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("q_ql_topk == brute-force Dirichlet QL from the raw corpus") {
    import spark.implicits._
    val got = IndexQueries.queries("q_ql_topk")(spark, sfDir)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    val tok = Tokenizers.default
    val docs = Pages.cleaned(Pages.withInjections(spark, sfDir))
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .collect().map { case (id, t) => id -> tok.terms(t) }
    val tf: Map[(Long, String), Int] =
      docs.flatMap { case (id, ts) => ts.groupBy(identity).map { case (t, o) => ((id, t), o.length) } }.toMap
    val cf: Map[String, Long] =
      docs.flatMap(_._2).groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val total = docs.map(_._2.length.toLong).sum
    val dl = docs.map { case (id, ts) => id -> ts.length }.toMap
    val mu = IndexQueries.QlMu

    def r(x: Double, s: Int) = BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = QuerySet.queries.flatMap { q =>
      val terms = q.terms.distinct.filter(cf.contains)
      if (terms.isEmpty) Seq.empty
      else {
        val cands = docs.collect { case (id, ts) if terms.exists(ts.contains) => id }
        cands.map { id =>
          val score = terms.map { t =>
            val p = mu * (cf(t).toDouble / total.toDouble)
            math.log((tf.getOrElse((id, t), 0).toDouble + p) / (dl(id).toDouble + mu))
          }.sum
          (id, score)
        }.sortBy { case (id, s) => (-r(s, 6), id) }
          .take(10).zipWithIndex
          .map { case ((id, s), i) => (q.queryId, i + 1, id, s) }
      }
    }
    assert(got.map(x => (x._1, x._2, x._3)).toSeq == want.map(x => (x._1, x._2, x._3)),
      s"rank order differs: got=${got.take(5).toSeq} want=${want.take(5)}")
    got.zip(want).foreach { case ((qid, rk, d, s), (_, _, _, ws)) =>
      assert(math.abs(s - ws) < 5e-4, s"query $qid rank $rk doc $d: score $s vs brute $ws")
    }
    assert(!got.exists(_._1 == 5), "all-OOV query must return nothing")
  }
}
