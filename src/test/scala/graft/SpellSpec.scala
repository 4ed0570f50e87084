package graft

import graft.queries.{IndexCache, VocabQueries}
import org.scalatest.funsuite.AnyFunSuite

/** SymSpell-style spell correction: the deletion-neighborhood candidate
  * join must return EXACTLY the vocabulary terms within edit distance 1 of
  * each fixture query (completeness of the deletion-key superset + the
  * levenshtein verify), with no UDF in the plan. */
class SpellSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def editDistance(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0)
      dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("q_spell == brute-force levenshtein scan of the vocabulary") {
    val got = VocabQueries.queries("q_spell")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val h = IndexCache.handle(spark, sfDir)
    val vocab = h.dictionary.collect().filter(_.term.nonEmpty)
    val want = (for {
      q <- VocabQueries.SpellQueries
      e <- vocab if editDistance(q, e.term) <= 1
    } yield (q, e.term, e.df)).toSet
    assert(got == want, s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(got.exists(_._1 == "merge"), "exact term must match itself")
    assert(!got.exists(_._1 == "zzz"), "no vocab term within ed 1 of zzz")
  }

  test("q_spell plan: no UDF, candidate join is broadcast") {
    val plan = VocabQueries.queries("q_spell")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"UDF in the spell plan:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"query-side keys did not broadcast:\n${plan.take(1500)}")
    assert(plan.contains("levenshtein"), "exact verify expression missing")
  }
}
