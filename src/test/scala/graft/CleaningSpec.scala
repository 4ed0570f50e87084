package graft

import graft.corpus.Pages
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The cleaning stage: url-dedup by max(warc_ts) (A4), corrupted-row skip
  * (S2), lang filter (F2), and the per-row invariant — the text that
  * survives cleaning is byte-identical to the source document text. */
class CleaningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("injections add stale-dup and corrupt rows deterministically") {
    val base = Pages.base(spark, sfDir).count()
    val all = Pages.withInjections(spark, sfDir)
    val staleCount = all.filter(col("text").startsWith("stale ")).count()
    val corruptCount = all.filter(col("text").isNull).count()
    assert(staleCount > 0 && corruptCount > 0)
    assert(all.count() == base + staleCount + corruptCount)
  }

  test("dedup keeps the max-warc_ts row per url; corrupt rows dropped") {
    val all = Pages.withInjections(spark, sfDir)
    val cleaned = Pages.cleaned(all)
    // no stale text survived
    assert(cleaned.filter(col("text").startsWith("stale ")).count() == 0)
    // no nulls survived
    assert(cleaned.filter(col("text").isNull).count() == 0)
    // urls unique
    assert(cleaned.select("url").distinct().count() == cleaned.count())
  }

  test("per-row invariant: cleaned text is byte-identical to source documents") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), col("text").as("src_text"))
    val cleaned = Pages.cleaned(Pages.withInjections(spark, sfDir))
      .select(col("doc_id"), col("text"))
    val joined = cleaned.join(docs, "doc_id")
    assert(joined.count() == docs.count(), "row count after cleaning != source corpus")
    assert(joined.filter(col("text") =!= col("src_text")).count() == 0,
      "cleaned text differs from source (byte-identity violated)")
    // html column really is the utf-8 bytes of text
    val htmlCheck = Pages.base(spark, sfDir)
      .filter(col("text").isNotNull)
      .filter(decode(col("html"), "UTF-8") =!= col("text"))
    assert(htmlCheck.count() == 0)
  }

  test("lang filter keeps only the allowlist") {
    val cleaned = Pages.cleaned(Pages.withInjections(spark, sfDir), Set("en", "de"))
    val langs = cleaned.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "de")))
  }

  test("cleaning is idempotent (a projection): cleaned(cleaned(x)) == cleaned(x)") {
    val once = Pages.cleaned(Pages.withInjections(spark, sfDir))
    val twice = Pages.cleaned(once)
    assert(once.count() == twice.count())
    assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
  }
}
