package graft.queries

import graft.corpus.Pages
import graft.index.PhraseVocab
import graft.tokenize.Tokenizers
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Vocabulary-merge (BPE `train` analog, E3) and boolean-retrieval queries. */
object VocabQueries {

  private def tokenDocs(s: SparkSession, d: String) = {
    import s.implicits._
    val tok = Tokenizers.default
    Pages.cleaned(Pages.withInjections(s, d))
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, tok.terms(t)) }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // E3 step 1: corpus-wide adjacent-pair frequency aggregation
    "q_bpe_pairs" -> ((s, d) =>
      PhraseVocab.pairCounts(tokenDocs(s, d))
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(100)),

    // E3 full loop: 8 deterministic merges (driver loop over cached corpus).
    // Non-SQL-expressible (iterative) → rows-only for the driver; exact
    // equality with a single-threaded reference asserted in BpeSpec.
    "q_bpe_merges" -> ((s, d) => {
      import s.implicits._
      val (merges, finalDocs) = PhraseVocab.train(tokenDocs(s, d), 8)
      finalDocs.unpersist()
      merges.toDF("step", "left", "right", "count", "merged").orderBy("step")
    }),

    // A6: token-type frequency index — invert the dictionary into
    // type → [ids] (type = first character class here; the reference
    // groups vocab ids by token type, midi_tokenizer.py:2151-2169)
    "q_a6_type_index" -> ((s, d) => {
      val h = IndexCache.handle(s, d)
      h.dictionary.toDF()
        .withColumn("tok_type",
          when(col("term").rlike("^[0-9]"), lit("num")).otherwise(substring(col("term"), 1, 1)))
        .groupBy("tok_type")
        .agg(array_join(array_sort(collect_list(col("termId"))), ",").as("term_ids"),
          count(lit(1)).as("n"))
        .orderBy("tok_type")
    }),

    // U4-extra: conjunctive (AND) retrieval = posting-list intersection,
    // answered FROM the compressed index (decode → per-query countDistinct)
    "q_bool_and" -> ((s, d) => {
      import s.implicits._
      val h = IndexCache.handle(s, d)
      val multi = QuerySet.queries.filter(_.terms.size > 1)
      val qdf = multi.flatMap(q => q.terms.distinct.map(t => (q.queryId, t)))
        .toDF("query_id", "term")
      val qsize = multi.map(q => (q.queryId, q.terms.distinct.size))
        .toDF("query_id", "n_terms")
      val dict = h.dictionary.toDF().select(col("term"), col("termId"))
      val wanted = qdf.join(dict, "term").select("query_id", "termId")
      val ids = wanted.select("termId").distinct().as[Int].collect().toSeq
      val postingDocs = h.postings
        .filter(col("termId").isin(ids.map(Int.box): _*))
        .as[graft.index.PostingBlock]
        .flatMap(b => graft.codec.VByte.decodeDocIds(b.docIdGaps).map(doc => (b.termId, doc)))
        .toDF("termId", "doc_id")
      postingDocs
        .join(broadcast(wanted), "termId")
        .groupBy("query_id", "doc_id")
        .agg(countDistinct(col("termId")).as("nt"))
        .join(broadcast(qsize), "query_id")
        .filter(col("nt") === col("n_terms"))
        .select("query_id", "doc_id")
        .orderBy("query_id", "doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_a6_type_index" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0
        |),
        |tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM corpus),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |dict AS (SELECT term, row_number() OVER (ORDER BY df DESC, term) - 1 AS term_id FROM dft)
        |SELECT CASE WHEN regexp_matches(term, '^[0-9]') THEN 'num' ELSE substr(term, 1, 1) END AS tok_type,
        |       string_agg(term_id, ',' ORDER BY term_id) AS term_ids, count(*) AS n
        |FROM dict GROUP BY 1 ORDER BY tok_type""".stripMargin,
    "q_bpe_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0
        |),
        |tok AS (
        |  SELECT doc_id,
        |         unnest(string_split(lower(text), ' ')) AS term,
        |         unnest(generate_series(1, len(string_split(lower(text), ' ')))) AS pos
        |  FROM corpus
        |),
        |pairs AS (
        |  SELECT a.term AS "left", b.term AS "right"
        |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |)
        |SELECT "left", "right", count(*) AS cnt FROM pairs GROUP BY "left", "right"
        |ORDER BY cnt DESC, "left", "right" LIMIT 100""".stripMargin,
    "q_bool_and" -> {
      val multi = QuerySet.queries.filter(_.terms.size > 1)
      val vals = multi.flatMap(q => q.terms.distinct.map(t => s"(${q.queryId},'$t')")).mkString(", ")
      val sizes = multi.map(q => s"(${q.queryId},${q.terms.distinct.size})").mkString(", ")
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents WHERE text IS NOT NULL AND length(text) > 0
         |),
         |tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM corpus),
         |q(query_id, term) AS (VALUES $vals),
         |qs(query_id, n_terms) AS (VALUES $sizes)
         |SELECT q.query_id, t.doc_id
         |FROM q JOIN (SELECT DISTINCT doc_id, term FROM tok) t ON t.term = q.term
         |GROUP BY q.query_id, t.doc_id
         |HAVING count(DISTINCT q.term) = (SELECT n_terms FROM qs WHERE qs.query_id = q.query_id)
         |ORDER BY query_id, doc_id""".stripMargin
    }
  )
}
