package graft.query

import graft.tokenize.TokenizerStrategy
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reverse search — the Lucene/ES percolator: stored queries, streamed
  * docs. For each incoming doc, which stored queries match it? This is
  * the alerting/routing surface of a crawl pipeline ("notify saved
  * searches of new matching docs", "route docs to subscribed topics"),
  * and the dual of the index: the QUERY set is the persisted side, the
  * docs flow through.
  *
  * Scale shape: the stored queries AND a term → candidate-query index over
  * their scoring terms ship once per executor via `sc.broadcast` (not the
  * task closure); matching is ONE map pass over the docs — tokenize once
  * per doc, then evaluate only the CANDIDATE queries sharing ≥ 1 scoring
  * term with the doc (the ES percolator's query-index discipline: per-doc
  * work scales with the queries its terms trigger, not with the full
  * saved-search population) — no Spark-side index, no join, no shuffle,
  * which is exactly the per-micro-batch shape a streaming ingest needs
  * (compose with DedupIngest's batch loop). Match semantics are
  * IDENTICAL to the index path's count/retrieval membership: ≥ 1 scoring
  * term present AND every constraint satisfied (required / requiredAny /
  * msm / excluded / phrases incl. slop / excluded phrases / url
  * filters), so a percolate hit today IS a search hit after indexing.
  *
  * Queries needing a vocabulary to expand (wildcards, fuzzies) are
  * refused loudly — percolation has no dictionary; synonyms (a pure
  * rewrite) thread through like everywhere else.
  *
  * No direct reference analog (MidiTok has no queries); the match
  * semantics are [[Search]]'s own, restated doc-at-a-time — the spec
  * pins the duality (percolate count == `Search.count` per query).
  */
object Percolate {

  private val EmptyInts = Array.empty[Int]

  def matches(docs: DataFrame, queries0: Seq[ParsedQuery],
      analyzer: TokenizerStrategy,
      synonyms: Option[Synonyms] = None): DataFrame = {
    val queries = synonyms.fold(queries0)(syn => queries0.map(syn.rewrite))
    queries.foreach { q =>
      require(q.wildcards.isEmpty && q.fuzzies.isEmpty,
        s"query ${q.queryId}: percolation cannot expand wildcards/fuzzies (no dictionary)")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    // QUERY INDEX (the ES percolator's trick): a doc can only match a query
    // whose admission gate — ≥ 1 scoring term present — it satisfies, so a
    // term → candidate-query index built from the scoring terms lets each
    // doc evaluate ONLY the queries sharing a term with it, instead of all
    // |queries| (O(docs·queries) was the documented wall at 10^5+ saved
    // searches). Candidates ⊇ admissible queries by construction, and the
    // full verifier runs unchanged on each candidate, so the match set is
    // IDENTICAL (PercolateSpec asserts it against per-query evaluation).
    // Both structures ride ONE sc.broadcast instead of re-serializing the
    // stored-query set into every task closure.
    val qArr = queries.toArray
    val termToQ: Map[String, Array[Int]] = qArr.iterator.zipWithIndex
      .flatMap { case (q, i) => q.scoring.iterator.map(_._1).distinct.map(_ -> i) }
      .toSeq.groupBy(_._1)
      .map { case (t, xs) => t -> xs.iterator.map(_._2).toArray.sorted }
    val bQueries = spark.sparkContext.broadcast(qArr)
    val bIndex = spark.sparkContext.broadcast(termToQ)
    docs.select(col("doc_id").cast("long"), col("url"), col("text"))
      .as[(Long, String, String)]
      .flatMap { case (docId, url, text) =>
        if (text == null) Iterator.empty
        else percolateOne(docId, url, text, bQueries.value, bIndex.value, analyzer)
      }
      .toDF("query_id", "doc_id")
      .orderBy("query_id", "doc_id")
  }

  private def percolateOne(docId: Long, url: String, text: String,
      queries: Array[ParsedQuery], termToQ: Map[String, Array[Int]],
      analyzer: TokenizerStrategy): Iterator[(Int, Long)] = {
    val pos: Map[String, Array[Int]] = analyzer.tokenize(text)
      .groupBy(_._1).map { case (t, v) => t -> v.map(_._2).sorted }
    // candidate queries = those sharing ≥ 1 scoring term with the doc —
    // exactly the admission gate, so non-candidates can never match
    val candIdx: Array[Int] = pos.keysIterator
      .flatMap(t => termToQ.getOrElse(t, EmptyInts).iterator)
      .toArray.distinct.sorted
    def has(t: String) = pos.contains(t)
    // ordered-window phrase check: extend every valid prefix-end
    // position by any next-term position within (p, p + 1 + slop]
    def phraseOk(ph: Phrase): Boolean = {
      var cand = pos.getOrElse(ph.terms.head, Array.empty[Int])
      var i = 1
      while (i < ph.terms.length && cand.nonEmpty) {
        val next = pos.getOrElse(ph.terms(i), Array.empty[Int])
        cand = next.filter(n => cand.exists(p => n > p && n <= p + 1 + ph.slop))
        i += 1
      }
      cand.nonEmpty
    }
    candIdx.iterator.map(queries(_)).filter { q =>
      q.scoring.exists(t => has(t._1)) &&
        q.required.forall(has) &&
        q.requiredAny.forall(_.exists(has)) &&
        (q.minShouldMatch == 0 ||
          q.scoring.map(_._1).distinct.count(has) >= q.minShouldMatch) &&
        !q.excluded.exists(has) &&
        q.phrases.forall(phraseOk) &&
        !q.excludedPhrases.exists(phraseOk) &&
        // a null url fails EVERY url filter, negated or not — SQL
        // NULL-predicate semantics, matching the index path where a
        // NULL filter column drops the doc
        q.filters.forall(f => url != null && (url.contains(f.value) != f.negated))
    }.map(q => (q.queryId, docId))
  }
}
