package graft.query

import graft.tokenize.TokenizerStrategy

/** The search-box surface: parsed query strings → exact constrained BM25
  * top-k, compiled onto the ONE ranked WAND driver ([[Wand.runFields]]).
  *
  * Semantics per [[ParsedQuery]]: BM25 over the scoring terms (with
  * `term^w` boosts folded into effective idf), restricted to docs that
  * contain every `+required` term, every `"quoted phrase"` at consecutive
  * positions, and none of the `-excluded` terms. Scoring statistics stay
  * corpus-global (constraints narrow the result set, they do not re-weight
  * terms — the same discipline as [[Wand.topKFiltered]]).
  *
  * Scale shape: constraints add NO extra Spark pass — excluded terms'
  * postings ride the same termId-pushdown block fetch, membership and
  * phrase-adjacency checks are bucket-local binary searches over the
  * already-decoded blocks (positions decoded lazily, once per block), and
  * only docs surviving the WAND pivot + block-max gates are ever verified.
  * Threshold seeding disables per constrained query (its df-guaranteed
  * docs may fail the constraints); block-max pruning is unaffected.
  *
  * Reference analog: the tokenizer's vocab→token-sequence query utilities
  * (midi_tokenizer.py:1676-1750) expose one string-shaped user surface over
  * the learned vocabulary; this is the retrieval-side equivalent.
  */
object Search {

  /** Parse raw query strings with the index's analyzer and run them.
    * Returns queryId → ranked (score, docId), exactly like [[Wand.topK]]. */
  def topKRaw(index: IndexHandle, raw: Seq[(Int, String)], k: Int,
      analyzer: TokenizerStrategy,
      metrics: Option[Wand.WandMetrics] = None): Map[Int, Array[(Double, Long)]] =
    topK(index, raw.map { case (qid, s) => QueryParser.parse(qid, s, analyzer) }, k, metrics)

  /** Run already-parsed queries. */
  def topK(index: IndexHandle, queries: Seq[ParsedQuery], k: Int,
      metrics: Option[Wand.WandMetrics] = None): Map[Int, Array[(Double, Long)]] = {
    val cons = queries.flatMap { q =>
      val c = Wand.Constraints(q.required, q.excluded, q.phrases)
      if (c.nonEmpty) Some(q.queryId -> c) else None
    }.toMap
    Wand.runFields(Seq(index -> 1.0), queries.map(_.toQuerySpec), k,
      metrics, boundKey = None, constraints = cons)
  }
}
