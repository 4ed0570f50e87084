package graft.query

import graft.tokenize.TokenizerStrategy

/** Query-time synonym expansion — a PURE [[ParsedQuery]] rewrite, applied
  * before dictionary (wildcard/fuzzy) expansion and independent of any
  * index state, so engine and oracle share the one rewrite as the single
  * source of truth for its semantics (the same discipline as the DSL
  * grammar itself).
  *
  * Semantics per clause role, mirroring the wildcard-expansion fold:
  *  - a SCORING term expands to its whole group, each added member scoring
  *    at the original clause's weight; explicit terms and earlier clauses
  *    win weight collisions (a member already scoring keeps its weight)
  *  - a `+required` term with synonyms relaxes to a requiredAny group —
  *    ANY member satisfies the constraint (the term itself still scores,
  *    as do its members)
  *  - a `-excluded` term excludes its whole group
  *  - phrase terms do NOT expand (a phrase is a literal positional
  *    pattern; synonym phrases would need per-position alternation)
  *  - `msm:N` refuses synonym-bearing scoring terms loudly: expansion
  *    would inflate the distinct-term count one concept at a time, the
  *    same index/vocabulary-dependent shift that bars wildcard × msm
  *  - an expansion that makes a term both excluded and positive (e.g.
  *    `-batch stream` under a batch↔stream group — an always-empty
  *    query) refuses loudly, matching the parser's contradiction rule
  *
  * An out-of-vocabulary member is harmless everywhere: it scores nothing,
  * satisfies nothing, and excludes nothing — the standard OOV discipline.
  *
  * Groups must be disjoint (a term in two groups would make expansion
  * order-dependent) and every member must normalize to ITSELF as a single
  * analyzer token (a multi-token or non-normal member would never match a
  * posting) — both validated loudly at construction.
  *
  * Reference analog: the vocabulary's bidirectional token↔id aliasing over
  * learned merges (midi_tokenizer.py:1676-1750) — one user-visible symbol
  * standing for a set of interchangeable index symbols. */
final case class Synonyms private (groups: Seq[Seq[String]]) {

  /** term → its full group (itself included); identity for ungrouped. */
  private val of: Map[String, Seq[String]] =
    groups.flatMap(g => g.map(_ -> g)).toMap

  def groupOf(t: String): Seq[String] = of.getOrElse(t, Seq(t))

  /** Expand one parsed query. Pure; safe to share across threads. */
  def rewrite(q: ParsedQuery): ParsedQuery = {
    val grouped = q.scoring.map(_._1).filter(of.contains)
    if (q.minShouldMatch > 0 && grouped.nonEmpty)
      throw QueryParser.ParseException(
        s"msm: cannot combine with synonym-bearing terms ${grouped.mkString(", ")}")
    val scoring = scala.collection.mutable.LinkedHashMap(q.scoring: _*)
    // earlier clauses win: members append at the first clause that names
    // any group member, at that clause's weight
    q.scoring.foreach { case (t, w) =>
      groupOf(t).foreach(m => if (!scoring.contains(m)) scoring(m) = w)
    }
    val requiredAny = scala.collection.mutable.ArrayBuffer(q.requiredAny: _*)
    val required = q.required.filter { t =>
      val keep = !of.contains(t)
      if (!keep) requiredAny += groupOf(t)
      keep
    }
    val excluded = q.excluded.flatMap(groupOf).distinct
    // expansion must not manufacture the contradiction the parser refuses
    // for explicit terms ("term both excluded and positive"): with groups
    // [[batch, stream]], "-batch stream" would expand to scoring
    // {stream, batch} × excluded {batch, stream} — an always-empty query.
    // Refuse loudly, matching the grammar's discipline
    val exSet = excluded.toSet
    val clash = scoring.keysIterator.find(exSet.contains)
    clash.foreach(t => throw QueryParser.ParseException(
      s"term '$t' is both excluded and positive after synonym expansion"))
    q.copy(scoring = scoring.toSeq, required = required,
      excluded = excluded, requiredAny = requiredAny.toSeq)
  }
}

object Synonyms {
  /** Validating constructor: disjoint groups of ≥ 2 members, each member
    * a single self-normal token under the given analyzer. */
  def apply(analyzer: TokenizerStrategy, groups: Seq[Seq[String]]): Synonyms = {
    groups.foreach { g =>
      require(g.length >= 2, s"synonym group needs >= 2 members: $g")
      require(g.distinct.length == g.length, s"duplicate member in group $g")
      g.foreach { m =>
        val toks = analyzer.tokenize(m).map(_._1).toSeq
        require(toks == Seq(m),
          s"synonym member '$m' must be one self-normal analyzer token, got ${toks.mkString("[", ", ", "]")}")
      }
    }
    val all = groups.flatten
    require(all.distinct.length == all.length,
      s"synonym groups must be disjoint: ${all.diff(all.distinct).distinct.mkString(", ")}")
    new Synonyms(groups.map(_.toSeq))
  }
}
