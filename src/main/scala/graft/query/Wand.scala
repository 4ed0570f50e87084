package graft.query

import graft.codec.VByte
import graft.index._
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One retrieval query. `boosts` are optional query-time per-term weights
  * (the `term^2.0` syntax of a search box): BM25 impact is linear in idf, so
  * a boost folds into the cursor's effective idf at query-plan time — upper
  * bounds, block-max refinement and threshold seeding all scale with it and
  * the WAND kernel is untouched. Absent terms default to weight 1.0;
  * non-positive boosts are rejected (a zero-weight term is term removal —
  * do that in the query, not the scorer). */
final case class QuerySpec(queryId: Int, terms: Seq[String],
    boosts: Map[String, Double] = Map.empty) {
  require(boosts.values.forall(_ > 0.0), s"non-positive boost in $boosts")
  def boost(term: String): Double = boosts.getOrElse(term, 1.0)
}
final case class ScoredDoc(queryId: Int, docId: Long, score: Double,
    group: String = "")

/** k-way sorted-array intersection with galloping (exponential) search:
  * driven by the smallest list, each probe doubles its step then binary
  * searches — O(Σ min-list · log(skip)) instead of scanning every list. */
object Intersect {
  def gallop(lists0: Array[Array[Long]]): Array[Long] = {
    if (lists0.isEmpty || lists0.exists(_.isEmpty)) return Array.empty
    val lists = lists0.sortBy(_.length) // rarest first drives the probes
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    val pos = new Array[Int](lists.length)
    val lead = lists(0)
    var i = 0
    while (i < lead.length) {
      val target = lead(i)
      var k = 1
      var ok = true
      while (ok && k < lists.length) {
        val p = gallopTo(lists(k), pos(k), target)
        pos(k) = p
        if (p >= lists(k).length) { ok = false; i = lead.length } // list exhausted → done
        else if (lists(k)(p) != target) ok = false
        k += 1
      }
      if (ok) out += target
      i += 1
    }
    out.result()
  }

  /** k-way union of sorted distinct lists, ascending, deduped — a linear
    * merge driven by the minimum head (k is query-sized, so the scan is
    * O(Σ|list| · k) with tiny constants; no hash set materialization). */
  def unionSorted(lists: Array[Array[Long]]): Array[Long] = {
    val live = lists.filter(_.nonEmpty)
    if (live.isEmpty) return Array.empty
    if (live.length == 1) return live(0)
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    val pos = new Array[Int](live.length)
    var last = Long.MinValue
    while ({
      var min = Long.MaxValue
      var k = 0
      while (k < live.length) {
        if (pos(k) < live(k).length && live(k)(pos(k)) < min) min = live(k)(pos(k))
        k += 1
      }
      if (min == Long.MaxValue) false
      else {
        if (min != last) { out += min; last = min }
        k = 0
        while (k < live.length) {
          if (pos(k) < live(k).length && live(k)(pos(k)) == min) pos(k) += 1
          k += 1
        }
        true
      }
    }) ()
    out.result()
  }

  /** Sorted difference a − b (both ascending): linear two-pointer merge —
    * allocation-free per element, no boxed hash set. */
  def diffSorted(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty || b.isEmpty) return a
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0
    var j = 0
    while (i < a.length) {
      while (j < b.length && b(j) < a(i)) j += 1
      if (j >= b.length || b(j) != a(i)) out += a(i)
      i += 1
    }
    out.result()
  }

  /** first index >= `from` with a(idx) >= target (galloping + binary).
    * The binary window's lower bound is the PREVIOUS probe index (the last
    * index proven < target) — never re-derived from the step width, which
    * would break once the step clamps at 2^30 on >2^30-element lists (the
    * overflow-safe regime this generic U4 kernel must serve). */
  private def gallopTo(a: Array[Long], from: Int, target: Long): Int = {
    if (from >= a.length || a(from) >= target) return from
    var step = 1
    var lo = from // invariant: a(lo) < target
    var hi = from
    while (hi < a.length && a(hi) < target) {
      lo = hi
      // overflow clamp: hi + step wraps negative once both near 2^30
      val next = hi + step
      hi = if (next < 0) a.length else next
      if (step < (1 << 30)) step <<= 1
    }
    var h = math.min(hi, a.length)
    while (lo < h) {
      val mid = (lo + h) >>> 1
      if (a(mid) < target) lo = mid + 1 else h = mid
    }
    lo
  }
}

/** Loaded index handle (manifest + lazily-read tables). */
final case class IndexHandle(spark: SparkSession, dir: String, manifest: IndexManifest) {
  import spark.implicits._
  def dictionary: Dataset[TermEntry] =
    spark.read.parquet(graft.index.IndexBuilder.dictDirFor(dir, manifest.dictVersion))
      .select("termId", "term", "df", "cf").as[TermEntry]
  def postings: Dataset[PostingBlock] =
    graft.index.IndexBuilder.readPostings(spark, dir, manifest).as[PostingBlock]
  /** PHYSICAL docstats — includes tombstoned docs' rows until compaction.
    * Internal machinery only: WAND (which overlays docLen = -1 sentinels)
    * and the validator (whose per-block invariants are physical). */
  def docstatsRaw: Dataset[DocStat] =
    graft.index.IndexBuilder.readDocstats(spark, dir, manifest).as[DocStat]
  /** LIVE docstats — the public accessor: tombstoned docs excluded, so
    * every docstats-derived surface (norms, quantiles, stats queries)
    * reflects the live corpus by construction. No-op when never deleted. */
  def docstats: Dataset[DocStat] = {
    val raw = docstatsRaw
    if (manifest.tombVersion < 0) raw
    else excludeDeleted(raw.toDF(), "docId")
      .select("docId", "url", "docLen").as[DocStat]
  }
  /** Tombstoned docIds (empty dataset when no delete ever ran). */
  def tombstones: Dataset[Long] =
    if (manifest.tombVersion < 0) spark.emptyDataset[Long]
    else spark.read
      .parquet(graft.index.IndexBuilder.tombDirFor(dir, manifest.tombVersion)).as[Long]
  /** Anti-join `docCol` against the tombstone set — a no-op (the input
    * plan, untouched) on never-deleted indexes, a result-sized anti-join
    * otherwise. Every non-WAND query path routes its doc-bearing rows
    * through this; WAND skips tombstones inside the bucket cogroup
    * (a post-heap anti-join could under-fill k). */
  def excludeDeleted(df: org.apache.spark.sql.DataFrame, docCol: String): org.apache.spark.sql.DataFrame =
    if (manifest.tombVersion < 0) df
    else df.join(tombstones.toDF("__tomb_doc_id"),
      org.apache.spark.sql.functions.col(docCol) === org.apache.spark.sql.functions.col("__tomb_doc_id"),
      "left_anti")
  /** Term-pruned dictionary lookup — the query path NEVER collects the
    * whole dictionary: the `term IN (...)` predicate pushes to the parquet
    * dictionary scan (asserted in PlanSpec), so a 512-query batch reads a
    * few thousand dictionary rows even against a 100M-term vocabulary. */
  def lookupTerms(terms: Seq[String]): Map[String, TermEntry] = {
    import org.apache.spark.sql.functions.col
    val ts = terms.distinct
    if (ts.isEmpty) Map.empty
    else dictionary.filter(col("term").isin(ts: _*)).collect()
      .map(e => e.term -> e).toMap
  }

  /** Driver-side FULL dictionary map — bench/test-side only (vocabulary
    * enumeration for query generation and oracle building); the query path
    * uses [[lookupTerms]]. */
  lazy val dictMap: Map[String, TermEntry] =
    dictionary.collect().map(e => e.term -> e).toMap

  /** Wildcard expansion: every dictionary term with `prefix`, ascending —
    * a prefix RANGE scan (the StartsWith predicate pushes to the parquet
    * dictionary, same plan as autocomplete), so one keystroke's expansion
    * touches only its term range even at a 100M-term vocabulary. More than
    * `max` matches is a LOUD error (Lucene's TooManyClauses analog): a
    * silently-truncated expansion set would make scoring depend on scan
    * order. Deletes never shrink the dictionary (tombstones are doc-level),
    * so expansion over a deleted corpus may include df-stale terms — their
    * cursors simply find no live docs, exactly like any stale df. */
  def expandPrefix(prefix: String, max: Int): Seq[String] = {
    import org.apache.spark.sql.functions.col
    require(prefix.nonEmpty, "empty wildcard prefix")
    val hits = dictionary.filter(col("term").startsWith(prefix))
      .select("term").limit(max + 1).as[String].collect()
    if (hits.length > max)
      throw new IllegalArgumentException(
        s"wildcard '$prefix*' expands to more than $max terms — narrow the prefix or raise maxExpansions")
    hits.sorted.toSeq
  }

  /** Wildcard expansion for a whole BATCH of prefixes in ONE dictionary
    * scan (the per-clause [[expandPrefix]] pays one Spark job per prefix;
    * a 12-clause batch was 12 jobs of pure overhead at fixture scale).
    * The OR-of-StartsWith predicate still pushes to the parquet dictionary
    * scan, so the scan touches only the prefixes' term ranges. Expansion
    * results are IDENTICAL per prefix (same terms, same loud cap). The
    * collect is bounded by `|prefixes| · (max+1)` rows: if the limit is
    * hit, some prefix must exceed `max` (pigeonhole), and the per-prefix
    * path re-runs to attribute the loud error precisely. */
  def expandPrefixes(prefixes: Seq[String], max: Int): Map[String, Seq[String]] = {
    import org.apache.spark.sql.functions.col
    val ps = prefixes.distinct
    if (ps.isEmpty) return Map.empty
    ps.foreach(p => require(p.nonEmpty, "empty wildcard prefix"))
    if (ps.lengthCompare(1) == 0) return Map(ps.head -> expandPrefix(ps.head, max))
    val pred = ps.map(p => col("term").startsWith(p)).reduce(_ || _)
    val cap = ps.length * (max + 1)
    val hits = dictionary.filter(pred)
      .select("term").as[String]
      .flatMap(t => ps.iterator.filter(t.startsWith(_)).map(p => (p, t)))
      .limit(cap).collect()
    if (hits.length >= cap) {
      // someone exceeds the cap — re-derive per prefix for the precise error
      ps.foreach(p => expandPrefix(p, max))
    }
    val byPrefix = hits.groupBy(_._1)
    val out = ps.map { p =>
      p -> byPrefix.getOrElse(p, Array.empty[(String, String)])
        .map(_._2).distinct.sorted.toSeq
    }.toMap
    out.foreach { case (p, terms) =>
      if (terms.length > max)
        throw new IllegalArgumentException(
          s"wildcard '$p*' expands to more than $max terms — narrow the prefix or raise maxExpansions")
    }
    out
  }

  /** Fuzzy expansion for a whole BATCH of needles in one job: needle →
    * every dictionary term within edit distance 1 (ascending; includes the
    * needle itself when in-vocab). The SymSpell shape shared with the
    * spell-correction query: both sides explode into {self} ∪ del1 keys —
    * a pure codegen transform/sequence lambda, no UDF — the (broadcast)
    * key join yields a provably COMPLETE ed≤1 candidate superset
    * (deletion/insertion/substitution all share a deletion key), verified
    * exactly by the built-in levenshtein. One vocabulary-linear pass per
    * BATCH, not per clause — the reason this takes Seq. Any needle
    * expanding past `max` is a loud error ([[expandPrefix]]'s cap
    * discipline). */
  def expandFuzzy(needles: Seq[String], maxExp: Int): Map[String, Seq[String]] = {
    import org.apache.spark.sql.functions.{array, array_distinct, broadcast,
      col, concat, explode, length, levenshtein, lit, sequence, transform}
    val ns = needles.distinct.filter(_.nonEmpty)
    if (ns.isEmpty) return Map.empty
    def del1(w: String): Seq[String] =
      (0 until w.length).map(i => w.substring(0, i) + w.substring(i + 1))
    val qkeys = ns.flatMap(q => (q +: del1(q)).distinct.map(k => (q, k)))
      .toDF("q_term", "key")
    val delKeys = transform(
      sequence(lit(0), length(col("term")) - lit(1)),
      i => concat(col("term").substr(lit(1), i),
        col("term").substr(i + lit(2), length(col("term")))))
    val hits = dictionary.toDF()
      .filter(length(col("term")) > 0)
      .select(col("term"),
        explode(array_distinct(concat(array(col("term")), delKeys))).as("key"))
      .join(broadcast(qkeys), "key")
      .select("q_term", "term").distinct()
      .filter(levenshtein(col("q_term"), col("term")) <= 1)
      .as[(String, String)].collect()
    val out = hits.groupBy(_._1).map { case (q, arr) =>
      q -> arr.map(_._2).distinct.sorted.toSeq
    }
    out.find(_._2.length > maxExp).foreach { case (q, _) =>
      throw new IllegalArgumentException(
        s"fuzzy '$q~1' expands to more than $maxExp terms — raise maxExpansions") }
    out
  }
}

object IndexReader {
  def load(spark: SparkSession, dir: String): IndexHandle =
    IndexHandle(spark, dir, Manifest.read(s"$dir/manifest.json"))

  /** Time-travel load: the index exactly as of snapshot `snapshotId` —
    * every query surface (WAND, decode, stats, tombstone overlays) runs
    * against the archived manifest's segment/dictionary/tombstone versions,
    * which stay on disk until vacuum retention expires the snapshot. */
  def loadAt(spark: SparkSession, dir: String, snapshotId: Int): IndexHandle =
    IndexHandle(spark, dir, Manifest.readAt(dir, snapshotId))
}

/** Document-at-a-time block-max WAND top-k (the new query surface mandated
  * by the north rule; its stateful cursor machinery is the engine analog of
  * the reference's replay-interpreter decode path, remi.py:368-651).
  *
  * Distribution: postings and docstats are cogrouped by docId bucket —
  * each bucket runs an independent exact WAND producing a local top-k;
  * local top-ks are reduced to the global top-k with a bounded heap.
  * Wall-clock scales with the largest bucket, not the largest term
  * (head-term skew immunity), and no stage ever materializes more than
  * (buckets × k) candidate rows.
  *
  * Exactness discipline (rank-identical scores vs the brute-force oracle):
  *  - per-doc score sums impacts in ascending-termId order, Double accum;
  *  - heap tie-break prefers smaller docId; DAAT visits docIds ascending, so
  *    pruning a doc whose upper bound equals the threshold is tie-safe
  *    (any equal-scored doc already in the heap has a smaller docId).
  */
object Wand {

  /** Per-query match constraints of the parsed-query (search-box) surface —
    * raw analyzer terms, resolved against the dictionary inside the one
    * ranked driver. A result doc must contain every `required` term and
    * every `phrases` sequence at consecutive positions, and none of the
    * `excluded` terms. Constraint verification is bucket-local (a doc and
    * all its postings share a bucket) and runs only on docs that survive
    * the WAND pivot + block-max gates. */
  final case class Constraints(required: Seq[String], excluded: Seq[String],
      phrases: Seq[Phrase], excludedPhrases: Seq[Phrase] = Seq.empty,
      requiredAny: Seq[Seq[String]] = Seq.empty,
      minMatch: Int = 0, scoringTerms: Seq[String] = Seq.empty) {
    require(minMatch == 0 || scoringTerms.nonEmpty,
      "minMatch needs the query's scoring terms to count against")
    def isEmpty: Boolean =
      required.isEmpty && excluded.isEmpty && phrases.isEmpty &&
        excludedPhrases.isEmpty && requiredAny.isEmpty && minMatch == 0
    def nonEmpty: Boolean = !isEmpty
  }

  /** Dictionary-resolved constraints (termIds, field 0); each phrase
    * carries its slop (max extra gap between consecutive terms).
    * `requiredAny` groups are disjunctions: the doc must contain at least
    * one member of EVERY group (the expanded `+pre*` wildcard). */
  private[query] final case class ResolvedConstraints(
      required: Array[Int], excluded: Array[Int],
      phrases: Array[(Array[Int], Int)],
      excludedPhrases: Array[(Array[Int], Int)],
      requiredAny: Array[Array[Int]] = Array.empty,
      minMatch: Int = 0, scoringIds: Array[Int] = Array.empty)

  /** docId membership across one term's bucket-local decoded blocks
    * (ascending disjoint runs): binary search for the covering block, then
    * binary search its ids. */
  private[query] def containsDoc(blocks: Array[DecodedBlock], doc: Long): Boolean = {
    var lo = 0
    var hi = blocks.length - 1
    var bi = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (blocks(mid).firstDocId <= doc) { bi = mid; lo = mid + 1 } else hi = mid - 1
    }
    bi >= 0 && java.util.Arrays.binarySearch(blocks(bi).ids, doc) >= 0
  }

  /** {q ∈ b : ∃p ∈ a, p + lo ≤ q ≤ p + hi} — both ascending; linear
    * two-pointer. With lo = hi = 1 this is exact-adjacency chain
    * extension (the plain quoted phrase); hi = 1 + slop widens the window
    * (`"a b"~slop` ordered-window proximity). Returns the END positions,
    * so chains fold left-to-right across an n-term phrase. */
  private[query] def windowIntersect(
      a: Array[Int], b: Array[Int], lo: Int, hi: Int): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val q = b(j)
      if (a(i) + hi < q) i += 1          // window entirely before q
      else if (a(i) + lo > q) j += 1     // q before the window
      else { out += q; j += 1 }          // a(i)+lo <= q <= a(i)+hi
    }
    out.result()
  }

  /** One block decoded once per bucket and shared by every query in the
    * batch (decode amortization: a 512-query batch touches each block's
    * bytes once, not 512 times). The positional payload is NOT decoded on
    * the WAND path — phrase queries decode it separately. */
  private[query] final class DecodedBlock(
      val firstDocId: Long,
      val ids: Array[Long],
      val tfs: Array[Int],
      /** tf used for the block's pruning bound: maxTf on the exact path; a
        * quantile (e.g. E6 tfP90) on the TIERED approximate path, where a
        * tighter-but-unsafe bound trades bounded recall for fewer exact
        * evaluations (the score-at-a-time pruning experiment). */
      val boundTf: Int,
      val minDocLen: Int)

  private[query] object DecodedBlock {
    def apply(b: PostingBlock, boundKey: Option[String]): DecodedBlock =
      new DecodedBlock(b.firstDocId, VByte.decodeDocIds(b.docIdGaps),
        VByte.decodeInts(b.tfs),
        boundKey.flatMap(b.meta.get).getOrElse(b.maxTf), b.minDocLen)
  }

  /** Cursor over one term's decoded blocks within one bucket. Block upper
    * bounds are derived at query time from the stored (maxTf, minDocLen)
    * under the CURRENT (idf, avgdl): BM25 impact is monotone ↑tf / ↓docLen,
    * so the bound dominates every member exactly, in doubles, and survives
    * stats drift from incremental appends. */
  private[query] final class TermCursor(
      val termId: Int,
      blocks: Array[DecodedBlock],
      /** EFFECTIVE idf — BM25 impact is linear in idf, so a fielded cursor
        * folds its field weight in here (w_f · idf_f) and the kernel stays
        * field-agnostic. */
      val idf: Double,
      val avgdl: Double,
      /** index into the kernel's per-field docLens array (0 for the
        * single-field BM25 path). */
      val field: Int = 0
  ) {
    private val bounds: Array[Double] = {
      val a = new Array[Double](blocks.length)
      var i = 0
      while (i < blocks.length) {
        a(i) = Bm25.scoreWithIdf(idf, blocks(i).boundTf, blocks(i).minDocLen, avgdl)
        i += 1
      }
      a
    }
    /** Term-level upper bound: max over this bucket's block bounds. */
    val termUB: Double = { var m = 0.0; var i = 0; while (i < bounds.length) { if (bounds(i) > m) m = bounds(i); i += 1 }; m }
    private var bi = 0
    private var pi = 0

    /** Postings in this bucket for this term (instrumentation only). */
    def totalDocs: Int = { var n = 0; var i = 0; while (i < blocks.length) { n += blocks(i).ids.length; i += 1 }; n }

    def exhausted: Boolean = bi >= blocks.length
    def curDoc: Long = if (exhausted) Long.MaxValue else blocks(bi).ids(pi)
    def curTf: Int = blocks(bi).tfs(pi)
    def blockMax: Double = if (exhausted) 0.0 else bounds(bi)

    /** Advance to the first posting with docId >= target; skips whole
      * blocks via the NEXT block's firstDocId. */
    def advanceTo(target: Long): Unit = {
      if (exhausted) return
      while (bi + 1 < blocks.length && blocks(bi + 1).firstDocId <= target) { bi += 1; pi = 0 }
      if (exhausted) return
      val ids = blocks(bi).ids
      while (pi < ids.length && ids(pi) < target) pi += 1
      if (pi >= ids.length) { bi += 1; pi = 0; if (!exhausted) advanceTo(target) }
    }

    def advanceOne(): Unit = {
      if (exhausted) return
      pi += 1
      if (pi >= blocks(bi).ids.length) { bi += 1; pi = 0 }
    }
  }

  /** Bounded min-heap keyed worst-first: (score asc, docId desc). */
  private[query] final class TopKHeap(k: Int, initTheta: Double = Double.NegativeInfinity) {
    private val ord: Ordering[(Double, Long)] = Ordering.by[(Double, Long), Double](_._1).reverse.orElseBy(_._2)
    // PriorityQueue dequeues the MAX by ordering; we want to pop the WORST,
    // so order by (score desc, docId asc).reverse == (score asc, docId desc)
    private val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Long)](ord)
    def size: Int = pq.size
    def full: Boolean = pq.size >= k
    /** The pruning threshold never drops below the SEEDED global lower
      * bound, so a bucket whose local candidates are all weak skips them
      * without waiting for its own heap to fill. */
    def threshold: Double =
      if (full) math.max(pq.head._1, initTheta) else initTheta
    def offer(score: Double, docId: Long): Unit = {
      if (!full) pq.enqueue((score, docId))
      else {
        val (ws, wd) = pq.head
        if (score > ws || (score == ws && docId < wd)) { pq.dequeue(); pq.enqueue((score, docId)) }
      }
    }
    /** Ranked best-first: (score desc, docId asc). */
    def ranked: Array[(Double, Long)] = pq.dequeueAll.toArray.reverse
  }

  /** Bounded GROUP-COLLAPSED top-k: keeps each group's best-(score desc,
    * docId asc) doc and the top-k groups ranked by that best — the "one
    * result per site" collector. Same admission/tie discipline as
    * [[TopKHeap]], so WAND's skip-ties-at-θ rule stays exact (DAAT visits
    * docIds ascending).
    *
    * Lazy-deletion heap: improving a group's best leaves a stale pq entry
    * that purges at the next threshold read, so offers stay O(log n).
    * Evicting the worst group when a new group is admitted at capacity is
    * exact: the k better group-bests each lower-bound their group's FINAL
    * best, so the evicted group's current best can never rank top-k; if a
    * LATER doc of that group beats the then-current threshold, the group
    * simply re-enters as new. The threshold (the kth-best group-best) is a
    * sound WAND pruning bound: a doc scoring ≤ θ either fails to improve
    * its group (its group's best already ≥ its score) or becomes a
    * group-best that k groups already beat. */
  private[query] final class CollapseTopK(k: Int) {
    private val best = new java.util.HashMap[String, (Double, Long)]()
    // pop the WORST live entry: order by (score asc, docId desc)
    private val ord: Ordering[(Double, Long, String)] =
      Ordering.by[(Double, Long, String), Double](_._1).reverse.orElseBy(_._2)
    private val pq = scala.collection.mutable.PriorityQueue.empty[(Double, Long, String)](ord)
    private def live(e: (Double, Long, String)): Boolean = {
      val b = best.get(e._3); b != null && b._1 == e._1 && b._2 == e._2
    }
    private def purge(): Unit =
      while (pq.nonEmpty && !live(pq.head)) { pq.dequeue(); () }
    def threshold: Double =
      if (best.size < k) Double.NegativeInfinity else { purge(); pq.head._1 }
    def offer(score: Double, docId: Long, group: String): Unit = {
      val cur = best.get(group)
      if (cur == null) {
        if (best.size >= k) {
          purge()
          val (ws, wd, wg) = pq.head
          // a distinct doc can't tie on BOTH keys: equal score + equal
          // docId would be the same doc, and then cur != null
          if (score < ws || (score == ws && docId > wd)) return
          pq.dequeue(); best.remove(wg); ()
        }
        best.put(group, (score, docId)); pq.enqueue((score, docId, group))
      } else if (score > cur._1 || (score == cur._1 && docId < cur._2)) {
        best.put(group, (score, docId)); pq.enqueue((score, docId, group))
      }
    }
    /** Ranked best-first (score desc, docId asc), one row per group. */
    def ranked: Array[(Double, Long)] = {
      import scala.jdk.CollectionConverters._
      best.values.asScala.toArray.sortBy { case (s, d) => (-s, d) }
    }
  }

  /** Exact WAND over one bucket for one query. `docLens` is indexed by each
    * cursor's `field` (a single-element array on the plain BM25 path); the
    * exact evaluation reads every at-pivot cursor's OWN (field docLen,
    * avgdl), which is what makes the same kernel serve BM25F.
    *
    * `admit` (null = always) is the constraint hook of the parsed-query
    * surface: a doc reaching exact evaluation is scored only if
    * admit(docId) holds (required/excluded/phrase verification, all
    * bucket-local). Constraints only REMOVE candidates, so every upper
    * bound stays valid and the threshold — fed only by admitted docs —
    * remains a lower bound on the true kth-best admitted score: pruning
    * stays exact. The check runs BEFORE the scoring loop (membership
    * probes are cheaper than the docLen lookups + impact math they save).
    *
    * `(afterScore, afterDoc)` is the deep-pagination (search_after) order
    * cursor: only docs STRICTLY after it in the global (score desc, docId
    * asc) ranking enter the heap. The default (+∞, -1) admits everything
    * (every finite score < +∞). The cutoff is one-sided-high, so it cannot
    * interact with WAND/block-max pruning (which skips LOW upper bounds);
    * a before-cursor doc still pays its exact evaluation and is rejected
    * at the heap — the price of exactness, bounded by the page-1 result
    * size per bucket. Scores are deterministic doubles (fixed summation
    * order), so cursor equality is exact across runs. */
  private[query] def wandBucket(
      cursors0: Array[TermCursor],
      docLens: Array[java.util.HashMap[Long, Integer]],
      k: Int,
      metrics: Option[WandMetrics] = None,
      initTheta: Double = Double.NegativeInfinity,
      admit: Long => Boolean = null,
      afterScore: Double = Double.PositiveInfinity,
      afterDoc: Long = -1L,
      groupOf: Long => String = null,
      boostOf: Long => Double = null,
      maxBoost: Double = 1.0
  ): Array[(Double, Long)] = {
    // boostOf (null = none): FUNCTION SCORE — the exact score is
    // boostOf(doc) × Σ impacts, with every upper bound (term UB, block
    // max) scaled by the caller-asserted global maxBoost, so pruning
    // stays exact (weaker by the boost spread, never wrong)
    // groupOf (null = no collapse) keys the group-collapsed collector:
    // the result is then the bucket's top-k GROUP-bests, the threshold the
    // kth-best group-best (sound — see CollapseTopK). Seeding is disabled
    // by the caller under collapse, so initTheta is -inf there.
    val heap = if (groupOf == null) new TopKHeap(k, initTheta) else null
    val cheap = if (groupOf != null) new CollapseTopK(k) else null
    def curTheta: Double =
      if (heap != null) heap.threshold else math.max(cheap.threshold, initTheta)
    val cursors = cursors0.filter(!_.exhausted)
    if (cursors.isEmpty) return Array.empty
    val n = cursors.length
    val order = cursors.indices.toArray // indices sorted by curDoc
    // insertion sort of `order` by curDoc (n <= |query terms| is tiny)
    def resort(): Unit = {
      var i = 1
      while (i < n) {
        val v = order(i)
        val dv = cursors(v).curDoc
        var j = i - 1
        while (j >= 0 && cursors(order(j)).curDoc > dv) { order(j + 1) = order(j); j -= 1 }
        order(j + 1) = v
        i += 1
      }
    }

    var done = false
    while (!done) {
      resort()
      // pivot: smallest prefix whose term-UB sum exceeds threshold
      val theta = curTheta
      var ub = 0.0
      var p = -1
      var i = 0
      while (i < n && p < 0) {
        ub += cursors(order(i)).termUB * maxBoost
        if (ub > theta && cursors(order(i)).curDoc != Long.MaxValue) p = i
        i += 1
      }
      if (p < 0) done = true
      else {
        val pivotDoc = cursors(order(p)).curDoc
        if (cursors(order(0)).curDoc == pivotDoc) {
          // block-max refinement: exact-eval only if block maxima can beat θ
          var bmSum = 0.0
          var j = 0
          while (j <= p) { val c = cursors(order(j)); if (c.curDoc == pivotDoc) { c.advanceTo(pivotDoc); bmSum += c.blockMax * maxBoost }; j += 1 }
          // also add UBs of cursors beyond p that are AT pivotDoc
          var j2 = p + 1
          while (j2 < n) { val c = cursors(order(j2)); if (c.curDoc == pivotDoc) bmSum += c.blockMax * maxBoost; j2 += 1 }
          if (bmSum > theta && (admit == null || admit(pivotDoc))) {
            // exact evaluation: sum impacts in cursor order — cursors are
            // pre-sorted by (field, termId) at construction, Double accum.
            // Each at-pivot cursor reads its OWN field's docLen and avgdl.
            var score = 0.0
            var dead = false
            var t = 0
            while (t < n && !dead) {
              val c = cursors(t)
              if (c.curDoc == pivotDoc) {
                // the build invariant guarantees a DocStat for every
                // posting's doc — a miss means the bucket semi-join pruning
                // or the docstats write is broken; fail loudly, never
                // score with dl=0
                val len = docLens(c.field).get(pivotDoc)
                if (len == null)
                  throw new IllegalStateException(
                    s"no DocStat for docId $pivotDoc (field ${c.field}) — docstats pruning/build bug")
                val dl = len.intValue()
                // dl == -1 marks a tombstoned doc: skip scoring (cursors
                // still advance below), so the heap fills with live docs
                if (dl == -1) dead = true
                else score += Bm25.scoreWithIdf(c.idf, c.curTf, dl, c.avgdl)
              }
              t += 1
            }
            if (!dead) {
              metrics.foreach(_.evals.add(1L))
              if (boostOf != null) score *= boostOf(pivotDoc)
              if (score < afterScore || (score == afterScore && pivotDoc > afterDoc)) {
                if (heap != null) heap.offer(score, pivotDoc)
                else cheap.offer(score, pivotDoc, groupOf(pivotDoc))
              }
            }
          }
          // advance every cursor sitting at pivotDoc
          var a = 0
          while (a < n) { if (cursors(a).curDoc == pivotDoc) cursors(a).advanceOne(); a += 1 }
        } else {
          // advance the lagging cursors up to the pivot
          var a = 0
          while (a <= p) { val c = cursors(order(a)); if (c.curDoc < pivotDoc) c.advanceTo(pivotDoc); a += 1 }
        }
      }
    }
    if (heap != null) heap.ranked else cheap.ranked
  }

  /** Bucket-count cap for the predicate-pushdown docstats path; beyond it
    * the caller keeps the distributed semi-join. */
  final val MaxPredicateBuckets = 256


  /** docstats restricted to the given docId buckets as an
    * OR-of-docId-ranges predicate pushed INTO the parquet scan — docstats
    * are clustered by docId bucket on write, so min/max footer stats skip
    * whole files/row groups, not just rows. For sets beyond
    * [[MaxPredicateBuckets]] use a distributed semi-join instead (topK
    * does — the bucket set is never fully collected to the driver). */
  def docstatsForBuckets(index: IndexHandle, buckets: Array[Long]): Dataset[DocStat] = {
    require(buckets.nonEmpty && buckets.length <= MaxPredicateBuckets,
      s"predicate path expects 1..$MaxPredicateBuckets buckets, got ${buckets.length}")
    val bucketRange = index.manifest.bucketRange
    val pred = buckets.map { b =>
      col("docId") >= b * bucketRange && col("docId") < (b + 1) * bucketRange
    }.reduce(_ || _)
    index.docstatsRaw.filter(pred)
  }

  /** Conjunctive (AND) retrieval: docIds containing EVERY query term,
    * answered by per-bucket k-way galloping intersection over the decoded
    * sorted posting lists — the U4 operator in its scale shape. A doc's
    * postings all live in the doc's bucket, so buckets intersect
    * independently and ONLY intersection hits are emitted: the exchange is
    * bounded by the result size, never by the terms' posting volume
    * (a groupBy(query, doc) over all postings of a stopword term would
    * shuffle the corpus). Queries with any OOV term return empty (AND
    * semantics). Returns (query_id, doc_id) rows. */
  def booleanAnd(index: IndexHandle, queries: Seq[QuerySpec]): org.apache.spark.sql.DataFrame = {
    val spark = index.spark
    import spark.implicits._
    val dict = index.lookupTerms(queries.flatMap(_.terms))
    // resolvable queries only; any OOV term empties the conjunction
    val qTerms: Map[Int, Array[Int]] = queries.flatMap { q =>
      val ts = q.terms.distinct
      val ids = ts.flatMap(dict.get).map(_.termId)
      if (ids.length == ts.length && ids.nonEmpty) Some(q.queryId -> ids.sorted.toArray) else None
    }.toMap
    val allIds = qTerms.values.flatten.toSeq.distinct
    if (allIds.isEmpty) return Seq.empty[(Int, Long)].toDF("query_id", "doc_id")
    val blocksPerBucket = index.manifest.bucketRange / index.manifest.blockSize
    val bQ = spark.sparkContext.broadcast(qTerms)
    index.postings
      .filter(col("termId").isin(allIds: _*)) // pushed to parquet row groups
      .as[PostingBlock]
      .groupByKey(b => b.blockId / blocksPerBucket)
      .flatMapGroups { (_, blocks) =>
        val byTerm: Map[Int, Array[Long]] = blocks.toArray.groupBy(_.termId).map {
          case (t, bs) =>
            // blocks of one term in one bucket are disjoint ascending runs
            t -> bs.sortBy(_.firstDocId).iterator.flatMap(b => VByte.decodeDocIds(b.docIdGaps)).toArray
        }
        bQ.value.iterator.flatMap { case (qid, termIds) =>
          val lists = termIds.flatMap(byTerm.get)
          if (lists.length < termIds.length) Iterator.empty // a term absent from this bucket
          else Intersect.gallop(lists).iterator.map(d => (qid, d))
        }
      }
      .toDF("query_id", "doc_id")
      .transform(index.excludeDeleted(_, "doc_id"))
  }

  /** OR (disjunctive) retrieval: docs containing ANY query term — the U1
    * analog over the index. Same bucket-cogroup shape as [[booleanAnd]];
    * per bucket each query takes the sorted dedupe-union of its terms'
    * decoded lists, so the output is exactly result-sized (for OR the
    * result IS the posting union — there is no tighter bound). OOV terms
    * are ignored; an all-OOV query is empty. */
  def booleanOr(index: IndexHandle, queries: Seq[QuerySpec]): org.apache.spark.sql.DataFrame = {
    val spark = index.spark
    import spark.implicits._
    val dict = index.lookupTerms(queries.flatMap(_.terms))
    val qTerms: Map[Int, Array[Int]] = queries.flatMap { q =>
      val ids = q.terms.distinct.flatMap(dict.get).map(_.termId)
      if (ids.nonEmpty) Some(q.queryId -> ids.sorted.toArray) else None
    }.toMap
    val allIds = qTerms.values.flatten.toSeq.distinct
    if (allIds.isEmpty) return Seq.empty[(Int, Long)].toDF("query_id", "doc_id")
    val blocksPerBucket = index.manifest.bucketRange / index.manifest.blockSize
    val bQ = spark.sparkContext.broadcast(qTerms)
    index.postings
      .filter(col("termId").isin(allIds: _*))
      .as[PostingBlock]
      .groupByKey(b => b.blockId / blocksPerBucket)
      .flatMapGroups { (_, blocks) =>
        val byTerm: Map[Int, Array[Long]] = blocks.toArray.groupBy(_.termId).map {
          case (t, bs) =>
            t -> bs.sortBy(_.firstDocId).iterator.flatMap(b => VByte.decodeDocIds(b.docIdGaps)).toArray
        }
        bQ.value.iterator.flatMap { case (qid, termIds) =>
          Intersect.unionSorted(termIds.flatMap(byTerm.get)).iterator.map(d => (qid, d))
        }
      }
      .toDF("query_id", "doc_id")
      .transform(index.excludeDeleted(_, "doc_id"))
  }

  /** AND-NOT retrieval: docs containing every positive term and none of
    * the negative terms — the boolean-algebra complement of [[booleanAnd]],
    * same bucket-cogroup shape (a doc and all its postings share a bucket,
    * so exclusion is bucket-local too). OOV positives empty the query; OOV
    * negatives are no-ops. `queries` maps queryId -> (positives, negatives). */
  def booleanAndNot(
      index: IndexHandle,
      queries: Seq[(Int, Seq[String], Seq[String])]
  ): org.apache.spark.sql.DataFrame = {
    val spark = index.spark
    import spark.implicits._
    val dict = index.lookupTerms(queries.flatMap(q => q._2 ++ q._3))
    val resolved: Map[Int, (Array[Int], Array[Int])] = queries.flatMap { case (qid, pos, neg) =>
      val ps = pos.distinct
      val pIds = ps.flatMap(dict.get).map(_.termId)
      if (pIds.length < ps.length || pIds.isEmpty) None // OOV positive → empty
      else Some(qid -> (pIds.sorted.toArray, neg.distinct.flatMap(dict.get).map(_.termId).toArray))
    }.toMap
    val allIds = resolved.values.flatMap(v => v._1 ++ v._2).toSeq.distinct
    if (allIds.isEmpty) return Seq.empty[(Int, Long)].toDF("query_id", "doc_id")
    val blocksPerBucket = index.manifest.bucketRange / index.manifest.blockSize
    val bQ = spark.sparkContext.broadcast(resolved)
    index.postings
      .filter(col("termId").isin(allIds: _*))
      .as[PostingBlock]
      .groupByKey(b => b.blockId / blocksPerBucket)
      .flatMapGroups { (_, blocks) =>
        val byTerm: Map[Int, Array[Long]] = blocks.toArray.groupBy(_.termId).map {
          case (t, bs) =>
            t -> bs.sortBy(_.firstDocId).iterator.flatMap(b => VByte.decodeDocIds(b.docIdGaps)).toArray
        }
        bQ.value.iterator.flatMap { case (qid, (pos, neg)) =>
          val posLists = pos.flatMap(byTerm.get)
          if (posLists.length < pos.length) Iterator.empty
          else {
            val hits = Intersect.gallop(posLists)
            val excluded = neg.flatMap(byTerm.get)
            // both sides sorted ascending: linear merge-difference, no
            // boxed hash set even when a negative term is a stopword
            val out =
              if (excluded.isEmpty || hits.isEmpty) hits
              else Intersect.diffSorted(hits, Intersect.unionSorted(excluded))
            out.iterator.map(d => (qid, d))
          }
        }
      }
      .toDF("query_id", "doc_id")
      .transform(index.excludeDeleted(_, "doc_id"))
  }

  /** Distributed top-k for a batch of queries. Returns exact (score, docId)
    * per query, ranked (score desc, docId asc), up to k rows each. */
  /** Optional pruning instrumentation: `candidates` counts every posting
    * a naive DAAT would touch (Σ cursor lengths per query per bucket);
    * `evals` counts docs that actually reached exact evaluation after the
    * pivot + block-max gates. evals/candidates is the measured skip rate. */
  final case class WandMetrics(
      evals: org.apache.spark.util.LongAccumulator,
      candidates: org.apache.spark.util.LongAccumulator)

  object WandMetrics {
    def apply(spark: SparkSession): WandMetrics = WandMetrics(
      spark.sparkContext.longAccumulator("wandExactEvals"),
      spark.sparkContext.longAccumulator("wandCandidatePostings"))
  }

  def topK(index: IndexHandle, queries: Seq[QuerySpec], k: Int): Map[Int, Array[(Double, Long)]] =
    topK(index, queries, k, None)

  def topK(index: IndexHandle, queries: Seq[QuerySpec], k: Int,
      metrics: Option[WandMetrics]): Map[Int, Array[(Double, Long)]] =
    run(index, queries, k, metrics, boundKey = None)

  /** FILTERED exact top-k: BM25 over only the documents satisfying a
    * metadata predicate (a Column over the docstats row: docId, url,
    * docLen) — the "site:/date-range/lang filter" of a search engine.
    * Scoring statistics (idf, avgdl, N) stay CORPUS-global (the standard
    * semantics: a filter narrows the result set, it does not re-weight
    * terms), and the result is exact among matching docs: non-matching
    * docs ride into the bucket cogroup as docLen = -1 skip sentinels —
    * the same mechanism as tombstones, ONE when() over the already
    * bucket-pruned docstats scan, no extra pass, no extra shuffle. At
    * 10^12 docs the marginal cost over unfiltered WAND is one codegen'd
    * predicate per candidate-bucket norm row. Upper bounds still include
    * filtered docs (less pruning, never wrong); the stats-only threshold
    * seed is UNSOUND under a filter (its guaranteed docs may be filtered
    * out) and is disabled. */
  def topKFiltered(index: IndexHandle, queries: Seq[QuerySpec], k: Int,
      filter: org.apache.spark.sql.Column,
      metrics: Option[WandMetrics] = None): Map[Int, Array[(Double, Long)]] =
    runFields(Seq(index -> 1.0), queries, k, metrics, boundKey = None,
      docFilter = Some(filter))

  /** COLLAPSED exact top-k: one result per GROUP — the best-scoring doc
    * of each of the k best groups, where a doc's group is `collapseKey`
    * (any Column over the docstats row: docId, url, docLen — e.g. a host
    * extracted from url), ranked by their bests. The "field collapse" /
    * site-dedup of a web SERP. Exact by a two-level argument: bucket-
    * locally the kth-best group-best is a sound WAND threshold (a doc
    * scoring ≤ θ either can't improve its group or is beaten by k groups —
    * [[CollapseTopK]]), and a group in the GLOBAL top-k has its best doc
    * inside some bucket's local top-k group-bests (k better groups locally
    * would imply k better groups globally). Cost shape over [[topK]]: the
    * collapse key is ONE codegen'd expression on the already bucket-pruned
    * docstats scan, riding the url slot that already ships to the cogroup
    * — no extra pass, no extra shuffle; candidates carry the group string
    * to the bounded group-aware reduce. The stats-only threshold seed is
    * UNSOUND under collapse (a term's df ≥ k guaranteed docs may collapse
    * into fewer than k groups) and is disabled. Composes with filters and
    * constraints; not with search_after (a collapsed ranking has no stable
    * per-doc cursor — enforced loudly). */
  def topKCollapsed(index: IndexHandle, queries: Seq[QuerySpec], k: Int,
      collapseKey: org.apache.spark.sql.Column,
      metrics: Option[WandMetrics] = None): Map[Int, Array[(Double, Long)]] =
    runFields(Seq(index -> 1.0), queries, k, metrics, boundKey = None,
      collapse = Some(collapseKey))

  /** FUNCTION SCORE (doc-value boost): exact top-k under
    * score' = boost(doc) × BM25(query, doc), where `boost` is any Column
    * over the docstats row (recency from an ingest timestamp, a quality
    * signal, pagerank — Lucene's FunctionScoreQuery in multiply mode) and
    * `maxBoost` is the caller-asserted global bound on its values
    * (validated per doc, loudly). Pruning stays EXACT: every term upper
    * bound and block max scales by maxBoost, so no boosted doc can hide
    * above a pruned bound — the cost of a wide boost spread is weaker
    * pruning, never a wrong ranking. The boost value rides the docstats
    * url slot into the bucket cogroup (one codegen'd expression on the
    * bucket-pruned scan — no extra pass or shuffle); the stats-only
    * threshold seed disables (per-doc boosts void the df ≥ k bound).
    * Composes with docFilter; excludes collapse/count modes. */
  def topKBoosted(index: IndexHandle, queries: Seq[QuerySpec], k: Int,
      boost: org.apache.spark.sql.Column, maxBoost: Double,
      metrics: Option[WandMetrics] = None,
      docFilter: Option[org.apache.spark.sql.Column] = None): Map[Int, Array[(Double, Long)]] =
    runFields(Seq(index -> 1.0), queries, k, metrics, boundKey = None,
      docFilter = docFilter, funcScore = Some((boost, maxBoost)))

  /** DEEP PAGINATION (search_after): the next k docs STRICTLY after each
    * query's `(score, docId)` cursor in the global (score desc, docId asc)
    * ranking — page N+1 given page N's last row, exactly, without
    * re-materializing pages 1..N. Stateless (the cursor IS the state, like
    * Elasticsearch's search_after vs scroll contexts), so it composes with
    * index appends only in the same snapshot — page against one `loadAt`
    * snapshot for a stable ranking. Scores are deterministic doubles
    * (fixed summation order), so a cursor taken from one run is exact in
    * the next. Cost shape: identical to [[topK]] — the cutoff is
    * one-sided-high and cannot interact with WAND/block-max pruning;
    * before-cursor docs re-pay exact evaluation and are rejected at the
    * heap (bounded by the preceding pages' per-bucket result counts). The
    * stats-only threshold seed is UNSOUND under a cursor (its guaranteed
    * docs may rank before it) and disables per cursored query. Queries
    * absent from `after` run as plain page-1 [[topK]]. */
  def topKAfter(index: IndexHandle, queries: Seq[QuerySpec], k: Int,
      after: Map[Int, (Double, Long)],
      metrics: Option[WandMetrics] = None): Map[Int, Array[(Double, Long)]] =
    runFields(Seq(index -> 1.0), queries, k, metrics, boundKey = None,
      pageAfter = after)

  /** TIERED approximate top-k: identical machinery, but block pruning
    * bounds derive from the named E6 metadata entry (e.g.
    * [[graft.index.TfQuantileComputer.TfP90Key]]) instead of maxTf — an
    * UNSAFE (quantile) bound, so high-tf outlier postings in blocks whose
    * quantile bound sits under the threshold can be missed. The trade is
    * deliberate and measured (PruneSpec: evals saved vs recall); blocks
    * without the metadata key fall back to the exact maxTf bound, so an
    * index built without the computer degrades to exact, never to wrong-er. */
  def topKApprox(index: IndexHandle, queries: Seq[QuerySpec], k: Int, boundKey: String,
      metrics: Option[WandMetrics] = None): Map[Int, Array[(Double, Long)]] =
    run(index, queries, k, metrics, boundKey = Some(boundKey))

  private def run(index: IndexHandle, queries: Seq[QuerySpec], k: Int,
      metrics: Option[WandMetrics], boundKey: Option[String]): Map[Int, Array[(Double, Long)]] =
    runFields(Seq(index -> 1.0), queries, k, metrics, boundKey)

  /** FEDERATED exact top-k over DISJOINT shard indexes — search without
    * merging, the query-side dual of [[graft.index.IndexBuilder.merge]].
    * Shards are independently built indexes over disjoint docId spaces
    * (the merge verb's contract); scoring statistics become corpus-GLOBAL:
    * nDocs and avgdl from the summed manifests, per-term df summed across
    * the shards' LIVE dictionaries — so a federated query ranks exactly
    * like the merged index would (same idf/avgdl doubles; per-doc addend
    * order is shard-local, so scores agree to rounding). Machinery: the
    * shards enter the ONE fielded driver as weight-1.0 fields — disjoint
    * docId spaces make each doc's cross-field sum degenerate to its own
    * shard's BM25 — so bucket cogrouping, block-max pruning, tombstone
    * sentinels and the bounded-heap reduce are all unchanged, and the only
    * extra cost over single-index WAND is one query-term-pruned dictionary
    * lookup per shard (driver-tiny). Reference analog: querying a corpus
    * tokenized in independent chunks without first concatenating them
    * (midi_tokenizer.py:3084-3198's per-chunk outputs). */
  def topKSharded(shards: Seq[IndexHandle], queries: Seq[QuerySpec], k: Int,
      metrics: Option[WandMetrics] = None,
      collapse: Option[org.apache.spark.sql.Column] = None): Map[Int, Array[(Double, Long)]] =
    runFields(shards.map(_ -> 1.0), queries, k, metrics, boundKey = None,
      globalStats = Some(shardStats(shards, queries)), collapse = collapse)

  /** Filtered federation: [[topKSharded]] restricted to documents
    * satisfying a metadata predicate over the docstats row — global
    * scoring statistics, shard-local evaluation, the same docLen = -1
    * skip-sentinel mechanism as [[topKFiltered]] (stats stay corpus-global:
    * a filter narrows the result set, it does not re-weight terms). */
  def topKShardedFiltered(shards: Seq[IndexHandle], queries: Seq[QuerySpec], k: Int,
      filter: org.apache.spark.sql.Column,
      metrics: Option[WandMetrics] = None,
      collapse: Option[org.apache.spark.sql.Column] = None): Map[Int, Array[(Double, Long)]] =
    runFields(shards.map(_ -> 1.0), queries, k, metrics, boundKey = None,
      docFilter = Some(filter), globalStats = Some(shardStats(shards, queries)),
      collapse = collapse)

  /** Corpus-global (nDocs, avgdl, per-term df) summed across the shards'
    * manifests and LIVE dictionaries — identical doubles to the merged
    * index's own stats. */
  private def shardStats(shards: Seq[IndexHandle],
      queries: Seq[QuerySpec]): (Long, Double, Map[String, Long]) = {
    require(shards.nonEmpty, "at least one shard")
    val gN = shards.map(_.manifest.nDocs).sum
    val gLen = shards.map(_.manifest.totalLen).sum
    val gAvgdl = gLen.toDouble / gN.toDouble // == merged manifest's avgdl
    val allTerms = queries.flatMap(_.terms).distinct
    val gDf: Map[String, Long] = shards
      .flatMap(_.lookupTerms(allTerms).map { case (t, e) => t -> e.df })
      .groupBy(_._1).map { case (t, xs) => t -> xs.iterator.map(_._2).sum }
    (gN, gAvgdl, gDf)
  }

  /** The ONE ranked-retrieval driver, generalized over weighted FIELDS —
    * plain BM25 is the single-field instance (weight 1.0), BM25F the
    * multi-field one ([[Bm25f.topK]] delegates here). Per field: its own
    * dictionary lookup, (nDocs, avgdl), docstats; each (field, term) pair
    * becomes an independent cursor with effective idf = w_f · idf_f (BM25
    * impact is linear in idf), so upper bounds, block-max refinement and
    * threshold seeding compose per field with no kernel changes.
    *
    * Global threshold seeding (zero-cost, stats-only): every (field, term)
    * with df_f >= k guarantees df_f docs whose FULL score is at least
    * w_f · impact_f(tf = 1, maxDocLen_f) — the max of those minima
    * lower-bounds the true kth-best score, computed from dictionary +
    * manifest alone (measured: 92% → 1.6% exact-evals at 512-doc buckets,
    * PruneSpec; exactness oracle-asserted with seeding on). SOUNDNESS:
    * single-field df is LIVE under deletes (eagerly decremented), but with
    * multiple fields a doc deleted from another sub-index still counts in
    * this field's df — so seeding disables on tombstoned multi-field runs.
    *
    * Tombstoned docs ride into each bucket's cogroup as docLen = -1
    * sentinels for EVERY field (a doc deleted from any sub-index is dead
    * for the logical document); the kernel skips them before scoring. */
  private[query] def runFields(fields: Seq[(IndexHandle, Double)], queries: Seq[QuerySpec],
      k: Int, metrics: Option[WandMetrics], boundKey: Option[String],
      docFilter: Option[org.apache.spark.sql.Column] = None,
      globalStats: Option[(Long, Double, Map[String, Long])] = None,
      constraints: Map[Int, Constraints] = Map.empty,
      pageAfter: Map[Int, (Double, Long)] = Map.empty,
      collapse: Option[org.apache.spark.sql.Column] = None,
      countOnly: Boolean = false,
      funcScore: Option[(org.apache.spark.sql.Column, Double)] = None): Map[Int, Array[(Double, Long)]] = {
    require(collapse.isEmpty || !countOnly,
      "countOnly × collapse is facet mode — use facetCounts")
    val kk = k
    val doCollapse = collapse.isDefined
    def onEmpty = queries.map(q => q.queryId -> Array.empty[(Double, Long)]).toMap
    runFieldsWith(fields, queries, k, metrics, boundKey, docFilter,
      globalStats, constraints, pageAfter, collapse, countOnly, funcScore)(onEmpty) { candidates =>
      val spark = fields.head._1.spark
      import spark.implicits._
      // reduce: per-query global top-k with a bounded heap (no full sort);
      // under collapse the same group-aware collector merges the buckets'
      // group-bests (a group spanning buckets collapses here)
      val reduced = candidates.groupByKey(_.queryId).mapGroups { (qid, it) =>
        if (countOnly) {
          // sum of the buckets' partial counts, one row: (hits, hits)
          var tot = 0L
          it.foreach(c => tot += c.docId)
          (qid, Array((tot.toDouble, tot)))
        } else if (doCollapse) {
          val ck = new CollapseTopK(kk)
          it.foreach(c => ck.offer(c.score, c.docId, c.group))
          (qid, ck.ranked)
        } else {
          val heap = new TopKHeap(kk)
          it.foreach(c => heap.offer(c.score, c.docId))
          (qid, heap.ranked.map { case (s, d) => (s, d) })
        }
      }.collect().toMap
      queries.map(q => q.queryId -> reduced.getOrElse(q.queryId, Array.empty[(Double, Long)])).toMap
    }
  }

  /** EXACT FACET COUNTS over the match set — the SERP facet panel: for
    * each query, the per-facet-value count of documents containing ≥ 1
    * scoring term and passing every constraint/filter, top-N values by
    * (count desc, value asc). The facet key is any Column over the
    * docstats row (like collapse), riding the url slot into the bucket
    * cogroup; the kernel runs in count mode, each bucket emitting one
    * partial row PER FACET VALUE PRESENT — shuffle is O(buckets × values
    * present), never O(matching docs). */
  def facetCounts(index: IndexHandle, queries: Seq[QuerySpec],
      facetKey: org.apache.spark.sql.Column, topN: Int,
      metrics: Option[WandMetrics] = None,
      docFilter: Option[org.apache.spark.sql.Column] = None,
      constraints: Map[Int, Constraints] = Map.empty): Map[Int, Seq[(String, Long)]] =
    facetCountsWithTotal(index, queries, facetKey, topN, metrics, docFilter,
      constraints).map { case (qid, (_, fs)) => qid -> fs }

  /** [[facetCounts]] plus the query's EXACT total hits from the SAME
    * pass — the per-value counts partition the match set, so their
    * pre-cutoff sum IS the total; a SERP needs one ranked pass + this. */
  def facetCountsWithTotal(index: IndexHandle, queries: Seq[QuerySpec],
      facetKey: org.apache.spark.sql.Column, topN: Int,
      metrics: Option[WandMetrics] = None,
      docFilter: Option[org.apache.spark.sql.Column] = None,
      constraints: Map[Int, Constraints] = Map.empty): Map[Int, (Long, Seq[(String, Long)])] = {
    def onEmpty =
      queries.map(q => q.queryId -> (0L, Seq.empty[(String, Long)])).toMap
    runFieldsWith(Seq(index -> 1.0), queries, k = 1, metrics, boundKey = None,
      docFilter = docFilter, constraints = constraints,
      collapse = Some(facetKey), countOnly = true)(onEmpty) { candidates =>
      val spark = index.spark
      import spark.implicits._
      val reduced = candidates.groupByKey(_.queryId).mapGroups { (qid, it) =>
        val m = new java.util.HashMap[String, Long]()
        var total = 0L
        it.foreach { c =>
          val prev = m.get(c.group)
          m.put(c.group, (if (prev == null) 0L else prev) + c.docId)
          total += c.docId
          ()
        }
        import scala.jdk.CollectionConverters._
        val top = m.asScala.toSeq.sortBy { case (v, n) => (-n, v) }.take(topN)
        (qid, total, top)
      }.collect()
      val byId = reduced.map(r => r._1 -> ((r._2, r._3))).toMap
      queries.map(q => q.queryId -> byId.getOrElse(q.queryId, (0L, Seq.empty))).toMap
    }
  }

  /** (key desc, docId asc) — the sort-by-field candidate order, shared by
    * the bucket-local and the global top-k cuts. Serializable: it rides
    * the cogroup closure. */
  private[query] val KeyDocOrdering: java.util.Comparator[(String, Long)] =
    new java.util.Comparator[(String, Long)] with Serializable {
      override def compare(a: (String, Long), b: (String, Long)): Int = {
        val c = b._1.compareTo(a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  /** The ONE bounded-cut idiom for sort-by-key — shared by the
    * bucket-local kernel and the global reduce so the two cuts are
    * provably identical: admit, then evict the lowest-priority element
    * when over capacity. */
  private[query] def boundedAdd(ts: java.util.TreeSet[(String, Long)],
      elem: (String, Long), k: Int): Unit = {
    ts.add(elem)
    if (ts.size > k) { ts.pollLast(); () }
  }

  /** SORT-BY-FIELD retrieval: each query's match set (same admission as
    * [[runFields]] count mode — ≥ 1 scoring term + every constraint and
    * filter) ordered by a DOC-VALUE key instead of relevance — the
    * `sort: [{date: desc}]` surface (freshness, doc length, any docstats
    * expression). `sortKey` must be a STRING-ORDER-SORTABLE encoding
    * (zero-pad numerics — `lpad(cast(v AS string), w, '0')` — the
    * classic sortable-doc-value trick; ascending order = complement the
    * encoding); it rides the collapse slot into the cogroup, so the cost
    * shape is the facet pass's: each bucket ships its top-k admitted
    * (key, docId) rows — shuffle O(buckets × k), never O(matching docs)
    * — and the global reduce cuts the same order. Returns per query the
    * top-k (key, docId) by (key desc, docId asc).
    *
    * NULL keys: the collapse slot coalesces a null key to "" — the
    * SMALLEST string — so null-keyed docs sort LAST under a plain desc
    * encoding but would surface FIRST under a complement-encoded
    * ascending key. Callers whose key column is nullable should coalesce
    * explicitly to the sentinel their encoding sorts last. */
  def topKByKey(index: IndexHandle, queries: Seq[QuerySpec],
      sortKey: org.apache.spark.sql.Column, k: Int,
      metrics: Option[WandMetrics] = None,
      docFilter: Option[org.apache.spark.sql.Column] = None,
      constraints: Map[Int, Constraints] = Map.empty): Map[Int, Seq[(String, Long)]] = {
    // k <= 0 would zero sortDocs and silently fall into FACET mode
    // (O(buckets × distinct keys) shuffle) before reducing to nothing
    require(k > 0, s"topKByKey requires k > 0, got $k")
    def onEmpty = queries.map(q => q.queryId -> Seq.empty[(String, Long)]).toMap
    runFieldsWith(Seq(index -> 1.0), queries, k = 1, metrics, boundKey = None,
      docFilter = docFilter, constraints = constraints,
      collapse = Some(sortKey), countOnly = true, sortDocs = k)(onEmpty) { candidates =>
      val spark = index.spark
      import spark.implicits._
      val reduced = candidates.groupByKey(_.queryId).mapGroups { (qid, it) =>
        val ts = new java.util.TreeSet[(String, Long)](KeyDocOrdering)
        it.foreach(c => boundedAdd(ts, (c.group, c.docId), k))
        import scala.jdk.CollectionConverters._
        (qid, ts.iterator().asScala.toSeq)
      }.collect().toMap
      queries.map(q => q.queryId -> reduced.getOrElse(q.queryId, Seq.empty)).toMap
    }
  }

  /** The shared driver core: everything up to the candidate rows (term
    * lookup, constraint resolution, threshold seeding, bucket pruning,
    * the cogroup kernel), generic in the final reduce so ranked / count /
    * facet surfaces share one implementation. `onEmpty` is the no-hit
    * result. */
  private[query] def runFieldsWith[T](fields: Seq[(IndexHandle, Double)], queries: Seq[QuerySpec],
      k: Int, metrics: Option[WandMetrics], boundKey: Option[String],
      docFilter: Option[org.apache.spark.sql.Column] = None,
      globalStats: Option[(Long, Double, Map[String, Long])] = None,
      constraints: Map[Int, Constraints] = Map.empty,
      pageAfter: Map[Int, (Double, Long)] = Map.empty,
      collapse: Option[org.apache.spark.sql.Column] = None,
      countOnly: Boolean = false,
      funcScore: Option[(org.apache.spark.sql.Column, Double)] = None,
      sortDocs: Int = 0)(onEmpty: => T)(
      reduceFn: Dataset[ScoredDoc] => T): T = {
    // sortDocs > 0: SORT-BY-KEY mode — count-mode admission, but each
    // bucket emits its top-`sortDocs` admitted docs by (key desc, docId
    // asc) instead of counts; requires the key (collapse) column
    require(sortDocs == 0 || (countOnly && collapse.isDefined),
      "sortDocs requires countOnly with a sort-key (collapse) column")
    require(fields.nonEmpty, "at least one field")
    require(constraints.isEmpty || fields.length == 1,
      "constrained (parsed-query) retrieval is single-field")
    require(collapse.isEmpty || pageAfter.isEmpty,
      "collapse does not compose with search_after (no stable per-doc cursor)")
    // funcScore rides the same url slot as collapse — one at a time; it
    // multiplies ranked scores, so it has no meaning in count mode
    require(funcScore.isEmpty ||
      (collapse.isEmpty && !countOnly && fields.length == 1),
      "funcScore is single-field and excludes collapse/count modes")
    funcScore.foreach { case (_, mb) =>
      require(mb > 0.0 && !mb.isInfinite, s"maxBoost must be finite positive, got $mb") }
    // countOnly: exact match COUNTS per query — no scoring, no heap; each
    // bucket emits partial-count rows (docId slot = count): ONE per query
    // plain, one per facet value present under a collapse key (facet
    // mode). Single-field, no ranking knobs to compose with.
    require(!countOnly || (fields.length == 1 && pageAfter.isEmpty),
      "countOnly is single-field and composes with filters/constraints only")
    val spark = fields.head._1.spark
    import spark.implicits._
    val m0 = fields.head._1.manifest
    require(fields.forall { case (h, _) =>
      h.manifest.bucketRange == m0.bucketRange && h.manifest.blockSize == m0.blockSize },
      "fielded sub-indexes must share block geometry (bucketRange, blockSize)")
    val nF = fields.length
    val kk = k
    def empty = onEmpty
    // term-pruned lookups of ONLY the batch's query terms (scale-safe: no
    // full-dictionary collect on the query path). Constraint terms ride in
    // the same lookup: excluded terms never score but their postings must
    // be probeable, and required/phrase terms decide OOV emptiness.
    val allTerms = queries.flatMap(_.terms) ++
      constraints.values.flatMap(c =>
        c.required ++ c.excluded ++ c.phrases.flatMap(_.terms) ++
          c.excludedPhrases.flatMap(_.terms) ++ c.requiredAny.flatten ++
          c.scoringTerms)
    val dicts = fields.map { case (h, _) => h.lookupTerms(allTerms) }
    // OOV discipline of the constraint surface: an unsatisfiable constraint
    // (OOV required or phrase term) empties the query; OOV excluded terms —
    // and excluded phrases containing one (the pattern cannot occur) — are
    // no-ops and drop out of the resolved ids.
    val dict0 = dicts.head
    // ... and a requiredAny group with NO in-vocabulary member (e.g. a
    // zero-expansion `+pre*` — the group is empty by construction) is
    // unsatisfiable, so it also empties the query
    val forcedEmpty: Set[Int] = constraints.collect { case (qid, c)
      if c.required.distinct.exists(t => !dict0.contains(t)) ||
        c.phrases.exists(_.terms.exists(t => !dict0.contains(t))) ||
        c.requiredAny.exists(g => !g.exists(dict0.contains)) ||
        // fewer in-vocabulary scoring terms than msm demands → no doc can
        // ever reach the count (OOV terms match nothing)
        (c.minMatch > 0 &&
          c.scoringTerms.distinct.count(dict0.contains) < c.minMatch) => qid }.toSet
    val resolvedCons: Map[Int, ResolvedConstraints] = constraints.collect {
      case (qid, c) if !forcedEmpty(qid) && c.nonEmpty =>
        qid -> ResolvedConstraints(
          c.required.distinct.map(t => dict0(t).termId).toArray,
          c.excluded.distinct.flatMap(dict0.get).map(_.termId).toArray,
          c.phrases.map(p => (p.terms.map(t => dict0(t).termId).toArray, p.slop)).toArray,
          c.excludedPhrases.filter(_.terms.forall(dict0.contains))
            .map(p => (p.terms.map(t => dict0(t).termId).toArray, p.slop)).toArray,
          // OOV group members drop (they can match no doc; the group's
          // satisfiability survives — forcedEmpty already caught all-OOV)
          c.requiredAny.map(_.distinct.flatMap(dict0.get).map(_.termId).toArray).toArray,
          c.minMatch,
          if (c.minMatch == 0) Array.empty
          else c.scoringTerms.distinct.flatMap(dict0.get).map(_.termId).toArray)
    }.filter { case (_, rc) => // fully-OOV no-op constraints dissolve entirely
      rc.required.nonEmpty || rc.excluded.nonEmpty || rc.phrases.nonEmpty ||
        rc.excludedPhrases.nonEmpty || rc.requiredAny.nonEmpty || rc.minMatch > 0
    }
    val liveQueries = queries.filterNot(q => forcedEmpty(q.queryId))
    // a federated (sharded) run overrides the per-field stats with the
    // summed corpus-global ones; fielded/plain runs keep per-field stats
    val avgdls = globalStats match {
      case Some((_, gAvgdl, _)) => Array.fill(nF)(gAvgdl)
      case None                 => fields.map(_._1.manifest.avgdl).toArray
    }
    def idfOf(f: Int, term: String, localDf: Long): Double = globalStats match {
      case Some((gN, _, gDf)) => Bm25.idf(gN, gDf(term))
      case None               => Bm25.idf(fields(f)._1.manifest.nDocs, localDf)
    }

    // per query: cursor specs (field, termId, effIdf), sorted (field,
    // termId) — the kernel's deterministic accumulation order
    val qSpecs: Map[Int, Array[(Int, Int, Double)]] = liveQueries.map { q =>
      q.queryId -> (for {
        f <- 0 until nF
        t <- q.terms.distinct
        e <- dicts(f).get(t)
      } yield (f, e.termId, q.boost(t) * fields(f)._2 * idfOf(f, t, e.df)))
        .sortBy(x => (x._1, x._2)).toArray
    }.toMap
    if (qSpecs.values.forall(_.isEmpty)) return empty

    val seedSound =
      docFilter.isEmpty && collapse.isEmpty && funcScore.isEmpty &&
        (nF == 1 || fields.forall(_._1.manifest.tombVersion < 0))
    val thetaSeed: Map[Int, Double] =
      if (!seedSound) Map.empty
      // seeding is UNSOUND for a constrained query (its df >= k guaranteed
      // docs may fail the constraints) and for a page cursor (guaranteed
      // docs may rank BEFORE the cursor) — per-query disable, like docFilter
      else liveQueries.filterNot(q =>
        resolvedCons.contains(q.queryId) || pageAfter.contains(q.queryId)).flatMap { q =>
        val bounds = for {
          f <- 0 until nF
          if fields(f)._1.manifest.maxDocLen > 0 // pre-upgrade manifest: no bound
          t <- q.terms.distinct
          e <- dicts(f).get(t)
          if e.df >= kk
        } yield Bm25.scoreWithIdf(
          q.boost(t) * fields(f)._2 * idfOf(f, t, e.df),
          1, fields(f)._1.manifest.maxDocLen, avgdls(f))
        // nextDown() guards exact-tie boundaries at the threshold
        if (bounds.isEmpty) None else Some(q.queryId -> math.nextDown(bounds.max))
      }.toMap
    val bTheta = spark.sparkContext.broadcast(thetaSeed)

    val bucketRange = m0.bucketRange
    val blocksPerBucket = m0.bucketRange / m0.blockSize
    // SCORING ids per field — from the live cursor specs, so candidate
    // buckets (and the docstats pruning below) derive only from terms that
    // can actually produce candidates. Excluded terms' postings are fetched
    // too (field 0; membership probes) but never expand the bucket set: a
    // doc matching only excluded terms is not a candidate.
    val idsByField: IndexedSeq[Seq[Int]] = (0 until nF).map { f =>
      qSpecs.valuesIterator.flatten.collect { case (`f`, tid, _) => tid }.toSeq.distinct
    }
    val exIds: Seq[Int] =
      (resolvedCons.values.flatMap(_.excluded) ++
        resolvedCons.values.flatMap(_.excludedPhrases.iterator.flatMap(_._1)) ++
        // requiredAny members usually score (wildcard expansions do) and
        // then dedupe away here; fetched defensively for constraint-only use
        resolvedCons.values.flatMap(_.requiredAny.iterator.flatten) ++
        // msm counts over scoring terms — always cursor terms, so this
        // dedupes away; defensive for the same reason as requiredAny
        resolvedCons.values.flatMap(_.scoringIds)).toSeq.distinct
        .filterNot(idsByField.head.toSet)
    def fetchIds(f: Int): Seq[Int] =
      if (f == 0) idsByField(0) ++ exIds else idsByField(f)

    // field-tagged candidate blocks — the termId IN (...) predicate pushes
    // to parquet row groups per field
    val fBlocks: Dataset[(Int, PostingBlock)] = (0 until nF).map { f =>
      val ids = fetchIds(f)
      if (ids.isEmpty) spark.emptyDataset[(Int, PostingBlock)]
      else fields(f)._1.postings
        .filter(col("termId").isin(ids.map(Int.box): _*))
        .map(b => (f, b))
    }.reduce(_ union _)

    // prune docstats (norms) to buckets that actually hold candidate blocks —
    // at 10^12 docs most buckets have no postings for a given query batch,
    // and their norms must never enter the cogroup exchange. The candidate
    // bucket set is tiny (≤ the query terms' block count), so collect a
    // BOUNDED probe of it and push an OR-of-docId-ranges predicate INTO the
    // docstats scan (docstats are range-clustered by docId on write, so
    // parquet min/max stats skip whole files/row groups); batches touching
    // more than MaxPredicateBuckets buckets keep the fully-distributed
    // semi-join — the driver never materializes a web-scale bucket set.
    val candBuckets = (0 until nF).flatMap { f =>
      val ids = idsByField(f)
      if (ids.isEmpty) None
      else Some(fields(f)._1.postings.toDF()
        .filter(col("termId").isin(ids.map(Int.box): _*))
        .select((col("blockId") / lit(blocksPerBucket)).cast("long").as("bucket")))
    }.reduce(_ unionByName _).distinct()
    val probe: Array[Long] =
      candBuckets.limit(MaxPredicateBuckets + 1).as[Long].collect()
    if (probe.isEmpty) return empty

    // tombstone union across fields → docLen = -1 sentinels for EVERY
    // field's map (bucket-pruned like the norms)
    val tombSentinels: Dataset[(Int, DocStat)] = {
      val tombed = fields.map(_._1).filter(_.manifest.tombVersion >= 0)
      if (tombed.isEmpty) spark.emptyDataset[(Int, DocStat)]
      else {
        val ids = tombed.map(_.tombstones.toDF("docId")).reduce(_ unionByName _).distinct()
          .withColumn("bucket", (col("docId") / lit(bucketRange)).cast("long"))
        // bounded path: reuse the already-collected probe array instead of
        // re-deriving candidate buckets with another postings scan
        val pruned =
          if (probe.length <= MaxPredicateBuckets)
            ids.filter(col("bucket").isin(probe.toIndexedSeq.map(Long.box): _*))
          else ids.join(candBuckets, Seq("bucket"), "left_semi")
        pruned.select("docId").as[Long]
          .flatMap(d => (0 until nF).iterator.map(f => (f, DocStat(d, "", -1))))
      }
    }

    val fStats: Dataset[(Int, DocStat)] = (0 until nF).map { f =>
      val h = fields(f)._1
      val pruned =
        if (probe.length <= MaxPredicateBuckets) docstatsForBuckets(h, probe)
        else h.docstatsRaw.toDF()
          .withColumn("bucket", (col("docId") / lit(bucketRange)).cast("long"))
          .join(candBuckets, Seq("bucket"), "left_semi")
          .drop("bucket")
          .as[DocStat]
      // a metadata filter marks non-matching docs with the same -1 skip
      // sentinel as tombstones — one codegen'd when() on the pruned scan
      val dlCol = docFilter match {
        case Some(p) => when(p, col("docLen")).otherwise(lit(-1)).cast("int")
        case None    => col("docLen")
      }
      // under collapse (or funcScore) the group key / boost value (one
      // codegen'd expression over the docstats row, computed AFTER
      // docFilter reads the raw url) rides the url slot into the cogroup
      // — docstats already ship url there
      val keyCol = collapse.orElse(funcScore.map(_._1)) match {
        case Some(c) => coalesce(c.cast("string"), lit("")).as("url")
        case None    => col("url")
      }
      pruned.toDF().select(col("docId"), keyCol, dlCol.as("docLen"))
        .as[DocStat].map(s => (f, s))
    }.reduce(_ union _).union(tombSentinels)
    val doCollapse = collapse.isDefined
    val doFunc = funcScore.isDefined
    val fsMax = funcScore.map(_._2).getOrElse(1.0)

    val bQ = spark.sparkContext.broadcast(qSpecs)
    val bAfter = spark.sparkContext.broadcast(pageAfter)
    val bCons = spark.sparkContext.broadcast(resolvedCons)
    val bPhraseTids = spark.sparkContext.broadcast(
      (resolvedCons.values.flatMap(_.phrases.iterator.flatMap(_._1)) ++
        resolvedCons.values.flatMap(_.excludedPhrases.iterator.flatMap(_._1))).toSet)
    val blocksByBucket = fBlocks.groupByKey(_._2.blockId / blocksPerBucket)
    val statsByBucket = fStats.groupByKey(_._2.docId / bucketRange)

    val candidates: Dataset[ScoredDoc] = blocksByBucket.cogroup(statsByBucket) {
      (bucket, blocks, stats) =>
        val blockArr = blocks.toArray
        if (blockArr.isEmpty) Iterator.empty
        else {
          val docLens = Array.fill(nF)(new java.util.HashMap[Long, Integer]())
          // collapse: docId → group key, from the SAME stats rows (the key
          // rides the url slot). putIfAbsent: a tombstone sentinel's ""
          // may win the slot, but a sentineled doc is never scored, so its
          // group is never consulted
          val docGroup =
            if (doCollapse) new java.util.HashMap[Long, String]() else null
          // funcScore: docId → boost, riding the same url slot; sentinel
          // rows carry "" and are skipped (a sentineled doc is never
          // scored). Raw strings here — parse + range-validation happen
          // LAZILY per scored doc (boostOf below), so a boost expression
          // that is garbage or out-of-bound for docs the filter excludes
          // (or tombstones kill) can never fail the job; validation stays
          // loud for every doc that actually scores (a silent over-bound
          // boost would break pruning exactness). Parsed values memoize
          // in place.
          val docBoost =
            if (doFunc) new java.util.HashMap[Long, AnyRef]() else null
          // iterator order after the shuffle is arbitrary: a -1 tombstone
          // sentinel must win over the doc's real norm either way round
          stats.foreach { case (f, s) =>
            if (s.docLen == -1) docLens(f).put(s.docId, Integer.valueOf(-1))
            else docLens(f).putIfAbsent(s.docId, Integer.valueOf(s.docLen))
            if (docGroup != null) { docGroup.putIfAbsent(s.docId, s.url); () }
            if (docBoost != null && s.url.nonEmpty) {
              docBoost.putIfAbsent(s.docId, s.url)
              ()
            }
            ()
          }
          val byFieldTerm: Map[(Int, Int), Array[DecodedBlock]] =
            blockArr.groupBy(p => (p._1, p._2.termId)).map { case (key, ps) =>
              key -> ps.map(_._2).sortBy(_.firstDocId).map(DecodedBlock(_, boundKey))
            }
          // positional payloads for phrase verification: raw blocks kept per
          // phrase termId, positions decoded lazily per block (one decode no
          // matter how many queries/docs probe it) — the WAND scoring path
          // still never touches positions
          val phraseTids = bPhraseTids.value
          val rawPos: Map[Int, Array[PostingBlock]] =
            if (phraseTids.isEmpty) Map.empty
            else blockArr.iterator
              .filter { case (f, b) => f == 0 && phraseTids(b.termId) }.toArray
              .groupBy(_._2.termId)
              .map { case (t, ps) => t -> ps.map(_._2).sortBy(_.firstDocId) }
          val posCache = new java.util.HashMap[Long, (Array[Long], Array[Array[Int]])]()
          def positionsOf(tid: Int, doc: Long): Array[Int] = {
            val bs = rawPos.getOrElse(tid, null)
            if (bs == null) return null
            var lo = 0; var hi = bs.length - 1; var bi = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (bs(mid).firstDocId <= doc) { bi = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (bi < 0) return null
            val key = tid.toLong << 32 | bi.toLong
            var dec = posCache.get(key)
            if (dec == null) {
              val b = bs(bi)
              val tfs = VByte.decodeInts(b.tfs)
              dec = (VByte.decodeDocIds(b.docIdGaps), VByte.decodePositions(b.positions, tfs))
              posCache.put(key, dec)
            }
            val ix = java.util.Arrays.binarySearch(dec._1, doc)
            if (ix < 0) null else dec._2(ix)
          }
          // ordered-window chain: cand holds END positions of valid
          // prefixes; each step admits positions of the next term within
          // (prev, prev + 1 + slop]. slop 0 = exact adjacency.
          def phraseAt(ph: Array[Int], slop: Int, doc: Long): Boolean = {
            var cand = positionsOf(ph(0), doc)
            if (cand == null) return false
            var i = 1
            while (i < ph.length) {
              val pi = positionsOf(ph(i), doc)
              if (pi == null) return false
              cand = windowIntersect(cand, pi, 1, 1 + slop)
              if (cand.isEmpty) return false
              i += 1
            }
            true
          }
          bQ.value.iterator.flatMap { case (qid, specs) =>
            val rc = bCons.value.get(qid)
            // a required term with no postings in this bucket → no doc here
            // can satisfy the conjunction; same for a phrase term
            val hopeless = rc.exists(c =>
              c.required.exists(tid => !byFieldTerm.contains((0, tid))) ||
                c.phrases.exists(_._1.exists(tid => !rawPos.contains(tid))) ||
                // no member of a requiredAny group has postings here → no
                // doc in this bucket can satisfy the disjunction
                c.requiredAny.exists(g => !g.exists(tid => byFieldTerm.contains((0, tid)))) ||
                // fewer scoring terms with postings here than msm demands
                (c.minMatch > 0 &&
                  c.scoringIds.count(tid => byFieldTerm.contains((0, tid))) < c.minMatch))
            val cursors =
              if (hopeless) Array.empty[TermCursor]
              else specs.flatMap { case (f, tid, effIdf) =>
                byFieldTerm.get((f, tid))
                  .map(bs => new TermCursor(tid, bs, effIdf, avgdls(f), f))
              }
            if (cursors.isEmpty) Iterator.empty
            else {
              metrics.foreach(m =>
                m.candidates.add(cursors.iterator.map(_.totalDocs.toLong).sum))
              val theta0 = bTheta.value.getOrElse(qid, Double.NegativeInfinity)
              val admit: Long => Boolean = rc match {
                case None => null
                case Some(c) => (doc: Long) =>
                  c.required.forall(tid => containsDoc(byFieldTerm((0, tid)), doc)) &&
                    c.requiredAny.forall(g => g.exists(tid =>
                      byFieldTerm.get((0, tid)).exists(containsDoc(_, doc)))) &&
                    (c.minMatch == 0 || {
                      // early-exit count of distinct scoring terms present
                      var n = 0; var i = 0
                      while (n < c.minMatch && i < c.scoringIds.length) {
                        if (byFieldTerm.get((0, c.scoringIds(i)))
                          .exists(containsDoc(_, doc))) n += 1
                        i += 1
                      }
                      n >= c.minMatch
                    }) &&
                    !c.excluded.exists(tid =>
                      byFieldTerm.get((0, tid)).exists(containsDoc(_, doc))) &&
                    c.phrases.forall { case (ph, sl) => phraseAt(ph, sl, doc) } &&
                    !c.excludedPhrases.exists { case (ph, sl) => phraseAt(ph, sl, doc) }
              }
              if (countOnly) {
                // exact hit count, bucket-local: the union of the scoring
                // terms' posting docIds (already-decoded blocks), each
                // checked live (no -1 sentinel) and admitted. ONE partial
                // row rides the shuffle per (query, bucket), docId = count.
                val set = new java.util.HashSet[Long]()
                specs.foreach { case (f, tid, _) =>
                  byFieldTerm.get((f, tid)).foreach(_.foreach { b =>
                    val ids = b.ids
                    var i = 0
                    while (i < ids.length) { set.add(ids(i)); i += 1 }
                  })
                }
                if (sortDocs > 0) {
                  // SORT-BY-KEY mode: the bucket's top-`sortDocs` admitted
                  // docs by (key desc, docId asc) — the key is the collapse
                  // Column riding the url slot. Candidates ride the shuffle
                  // k-per-bucket; docId carries the REAL docId here.
                  val ts = new java.util.TreeSet[(String, Long)](KeyDocOrdering)
                  val dit = set.iterator()
                  while (dit.hasNext) {
                    val d = dit.next()
                    val len = docLens(0).get(d)
                    if (len == null)
                      throw new IllegalStateException(
                        s"no DocStat for docId $d — docstats pruning/build bug")
                    if (len.intValue() != -1 && (admit == null || admit(d)))
                      boundedAdd(ts, (docGroup.get(d), d), sortDocs)
                  }
                  import scala.jdk.CollectionConverters._
                  ts.iterator().asScala
                    .map { case (key, d) => ScoredDoc(qid, d, 0.0, key) }
                } else {
                // facet mode (collapse key present): per-value partial
                // counts; plain count mode: one total per bucket
                val perFacet =
                  if (docGroup == null) null else new java.util.HashMap[String, Long]()
                var cnt = 0L
                val dit = set.iterator()
                while (dit.hasNext) {
                  val d = dit.next()
                  val len = docLens(0).get(d)
                  if (len == null)
                    throw new IllegalStateException(
                      s"no DocStat for docId $d — docstats pruning/build bug")
                  if (len.intValue() != -1 && (admit == null || admit(d))) {
                    if (perFacet == null) cnt += 1
                    else {
                      val g = docGroup.get(d)
                      val prev = perFacet.get(g)
                      perFacet.put(g, (if (prev == null) 0L else prev) + 1L)
                      ()
                    }
                  }
                }
                if (perFacet == null) Iterator.single(ScoredDoc(qid, cnt, 0.0))
                else {
                  import scala.jdk.CollectionConverters._
                  perFacet.entrySet().iterator().asScala
                    .map(e => ScoredDoc(qid, e.getValue, 0.0, e.getKey))
                }
                }
              } else {
                val (aScore, aDoc) =
                  bAfter.value.getOrElse(qid, (Double.PositiveInfinity, -1L))
                val groupOf: Long => String =
                  if (docGroup == null) null else docGroup.get(_)
                val boostOf: Long => Double =
                  if (docBoost == null) null
                  else (d: Long) => docBoost.get(d) match {
                    case null =>
                      throw new IllegalStateException(
                        s"no funcScore boost for docId $d — docstats pruning/build bug")
                    case v: java.lang.Double => v.doubleValue()
                    case raw: String =>
                      val v = try java.lang.Double.parseDouble(raw) catch {
                        case _: NumberFormatException =>
                          throw new IllegalStateException(
                            s"non-numeric funcScore boost '$raw' for docId $d")
                      }
                      if (!(v > 0.0) || v > fsMax)
                        throw new IllegalStateException(
                          s"funcScore boost $v for docId $d outside (0, maxBoost=$fsMax]")
                      docBoost.put(d, java.lang.Double.valueOf(v))
                      v
                    case other =>
                      throw new IllegalStateException(s"unexpected boost slot $other")
                  }
                wandBucket(cursors, docLens, kk, metrics, theta0, admit, aScore, aDoc,
                  groupOf, boostOf, if (doFunc) fsMax else 1.0).iterator
                  .map { case (s, d) =>
                    ScoredDoc(qid, d, s, if (docGroup == null) "" else docGroup.get(d))
                  }
              }
            }
          }
        }
    }

    reduceFn(candidates)
  }
}
