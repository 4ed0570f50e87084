package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One BPE merge step. */
final case class MergeStep(step: Int, left: String, right: String, count: Long, merged: String)

/** One WordPiece merge step: the pair maximizing the likelihood score
  * count(l,r) / (count(l)·count(r)) rather than the raw pair count. */
final case class WpMergeStep(step: Int, left: String, right: String, count: Long,
    score: Double, merged: String)

/** Iterative frequency-driven vocabulary merges — the faithful engine analog
  * of MidiTok's BPE `train` loop (midi_tokenizer.py:2681-2938): repeatedly
  * count adjacent token pairs over the whole corpus, merge the most frequent
  * pair into a new vocabulary unit, rewrite the corpus, repeat.
  *
  * Shape at scale: a driver loop over a cached typed Dataset; each iteration
  * is one partial+final hash aggregation (pair count) + one map (merge
  * rewrite). Deterministic: argmax tie-break is (count desc, left asc,
  * right asc); merge application is leftmost-non-overlapping, like the
  * reference's deterministic BPE path (vs its explicitly-nondeterministic
  * Unigram path, midi_tokenizer.py:2723-2727, which we avoid). */
object PhraseVocab {

  /** Argmax/candidate orderings tie-break term strings in UTF-8 BINARY
    * (code-point) order — the collation of the DataFrame `orderBy` these
    * RDD loops replaced AND of the DuckDB replay oracles; Java
    * `String.compareTo` (UTF-16 units) would diverge on
    * supplementary-plane terms. */
  private def cmp2(a: (String, String), b: (String, String)): Int = {
    val c = Overlap.utf8Compare(a._1, b._1)
    if (c != 0) c else Overlap.utf8Compare(a._2, b._2)
  }

  private val PairCountDescOrd: Ordering[((String, String), Long)] =
    new Ordering[((String, String), Long)] {
      def compare(a: ((String, String), Long), b: ((String, String), Long)): Int = {
        val c = java.lang.Long.compare(b._2, a._2) // count desc
        if (c != 0) c else cmp2(a._1, b._1)
      }
    }

  private val ScoreDescOrd: Ordering[(String, String, Long, Double)] =
    new Ordering[(String, String, Long, Double)] {
      def compare(a: (String, String, Long, Double), b: (String, String, Long, Double)): Int = {
        val c = java.lang.Double.compare(b._4, a._4) // score desc
        if (c != 0) c else cmp2((a._1, a._2), (b._1, b._2))
      }
    }

  private val CountDescOrd: Ordering[(String, String, Long)] =
    new Ordering[(String, String, Long)] {
      def compare(a: (String, String, Long), b: (String, String, Long)): Int = {
        val c = java.lang.Long.compare(b._3, a._3) // count desc
        if (c != 0) c else cmp2((a._1, a._2), (b._1, b._2))
      }
    }

  /** Apply one merge to a token sequence: leftmost non-overlapping. */
  def applyMerge(tokens: Array[String], left: String, right: String, merged: String): Array[String] = {
    if (tokens.length < 2) return tokens
    val out = new scala.collection.mutable.ArrayBuffer[String](tokens.length)
    var i = 0
    while (i < tokens.length) {
      if (i + 1 < tokens.length && tokens(i) == left && tokens(i + 1) == right) {
        out += merged
        i += 2
      } else {
        out += tokens(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Adjacent-pair counts over the corpus (one hash-agg job). */
  def pairCounts(docs: Dataset[(Long, Array[String])]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.flatMap { case (_, ts) =>
      if (ts.length < 2) Iterator.empty
      else (0 until ts.length - 1).iterator.map(i => (ts(i), ts(i + 1)))
    }.toDF("left", "right").groupBy("left", "right").agg(count(lit(1)).as("cnt"))
  }

  /** Adjacent pairs of one document, as an iterator (shared by the RDD
    * trainer cores). */
  private def adjacentPairs(ts: Array[String]): Iterator[(String, String)] =
    if (ts.length < 2) Iterator.empty
    else (0 until ts.length - 1).iterator.map(i => (ts(i), ts(i + 1)))

  /** Run `numMerges` BPE iterations; returns the merge table, the final
    * rewritten corpus, and a release handle freeing the trainer's cache
    * (call it once the final corpus has been consumed).
    *
    * The iteration loop runs on the RDD layer (guide §1.2: per-task work):
    * the corpus caches as JVM OBJECTS (`MEMORY_AND_DISK`), so each of the
    * loop's full-corpus scans skips the columnar encode/decode a Dataset
    * cache pays per pass, the per-iteration Catalyst analyze/optimize cost
    * of a logical plan that grows with every rewrite disappears, and each
    * iteration is exactly ONE job: `reduceByKey` (map-side combine — the
    * same partial-aggregation shape as the DF hash agg) + a driver
    * `takeOrdered(1)` under the (count desc, left, right) total order.
    * Counts are exact integers and the order is total, so the merge
    * sequence is bit-identical to the previous DataFrame loop (BpeSpec
    * asserts equality with the single-threaded reference). */
  def train(docs0: Dataset[(Long, Array[String])], numMerges: Int): (Seq[MergeStep], Dataset[(Long, Array[String])], () => Unit) = {
    val spark = docs0.sparkSession
    import spark.implicits._
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var docs = docs0.rdd.persist(sl)
    // the parent of `docs`; unpersisted only AFTER a job has materialized
    // `docs` (the pair-count job), so each iteration stays one job
    var parent: org.apache.spark.rdd.RDD[(Long, Array[String])] = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[MergeStep]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val top = docs.flatMap { case (_, ts) => adjacentPairs(ts) }
        .map((_, 1L)).reduceByKey(_ + _)
        .takeOrdered(1)(PairCountDescOrd)
      if (parent != null) { parent.unpersist(); parent = null }
      if (top.isEmpty || top(0)._2 < 2) done = true
      else {
        val ((l, r), c) = top(0)
        val m = l + "_" + r
        merges += MergeStep(step, l, r, c, m)
        parent = docs
        docs = docs.map { case (id, ts) => (id, applyMerge(ts, l, r, m)) }.persist(sl)
        step += 1
      }
    }
    // materialize the final rewrite once so the last parent can be dropped
    if (parent != null) { docs.count(); parent.unpersist() }
    val out = docs
    (merges.toSeq, spark.createDataset(out), () => { out.unpersist(); () })
  }

  /** WordPiece-style training: the merge argmax is the LIKELIHOOD score
    * `count(l,r) / (count(l)·count(r))` — pairs that co-occur more than
    * their unigram frequencies predict win, rather than the raw-count BPE
    * argmax. The reference trains BPE, Unigram AND WordPiece through the
    * same surface (midi_tokenizer.py:2784-2832); this is the engine's
    * second trainer, exercising a join-scored aggregation the BPE loop
    * never does (pair counts ⋈ unigram counts).
    *
    * Determinism (cross-engine): candidates are pairs with count >= 2;
    * the score is one double multiply + one divide of exact integer
    * counts — bit-identical in the JVM and the SQL oracle — and ties break
    * on (left, right). Each iteration is ONE Spark action (the pair and
    * unigram aggregations meet in a single top-1 job). */
  def trainWordPiece(docs0: Dataset[(Long, Array[String])], numMerges: Int): (Seq[WpMergeStep], Dataset[(Long, Array[String])], () => Unit) = {
    val spark = docs0.sparkSession
    import spark.implicits._
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var docs = docs0.rdd.persist(sl)
    var parent: org.apache.spark.rdd.RDD[(Long, Array[String])] = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[WpMergeStep]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      // one object-cache scan feeds BOTH aggregations; the pair⋈unigram
      // scoring joins stay distributed (the unigram relation is the CORPUS
      // vocabulary — never collected to the driver, same discipline as the
      // dictionary build's broadcastVocabMax split). The score is one
      // double multiply + one divide of exact integer counts — bit-
      // identical to the previous DataFrame loop and the SQL oracle.
      val uni = docs.flatMap { case (_, ts) => ts.iterator }
        .map((_, 1L)).reduceByKey(_ + _)
      val top = docs.flatMap { case (_, ts) => adjacentPairs(ts) }
        .map((_, 1L)).reduceByKey(_ + _)
        .filter(_._2 >= 2)
        .map { case ((l, r), c) => (l, (r, c)) }.join(uni)
        .map { case (l, ((r, c), cl)) => (r, (l, c, cl)) }.join(uni)
        .map { case (r, ((l, c, cl), cr)) =>
          (l, r, c, c.toDouble / (cl.toDouble * cr.toDouble))
        }
        .takeOrdered(1)(ScoreDescOrd)
      if (parent != null) { parent.unpersist(); parent = null }
      if (top.isEmpty) done = true
      else {
        val (l, r, c, sc) = top(0)
        val m = l + "_" + r
        merges += WpMergeStep(step, l, r, c, sc, m)
        parent = docs
        docs = docs.map { case (id, ts) => (id, applyMerge(ts, l, r, m)) }.persist(sl)
        step += 1
      }
    }
    if (parent != null) { docs.count(); parent.unpersist() }
    val out = docs
    (merges.toSeq, spark.createDataset(out), () => { out.unpersist(); () })
  }

  /** Apply one E-step fuse pass: every adjacent pair in `qualifying` is
    * fused leftmost-non-overlapping into `l_r`. */
  def applyFuseSet(tokens: Array[String], qualifying: Set[(String, String)]): Array[String] = {
    if (tokens.length < 2) return tokens
    val out = new scala.collection.mutable.ArrayBuffer[String](tokens.length)
    var i = 0
    while (i < tokens.length) {
      if (i + 1 < tokens.length && qualifying((tokens(i), tokens(i + 1)))) {
        out += tokens(i) + "_" + tokens(i + 1)
        i += 2
      } else {
        out += tokens(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Unigram-style EM training — the third trainer of the reference's
    * multi-model surface (midi_tokenizer.py:2784-2832). Unlike the
    * bottom-up single-pair argmax of BPE/WordPiece, each iteration is a
    * full E/M cycle: the E-step SEGMENTS the whole corpus under the current
    * unigram model — every adjacent pair whose joint count beats its
    * independence prediction (cnt(l,r)·N > cnt(l)·cnt(r), i.e. positive
    * PMI; top-`cap` such pairs by (cnt desc, l, r)) is fused leftmost-
    * non-overlapping in ONE pass — and the M-step re-estimates unit
    * frequencies from the new segmentation (the next iteration's counts).
    * The fuse decision is pure int64 arithmetic (exact below ~3·10^9
    * corpus tokens; beyond that compare in log space), so the whole chain
    * replays exactly in SQL. Each iteration is ONE Spark job collecting at
    * most `cap` qualifying pairs — never a vocabulary-sized collect. */
  def trainUnigram(
      docs0: Dataset[(Long, Array[String])],
      iters: Int,
      cap: Int
  ): (Seq[Int], Dataset[(Long, Array[String])], () => Unit) = {
    val spark = docs0.sparkSession
    import spark.implicits._
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var docs = docs0.rdd.persist(sl)
    var parent: org.apache.spark.rdd.RDD[(Long, Array[String])] = null
    val perStep = scala.collection.mutable.ArrayBuffer.empty[Int]
    var step = 0
    var done = false
    while (step < iters && !done) {
      // unigram model cached for this iteration (it feeds the total-count
      // reduce AND both scoring joins); the PMI test stays pure int64
      val uni = docs.flatMap { case (_, ts) => ts.iterator }
        .map((_, 1L)).reduceByKey(_ + _).persist(sl)
      val total = uni.map(_._2).fold(0L)(_ + _)
      val q = docs.flatMap { case (_, ts) => adjacentPairs(ts) }
        .map((_, 1L)).reduceByKey(_ + _)
        .filter(_._2 >= 2)
        .map { case ((l, r), c) => (l, (r, c)) }.join(uni)
        .map { case (l, ((r, c), cl)) => (r, (l, c, cl)) }.join(uni)
        .collect { case (r, ((l, c, cl), cr)) if c * total > cl * cr => (l, r, c) }
        .takeOrdered(cap)(CountDescOrd)
      uni.unpersist()
      if (parent != null) { parent.unpersist(); parent = null }
      if (q.isEmpty) done = true
      else {
        val set = q.map { case (l, r, _) => (l, r) }.toSet
        perStep += set.size
        parent = docs
        docs = docs.map { case (id, ts) => (id, applyFuseSet(ts, set)) }.persist(sl)
        step += 1
      }
    }
    if (parent != null) { docs.count(); parent.unpersist() }
    val out = docs
    (perStep.toSeq, spark.createDataset(out), () => { out.unpersist(); () })
  }

  /** Single-threaded Unigram-EM reference for tests (the oracle twin). */
  def trainUnigramLocal(corpus: Seq[Array[String]], iters: Int, cap: Int): (Seq[Int], Seq[Array[String]]) = {
    var docs = corpus
    val perStep = scala.collection.mutable.ArrayBuffer.empty[Int]
    var step = 0
    var done = false
    while (step < iters && !done) {
      val uni = scala.collection.mutable.HashMap.empty[String, Long]
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      docs.foreach { ts =>
        ts.foreach(t => uni.updateWith(t)(v => Some(v.getOrElse(0L) + 1)))
        var i = 0
        while (i + 1 < ts.length) {
          pairs.updateWith((ts(i), ts(i + 1)))(v => Some(v.getOrElse(0L) + 1))
          i += 1
        }
      }
      val total = uni.valuesIterator.sum
      val q = pairs.iterator
        .filter { case ((l, r), c) => c >= 2 && c * total > uni(l) * uni(r) }
        .toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .take(cap)
        .map(_._1).toSet
      if (q.isEmpty) done = true
      else {
        perStep += q.size
        docs = docs.map(ts => applyFuseSet(ts, q))
        step += 1
      }
    }
    (perStep.toSeq, docs)
  }

  /** Single-threaded WordPiece reference for tests (the oracle twin). */
  def trainLocalWordPiece(corpus: Seq[Array[String]], numMerges: Int): Seq[WpMergeStep] = {
    var docs = corpus
    val merges = scala.collection.mutable.ArrayBuffer.empty[WpMergeStep]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val uni = scala.collection.mutable.HashMap.empty[String, Long]
      val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
      docs.foreach { ts =>
        ts.foreach(t => uni.updateWith(t)(v => Some(v.getOrElse(0L) + 1)))
        var i = 0
        while (i + 1 < ts.length) {
          pairs.updateWith((ts(i), ts(i + 1)))(v => Some(v.getOrElse(0L) + 1))
          i += 1
        }
      }
      val cands = pairs.iterator.filter(_._2 >= 2).map { case ((l, r), c) =>
        (l, r, c, c.toDouble / (uni(l).toDouble * uni(r).toDouble))
      }.toSeq
      if (cands.isEmpty) done = true
      else {
        val (l, r, c, sc) = cands.minBy { case (a, b, _, s) => (-s, a, b) }
        val m = l + "_" + r
        merges += WpMergeStep(step, l, r, c, sc, m)
        docs = docs.map(ts => applyMerge(ts, l, r, m))
        step += 1
      }
    }
    merges.toSeq
  }

  /** Single-threaded reference implementation for tests (the oracle). */
  def trainLocal(corpus: Seq[Array[String]], numMerges: Int): Seq[MergeStep] = {
    var docs = corpus
    val merges = scala.collection.mutable.ArrayBuffer.empty[MergeStep]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      docs.foreach { ts =>
        var i = 0
        while (i + 1 < ts.length) {
          counts.updateWith((ts(i), ts(i + 1))) { v => Some(v.getOrElse(0L) + 1) }
          i += 1
        }
      }
      if (counts.isEmpty || counts.values.max < 2) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        val m = l + "_" + r
        merges += MergeStep(step, l, r, c, m)
        docs = docs.map(ts => applyMerge(ts, l, r, m))
        step += 1
      }
    }
    merges.toSeq
  }
}
