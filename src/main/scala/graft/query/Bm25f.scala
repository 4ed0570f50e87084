package graft.query

import graft.index._
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Fielded (multi-vocabulary) BM25F retrieval — the engine analog of the
  * reference's parallel-token-stream tokenizers: Octuple/CPWord emit
  * MULTIPLE vocabularies over one document per timestep
  * (tokenizations/octuple.py:173-203, cp_word.py:319-416; `is_multi_voc`
  * midi_tokenizer.py:3691-3698). Here one logical document carries several
  * FIELDS (title/body/anchor…), each with its own sub-index — own
  * dictionary, postings, norms, (nDocs, avgdl) — and the ranked score is
  * the weighted per-field BM25 sum:
  *
  *   score(q, d) = Σ_f w_f · Σ_t BM25_f(t, d)
  *
  * Distribution shape: identical to [[Wand.topK]] (bucket cogroup, exact
  * per-bucket WAND, bounded-heap reduce). BM25 impact is LINEAR in idf, so
  * a fielded query is exactly a multi-cursor WAND where each (field, term)
  * pair contributes an independent cursor with effective idf = w_f · idf_f
  * — upper bounds are the weighted sums of per-field block bounds for free,
  * and the shared kernel needs no field-specific logic beyond per-cursor
  * (docLen, avgdl) lookup. Exactness discipline matches WAND: per-doc
  * impacts sum in (field, termId) cursor order, threshold seeding uses the
  * per-field maxDocLen lower bound, heap tie-break prefers smaller docId.
  *
  * All sub-indexes must share block geometry (bucketRange/blockSize), so
  * one docId bucket cogroups every field's postings and norms together. A
  * document absent from a field (e.g. no body) simply has no cursors
  * there — its score is the sum over the fields that contain it.
  * Tombstone deletes compose: a doc deleted from ANY sub-index is dead for
  * the logical document (its id rides into every field's cogroup map as a
  * docLen = -1 sentinel, the same mechanism as [[Wand.topK]]); per-field
  * live stats keep the scores exact post-delete (Bm25fSpec: delete ==
  * rebuilt-pair equality). */
object Bm25f {

  /** Distributed fielded top-k. `fields` = (sub-index handle, weight) per
    * field; returns exact (score, docId) per query, ranked (score desc,
    * docId asc), up to k rows each. */
  def topK(fields: Seq[(IndexHandle, Double)], queries: Seq[QuerySpec],
      k: Int): Map[Int, Array[(Double, Long)]] = {
    require(fields.nonEmpty, "at least one field")
    val spark = fields.head._1.spark
    import spark.implicits._
    val m0 = fields.head._1.manifest
    require(fields.forall { case (h, _) =>
      h.manifest.bucketRange == m0.bucketRange && h.manifest.blockSize == m0.blockSize },
      "fielded sub-indexes must share block geometry (bucketRange, blockSize)")
    val nF = fields.length
    val kk = k
    val allTerms = queries.flatMap(_.terms)
    val dicts = fields.map { case (h, _) => h.lookupTerms(allTerms) }
    val avgdls = fields.map(_._1.manifest.avgdl).toArray

    // per query: cursor specs (field, termId, effIdf = w_f · idf_f),
    // sorted by (field, termId) — the kernel's deterministic accum order
    val qSpecs: Map[Int, Array[(Int, Int, Double)]] = queries.map { q =>
      q.queryId -> (for {
        f <- 0 until nF
        t <- q.terms.distinct
        e <- dicts(f).get(t)
      } yield (f, e.termId,
          fields(f)._2 * Bm25.idf(fields(f)._1.manifest.nDocs, e.df)))
        .sortBy(x => (x._1, x._2)).toArray
    }.toMap
    if (qSpecs.values.forall(_.isEmpty))
      return queries.map(q => q.queryId -> Array.empty[(Double, Long)]).toMap

    // threshold seed — the per-field twin of Wand's: a (field, term) with
    // df_f >= k has df_f docs whose FULL fielded score is at least
    // w_f · impact_f(tf=1, maxDocLen_f); the max of those minima
    // lower-bounds the true kth-best score (manifest + dictionary only)
    val thetaSeed: Map[Int, Double] = queries.flatMap { q =>
      val bounds = for {
        f <- 0 until nF
        if fields(f)._1.manifest.maxDocLen > 0
        t <- q.terms.distinct
        e <- dicts(f).get(t)
        if e.df >= kk
      } yield Bm25.scoreWithIdf(
        fields(f)._2 * Bm25.idf(fields(f)._1.manifest.nDocs, e.df),
        1, fields(f)._1.manifest.maxDocLen, avgdls(f))
      if (bounds.isEmpty) None else Some(q.queryId -> math.nextDown(bounds.max))
    }.toMap

    val bucketRange = m0.bucketRange
    val bpb = m0.bucketRange / m0.blockSize
    val idsByField: IndexedSeq[Seq[Int]] =
      (0 until nF).map(f => dicts(f).values.map(_.termId).toSeq.distinct)

    // field-tagged candidate blocks (termId pushdown per field)
    val fBlocks: Dataset[(Int, PostingBlock)] = (0 until nF).map { f =>
      val ids = idsByField(f)
      if (ids.isEmpty) spark.emptyDataset[(Int, PostingBlock)]
      else fields(f)._1.postings
        .filter(col("termId").isin(ids.map(Int.box): _*))
        .map(b => (f, b))
    }.reduce(_ union _)

    // candidate docId buckets across ALL fields (two-path pruning, exactly
    // like Wand.topK: bounded predicate probe, distributed semi-join beyond)
    val candBuckets = (0 until nF).flatMap { f =>
      val ids = idsByField(f)
      if (ids.isEmpty) None
      else Some(fields(f)._1.postings.toDF()
        .filter(col("termId").isin(ids.map(Int.box): _*))
        .select((col("blockId") / lit(bpb)).cast("long").as("bucket")))
    }.reduce(_ unionByName _).distinct()
    val probe: Array[Long] =
      candBuckets.limit(Wand.MaxPredicateBuckets + 1).as[Long].collect()
    if (probe.isEmpty)
      return queries.map(q => q.queryId -> Array.empty[(Double, Long)]).toMap

    // tombstoned docs (union across fields — a doc deleted from ANY
    // sub-index is dead for the logical document) ride into the cogroup as
    // docLen = -1 sentinels for EVERY field, exactly like Wand.topK's
    // single-field path: the kernel must see the sentinel regardless of
    // which field's cursor sits at the pivot
    val tombSentinels: Dataset[(Int, DocStat)] = {
      val tombed = fields.map(_._1).filter(_.manifest.tombVersion >= 0)
      if (tombed.isEmpty) spark.emptyDataset[(Int, DocStat)]
      else {
        val ids = tombed.map(_.tombstones.toDF("docId")).reduce(_ unionByName _).distinct()
          .withColumn("bucket", (col("docId") / lit(bucketRange)).cast("long"))
        val pruned =
          if (probe.length <= Wand.MaxPredicateBuckets)
            ids.filter(col("bucket").isin(probe.toIndexedSeq.map(Long.box): _*))
          else ids.join(candBuckets, Seq("bucket"), "left_semi")
        pruned.select("docId").as[Long]
          .flatMap(d => (0 until nF).iterator.map(f => (f, DocStat(d, "", -1))))
      }
    }

    val fStats: Dataset[(Int, DocStat)] = (0 until nF).map { f =>
      val h = fields(f)._1
      val pruned =
        if (probe.length <= Wand.MaxPredicateBuckets) Wand.docstatsForBuckets(h, probe)
        else h.docstatsRaw.toDF()
          .withColumn("bucket", (col("docId") / lit(bucketRange)).cast("long"))
          .join(candBuckets, Seq("bucket"), "left_semi")
          .drop("bucket")
          .as[DocStat]
      pruned.toDF().select("docId", "url", "docLen").as[DocStat].map(s => (f, s))
    }.reduce(_ union _).union(tombSentinels)

    val bQ = spark.sparkContext.broadcast(qSpecs)
    val bTheta = spark.sparkContext.broadcast(thetaSeed)
    val blocksByBucket = fBlocks.groupByKey(_._2.blockId / bpb)
    val statsByBucket = fStats.groupByKey(_._2.docId / bucketRange)

    val candidates: Dataset[ScoredDoc] = blocksByBucket.cogroup(statsByBucket) {
      (bucket, blocks, stats) =>
        val blockArr = blocks.toArray
        if (blockArr.isEmpty) Iterator.empty
        else {
          val docLens = Array.fill(nF)(new java.util.HashMap[Long, Integer]())
          // shuffle order is arbitrary: a -1 tombstone sentinel must win
          // over the doc's real norm either way round (same as Wand.topK)
          stats.foreach { case (f, s) =>
            if (s.docLen == -1) docLens(f).put(s.docId, Integer.valueOf(-1))
            else docLens(f).putIfAbsent(s.docId, Integer.valueOf(s.docLen))
            ()
          }
          val byFieldTerm: Map[(Int, Int), Array[Wand.DecodedBlock]] =
            blockArr.groupBy(p => (p._1, p._2.termId)).map { case (key, ps) =>
              key -> ps.map(_._2).sortBy(_.firstDocId).map(Wand.DecodedBlock(_, None))
            }
          bQ.value.iterator.flatMap { case (qid, specs) =>
            val cursors = specs.flatMap { case (f, tid, effIdf) =>
              byFieldTerm.get((f, tid))
                .map(bs => new Wand.TermCursor(tid, bs, effIdf, avgdls(f), f))
            }
            if (cursors.isEmpty) Iterator.empty
            else {
              val theta0 = bTheta.value.getOrElse(qid, Double.NegativeInfinity)
              Wand.wandBucket(cursors, docLens, kk, None, theta0).iterator
                .map { case (s, d) => ScoredDoc(qid, d, s) }
            }
          }
        }
    }

    // reduce: per-query global top-k with a bounded heap (no full sort)
    val reduced = candidates.groupByKey(_.queryId).mapGroups { (qid, it) =>
      val heap = new Wand.TopKHeap(kk)
      it.foreach(c => heap.offer(c.score, c.docId))
      (qid, heap.ranked.map { case (s, d) => (s, d) })
    }.collect().toMap
    queries.map(q => q.queryId -> reduced.getOrElse(q.queryId, Array.empty)).toMap
  }
}
