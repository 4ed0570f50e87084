package graft.query

import graft.index.{TermDoc, TermEntry}
import org.apache.spark.sql.Dataset

/** Brute-force BM25 scorer — the golden oracle for rank-identical tests
  * (the analog of the reference's encode→decode round-trip golden checks,
  * tests/test_tokenize.py:201-250). Same formula, same ascending-termId
  * summation order, same (score desc, docId asc) ranking as [[Wand]], so
  * scores must match EXACTLY (double equality), not approximately.
  *
  * Driver-side over a collected corpus — test/bench-scale only by design.
  */
object OracleScorer {

  /** @param termDocs  collected (term, docId, tf, docLen) rows
    * @param dict      term → TermEntry (termId, df)
    * @param nDocs     corpus size
    * @param avgdl     exact average doc length
    */
  final class Oracle(
      termDocs: Array[TermDoc],
      dict: Map[String, TermEntry],
      nDocs: Long,
      avgdl: Double
  ) {
    // term -> (docId -> (tf, docLen))
    private val postings: Map[String, Array[TermDoc]] =
      termDocs.groupBy(_.term).map { case (t, arr) => t -> arr.sortBy(_.docId) }

    def topK(terms: Seq[String], k: Int): Array[(Double, Long)] =
      topK(terms, k, Map.empty[String, Double])

    /** Boosted variant: per-term weight folded into idf BEFORE the impact,
      * mirroring Wand's effIdf = boost · idf exactly (bit-for-bit). */
    def topK(terms: Seq[String], k: Int, boosts: Map[String, Double]): Array[(Double, Long)] = {
      // dedup query terms; resolve; sort by termId ascending (summation order)
      val resolved = terms.distinct
        .flatMap(t => dict.get(t).map(e => (e, t)))
        .sortBy(_._1.termId)
      val acc = scala.collection.mutable.LinkedHashMap.empty[Long, Double]
      // iterate terms in ascending-termId order; accumulate per doc in that
      // order — identical addend order to Wand's exact evaluation.
      val perDoc = scala.collection.mutable.HashMap.empty[Long, List[Double]]
      resolved.foreach { case (entry, term) =>
        val idf = boosts.getOrElse(term, 1.0) * Bm25.idf(nDocs, entry.df)
        postings.getOrElse(term, Array.empty).foreach { p =>
          val impact = Bm25.scoreWithIdf(idf, p.tf, p.docLen, avgdl)
          perDoc.updateWith(p.docId) {
            case Some(l) => Some(impact :: l)
            case None    => Some(impact :: Nil)
          }
        }
      }
      // impacts were prepended (reverse termId order) — fold right-to-left
      // to sum in ascending termId order
      val scored = perDoc.iterator.map { case (docId, impactsRev) =>
        var s = 0.0
        impactsRev.reverse.foreach(i => s += i)
        (s, docId)
      }.toArray
      scored
        .sortBy { case (s, d) => (-s, d) }
        .take(k)
    }
  }

  def build(td: Dataset[TermDoc], dict: Map[String, TermEntry], nDocs: Long, avgdl: Double): Oracle =
    new Oracle(td.collect(), dict, nDocs, avgdl)
}
