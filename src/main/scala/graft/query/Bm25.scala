package graft.query

/** BM25 scoring (k1=1.2, b=0.75 fixed per the north rule).
  *
  * The exact floating-point expression shape below is replicated verbatim in
  * the DuckDB oracle SQL — operation order matters for rank-identical
  * comparison (the engine analog of MidiTok's deterministic tie-break-sort
  * discipline, midi_tokenizer.py:738-741).
  *
  * Summation over query terms is ALWAYS in ascending termId order
  * (fixed float summation order; SURVEY.md §7 "hard parts").
  */
object Bm25 {
  val K1: Double = 1.2
  val B: Double = 0.75

  /** Lucene-style smoothed idf: ln((N - df + 0.5)/(df + 0.5) + 1). */
  def idf(nDocs: Long, df: Long): Double =
    math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0)

  /** Per-(term, doc) impact. */
  def score(tf: Int, docLen: Int, df: Long, nDocs: Long, avgdl: Double): Double =
    idf(nDocs, df) * (tf * (K1 + 1.0)) /
      (tf + K1 * (1.0 - B + B * docLen / avgdl))

  /** Impact given a precomputed idf (hot path: idf per term is constant). */
  def scoreWithIdf(idfVal: Double, tf: Int, docLen: Int, avgdl: Double): Double =
    idfVal * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * docLen / avgdl))
}
