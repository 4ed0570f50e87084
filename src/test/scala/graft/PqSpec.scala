package graft

import graft.pipeline.Similarity
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Product quantization + ADC: the compressed-domain ANN path must hit
  * recall ≥ 0.9 vs brute force at two corpus scales, encode
  * deterministically, and actually compress (PqM codes per vector). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def recallAt(sfDir: String, k: Int): Double = {
    val emb = Similarity.embeddings(spark, sfDir)
    val queries = 0L until 10L
    val brute = Similarity.bruteForceTopK(emb, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val pq = Similarity.annTopKPQ(emb, queries, k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (q, rs) => q -> rs.map(_._2).toSet }
    val hits = brute.map { case (q, want) => (pq.getOrElse(q, Set.empty) & want).size }.sum
    hits.toDouble / brute.values.map(_.size).sum
  }

  test("PQ+ADC recall@5 >= 0.9 vs brute force (sf0.01)") {
    val r = recallAt("/root/testdata/sf0.01", 5)
    info(f"recall@5 = $r%.3f")
    assert(r >= 0.9, f"PQ recall $r%.3f below gate")
  }

  test("PQ+ADC recall@5 >= 0.9 at sf0.001 too (robustness across scales)") {
    val r = recallAt("/root/testdata/sf0.001", 5)
    info(f"recall@5 = $r%.3f")
    assert(r >= 0.9, f"PQ recall $r%.3f below gate")
  }

  test("codes are PqM bytes per vector and encoding is deterministic") {
    import spark.implicits._
    val emb = Similarity.embeddings(spark, "/root/testdata/sf0.001")
    val sample = emb.orderBy("vec_id").limit(Similarity.PqSampleCap)
      .select("emb").as[Array[Double]].collect()
    val cb = Similarity.trainPqCodebooks(sample, Similarity.PqM, Similarity.PqK, Similarity.PqIters)
    // codebook shape: M subspaces × ≤K codewords
    assert(cb.length == Similarity.PqM && cb.forall(_.length <= Similarity.PqK))
    val a = Similarity.pqEncode(emb, cb).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    val b = Similarity.pqEncode(emb, cb).orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
    assert(a.toSeq == b.toSeq, "PQ encoding must be deterministic")
    assert(a.forall(_._2.length == Similarity.PqM), "one code per subspace")
    // codes actually discriminate: not all vectors share one codeword tuple
    assert(a.map(_._2).distinct.length > a.length / 4, "degenerate codebooks")
  }
}
