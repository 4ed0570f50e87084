package graft

import graft.pipeline._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dedup + similarity pipeline invariants on the fixed corpus. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("exact duplicates have identical minhash signatures and simhash") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val sigs = Dedup.signatures(spark, sfDir)
      .map(s => (s.docId, s.sig.mkString(","), s.simhash))
      .toDF("doc_id", "sig", "simhash")
    val joined = docs.join(sigs, "doc_id")
    val groups = joined.groupBy("h")
      .agg(countDistinct(col("sig")).as("nsig"), countDistinct(col("simhash")).as("nsim"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1)
    assert(groups.filter(col("nsig") =!= 1 || col("nsim") =!= 1).count() == 0)
  }

  test("LSH candidates contain every pair with jaccard >= 0.7 (empirical recall on fixed corpus)") {
    import spark.implicits._
    val sigs = Dedup.signatures(spark, sfDir)
    val cands = Dedup.lshCandidates(sigs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs jaccard
    val ids = sigs.filter(_.nShingles > 0).map(_.docId).collect().sorted
    val all = ids.toSeq.toDF("doc_id")
    val pairs = all.as("a").join(all.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val exact = Dedup.jaccardVerify(spark, sfDir, pairs)
      .filter(col("jaccard") >= 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = exact -- cands
    assert(missed.isEmpty, s"LSH missed ${missed.size} high-jaccard pairs: ${missed.take(5)}")
  }

  test("jaccardVerify intersection is candidate-bounded (pairs relation below the count aggregate)") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val pairs = Seq((0L, 1L)).toDF("doc_a", "doc_b")
    val df = Dedup.jaccardVerify(spark, sfDir, pairs)
    val plan = df.queryExecution.optimizedPlan
    // every aggregate computing the intersection count must have the
    // candidate-pairs relation (leaf emitting doc_a/doc_b) in its SUBTREE —
    // i.e. the expensive shingle-equality join is candidate-pruned, not a
    // corpus-wide self-join filtered after the fact
    val interAggs = plan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.name == "inter") => a
    }
    assert(interAggs.nonEmpty, s"no intersection aggregate found:\n$plan")
    interAggs.foreach { a =>
      val hasPairsLeaf = a.collectLeaves().exists { l =>
        val names = l.output.map(_.name).toSet
        names.contains("doc_a") && names.contains("doc_b")
      }
      assert(hasPairsLeaf, s"intersection aggregate not bounded by the pairs relation:\n$a")
    }
    // the verify checkpoint-materializes the candidates' shingles (the
    // candidate semi-join happened when building that relation); the
    // aggregate inputs are joins against pairs only — assert no leaf is a
    // corpus-wide parquet scan of documents
    interAggs.foreach { a =>
      assert(!a.collectLeaves().exists(_.toString.contains("documents.parquet")),
        s"intersection reads the raw corpus directly:\n$a")
    }
  }

  test("prefix-filtered exact jaccard == all-pairs exact jaccard at threshold 0.5 (lossless)") {
    import spark.implicits._
    val ids = Dedup.signatures(spark, sfDir).filter(_.nShingles > 0).map(_.docId).collect()
    val all = ids.toSeq.toDF("doc_id")
    val allPairs = all.as("a").join(all.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val exact = Dedup.jaccardVerify(spark, sfDir, allPairs)
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaPrefix = Dedup.jaccardVerify(spark, sfDir, Dedup.prefixFilterPairs(spark, sfDir, 0.5))
      .filter(col("jaccard") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "no qualifying pairs on the fixture — test degenerate")
    assert(viaPrefix == exact,
      s"prefix filter lost ${(exact -- viaPrefix).size} / gained ${(viaPrefix -- exact).size} pairs")
  }

  test("simhash hamming distance of exact dups is 0; of random pairs usually > 0") {
    import spark.implicits._
    val sigs = Dedup.signatures(spark, sfDir).collect()
    val byHash = sigs.groupBy(_.simhash)
    assert(byHash.size > 1, "all simhashes identical — degenerate")
  }

  test("rolling_hash expression matches the Scala function and is codegen-compatible") {
    import spark.implicits._
    graft.functions.RollingHash.register(spark)
    val df = Seq("hello world", "a", "", "spark join merge").toDF("s")
    val got = df.select(col("s"), expr("rolling_hash(s)").as("h")).collect()
    got.foreach { r =>
      assert(r.getLong(1) == graft.functions.RollingHash.hash(r.getString(0)))
    }
  }

  test("hybrid IVF∪LSH ANN recall@5 >= 0.9 vs brute force (sf0.01)") {
    val emb = Similarity.embeddings(spark, "/root/testdata/sf0.01")
    val brute = Similarity.bruteForceTopK(emb, 0L until 10L, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.annTopK(emb, 0L until 10L, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ann.nonEmpty, "ANN returned nothing")
    val recall = (brute intersect ann).size.toDouble / brute.size.toDouble
    assert(recall >= 0.9, s"ANN recall@5 $recall below the 0.9 gate")
    info(s"hybrid IVF∪LSH ANN recall@5 = $recall")
  }

  test("hybrid ANN recall@5 >= 0.9 at sf0.001 too (robustness across scales)") {
    val emb = Similarity.embeddings(spark, sfDir)
    val brute = Similarity.bruteForceTopK(emb, 0L until 10L, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.annTopK(emb, 0L until 10L, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (brute intersect ann).size.toDouble / brute.size.toDouble
    assert(recall >= 0.9, s"ANN recall@5 $recall below the 0.9 gate")
    info(s"hybrid IVF∪LSH ANN recall@5 (sf0.001) = $recall")
  }

  test("LSH near-dup pairs == exact cartesian pairs on the planted fixture (recall 1.0)") {
    for (d <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val emb = Similarity.withPlantedNearDups(Similarity.embeddings(spark, d))
      val exact = Similarity.cosineNearDupPairs(emb, 0.99).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val lsh = Similarity.lshNearDupPairs(emb, 0.99).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(exact.nonEmpty, s"$d: no planted pairs found — injection broken")
      assert(lsh == exact, s"$d: LSH missed ${(exact -- lsh).size}, extra ${(lsh -- exact).size}")
      // every planted base must pair with its jittered copy
      val planted = Similarity.embeddings(spark, d)
        .filter(org.apache.spark.sql.functions.expr("vec_id % 10 = 0"))
        .count()
      assert(exact.count { case (a, b, _) => b == a + Similarity.PlantOffset } == planted)
    }
  }

  test("multimodal feature extraction: stub decode is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(Multimodal.mediaRows(spark, sfDir)).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(Multimodal.mediaRows(spark, sfDir)).collect().sortBy(_.id)
    assert(f1.toSeq == f2.toSeq)
    f1.foreach { f =>
      assert(f.nChunks == (f.payloadLen + 255) / 256)
      assert(f.firstByte >= 0 && f.firstByte < 256)
    }
  }
}
