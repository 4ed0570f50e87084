package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column.
  *
  * Baseline: brute-force cosine top-k via `zip_with` + `aggregate`
  * (codegen'd builtin higher-order functions; fixed left-to-right summation
  * so results are deterministic). Scale path: random-hyperplane LSH with
  * INTEGER hyperplane weights (deterministic, SQL-replicable sign bits),
  * bucketed self-join, exact rerank of candidates only. */
object Similarity {

  /** Normalized embeddings frame (vec_id, emb: array<double>); tolerates a
    * flattened `element: float` schema as a defensive fallback. */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
    if (raw.columns.contains("embedding"))
      raw.select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"),
        col("label"))
    else
      raw.select(col("vec_id"), array(col("element").cast("double")).as("emb"), col("label"))
  }

  /** Dot product with fixed sequential summation (aggregate = left fold). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k for a set of query vectors: broadcast the
    * (tiny) query side, rank by (round(cos,6) desc, vec_id). */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qemb"), col("emb")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy("query_id", "rk")
  }

  /** All near-duplicate pairs with cosine >= threshold (embedding-cosine
    * near-dup). O(n²) compare — at 100 TB this is what [[lshBuckets]]
    * prunes; kept exact here as the oracle-checkable baseline. */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("emb").as("emb_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("emb").as("emb_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", round(cosine(col("emb_a"), col("emb_b")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Deterministic integer hyperplane weight: w(plane, dim) ∈ [-3, 3]. */
  def planeWeight(plane: Int, dim: Int): Int = ((plane * 73 + dim * 179) % 7) - 3

  /** Multi-table random-hyperplane LSH: NumTables independent tables of
    * TableBits sign bits each; a pair is a candidate if ANY table agrees
    * (the OR-construction — same amplification shape as MinHash banding). */
  final val NumTables = 6
  final val TableBits = 3

  /** Exploded bucket rows: (vec_id, emb, table, key). */
  def lshBuckets(emb: DataFrame): DataFrame = {
    val dimCount = 64 // weight-vector length; extra dims beyond emb are ignored
    def bit(p: Int): Column = {
      val w = typedLit((0 until dimCount).map(d => planeWeight(p, d).toDouble))
      // dot(emb, w) with codegen-friendly size: one zip_with + fold instead
      // of dimCount try_element_at terms (keeps whole-stage codegen small)
      val s = aggregate(
        zip_with(col("emb"), w, (x, wc) => coalesce(x, lit(0.0)) * coalesce(wc, lit(0.0))),
        lit(0.0), (acc, x) => acc + x)
      when(s > 0, lit(1)).otherwise(lit(0))
    }
    val tables = (0 until NumTables).map { t =>
      val key = (0 until TableBits)
        .map(b => bit(t * TableBits + b) * lit(1 << b))
        .reduce(_ + _)
      struct(lit(t).as("table"), key.as("key"))
    }
    emb.withColumn("tk", explode(array(tables: _*)))
      .select(col("vec_id"), col("emb"), col("tk.table").as("table"), col("tk.key").as("key"))
  }

  /** ANN via LSH: bucket join for candidates (any-table match), exact
    * cosine rerank, top-k. Approximate by design — verified against brute
    * force by recall assertions in tests, not a SQL oracle. */
  def annTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val bucketed = lshBuckets(emb)
    val q = bucketed.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("emb").as("qemb"),
        col("table").as("qtable"), col("key").as("qkey"))
    val cand = bucketed.join(broadcast(q),
        col("table") === col("qtable") && col("key") === col("qkey") &&
          col("vec_id") =!= col("query_id"))
      .select("query_id", "qemb", "vec_id", "emb")
      .distinct() // a pair may match in several tables
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("cos", round(cosine(col("qemb"), col("emb")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos"))
      .orderBy("query_id", "rk")
  }
}
