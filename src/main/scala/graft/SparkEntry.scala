package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 has a `queries` entry; each entry
  * with a SQL-expressible semantics also has a DuckDB `oracleSql` twin with
  * IDENTICAL column names and deterministic row order.
  */
object SparkEntry {

  /** Flagship: full index build (SPIMI + VByte + block-max) over the
    * sf0.001 corpus, then block-max WAND BM25 top-10 for the fixture
    * query set. Driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    IndexQueries.queries("q_bm25_topk")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "q1_agg" -> ((s: SparkSession, dir: String) => {
        s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity")).cast("double").as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      })
    ) ++ IndexQueries.queries ++ RelationalQueries.queries ++
      PipelineQueries.queries ++ VocabQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Map(
      "q1_agg" ->
        ("SELECT l_returnflag, sum(l_quantity) AS sum_qty, count(*) AS n " +
          "FROM lineitem GROUP BY 1 ORDER BY 1")
    ) ++ IndexQueries.oracles ++ RelationalQueries.oracles ++
      PipelineQueries.oracles ++ VocabQueries.oracles
}
