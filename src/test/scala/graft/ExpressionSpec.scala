package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Native Catalyst expressions registered on the SQL surface. */
class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("vbyte_encode/vbyte_decode are SQL-callable exact inverses") {
    import spark.implicits._
    graft.functions.VByteExpressions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val gaps = Array.fill(1 + rnd.nextInt(50))(1L + rnd.nextInt(1000000))
      (i, gaps.scanLeft(0L)(_ + _).drop(1).toSeq)
    }
    val df = rows.toDF("id", "ids")
    val back = df.selectExpr("id", "vbyte_decode(vbyte_encode(ids)) AS back", "ids")
      .filter(expr("back <> ids"))
    assert(back.count() == 0)
    // and the plan stays in whole-stage codegen on a real (non-local) scan
    val ranged = spark.range(200)
      .selectExpr("id", "sequence(id + 1, id + 20) AS ids")
      .selectExpr("vbyte_decode(vbyte_encode(ids)) AS back")
    assert(ranged.filter(expr("size(back) = 20")).count() == 200)
    val plan = ranged.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact plan form
    assert(plan.contains("*(") , plan.take(500))
  }

  test("rolling_hash participates in codegen and SQL") {
    graft.functions.RollingHash.register(spark)
    val got = spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0)
    assert(got == graft.functions.RollingHash.hash("abc"))
  }
}
