package graft

import graft.plans.GlobalRank
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Exact order statistics via GlobalRank: the distributed percentile
  * selection must equal local sorted-rank selection for every pct,
  * including boundary ranks and tiny/duplicate-heavy inputs. */
class QuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def check(values: Seq[Int], pcts: Seq[Int]): Unit = {
    import spark.implicits._
    val rows = values.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "v")
    val got = GlobalRank.exactPercentiles(
        df, Seq(col("v").asc, col("id").asc), col("v"), pcts)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val sorted = values.sorted
    val n = values.size.toLong
    pcts.foreach { pct =>
      val rank = math.max(1L, (n * pct + 99) / 100)
      assert(got(pct) == sorted((rank - 1).toInt),
        s"pct=$pct: got ${got(pct)}, want ${sorted((rank - 1).toInt)} (rank $rank of $n)")
    }
  }

  test("random data, duplicate-heavy data, singleton, and all boundary pcts") {
    val rnd = new scala.util.Random(7)
    check(Seq.fill(1000)(rnd.nextInt(500)), Seq(1, 25, 50, 75, 90, 99, 100))
    check(Seq.fill(333)(rnd.nextInt(3)), Seq(1, 50, 100)) // heavy ties
    check(Seq(42), Seq(1, 50, 100))                        // singleton
    check((1 to 100).toSeq, Seq(1, 99, 100))               // exact boundaries
  }
}
