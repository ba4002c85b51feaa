package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy checks for sketch-based aggregates that ship as rows-only
  * CORRECTNESS entries (q_events_approx_distinct). */
class AggregationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on 10k distinct keys") {
    val df = (0 until 100000).map(i => i % 10000).toDF("k")
    val approx = df.agg(approx_count_distinct(col("k")).as("a"))
      .collect()(0).getLong(0)
    assert(math.abs(approx - 10000.0) / 10000.0 < 0.05,
      s"approx=$approx vs exact=10000")
  }

  test("approx_count_distinct is exact-ish per group on skewed groups") {
    val df = (0 until 20000).map(i => (i % 4, i % (100 * (1 + i % 4)))).toDF("g", "k")
    val rows = df.groupBy("g")
      .agg(countDistinct(col("k")).as("exact"), approx_count_distinct(col("k")).as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact").toDouble
      val approx = r.getAs[Long]("approx").toDouble
      assert(math.abs(approx - exact) / exact < 0.1, s"group ${r.get(0)}: $approx vs $exact")
    }
  }
}
