package graft

import graft.graph.{PropertyGraph, TpchGraph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed persistence: the expand join over bucketed tables must read
  * bucket-aware (no shuffle exchange on the scan sides) and return the same
  * rows as the unbucketed graph — the layout that removes the dominant
  * shuffle from every traversal at scale. */
class BucketedGraphSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("bucketed expand join runs without a shuffle exchange") {
    val g = TpchGraph.load(spark, "/root/testdata/sf0.001")
    PropertyGraph.saveBucketed(
      PropertyGraph(g.nodes, g.rels.filter(col("type") === "PLACED")),
      "graft_bucket_test", buckets = 8)
    try {
      val b = PropertyGraph.loadBucketed(spark, "graft_bucket_test")
      val joined = b.rels.join(b.nodes, b.rels("src") === b.nodes("id"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(2500)}")
      // and it is the SAME answer as the plain parquet graph
      val expected = g.rels.filter(col("type") === "PLACED").count()
      assert(joined.count() == expected && expected > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_test_nodes")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_test_rels")
    }
  }
}
