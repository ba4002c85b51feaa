package graft

import graft.graph.Direction
import graft.ops.Expand
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for the Expand family (reference ExpandAllTestBase /
  * OptionalExpandAllTestBase shapes, on GraphCreation-style fixtures). */
class ExpandSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("expandAll traverses star graph out-edges") {
    val g = GraphFixtures.starGraph(spark, 5)
    val in = g.nodesByLabel("Center").select(col("id").as("c"))
    val out = Expand.expandAll(g, in, "c", Some("T"), Direction.Out, "r", "x")
    assert(out.count() === 5)
    assert(out.select("x").collect().map(_.getLong(0)).sorted === Array(1L, 2L, 3L, 4L, 5L))
  }

  test("expandAll In direction reverses edges") {
    val g = GraphFixtures.starGraph(spark, 4)
    val ring = g.nodesByLabel("Ring").select(col("id").as("n"))
    val out = Expand.expandAll(g, ring, "n", Some("T"), Direction.In, "r", "x")
    assert(out.count() === 4)
    assert(out.select("x").distinct().collect().map(_.getLong(0)) === Array(0L))
  }

  test("expandAll Both on chain counts both orientations") {
    val g = GraphFixtures.chainGraph(spark, 3) // 0->1->2
    val in = g.nodes.select(col("id").as("n"))
    val out = Expand.expandAll(g, in, "n", None, Direction.Both, "r", "x")
    // endpoints have degree 1, middle has 2 → 4 rows
    assert(out.count() === 4)
  }

  test("expandInto verifies bound endpoint pairs") {
    val g = GraphFixtures.chainGraph(spark, 4) // edges 0->1,1->2,2->3
    val pairs = spark.createDataFrame(Seq((0L, 1L), (0L, 2L), (2L, 3L)))
      .toDF("a", "b")
    val out = Expand.expandInto(g, pairs, "a", "b", Some("T"), Direction.Out, "r")
    assert(out.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((0L, 1L), (2L, 3L)))
  }

  test("optionalExpandAll keeps non-matching rows with nulls") {
    val g = GraphFixtures.chainGraph(spark, 3) // 2 has no out-edge
    val in = g.nodes.select(col("id").as("n"))
    val out = Expand.optionalExpandAll(g, in, "n", Some("T"), Direction.Out, "r", "x")
    assert(out.count() === 3)
    val noMatch = out.filter(col("x").isNull).select("n").collect().map(_.getLong(0))
    assert(noMatch === Array(2L))
  }
}
