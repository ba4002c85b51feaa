package graft

import graft.graph.GraphStats
import graft.ops.Triadic
import org.scalatest.funsuite.AnyFunSuite

class TriadicStatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("triadicSelection negative: friend-of-friend not already friend") {
    // 0->1, 1->2, 0->2 (triangle closed), 1->3 (0->3 open)
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (1L, 3L)).toDF("src", "dst")
    val neg = Triadic.triadicSelection(edges, positive = false)
      .select("a", "c").distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 2-hop pairs: 0->1->2 = (0,2) closed by 0->2; 0->1->3 = (0,3) open
    assert(neg === Set((0L, 3L)))
    val pos = Triadic.triadicSelection(edges, positive = true)
      .select("a", "c").distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pos === Set((0L, 2L)))
  }

  test("GraphStats mirrors the reference count store shape") {
    val g = GraphFixtures.starGraph(spark, 3) // Center -T-> Ring ×3
    val stats = GraphStats.compute(g)
    assert(stats.nodeCount("Center") === 1)
    assert(stats.nodeCount("Ring") === 3)
    assert(stats.relCount("Center", "T", "Ring") === 3)
    assert(stats.relCount("Ring", "T", "Center") === 0)
  }
}
