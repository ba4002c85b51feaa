package graft

import graft.graph.Direction
import graft.ops.{Bfs, VarExpand}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for VarExpand / Bfs — including the any-rel-type VarExpand
  * path (the default Cypher `[*1..2]` form) and the O(log n) round bound of
  * the star-contraction connected components. */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("varExpand with empty relTypes (any type) traverses all edges") {
    val g = GraphFixtures.chainGraph(spark, 4) // 0->1->2->3, type T
    val start = g.nodes.filter(col("id") === 0L).select(col("id").as("a"))
    val out = VarExpand.varExpand(g, start, "a",
      relTypes = Seq.empty, Direction.Out, minHops = 1, maxHops = 2)
    val reached = out.select("end", "depth").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(reached === Set((1L, 1), (2L, 2)))
  }

  test("varExpand minHops=0 includes the zero-length path") {
    val g = GraphFixtures.chainGraph(spark, 3)
    val start = g.nodes.filter(col("id") === 0L).select(col("id").as("a"))
    val out = VarExpand.varExpand(g, start, "a", Seq("T"), Direction.Out, 0, 1)
    val reached = out.select("end", "depth").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(reached === Set((0L, 0), (1L, 1)))
  }

  test("varExpand enforces relationship uniqueness within a path") {
    // 0 <-> 1 (two directed edges): with uniqueness, Both-direction paths
    // cannot reuse a rel, so depth-2 paths 0->1->0 use the two distinct rels
    val g = GraphFixtures.graph(spark,
      Seq((0L, Seq("N"), "a"), (1L, Seq("N"), "b")),
      Seq((100L, 0L, 1L, "T"), (101L, 1L, 0L, "T")))
    val start = g.nodes.filter(col("id") === 0L).select(col("id").as("a"))
    val out = VarExpand.varExpand(g, start, "a", Seq("T"), Direction.Both, 1, 2)
    // depth1: 0->1 via 100, 0->1 via 101 reversed (Both sees both rels)
    // depth2: each continues over the *other* rel back to 0; never the same rel twice
    val paths = out.select("rels").collect().map(_.getSeq[Long](0))
    assert(paths.forall(p => p.distinct.size === p.size))
  }

  test("BFS distances on grid equal manhattan distance") {
    val g = GraphFixtures.gridGraph(spark, 4, 4)
    val sources = Seq(0L).toDF("source")
    val d = Bfs.distances(GraphFixtures.edges(g), sources, maxDepth = 10)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Int]("dist")).toMap
    assert(d(0L) === 0)
    assert(d(5L) === 2)  // (1,1)
    assert(d(15L) === 6) // (3,3)
  }

  test("shortestPathLengths early-exits and returns requested pairs only") {
    val g = GraphFixtures.chainGraph(spark, 30)
    val pairs = Seq((0L, 3L)).toDF("source", "target")
    val out = Bfs.shortestPathLengths(GraphFixtures.edges(g), pairs, maxDepth = 50)
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[Int]("dist") === 3)
  }

  test("connectedComponents on a 1000-node chain converges (O(log n) rounds)") {
    // chain diameter 999: neighbor-min propagation would need ~999 rounds;
    // star contraction must finish within maxIter=25 ≈ 2·log2(1000)+c
    val edges = (0L until 999L).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = Bfs.connectedComponents(edges, maxIter = 25)
    val comps = comp.select("component").distinct().collect().map(_.getLong(0))
    assert(comps === Array(0L))
    assert(comp.count() === 1000)
  }

  test("connectedComponents separates disjoint components") {
    val edges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("src", "dst")
    val comp = Bfs.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(0L -> 0L, 1L -> 0L, 2L -> 0L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("listRanks ranks chain nodes in O(log L) pointer-doubling rounds") {
    val edges = ((0L until 39L).map(i => (i, i + 1)) ++      // chain 0..39
      Seq((100L, 101L), (101L, 102L))).toDF("src", "dst")    // chain 100..102
    val r = Bfs.listRanks(edges, maxLength = 64)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    assert(r(0L) == (0L, 0L) && r(39L) == (0L, 39L) && r(20L) == (0L, 20L))
    assert(r(100L) == (100L, 0L) && r(102L) == (100L, 2L))
  }

  test("listRanks rejects cycles instead of silently looping") {
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    intercept[IllegalArgumentException] { Bfs.listRanks(cyc, maxLength = 8).collect() }
  }

  test("allShortestPaths returns every minimal-hop path, ties included") {
    // diamond: 0->1->3 and 0->2->3 both length 2; plus direct 0->4 (len 1)
    val edges = Seq((100L, 0L, 1L), (101L, 0L, 2L), (102L, 1L, 3L),
      (103L, 2L, 3L), (104L, 0L, 4L)).toDF("id", "src", "dst")
    val paths = Bfs.allShortestPaths(edges, Seq(0L).toDF("source"), maxDepth = 5)
      .filter(col("node") === 3L).collect()
      .map(r => r.getSeq[Long](r.fieldIndex("path"))).toSet
    assert(paths == Set(Seq(100L, 102L), Seq(101L, 103L)))
    // longer 0->...->3 routes must NOT appear even under a higher maxDepth
    val all = Bfs.allShortestPaths(edges, Seq(0L).toDF("source"), maxDepth = 5)
    assert(all.filter(col("node") === 3L && col("dist") =!= 2).count() == 0)
  }

  test("deep BFS (depth 25) completes with compacted visited set") {
    // 25-deep chain: exercises the every-4-rounds visited re-checkpoint —
    // without compaction the round-25 anti-join plan unions 24 deltas
    val edges = (0L until 25L).map(i => (i, i + 1)).toDF("src", "dst")
    val d = Bfs.distances(edges, Seq(0L).toDF("source"), maxDepth = 30)
    assert(d.count() == 26)
    assert(d.filter(col("node") === 25L).select("dist").collect()(0).getInt(0) == 25)
    val deep = Bfs.allShortestPaths(
      edges.withColumn("id", col("dst") + 1000), Seq(0L).toDF("source"), maxDepth = 30)
    assert(deep.filter(col("node") === 25L).select("dist").collect()(0).getInt(0) == 25)
  }
}
