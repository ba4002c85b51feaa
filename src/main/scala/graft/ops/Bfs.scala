package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Frontier-based BFS over an edge DataFrame — the scale path for
 * PruningVarLengthExpandPipe (distinct end nodes only, reference
 * pipes/PruningVarLengthExpandPipe.scala), BFSPruningVarExpand
 * (LogicalPlan.scala:2119) and FindShortestPaths (graph-algo
 * ShortestPath.java:81's BFS, distributed).
 *
 * Design (SURVEY §7.4 hard-part #5): never self-join-to-fixpoint over full
 * path sets — instead iterate a *frontier* (node, source) set, anti-joined
 * against the visited set, with `localCheckpoint` every few rounds to cut
 * the lineage/plan growth that would otherwise dominate at depth. Each round
 * costs one shuffle-join frontier⋈edges plus one anti-join against visited —
 * the same asymptotics as Pregel, expressed in DataFrames so AQE/broadcast
 * still apply. Visited stays partitioned by node id across rounds.
 */
object Bfs {

  private val CheckpointEvery = 4

  /**
   * Multi-source BFS distances.
   * @param edges  (src LONG, dst LONG) — pre-orient/symmetrize upstream
   * @param sources (source LONG) — one BFS per distinct source, batched
   *                together in the same frontier (source is part of the key)
   * @return (source, node, dist) with dist in [0, maxDepth], minimal hops
   */
  def distances(edges: DataFrame, sources: DataFrame, maxDepth: Int): DataFrame = {
    val e = edges.select(col("src").as("__s"), col("dst").as("__d"))
      .localCheckpoint(false)
    var visited = sources.select(col("source"), col("source").as("node"), lit(0).as("dist"))
      .localCheckpoint() // eager: frontier/visited are materialized RDDs, so
                         // each round's plan is one join + one anti-join, not
                         // the whole history replayed by isEmpty
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      frontier = frontier.join(e, col("node") === col("__s"))
        .select(col("source"), col("__d").as("node"))
        .distinct()
        .join(visited.select("source", "node"), Seq("source", "node"), "left_anti")
        .withColumn("dist", lit(depth))
        .localCheckpoint()
      // visited stays a union of already-checkpointed frontiers (no
      // recompute); re-checkpoint periodically to keep the plan shallow
      visited = visited.unionByName(frontier)
      if (depth % CheckpointEvery == 0) visited = visited.localCheckpoint()
    }
    visited
  }

  /** PruningVarExpand: distinct nodes reachable in [minHops, maxHops] —
    * endpoints only, no path enumeration (the whole point of the pruning
    * variant: frontier size is bounded by |V|, not by path count). */
  def pruningExpand(edges: DataFrame, sources: DataFrame, minHops: Int, maxHops: Int): DataFrame =
    distances(edges, sources, maxHops)
      .filter(col("dist") >= minHops && col("dist") <= maxHops)
      .select("source", "node", "dist")

  /**
   * Single-pair shortest path length (FindShortestPaths :2178). Returns
   * (source, target, dist) for reached pairs. Implemented as multi-source
   * forward BFS with early exit when every target is reached.
   */
  def shortestPathLengths(edges: DataFrame, pairs: DataFrame, maxDepth: Int): DataFrame = {
    val d = distances(edges, pairs.select("source").distinct(), maxDepth)
    pairs.join(d.withColumnRenamed("node", "target"), Seq("source", "target"))
  }

  /**
   * Connected components by iterated min-id propagation with path doubling
   * (each round joins component←min(component of neighbors)); converges in
   * O(log(diameter)) rounds on typical graphs. Returns (node, component)
   * where component = min node id in the component.
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .distinct().localCheckpoint()
    val nodes = sym.select(col("a").as("node")).distinct()
    var comp = nodes.withColumn("component", col("node")).localCheckpoint()
    var changedCount = 1L
    var iter = 0
    while (changedCount > 0 && iter < maxIter) {
      iter += 1
      // neighbor-min pass: component(n) := min(component(n), min over nbrs);
      // one joined materialization per round serves both the update and the
      // convergence check
      val nbrMin = sym.join(comp.withColumnRenamed("node", "b"), Seq("b"))
        .groupBy(col("a").as("node")).agg(min(col("component")).as("nbrComp"))
      val joined = comp.join(nbrMin, Seq("node"), "left_outer").localCheckpoint()
      changedCount = joined.filter(col("nbrComp") < col("component")).count()
      comp = joined
        .select(col("node"),
          least(col("component"), coalesce(col("nbrComp"), col("component"))).as("component"))
        .localCheckpoint()
    }
    comp
  }
}
