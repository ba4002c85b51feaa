package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Weighted shortest paths — the Spark counterpart of the reference's
 * Dijkstra/AStar family (community/graph-algo/src/main/java/org/neo4j/
 * graphalgo/impl/path/Dijkstra.java, DijkstraBidirectional.java;
 * ShortestPath.java returns Path objects, so paths — not just lengths —
 * are part of the contract).
 *
 * A priority queue doesn't distribute, so the scale formulation is
 * frontier-parallel relaxation (distributed Bellman-Ford, i.e. Pregel SSSP
 * — delta-stepping without the bucket ordering): each round relaxes every
 * out-edge of the nodes whose tentative distance improved last round, then
 * keeps the per-(source, node) minimum. Rounds are bounded by the hop count
 * of the longest shortest path, and every round is two shuffles (join +
 * min-aggregate) over (source, node) — at cluster scale both hash-partition
 * on the same key and AQE coalesces the tail.
 *
 * Ties are broken by the lexicographically smallest edge-id path
 * (min over STRUCT(dist, path)), making results deterministic — required
 * for the oracle gate.
 */
object WeightedPaths {

  /**
   * Multi-source weighted shortest paths with path reconstruction.
   * @param edges   (id LONG, src LONG, dst LONG, weight DOUBLE ≥ 0)
   * @param sources (source LONG) — batched like the reference runs one
   *                Dijkstra per start node, but in one shared frontier
   * @param maxIter round cap = max hops of any shortest path; throws if
   *                exhausted before convergence rather than returning
   *                silently-wrong distances
   * @return (source, node, dist, path ARRAY<LONG> of edge ids,
   *         nodes ARRAY<LONG> of visited node ids incl. both endpoints)
   */
  def shortestPaths(edges: DataFrame, sources: DataFrame, maxIter: Int = 50): DataFrame = {
    val e = edges.select(col("src").as("__s"), col("dst").as("__d"),
      col("weight").as("__w"), col("id").as("__e"))
      .localCheckpoint(false)

    var best = sources.select(col("source"), col("source").as("node"),
      lit(0.0).as("dist"), array().cast("array<long>").as("path"),
      array(col("source")).as("nodes"))
      .localCheckpoint()
    var frontier = best
    var fCnt = frontier.count()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      iter += 1
      // small frontiers broadcast: relaxation probes edges map-side instead
      // of shuffling the full edge table (checkpointed RDDs have no stats)
      val f = if (fCnt <= 200000) broadcast(frontier) else frontier
      val relaxed = f.join(e, col("node") === col("__s"))
        .select(col("source"), col("__d").as("node"),
          (col("dist") + col("__w")).as("dist"),
          concat(col("path"), array(col("__e"))).as("path"),
          concat(col("nodes"), array(col("__d"))).as("nodes"))
      // per-(source,node) minimum over old best ∪ newly relaxed; struct
      // ordering = (dist, path) so equal-distance ties resolve
      // deterministically to the smallest edge-id sequence (the node array
      // is functionally determined by the edge path, so trailing it in the
      // struct never affects the ordering)
      val merged = best.unionByName(relaxed)
        .groupBy("source", "node")
        .agg(min(struct(col("dist"), col("path"), col("nodes"))).as("__m"))
        .select(col("source"), col("node"),
          col("__m.dist").as("dist"), col("__m.path").as("path"),
          col("__m.nodes").as("nodes"))
        .localCheckpoint()
      // next frontier: strictly improved entries only
      frontier = merged.join(
          best.select(col("source"), col("node"), col("dist").as("__old")),
          Seq("source", "node"), "left_outer")
        .filter(col("__old").isNull || col("dist") < col("__old"))
        .drop("__old")
        .localCheckpoint()
      best = merged
      fCnt = frontier.count()
      done = fCnt == 0
    }
    require(done, s"shortestPaths did not converge within $maxIter rounds " +
      "(negative cycle or maxIter too small)")
    best
  }

  /** Shortest path lengths+paths restricted to requested (source, target)
    * pairs. */
  def shortestPathsTo(edges: DataFrame, pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val all = shortestPaths(edges, pairs.select("source").distinct(), maxIter)
    pairs.join(all.withColumnRenamed("node", "target"), Seq("source", "target"))
  }
}
