package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Centrality and node-similarity algorithms — the remainder of the
 * reference's graph-algo family (community/graph-algo/.../CentralityService
 * and the path-finder infrastructure it feeds) next to PageRank / triangle
 * counting / label propagation in [[Ranking]].
 *
 * Scale rules shared by every algorithm here:
 *  - state rows are (source, node) pairs of 8-byte ids — properties never
 *    enter the loops;
 *  - each round is one join + one aggregate, both hash-partitioned on node
 *    ids, frontiers lazily checkpointed so one action materializes a round;
 *  - exact all-pairs forms are O(|V|·|E|) by nature, so the entry points
 *    take an explicit `sources` relation: pass every node for exact
 *    results on bounded graphs, or a sampled pivot set for the standard
 *    unbiased estimate at 100 TB (Riondato & Kornaropoulos-style pivot
 *    sampling — estimates scale by |V|/|pivots| downstream).
 */
object Centrality {

  /**
   * Closeness + harmonic centrality from per-source BFS distances
   * (reference: community/graph-algo closeness; harmonic per Boldi &
   * Vigna, "Axioms for Centrality", 2014).
   *
   *   closeness(s) = reached(s) / Σ_t d(s,t)   (0 when nothing reached)
   *   harmonic(s)  = Σ_t 1/d(s,t)
   *
   * Distances are OUT-distances over the `edges` orientation; symmetrize
   * upstream for the undirected form. One frontier BFS batched across all
   * sources ([[Bfs.distances]]), one aggregate — at cluster scale the
   * frontier shuffles (source, node) pairs only.
   *
   * @return (node, reached LONG, closeness DOUBLE 4dp, harmonic DOUBLE 4dp)
   */
  def closenessHarmonic(edges: DataFrame, sources: DataFrame,
      maxDepth: Int): DataFrame = {
    val d = Bfs.distances(edges, sources, maxDepth)
      .filter(col("dist") > 0)
    d.groupBy(col("source").as("node"))
      .agg(count(lit(1)).as("reached"),
        round(count(lit(1)).cast("double") / sum(col("dist")), 4)
          .as("closeness"),
        round(sum(lit(1.0) / col("dist")), 4).as("harmonic"))
  }

  /**
   * Betweenness centrality, Brandes' algorithm (Brandes 2001, "A Faster
   * Algorithm for Betweenness Centrality") in its synchronous-frontier
   * form:
   *
   *  forward — batched BFS carrying σ (shortest-path counts): all paths
   *  reaching a node at round k arrive from predecessors at k-1, so
   *  σ(source, w) = Σ_{v∈pred(w)} σ(source, v) is one groupBy per round;
   *
   *  backward — dependency accumulation by descending depth:
   *  δ(v) = Σ_{w: d(w)=d(v)+1, v→w} σ(v)/σ(w) · (1 + δ(w)), one
   *  join + aggregate per level;
   *
   *  betweenness(v) = Σ_{s≠v} δ_s(v).
   *
   * Exact when `sources` is all nodes; with sampled pivots multiply by
   * |V|/|pivots| for the unbiased estimate (Riondato & Kornaropoulos).
   * Rounds = 2·diameter, each shuffling (source, node) id pairs only.
   *
   * @param edges (src, dst) — directed; symmetrize for undirected
   * @return (node, betweenness DOUBLE 4dp) — nodes with zero dependency
   *         are absent
   */
  def betweenness(edges: DataFrame, sources: DataFrame,
      maxDepth: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(false)

    // forward sweep: visited = (source, node, dist, sigma)
    var frontier = sources.select(col("source"),
        col("source").as("node"), lit(0).as("dist"), lit(1L).as("sigma"))
      .localCheckpoint()
    var visited = frontier
    var d = 0
    var more = true
    while (more && d < maxDepth) {
      val next = frontier.join(e, col("node") === col("src"))
        .groupBy(col("source"), col("dst"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(visited.select(col("source"), col("node").as("dst")),
          Seq("source", "dst"), "left_anti")
        .select(col("source"), col("dst").as("node"),
          lit(d + 1).as("dist"), col("sigma"))
        .localCheckpoint(false)
      more = next.count() > 0
      if (more) {
        visited = visited.unionByName(next).localCheckpoint(false)
        frontier = next
        d += 1
      }
    }

    // backward sweep, deepest level first; delta rows carry sigma so the
    // next level joins one table
    var level = d
    var upper = visited.filter(col("dist") === level)
      .select(col("source"), col("node"), col("sigma"),
        lit(0.0).as("delta"))
    var acc = upper
    while (level > 0) {
      level -= 1
      val cur = visited.filter(col("dist") === level)
      val up = upper.select(col("source").as("__us"),
        col("node").as("__w"), col("sigma").as("__sw"),
        col("delta").as("__dw"))
      val contrib = cur
        .join(e, col("node") === col("src"))
        .join(up, col("dst") === col("__w") && col("source") === col("__us"))
        .groupBy(col("source"), col("node"))
        .agg(sum(col("sigma").cast("double") / col("__sw") *
          (lit(1.0) + col("__dw"))).as("__delta"))
      upper = cur.join(contrib, Seq("source", "node"), "left_outer")
        .select(col("source"), col("node"), col("sigma"),
          coalesce(col("__delta"), lit(0.0)).as("delta"))
        .localCheckpoint(false)
      acc = acc.unionByName(upper)
    }
    acc.filter(col("node") =!= col("source"))
      .groupBy("node").agg(round(sum(col("delta")), 4).as("betweenness"))
      .filter(col("betweenness") > 0)
  }

  /**
   * k-core: the maximal subgraph in which every node has (undirected)
   * degree ≥ k, by iterative peeling — drop nodes under the threshold,
   * recompute degrees, repeat to fixpoint. Each round is one aggregate +
   * two semi-joins over the shrinking edge set; round count is the peel
   * depth (≤ graph degeneracy), independent of |V|. The standard
   * distributed formulation — no per-node driver state.
   *
   * @param edges (src, dst) — direction ignored, self-loops dropped
   * @return (node LONG) — members of the k-core
   */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val canon = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
    var e = canon
      .unionByName(canon.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(false)
    var edgeCnt = e.count()
    var stable = edgeCnt == 0
    var i = 0
    while (!stable && i < maxIter) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") >= k).select(col("src").as("__n"))
      val next = e
        .join(keep, col("src") === col("__n"), "left_semi")
        .join(keep, col("dst") === col("__n"), "left_semi")
        .localCheckpoint(false)
      val nextCnt = next.count()
      stable = nextCnt == edgeCnt || nextCnt == 0
      e = next; edgeCnt = nextCnt; i += 1
    }
    require(stable, s"kCore did not converge in $maxIter peels")
    e.select(col("src").as("node")).distinct()
  }

  /**
   * Node similarity over out-neighborhoods (the gds.nodeSimilarity
   * shape): Jaccard = |N(a)∩N(b)| / |N(a)∪N(b)| for node pairs sharing
   * at least one neighbor, top-k pairs per node.
   *
   * Scale shape: candidate pairs are generated by the shared-neighbor
   * self-join — cost Σ_w fan(w)², so high-fanout hub neighbors are
   * excluded from pair GENERATION by `fanoutCap` (degrees for the
   * denominator still count them; the standard degree-cap approximation,
   * exact whenever no neighbor exceeds the cap). Pairs shuffle as id
   * triples; neighborhoods are never collected.
   *
   * @param edges (src, dst) — similarity between src nodes
   * @return (n1, n2, similarity DOUBLE 4dp, rank 1..k per n1) with n1 < n2
   */
  def nodeSimilarity(edges: DataFrame, topK: Int,
      fanoutCap: Int = 100000): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(false)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    val smallFan = e.groupBy(col("dst")).agg(count(lit(1)).as("__fan"))
      .filter(col("__fan") <= fanoutCap).select(col("dst"))
    val pruned = e.join(smallFan, Seq("dst"), "left_semi")
    val inter = pruned.select(col("dst"), col("src").as("n1"))
      .join(pruned.select(col("dst"), col("src").as("n2")), Seq("dst"))
      .filter(col("n1") < col("n2"))
      .groupBy(col("n1"), col("n2")).agg(count(lit(1)).as("__i"))
    val sim = inter
      .join(deg.select(col("src").as("n1"), col("__deg").as("__d1")), Seq("n1"))
      .join(deg.select(col("src").as("n2"), col("__deg").as("__d2")), Seq("n2"))
      .withColumn("similarity", round(col("__i").cast("double") /
        (col("__d1") + col("__d2") - col("__i")), 4))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("n1"))
      .orderBy(col("similarity").desc, col("n2").asc)
    sim.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("n1"), col("n2"), col("similarity"), col("rank"))
  }
}
