package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph ranking / counting algorithms (surplus per SURVEY §2.10 — the
 * reference ships its algo library in community/graph-algo; PageRank and
 * triangle counting are the canonical additions next to the shortest-path
 * family already covered).
 */
object Ranking {

  /**
   * Degree distribution — the first profiling query on any graph (the
   * reference exposes degree stats through db.stats): per-degree node
   * counts for the chosen orientation. Two aggregates, both
   * hash-partitioned on 8-byte keys; nodes with zero edges in the chosen
   * orientation are absent (join the node table downstream if isolated
   * nodes matter).
   *
   * @param edges (src, dst)
   * @return (degree LONG, n LONG) sorted nowhere — order downstream
   */
  def degreeDistribution(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n"))

  /**
   * Directed degree assortativity (Newman 2002): the Pearson correlation,
   * over edges, of the source's out-degree with the target's in-degree —
   * the standard "do hubs link to hubs" profiling metric next to the
   * degree distribution. Two degree aggregates plus two id-keyed joins
   * back to the edge list, then one global `corr` (a partial-aggregating
   * co-moment — no row ever leaves its partition until the final combine).
   *
   * @param edges (src, dst) — multi-edges count once
   * @return one row (assortativity DOUBLE 4dp)
   */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct()
    val outd = e.groupBy("src").agg(count(lit(1)).as("__od"))
    val ind = e.groupBy("dst").agg(count(lit(1)).as("__id"))
    e.join(outd, Seq("src")).join(ind, Seq("dst"))
      .agg(round(corr(col("__od").cast("double"),
        col("__id").cast("double")), 4).as("assortativity"))
  }

  /**
   * Clustering coefficients over the undirected simple graph:
   * local C(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) and the global
   * (transitivity) ratio 3·triangles / wedges. Reuses the canonical
   * two-join triangle enumeration ([[triangles]]); wedges come from the
   * degree aggregate — nothing new shuffles.
   *
   * @param edges (src, dst) — direction ignored
   * @return (node, degree LONG, triangles LONG, coeff DOUBLE 4dp) for
   *         nodes with degree ≥ 2
   */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val canon = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct().localCheckpoint(false)
    val deg = canon.select(col("u").as("node"))
      .unionByName(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tri = triangleCounts(canon.select(col("u").as("src"), col("v").as("dst")))
    deg.filter(col("degree") >= 2)
      .join(tri, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
          (col("degree") * (col("degree") - 1)), 4).as("coeff"))
  }

  /**
   * PageRank by synchronous power iteration (Pregel formulation):
   *   rank_{t+1}(v) = (1-d) + d * Σ_{u→v} rank_t(u) / outdeg(u)
   * No dangling-mass redistribution (same per-node form the usual graph
   * libraries use). Init rank = (1-d), the fixed point for in-degree-0
   * nodes, so DAGs converge in longest-path iterations exactly.
   *
   * Each iteration is one join on src + one aggregate on dst — both
   * hash-partition on the node key at cluster scale; ranks are
   * lazily checkpointed per round so the final action sees a flat plan.
   *
   * @param edges (src, dst)
   * @return (node, rank)
   */
  def pageRank(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1,
      s"bad pageRank config: iterations=$iterations damping=$damping")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint(false)
    var ranks = nodes.withColumn("rank", lit(1.0 - damping))
    var i = 0
    while (i < iterations) {
      val contrib = e
        .join(ranks.join(outDeg, "node"), col("src") === col("node"))
        .select(col("dst").as("node"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("__in"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(false)
      i += 1
    }
    ranks
  }

  /**
   * Weighted PageRank: each node distributes its rank across out-edges
   * proportionally to edge weight instead of uniformly —
   *   contrib(u→v) = rank(u) · w(u→v) / Σ_x w(u→x)
   * (the GDS-style relationship-weighted variant). Same per-iteration
   * shape as [[pageRank]]: one join + one partial-aggregating sum, both
   * hash-partitioned on 8-byte node ids; the only extra state is the
   * per-node out-weight total, computed once.
   *
   * @param edges (src, dst, weight DOUBLE > 0); multi-edges each carry
   *              their own weight
   */
  def weightedPageRank(edges: DataFrame, iterations: Int = 10,
      damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1,
      s"bad pageRank config: iterations=$iterations damping=$damping")
    val e = edges.select(col("src"), col("dst"),
      col("weight").cast("double")).localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outW = e.groupBy(col("src").as("node")).agg(sum("weight").as("__w"))
      .localCheckpoint(false)
    var ranks = nodes.withColumn("rank", lit(1.0 - damping))
    var i = 0
    while (i < iterations) {
      val contrib = e
        .join(ranks.join(outW, "node"), col("src") === col("node"))
        .select(col("dst").as("node"),
          (col("rank") * col("weight") / col("__w")).as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          (lit(1.0 - damping) + lit(damping) * coalesce(col("__in"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(false)
      i += 1
    }
    ranks
  }

  /**
   * Personalized PageRank (Haveliwala 2002, "Topic-Sensitive PageRank"):
   * the teleport mass restarts at the SOURCE set instead of uniformly —
   *   rank_{t+1}(v) = (1−d)·1[v ∈ S]/|S| + d · Σ_{u→v} rank_t(u)/outdeg(u)
   * — the similarity-to-my-seeds ranking behind recommendation and
   * related-entity queries. Same per-iteration shape as [[pageRank]]
   * (one join + one aggregate, hash-partitioned on node ids); the source
   * set joins as a DataFrame, |S| is the one driver scalar.
   *
   * @param edges (src, dst); sources (source LONG)
   * @return (node, rank) — nodes with rank 0 included (they're in the
   *         graph, just unreachable from the seeds)
   */
  def personalizedPageRank(edges: DataFrame, sources: DataFrame,
      iterations: Int = 10, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && damping > 0 && damping < 1,
      s"bad pageRank config: iterations=$iterations damping=$damping")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(false)
    val s = sources.select(col("source").as("node")).distinct()
      .localCheckpoint(false)
    val nS = s.count()
    require(nS > 0, "personalized PageRank needs a non-empty source set")
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .unionByName(s).distinct().localCheckpoint(false)
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("__deg"))
    val teleport = lit(1.0 - damping) / nS
    var ranks = nodes.join(s.withColumn("__s", lit(1)), Seq("node"), "left_outer")
      .select(col("node"),
        when(col("__s").isNotNull, teleport).otherwise(lit(0.0)).as("rank"))
      .localCheckpoint(false)
    var i = 0
    while (i < iterations) {
      val contrib = e
        .join(ranks.join(outDeg, "node"), col("src") === col("node"))
        .select(col("dst").as("node"), (col("rank") / col("__deg")).as("__c"))
        .groupBy("node").agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(s.withColumn("__s", lit(1)), Seq("node"), "left_outer")
        .join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          (when(col("__s").isNotNull, teleport).otherwise(lit(0.0)) +
            lit(damping) * coalesce(col("__in"), lit(0.0))).as("rank"))
        .localCheckpoint(false)
      i += 1
    }
    ranks
  }

  /**
   * Triangle enumeration over the undirected simple graph: canonicalize
   * every edge to (u < v), join wedges a<b<c on the shared middle node,
   * close them against the edge set. One row per distinct triangle —
   * the standard two-join MapReduce formulation; at scale both joins
   * hash-partition on node ids and the canonical orientation keeps each
   * triangle counted exactly once.
   *
   * @param edges (src, dst) — direction ignored
   * @return (a, b, c) with a < b < c, one row per triangle
   */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(false)
    val wedges = und.select(col("u").as("a"), col("v").as("b"))
      .join(und.select(col("u").as("b"), col("v").as("c")), "b")
    wedges.join(und.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-node triangle participation counts (a node appears in each of its
    * triangles once per corner role). */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val t = triangles(edges)
    t.select(col("a").as("node"))
      .unionByName(t.select(col("b").as("node")))
      .unionByName(t.select(col("c").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /**
   * Label propagation (community detection, Raghavan et al. 2007) with
   * SYNCHRONOUS updates and deterministic tie-breaks: every node adopts
   * the most frequent label among its undirected neighbors each round,
   * ties resolved to the smallest label — so the result is reproducible
   * (the usual async/random variant is not). Labels init to node ids.
   * Each round is one join + two aggregates, all hash-partitioned on the
   * node key; rounds are bounded by `iterations` (label prop oscillates on
   * bipartite-ish structures rather than converging, so a fixed budget is
   * the standard stop rule).
   *
   * @param edges (src, dst) — direction ignored
   * @return (node, label) — nodes sharing a label form a community
   */
  def labelPropagation(edges: DataFrame, iterations: Int = 10): DataFrame = {
    require(iterations >= 1, s"bad iterations: $iterations")
    val und = edges
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val sym = und.unionByName(und.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(false)
    val nodes = sym.select(col("u").as("node")).distinct().localCheckpoint()
    var labels = nodes.withColumn("label", col("node"))
    var i = 0
    while (i < iterations) {
      // most frequent neighbor label; (count DESC, label ASC) via max of
      // a (count, -label) struct so the round is two partial-aggregable
      // aggregates, no window
      val freq = sym
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("__n"))
        .groupBy(col("u"))
        .agg(max(struct(col("__n"), (-col("label")).as("__neg"))).as("__m"))
        .select(col("u").as("node"), (-col("__m.__neg")).as("label"))
      labels = nodes.join(freq, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("label"), col("node")).as("label"))
        .localCheckpoint(false)
      i += 1
    }
    labels
  }
}
