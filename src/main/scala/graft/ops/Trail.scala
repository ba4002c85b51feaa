package graft.ops

import graft.graph.{Direction, PropertyGraph}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Trail — quantified path patterns `((a)-[r:T]->(b)){min,max}` with GROUP
 * VARIABLES (reference pipes/TrailPipe.scala:65, logical Trail
 * LogicalPlan.scala:3977): repeat a one-hop pattern between min and max
 * times, collecting the per-iteration nodes and relationships into arrays,
 * under Cypher's relationship-uniqueness rule (a rel may appear at most once
 * per path — "trail" semantics, front-end AddUniquenessPredicates.scala).
 *
 * Spark formulation: bounded unrolled join loop (same skeleton as
 * VarExpand), accumulating BOTH the rel-id array (the `r` group variable)
 * and the node-id array (start + every hop end — the `a` group is its init,
 * the `b` group its tail). Each iteration is one equi-join on the frontier
 * node; arrays hold 8-byte ids only, so the shuffle payload stays narrow
 * even at 100 TB — property hydration of group elements is a post-join
 * against the nodes table, outside the loop.
 */
object Trail {

  /**
   * @param edges (id LONG, src LONG, dst LONG) — pre-oriented/filtered
   * @param input rows with bound start-node column `fromCol`
   * @param edgePredicate extra per-iteration predicate over edge columns
   * @return input + `endAlias` LONG, `nodesAlias` ARRAY<LONG> (length
   *         hops+1, starts with the start node), `relsAlias` ARRAY<LONG>,
   *         `hopsAlias` INT — one row per distinct trail of length
   *         in [min, max]
   */
  def trail(edges: DataFrame, input: DataFrame, fromCol: String,
      min: Int, max: Int,
      endAlias: String = "end", relsAlias: String = "trail_rels",
      nodesAlias: String = "trail_nodes", hopsAlias: String = "hops",
      edgePredicate: Option[Column] = None): DataFrame = {
    require(min >= 0 && max >= min && max <= 30,
      s"trail bounds out of range: $min..$max")
    val e0 = edges.select(col("id").as("__er"), col("src").as("__es"), col("dst").as("__ed"))
    val e = edgePredicate.fold(e0)(p => edges.filter(p)
      .select(col("id").as("__er"), col("src").as("__es"), col("dst").as("__ed")))

    var level = input
      .withColumn(endAlias, col(fromCol))
      .withColumn(nodesAlias, array(col(fromCol)))
      .withColumn(relsAlias, array().cast("array<long>"))
    val out = Seq.newBuilder[DataFrame]
    if (min == 0) out += level.withColumn(hopsAlias, lit(0))

    var k = 1
    while (k <= max) {
      level = level
        .join(e, col(endAlias) === col("__es") &&
          !array_contains(col(relsAlias), col("__er")))
        .withColumn(relsAlias, concat(col(relsAlias), array(col("__er"))))
        .withColumn(nodesAlias, concat(col(nodesAlias), array(col("__ed"))))
        .withColumn(endAlias, col("__ed"))
        .drop("__es", "__ed", "__er")
      if (k >= min) out += level.withColumn(hopsAlias, lit(k))
      k += 1
    }
    out.result().reduce(_ unionByName _)
  }

  /**
   * SHORTEST k paths (GQL / reference StatefulShortestPath,
   * LogicalPlan.scala:2290 + NFA.scala): for each (source, target) pair the
   * k shortest TRAILS by hop count, ties broken by the lexicographically
   * smallest rel-id sequence — deterministic.
   *
   * Depth-synchronized frontier search, the Spark analog of the reference's
   * product-graph BFS: each round expands the frontier one hop and keeps
   * only the k best `(hops, path)` partial trails per (source, node). Work
   * per round is bounded by |reached nodes| × k — NOT by the number of
   * trails, which is exponential in depth on dense graphs. Because shorter
   * partials always outrank longer ones, rows kept in earlier rounds are
   * never evicted, so the per-node budget is maintained with an incremental
   * (source, node) → count table instead of re-ranking history each round.
   *
   * @param edges (id, src, dst) oriented/filtered
   * @param pairs (source, target)
   * @return (source, target, hops, path ARRAY<LONG>, rank 1..k)
   */
  def shortestK(edges: DataFrame, pairs: DataFrame, k: Int, maxDepth: Int): DataFrame = {
    require(k >= 1 && maxDepth >= 0 && maxDepth <= 30,
      s"shortestK bounds out of range: k=$k maxDepth=$maxDepth")
    val e = edges.select(col("id").as("__er"), col("src").as("__es"), col("dst").as("__ed"))
    // candidates within one round share a hop count — rank on path only
    val wNew = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "end").orderBy(col("path").asc)

    var frontier = pairs.select("source").distinct()
      .select(col("source"), col("source").as("end"), lit(0).as("hops"),
        array().cast("array<long>").as("path"))
      .localCheckpoint()
    val keptPieces = Seq.newBuilder[DataFrame]
    keptPieces += frontier
    var counts = frontier.groupBy("source", "end").agg(count(lit(1)).as("__have"))
      .localCheckpoint()

    var d = 0
    var fCnt = frontier.count()
    while (d < maxDepth && fCnt > 0) {
      // per-node budget bounds the frontier at |reached| × k — broadcast
      // when small so expansion probes edges map-side
      val f = if (fCnt <= 200000) broadcast(frontier) else frontier
      val expanded = f.join(e,
          col("end") === col("__es") && !array_contains(col("path"), col("__er")))
        .select(col("source"), col("__ed").as("end"), (col("hops") + 1).as("hops"),
          concat(col("path"), array(col("__er"))).as("path"))
      val newKept = expanded
        .withColumn("__rk", row_number().over(wNew))
        .join(counts, Seq("source", "end"), "left_outer")
        .filter(col("__rk") + coalesce(col("__have"), lit(0L)) <= k)
        .drop("__rk", "__have")
        .localCheckpoint()
      // lazy: next round's join materializes it in the same job
      counts = counts.join(
          newKept.groupBy("source", "end").agg(count(lit(1)).as("__new")),
          Seq("source", "end"), "full_outer")
        .select(col("source"), col("end"),
          (coalesce(col("__have"), lit(0L)) + coalesce(col("__new"), lit(0L))).as("__have"))
        .localCheckpoint(false)
      keptPieces += newKept
      frontier = newKept
      fCnt = frontier.count()
      d += 1
    }
    val kept = keptPieces.result().reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source", "target").orderBy(col("hops").asc, col("path").asc)
    kept.join(pairs, Seq("source")).filter(col("end") === col("target"))
      .select(col("source"), col("target"), col("hops"), col("path"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** PropertyGraph convenience: orient + type-filter the rels table. */
  def trail(g: PropertyGraph, input: DataFrame, fromCol: String,
      relTypes: Seq[String], direction: Direction, min: Int, max: Int): DataFrame = {
    val r0 = direction match {
      case Direction.Out  => g.rels.select(col("id"), col("src"), col("dst"), col("type"))
      case Direction.In   => g.rels.select(col("id"), col("dst").as("src"), col("src").as("dst"), col("type"))
      case Direction.Both => g.undirectedRels.select(col("id"), col("src"), col("dst"), col("type"))
    }
    val filtered = if (relTypes.isEmpty) r0 else r0.filter(col("type").isin(relTypes: _*))
    trail(filtered.select("id", "src", "dst"), input, fromCol, min, max)
  }
}
