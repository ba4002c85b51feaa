package graft.ops

import graft.graph.{Direction, PropertyGraph}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Variable-length expand `(a)-[:T*min..max]->(b)` — reference
 * VarLengthExpandPipe (pipes/VarLengthExpandPipe.scala:83-123, DFS with
 * per-step predicates) and Trail/quantified path patterns
 * (pipes/TrailPipe.scala:65-81).
 *
 * Spark formulation: a bounded iterative join loop. Level k+1 = level k
 * joined against the (type-filtered, orientation-resolved) rels table on
 * frontier node = src. Cypher's RELATIONSHIP UNIQUENESS within a path
 * (front-end AddUniquenessPredicates.scala — SURVEY §7.4 hard-part #1) is
 * enforced by accumulating the rel-id path array and rejecting rels already
 * in it (`array_contains`).
 *
 * Scale notes: max hops is statically bounded (the planner rewrites
 * unbounded patterns to pruning BFS — see Bfs.scala — exactly like the
 * reference's pruningVarExpander.scala). Each iteration is one shuffle on
 * the frontier; path arrays hold 8-byte ids only. For hub-heavy graphs the
 * per-level DataFrame grows multiplicatively — that blowup is inherent to
 * enumerating paths (the reference's DFS enumerates the same set, serially);
 * when only endpoints matter use Bfs.pruningExpand instead.
 */
object VarExpand {

  /**
   * @param input rows with bound start-node column `fromCol`
   * @return input columns + `<toAlias>` (end node), `<relsAlias>`
   *         (ARRAY<LONG> of traversed rel ids, in order), `<depthAlias>`
   *         — one row per distinct path of length in [minHops, maxHops].
   */
  def varExpand(
      g: PropertyGraph, input: DataFrame, fromCol: String,
      relTypes: Seq[String], direction: Direction,
      minHops: Int, maxHops: Int,
      toAlias: String = "end", relsAlias: String = "rels",
      depthAlias: String = "depth",
      edgeFilter: Option[Column] = None,
      baseRels: Option[DataFrame] = None): DataFrame = {
    require(minHops >= 0 && maxHops >= minHops && maxHops <= 30,
      s"varExpand bounds out of range: $minHops..$maxHops")

    // per-step predicate over raw rel columns (e.g. the inline property map
    // of `[r:T*1..3 {k: v}]` — every traversed rel must match) is applied
    // BEFORE orientation drops property columns
    // no per-step property predicate → the warm compact topology suffices;
    // with one, raw rels keep the property columns the filter reads. A
    // caller that pre-filtered the raw rels (per-step WHERE) overrides.
    val base = baseRels match {
      case Some(b) => direction match {
        case Direction.Both =>
          val swapped = b
            .withColumnRenamed("src", "__tmp_src")
            .withColumnRenamed("dst", "src")
            .withColumnRenamed("__tmp_src", "dst")
          b.unionByName(swapped.select(b.columns.map(col).toIndexedSeq: _*))
        case _ => b
      }
      case None => direction match {
        case Direction.Both => if (edgeFilter.isEmpty) g.undirectedTopo else g.undirectedRels
        case _              => if (edgeFilter.isEmpty) g.topology else g.rels
      }
    }
    val pre = edgeFilter.fold(base)(base.filter)
    val r0 = direction match {
      case Direction.In => pre.select(col("id"), col("dst").as("src"),
        col("src").as("dst"), col("type"))
      case _ => pre
    }
    val filtered = if (relTypes.isEmpty) r0 else r0.filter(col("type").isin(relTypes: _*))
    val edges = filtered
      .select(col("src").as("__es"), col("dst").as("__ed"), col("id").as("__er"))

    // level 0: zero-length path (start = end)
    var level = input.withColumn(toAlias, col(fromCol))
      .withColumn(relsAlias, array().cast("array<long>"))
    val out = Seq.newBuilder[DataFrame]
    if (minHops == 0) out += level.withColumn(depthAlias, lit(0))

    var k = 1
    while (k <= maxHops) {
      level = level
        .join(edges, col(toAlias) === col("__es") && !array_contains(col(relsAlias), col("__er")))
        .withColumn(relsAlias, concat(col(relsAlias), array(col("__er"))))
        .withColumn(toAlias, col("__ed"))
        .drop("__es", "__ed", "__er")
      if (k >= minHops) out += level.withColumn(depthAlias, lit(k))
      k += 1
    }
    out.result().reduce(_ unionByName _)
  }
}
