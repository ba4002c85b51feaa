package graft.ops

import graft.graph.{Direction, PropertyGraph}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Expand — the reference's signature traversal operator family
 * (ExpandAllPipe, community/cypher/interpreted-runtime/.../pipes/
 * ExpandAllPipe.scala:41-66; logical Expand LogicalPlan.scala:2012),
 * re-expressed as equi-joins. Where the reference walks per-node
 * relationship chains one row at a time, we declare the join and let
 * Catalyst/AQE pick broadcast vs shuffled-hash vs sort-merge; at 100 TB the
 * rels side is bucketed/partitioned by (type, src) so repeated expands reuse
 * the same partitioning and avoid re-shuffles.
 *
 * Binding model: the input DataFrame carries one column per bound variable
 * (e.g. `c` = node id). expand() appends `<relAlias>` (rel id) and
 * `<toAlias>` (node id) columns; property hydration is a later join against
 * the nodes table, kept out of the hot traversal loop (column pruning: the
 * traversal only ever shuffles ids).
 */
object Expand {

  // every expand variant projects only (id, src, dst) — the warm compact
  // topology serves them all; rel-property predicates hydrate separately
  // against the parquet-lineage rels table (pushdown preserved there)
  private def oriented(g: PropertyGraph, direction: Direction): DataFrame = direction match {
    case Direction.Out  => g.topology
    case Direction.In   =>
      g.topology.select(col("id"), col("dst").as("src"),
        col("src").as("dst"), col("type"))
    case Direction.Both => g.undirectedTopo
  }

  /** ExpandAll: for each row, traverse rels of node `fromCol` matching
    * type/direction; bind rel id as `relAlias`, far node as `toAlias`. */
  def expandAll(
      g: PropertyGraph, input: DataFrame, fromCol: String,
      relType: Option[String], direction: Direction,
      relAlias: String, toAlias: String): DataFrame = {
    val r0 = oriented(g, direction)
    val r1 = relType.fold(r0)(t => r0.filter(col("type") === t))
    val r = r1.select(col("id").as(relAlias), col("src").as("__from"), col("dst").as(toAlias))
    input.join(r, col(fromCol) === col("__from")).drop("__from")
  }

  /** ExpandInto (LogicalPlan.scala:2012, mode=ExpandInto): both endpoints
    * already bound — join on the composite (src, dst) key. */
  def expandInto(
      g: PropertyGraph, input: DataFrame, fromCol: String, toCol: String,
      relType: Option[String], direction: Direction, relAlias: String): DataFrame = {
    val r0 = oriented(g, direction)
    val r1 = relType.fold(r0)(t => r0.filter(col("type") === t))
    val r = r1.select(col("id").as(relAlias), col("src").as("__s"), col("dst").as("__d"))
    input.join(r, col(fromCol) === col("__s") && col(toCol) === col("__d"))
      .drop("__s", "__d")
  }

  /** ProjectEndpoints (LogicalPlan.scala:3115): a bound relationship id
    * column resolves to its (start, end) nodes — one equi-join against the
    * rels table, directed or either-orientation. */
  def projectEndpoints(g: PropertyGraph, input: DataFrame, relCol: String,
      startAlias: String, endAlias: String,
      direction: Direction = Direction.Out): DataFrame = {
    val r = oriented(g, direction)
      .select(col("id").as("__rid"), col("src").as(startAlias), col("dst").as(endAlias))
    input.join(r, col(relCol) === col("__rid")).drop("__rid")
  }

  /** OptionalExpandAll (OptionalExpandAllPipe): left-outer join — rows with
    * no matching rel survive with NULL rel/to, optionally gated by an extra
    * predicate evaluated inside the join condition (so non-matches are kept,
    * not filtered after the fact). */
  def optionalExpandAll(
      g: PropertyGraph, input: DataFrame, fromCol: String,
      relType: Option[String], direction: Direction,
      relAlias: String, toAlias: String,
      predicate: Option[Column] = None): DataFrame = {
    val r0 = oriented(g, direction)
    val r1 = relType.fold(r0)(t => r0.filter(col("type") === t))
    val r = r1.select(col("id").as(relAlias), col("src").as("__from"), col("dst").as(toAlias))
    val cond = predicate.foldLeft(col(fromCol) === col("__from"))(_ && _)
    input.join(r, cond, "left_outer").drop("__from")
  }
}
