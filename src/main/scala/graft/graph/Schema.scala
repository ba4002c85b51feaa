package graft.graph

import org.apache.spark.sql.functions._

/**
 * Schema objects (SURVEY §1.3; reference community/schema
 * IndexDescriptor/ConstraintDescriptor, SchemaLogicalPlan.scala commands):
 * advisory indexes and enforced constraints over the property graph.
 *
 * Spark-native meaning of each object:
 *  - RANGE index on (label, prop): a LAYOUT declaration. GraphStore.commit
 *    range-partitions + sorts the nodes table by the indexed property, so
 *    parquet row-group min/max statistics turn property predicates into
 *    file-level pruning — the columnar analog of a b-tree seek (predicate
 *    pushdown into the scan is already free; see PlanAuditSpec).
 *  - constraints (unique / existence / node key): validated on creation
 *    (the reference's populating phase) and re-validated by
 *    GraphStore.commit, which refuses to flip the version pointer on a
 *    violating snapshot — the batch analog of transaction-time enforcement.
 *
 * The catalog rides ON the PropertyGraph value, so every write
 * (UpdateOps returns g.copy(...)) carries the schema forward unchanged.
 */
final case class IndexDef(name: String, label: String, prop: String,
    kind: String = "range",
    // kind-specific config (reference IndexConfig): vector indexes carry
    // vector.dimensions + vector.similarity ("COSINE" | "EUCLIDEAN")
    options: Map[String, String] = Map.empty)

final case class ConstraintDef(name: String, label: String, prop: String,
    kind: String) // "unique" | "exists" | "node_key"

final case class GraphSchema(indexes: Seq[IndexDef], constraints: Seq[ConstraintDef])

object GraphSchema {
  val empty: GraphSchema = GraphSchema(Nil, Nil)
}

object Schema {

  /** CREATE INDEX — records the layout declaration (applied at commit).
    * kind: range (layout driver) / text / point / vector / fulltext —
    * non-range kinds are catalog entries that name-resolve in the
    * matching procedures (db.index.vector.queryNodes, …). */
  def createIndex(g: PropertyGraph, name: String, label: String,
      prop: String, kind: String = "range",
      options: Map[String, String] = Map.empty): PropertyGraph = {
    require(Set("range", "text", "point", "vector", "fulltext")(kind),
      s"unknown index kind $kind")
    require(!g.schema.indexes.exists(_.name == name), s"index $name already exists")
    g.copy(schema = g.schema.copy(
      indexes = g.schema.indexes :+ IndexDef(name, label, prop, kind, options)))
  }

  /** CREATE CONSTRAINT — validates the existing data first (reference
    * constraint population), then records the descriptor. */
  def createConstraint(g: PropertyGraph, name: String, label: String,
      prop: String, kind: String): PropertyGraph = {
    require(Set("unique", "exists", "node_key")(kind), s"unknown constraint kind $kind")
    require(!g.schema.constraints.exists(_.name == name),
      s"constraint $name already exists")
    val c = ConstraintDef(name, label, prop, kind)
    validateConstraint(g, c)
    g.copy(schema = g.schema.copy(constraints = g.schema.constraints :+ c))
  }

  def dropIndex(g: PropertyGraph, name: String): PropertyGraph = {
    require(g.schema.indexes.exists(_.name == name), s"no such index $name")
    g.copy(schema = g.schema.copy(
      indexes = g.schema.indexes.filterNot(_.name == name)))
  }

  def dropConstraint(g: PropertyGraph, name: String): PropertyGraph = {
    require(g.schema.constraints.exists(_.name == name), s"no such constraint $name")
    g.copy(schema = g.schema.copy(
      constraints = g.schema.constraints.filterNot(_.name == name)))
  }

  /** Validate one constraint against the current snapshot; throws with the
    * offending count on violation. Uniqueness ignores NULL values (Cypher
    * semantics); existence means IS NOT NULL for every node of the label. */
  def validateConstraint(g: PropertyGraph, c: ConstraintDef): Unit = {
    val scoped = g.nodesByLabel(c.label)
    // the STORAGE column of the property (a property named `id` stores
    // under the escape, PropertyGraph.propCol) — a constraint over a
    // property the graph has never seen trivially holds (all NULL) for
    // uniqueness and trivially fails for existence on a non-empty scope
    val pc = PropertyGraph.propCol(c.prop)
    val present = scoped.columns.contains(pc)
    def checkUnique(): Unit = if (present) {
      val dups = scoped.filter(col(pc).isNotNull)
        .groupBy(col(pc)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).count()
      if (dups > 0) throw new IllegalStateException(
        s"constraint ${c.name}: $dups duplicate value(s) of ${c.label}.${c.prop}")
    }
    def checkExists(): Unit = {
      val nulls =
        if (present) scoped.filter(col(pc).isNull).count()
        else scoped.count()
      if (nulls > 0) throw new IllegalStateException(
        s"constraint ${c.name}: $nulls ${c.label} node(s) missing ${c.prop}")
    }
    c.kind match {
      case "unique"   => checkUnique()
      case "exists"   => checkExists()
      case "node_key" => checkExists(); checkUnique()
    }
  }

  /** Re-validate every constraint (GraphStore.commit calls this before
    * flipping the version pointer — a violating snapshot never commits). */
  def validate(g: PropertyGraph): Unit =
    g.schema.constraints.foreach(validateConstraint(g, _))

  /** Apply index layout for persistence: range-partition + sort the nodes
    * table by the first range index's property so parquet min/max row-group
    * stats prune files on indexed predicates. (One clustering dimension per
    * table — the same limitation any sort-based layout has; additional
    * indexes still benefit from pushdown + dictionary stats.) */
  def applyLayout(g: PropertyGraph): PropertyGraph =
    g.schema.indexes.filter(_.kind == "range").headOption match {
      case Some(ix) if g.nodes.columns.contains(ix.prop) =>
        g.copy(nodes = g.nodes
          .repartitionByRange(col(ix.prop))
          .sortWithinPartitions(col(ix.prop)))
      case _ => g
    }
}
