package graft.ops

import graft.graph.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Updating operators (SURVEY §2.8) as pure PropertyGraph → PropertyGraph
 * transforms: Create :1217, Merge :2602 (ON MATCH / ON CREATE), SetLabels
 * :3686 / RemoveLabels :3492, SetNodeProperty :3695, Delete/DetachDelete
 * :1240-:1315 — reference pipes CreatePipe/MergePipe/SetPipe/DeletePipe.
 *
 * The reference applies updates in-place under locks; Spark-native updates
 * are batch rewrites of immutable snapshots (persisted via GraphStore,
 * which gives the snapshot isolation the reference gets from its
 * transaction machinery). Each op is a join/union — shuffle on the id key,
 * no driver-side loops — so a 100 TB MERGE is one co-partitioned full-outer
 * join.
 *
 * Cypher's "updates visible to later clauses" (Eager :1940 semantics) holds
 * by construction: each op returns a new graph value that later ops read.
 */
object UpdateOps {

  /** CREATE new nodes. Caller provides ids (e.g. via GraphStore.nextIdRange
    * or a deterministic scheme like TpchGraph's). Property columns the graph
    * has never seen EXTEND the schema (NULL for existing rows) — any node
    * may carry any property, like the reference's schema-free stores;
    * absent properties conform to NULL. */
  def createNodes(g: PropertyGraph, newNodes: DataFrame): PropertyGraph =
    enforced(g.copy(nodes = unionExtending(g.nodes, newNodes)))

  /** Eager constraint enforcement on node writes (reference: a violating
    * write fails its transaction). A no-op — zero added jobs — unless the
    * graph actually declares constraints. */
  private def enforced(g: PropertyGraph): PropertyGraph = {
    if (g.schema.constraints.nonEmpty) graft.graph.Schema.validate(g)
    g
  }

  def createRels(g: PropertyGraph, newRels: DataFrame): PropertyGraph =
    g.copy(rels = unionExtending(g.rels, newRels))

  private def unionExtending(target: DataFrame, df: DataFrame): DataFrame = {
    val known = target.columns.toSet
    val extended = df.schema.fields.filterNot(f => known(f.name))
      .foldLeft(target) { (acc, f) => acc.withColumn(f.name, lit(null).cast(f.dataType)) }
    val (t2, d2) = reconcileTypes(extended, df)
    t2.unionByName(conform(d2, t2))
  }

  /** Dynamic property typing: a property column WRITTEN with a different
    * value category than stored (`SET n.p = 'x'` where p holds numbers —
    * the reference stores per-value dynamic types) widens BOTH sides to
    * the orderability encoding instead of failing Spark's ANSI coercion.
    * Numeric-vs-numeric and NullType conflicts keep native coercion. */
  private def reconcileTypes(target: DataFrame,
      df: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    val O = graft.functions.Orderability
    val structural = Set("id", "src", "dst", "type", "labels")
    val shared = df.columns.filter(c =>
      !structural(c) && target.columns.contains(c))
    def nativeOk(a: DataType, b: DataType): Boolean =
      a == b || a == NullType || b == NullType ||
        (a.isInstanceOf[NumericType] && b.isInstanceOf[NumericType]) ||
        ((a, b) match {
          case (ArrayType(x, _), ArrayType(y, _)) => nativeOk(x, y)
          case _ => false
        })
    shared.foldLeft((target, df)) { case ((t, d), c0) =>
      val (tt, dt) = (t.schema(c0).dataType, d.schema(c0).dataType)
      if (nativeOk(tt, dt)) (t, d)
      else {
        def liftTo(frame: DataFrame, from: DataType): Option[DataFrame] =
          if (O.isEncoded(from))
            Some(frame.withColumn(c0, col(c0).cast(O.encodedDdl)))
          else O.encoderAt(0, from).map(f =>
            frame.withColumn(c0, f(col(c0)).cast(O.encodedDdl)))
        (liftTo(t, tt), liftTo(d, dt)) match {
          case (Some(t2), Some(d2)) => (t2, d2)
          case _ => (t, d) // unencodable: keep native coercion (pre-r14)
        }
      }
    }
  }

  private def conform(df: DataFrame, target: DataFrame): DataFrame = {
    val present = df.columns.toSet
    target.schema.fields.foldLeft(df) { (acc, f) =>
      if (present(f.name)) acc
      else acc.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(target.columns.map(col).toIndexedSeq: _*)
  }

  /**
   * MERGE on node id (Delta-style MERGE INTO without Delta): full-outer join
   * target×source on id; matched rows get `onMatch` column updates, unmatched
   * source rows are inserted with `onCreate` applied.
   *
   * @param source   rows with `id` + any property columns to set
   * @param onMatch  property -> expression over (target columns, source
   *                 columns prefixed `src_`) applied to matched rows
   * @param onCreate same, applied to inserted rows
   */
  def mergeNodes(
      g: PropertyGraph, source: DataFrame,
      onMatch: Map[String, Column] = Map.empty,
      onCreate: Map[String, Column] = Map.empty): PropertyGraph = {
    val src = source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, s"src_$c"))
    val joined = g.nodes.join(src, col("id") === col("src_id"), "full_outer")
    val matched = col("id").isNotNull && col("src_id").isNotNull
    val insertOnly = col("id").isNull

    val outCols = g.nodes.columns.map { c =>
      val base = c match {
        case "id" => coalesce(col("id"), col("src_id"))
        case _ =>
          val fromSrc = if (src.columns.contains(s"src_$c")) col(s"src_$c") else lit(null)
          val whenMatched = onMatch.get(c) match {
            case Some(m) => when(matched, m).otherwise(col(c))
            case None    => col(c)
          }
          when(insertOnly, onCreate.getOrElse(c, fromSrc)).otherwise(whenMatched)
      }
      base.as(c)
    }
    g.copy(nodes = joined.select(outCols.toIndexedSeq: _*))
  }

  /** SET n:Label / REMOVE n:Label for the node ids in `ids`. Ids are
    * deduplicated first: MATCH output routinely carries duplicates, and a
    * non-distinct left join would multiply node rows. */
  def setLabels(g: PropertyGraph, ids: DataFrame, add: Seq[String] = Nil,
      remove: Seq[String] = Nil): PropertyGraph = {
    val flagged = g.nodes.join(
      ids.select(col("id")).distinct().withColumn("__hit", lit(true)),
      Seq("id"), "left_outer")
    val withAdd =
      if (add.isEmpty) col("labels")
      else array_union(col("labels"), lit(add.toArray))
    val withRemove =
      if (remove.isEmpty) withAdd
      else array_except(withAdd, lit(remove.toArray))
    enforced(g.copy(nodes = flagged
      .withColumn("labels", when(col("__hit"), withRemove).otherwise(col("labels")))
      .drop("__hit")))
  }

  /** SET n.prop = expr for matching ids (SetNodeProperty :3695). */
  def setNodeProperty(g: PropertyGraph, ids: DataFrame, prop: String, value: Column): PropertyGraph =
    setNodeProperties(g, ids, Map(prop -> value))

  /** SET n += {props} (SetNodePropertiesFromMap :3724): several properties
    * in one pass over the nodes table. */
  def setNodeProperties(g: PropertyGraph, ids: DataFrame, props: Map[String, Column]): PropertyGraph = {
    val flagged = g.nodes.join(
      ids.select(col("id")).distinct().withColumn("__hit", lit(true)),
      Seq("id"), "left_outer")
    val updated = props.foldLeft(flagged) { case (df, (p, v)) =>
      df.withColumn(p, when(col("__hit"), v).otherwise(col(p)))
    }
    g.copy(nodes = updated.drop("__hit"))
  }

  /** SET from a computed source: each source row carries an `id` plus new
    * property values (e.g. produced by a MATCH with per-row expressions).
    * One left join on id; unmatched target rows keep their values. The
    * general form behind Cypher `SET n.p = <expr over the match row>`. */
  def setNodePropertiesFromSource(g: PropertyGraph, source: DataFrame): PropertyGraph =
    enforced(g.copy(nodes = applySource(g.nodes, source)))

  def setRelPropertiesFromSource(g: PropertyGraph, source: DataFrame): PropertyGraph =
    g.copy(rels = applySource(g.rels, source))

  private def applySource(target0: DataFrame, source0: DataFrame): DataFrame = {
    val props = source0.columns.filter(_ != "id")
    // SET of a property key the graph has never seen extends the schema
    // (NULL for untouched rows) — same schema-free semantics as createNodes
    val known = target0.columns.toSet
    val target1 = source0.schema.fields
      .filter(f => f.name != "id" && !known(f.name))
      .foldLeft(target0)((acc, f) => acc.withColumn(f.name, lit(null).cast(f.dataType)))
    // cross-category SET widens the stored column to the dynamic encoding
    val (target, source) = reconcileTypes(target1, source0)
    // last-write-wins per id, deterministically (max over the value struct)
    val dedup = source.groupBy("id")
      .agg(max(struct(props.map(col).toIndexedSeq: _*)).as("__s"))
      .select((col("id").as("__sid") +: props.map(p => col(s"__s.$p").as(s"__src_$p"))): _*)
    val joined = target.join(dedup, col("id") === col("__sid"), "left_outer")
    val updated = props.foldLeft(joined) { (df, p) =>
      df.withColumn(p, when(col("__sid").isNotNull, col(s"__src_$p")).otherwise(col(p)))
    }
    updated.drop((("__sid" +: props.map(p => s"__src_$p")).toIndexedSeq): _*)
  }

  /** SET r.prop = expr for matching rel ids (SetRelationshipProperty :3752). */
  def setRelProperties(g: PropertyGraph, relIds: DataFrame, props: Map[String, Column]): PropertyGraph = {
    val flagged = g.rels.join(
      relIds.select(col("id")).distinct().withColumn("__hit", lit(true)),
      Seq("id"), "left_outer")
    val updated = props.foldLeft(flagged) { case (df, (p, v)) =>
      df.withColumn(p, when(col("__hit"), v).otherwise(col(p)))
    }
    g.copy(rels = updated.drop("__hit"))
  }

  /**
   * MERGE on relationship identity (src, dst, type) — reference MergePipe
   * over a relationship pattern: matched rels get `onMatch` updates,
   * unmatched source rows are inserted (with ids from `source.id`).
   * One co-partitioned full-outer join on the composite key — scales.
   */
  def mergeRels(
      g: PropertyGraph, source: DataFrame,
      onMatch: Map[String, Column] = Map.empty,
      onCreate: Map[String, Column] = Map.empty,
      keyProps: Seq[String] = Nil): PropertyGraph = {
    // property columns the rels table has never seen extend the schema, so
    // inserted rows keep them (and keyProps can always resolve)
    val known = g.rels.columns.toSet
    val target = source.schema.fields.filterNot(f => known(f.name))
      .foldLeft(g.rels)((acc, f) => acc.withColumn(f.name, lit(null).cast(f.dataType)))
    val src = source.columns.foldLeft(source)((d, c) => d.withColumnRenamed(c, s"src_$c"))
    // Cypher MERGE (a)-[r:T {k:v}]->(b) matches on the WHOLE pattern: the
    // inline property map is part of the key (null-safe — props may be NULL)
    val cond = keyProps.foldLeft(
      col("src") === col("src_src") && col("dst") === col("src_dst") &&
        col("type") === col("src_type"))((c, k) => c && (col(k) <=> col(s"src_$k")))
    val joined = target.join(src, cond, "full_outer")
    val matched = col("id").isNotNull && col("src_id").isNotNull
    val insertOnly = col("id").isNull
    val outCols = target.columns.map { c =>
      val base = c match {
        case "id" | "src" | "dst" | "type" => coalesce(col(c), col(s"src_$c"))
        case _ =>
          val fromSrc = if (src.columns.contains(s"src_$c")) col(s"src_$c") else lit(null)
          val whenMatched = onMatch.get(c) match {
            case Some(m) => when(matched, m).otherwise(col(c))
            case None    => col(c)
          }
          when(insertOnly, onCreate.getOrElse(c, fromSrc)).otherwise(whenMatched)
      }
      base.as(c)
    }
    g.copy(rels = joined.select(outCols.toIndexedSeq: _*))
  }

  /**
   * DELETE / DETACH DELETE nodes. Plain DELETE must fail on nodes that still
   * have relationships (Cypher semantics); DETACH also removes incident
   * rels. Validation is a count, not a collect — scales.
   */
  def deleteNodes(g: PropertyGraph, ids: DataFrame, detach: Boolean): PropertyGraph = {
    val idsOnly = ids.select(col("id")).distinct()
    if (!detach) {
      // rels has its own `id` column — rename before the semi join so the
      // endpoint comparison can't resolve to the rel id
      val delIds = idsOnly.withColumnRenamed("id", "__del_id")
      val incident = g.rels.join(delIds,
        col("src") === col("__del_id") || col("dst") === col("__del_id"), "left_semi")
      val n = incident.count()
      require(n == 0, s"Cannot DELETE nodes with $n incident relationships — use DETACH DELETE")
      g.copy(nodes = g.nodes.join(idsOnly, Seq("id"), "left_anti"))
    } else {
      val keptRels = g.rels
        .join(idsOnly.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(idsOnly.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        .select(g.rels.columns.map(col).toIndexedSeq: _*)
      g.copy(nodes = g.nodes.join(idsOnly, Seq("id"), "left_anti"),
        rels = keptRels)
    }
  }

  def deleteRels(g: PropertyGraph, relIds: DataFrame): PropertyGraph =
    g.copy(rels = g.rels.join(relIds.select(col("id")), Seq("id"), "left_anti"))

  /** AssertSameNode (LogicalPlan.scala:999): MERGE against several unique
    * constraints must resolve every seek to the SAME node — enforced inside
    * the plan via assert_true, so the violation fails the job (the
    * reference throws MergeConstraintConflictException) instead of silently
    * fanning out. */
  def assertSameNode(df: DataFrame, a: String, b: String): DataFrame =
    // anchored in a filter (not a dropped column) so column pruning /
    // CollapseProject can never legally eliminate the check
    df.filter(when(col(a) === col(b), lit(true)).otherwise(raise_error(
      lit(s"MERGE unique-constraint conflict: $a and $b resolved to different nodes"))))
}
