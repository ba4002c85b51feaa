package graft.queries

import graft.graph.TpchGraph
import graft.ops.UpdateOps
import org.apache.spark.sql.functions._

/**
 * Oracle-checked coverage for the updating operators (SURVEY §2.8 —
 * reference CreatePipe/MergePipe/SetPipe/DeletePipe) and the label-algebra
 * / id-seek scans (§2.1). Each query performs a real graph mutation through
 * UpdateOps and reads the result back; the DuckDB oracle re-derives the
 * post-update state relationally.
 */
object UpdateQueries {
  import QueryDef.t

  private val CustomerBase = TpchGraph.LabelBase("Customer") // 3 << 44

  val defs: Seq[QueryDef] = Seq(

    // MERGE upsert (MergePipe match-or-create): customers with key < 50 get
    // acctbal doubled ON MATCH; all suppliers are inserted as new Customer
    // nodes (id offset 20M). Oracle = full-outer-join emulation in DuckDB.
    QueryDef("q_merge_upsert",
      (s, d) => {
        val g = TpchGraph.load(s, d)
        val cust = t(s, d, "customer")
        val updates = cust.filter(col("c_custkey") < 50).select(
          TpchGraph.nodeId("Customer", col("c_custkey")).as("id"),
          lit(Array("Customer")).as("labels"),
          col("c_name").as("name"),
          round(col("c_acctbal") * 2, 2).as("acctbal"))
        val inserts = t(s, d, "supplier").select(
          (TpchGraph.nodeId("Customer", col("s_suppkey")) + lit(20000000L)).as("id"),
          lit(Array("Customer")).as("labels"),
          col("s_name").as("name"),
          round(col("s_acctbal"), 2).as("acctbal"))
        val g2 = UpdateOps.mergeNodes(g, updates.unionByName(inserts),
          onMatch = Map("acctbal" -> col("src_acctbal")))
        g2.nodesByLabel("Customer")
          .select(col("id"), col("name"), round(col("acctbal"), 2).as("acctbal"))
      },
      Some("""SELECT (CAST(3 AS BIGINT) << 44) + c_custkey AS id, c_name AS name,
             |  round(CASE WHEN c_custkey < 50 THEN round(c_acctbal * 2, 2)
             |        ELSE c_acctbal END, 2) AS acctbal
             |FROM customer
             |UNION ALL
             |SELECT (CAST(3 AS BIGINT) << 44) + 20000000 + s_suppkey, s_name,
             |  round(s_acctbal, 2)
             |FROM supplier""".stripMargin)),

    // SetLabels at data scale + the three label-algebra scans over the
    // result: intersection (Customer ∧ Debtor), subtraction (Customer ∧
    // ¬Debtor), union (Debtor ∨ Supplier) — reference
    // IntersectionNodeByLabelsScan :2413, SubtractionNodeByLabelsScan :4106,
    // UnionNodeByLabelsScan :4748.
    QueryDef("q_label_algebra",
      (s, d) => {
        val g = TpchGraph.load(s, d)
        val debtors = g.nodesByLabel("Customer")
          .filter(col("acctbal") < 0).select(col("id"))
        val g2 = UpdateOps.setLabels(g, debtors, add = Seq("Debtor"))
        val inter = g2.nodesByAllLabels(Seq("Customer", "Debtor"))
          .agg(count(lit(1)).as("n")).select(lit("intersection").as("scan"), col("n"))
        val sub = g2.nodesBySubtraction(Seq("Customer"), Seq("Debtor"))
          .agg(count(lit(1)).as("n")).select(lit("subtraction").as("scan"), col("n"))
        val uni = g2.nodesByAnyLabel(Seq("Debtor", "Supplier"))
          .agg(count(lit(1)).as("n")).select(lit("union").as("scan"), col("n"))
        inter.unionByName(sub).unionByName(uni)
      },
      Some("""SELECT 'intersection' AS scan, count(*) AS n FROM customer WHERE c_acctbal < 0
             |UNION ALL
             |SELECT 'subtraction', count(*) FROM customer WHERE c_acctbal >= 0
             |UNION ALL
             |SELECT 'union',
             |  (SELECT count(*) FROM customer WHERE c_acctbal < 0) +
             |  (SELECT count(*) FROM supplier)""".stripMargin)),

    // NodeByIdSeek :2684 — direct id-list lookup across label id spaces.
    QueryDef("q_node_id_seek",
      (s, d) => {
        val g = TpchGraph.load(s, d)
        val ids = Seq(1L, 7L).map(CustomerBase + _) ++
          Seq(TpchGraph.LabelBase("Nation") + 3L)
        g.nodesById(ids).select(col("id"), col("name"))
      },
      Some("""SELECT (CAST(3 AS BIGINT) << 44) + c_custkey AS id, c_name AS name
             |FROM customer WHERE c_custkey IN (1, 7)
             |UNION ALL
             |SELECT (CAST(2 AS BIGINT) << 44) + n_nationkey, n_name
             |FROM nation WHERE n_nationkey = 3""".stripMargin)),

    // DirectedRelationshipByIdSeek :1621 — rel-id lookup (FROM rels are
    // dense in custkey).
    QueryDef("q_rel_id_seek",
      (s, d) => {
        val g = TpchGraph.load(s, d)
        val ids = Seq(1L, 2L, 3L).map(TpchGraph.RelBase("FROM") + _)
        g.relsById(ids).select(col("id"), col("src"), col("dst"), col("type"))
      },
      Some("""SELECT (CAST(22 AS BIGINT) << 44) + c_custkey AS id,
             |  (CAST(3 AS BIGINT) << 44) + c_custkey AS src,
             |  (CAST(2 AS BIGINT) << 44) + c_nationkey AS dst,
             |  'FROM' AS type
             |FROM customer WHERE c_custkey IN (1, 2, 3)""".stripMargin)),

    // DETACH DELETE at data scale: remove the 5 highest-degree Part nodes
    // and count surviving CONTAINS rels. Oracle re-derives the cascade.
    QueryDef("q_detach_delete",
      (s, d) => {
        val g = TpchGraph.load(s, d)
        val li = t(s, d, "lineitem")
        val topParts = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("deg"))
          .orderBy(col("deg").desc, col("l_partkey").asc).limit(5)
          .select(TpchGraph.nodeId("Part", col("l_partkey")).as("id"))
        val g2 = UpdateOps.deleteNodes(g, topParts, detach = true)
        g2.rels.filter(col("type") === "CONTAINS")
          .agg(count(lit(1)).as("n_contains"))
      },
      Some("""WITH top5 AS (SELECT l_partkey FROM lineitem
             |  GROUP BY l_partkey ORDER BY count(*) DESC, l_partkey ASC LIMIT 5)
             |SELECT count(*) AS n_contains FROM lineitem
             |WHERE l_partkey NOT IN (SELECT l_partkey FROM top5)""".stripMargin))
  )
}
