package graft

import graft.graph.{Direction, TpchGraph}
import graft.ops.Expand
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY §7.2) on /root/testdata/sf0.001 — the minimum
    * end-to-end slice: MATCH (c:Customer)-[:PLACED]->(o:Order)
    * WHERE o.totalprice > 100 RETURN c.name, count(o) AS n
    * ORDER BY n DESC LIMIT 10 — run through the PropertyGraph + Expand
    * operators, not raw table joins. */
  def entry(spark: SparkSession): DataFrame = {
    val g = TpchGraph.load(spark, "/root/testdata/sf0.001")
    val custs = g.nodesByLabel("Customer").select(col("id").as("c"), col("name"))
    val expanded = Expand.expandAll(g, custs, "c", Some("PLACED"), Direction.Out, "r", "o")
    val orders = g.nodesByLabel("Order").filter(col("totalprice") > 100)
      .select(col("id").as("o"))
    expanded.join(orders, "o")
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("name").asc)
      .limit(10)
  }

  private val all: Seq[QueryDef] =
    RelationalQueries.defs ++ ExpressionQueries.defs ++ GraphQueries.defs ++
      PipelineQueries.defs ++ EventQueries.defs ++ UpdateQueries.defs

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (probabilistic sketches, LSH) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
