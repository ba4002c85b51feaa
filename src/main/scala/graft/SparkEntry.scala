package graft

import graft.graph.{Direction, TpchGraph}
import graft.ops.Expand
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY §7.2) on /root/testdata/sf0.001 — the full
    * engine end-to-end: a Cypher string parsed, planned and executed by
    * graft.cypher over the PropertyGraph projection. */
  def entry(spark: SparkSession): DataFrame = {
    val g = TpchGraph.load(spark, "/root/testdata/sf0.001")
    graft.cypher.Cypher.run(spark, g,
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.totalprice > 100
        |RETURN c.name AS name, count(o) AS n
        |ORDER BY n DESC, name ASC LIMIT 10""".stripMargin)
  }

  private val all: Seq[QueryDef] =
    RelationalQueries.defs ++ ExpressionQueries.defs ++ GraphQueries.defs ++
      PipelineQueries.defs ++ EventQueries.defs ++ UpdateQueries.defs ++
      CypherQueries.defs ++ PathQueries.defs ++ TypeQueries.defs

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (probabilistic sketches, LSH) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
