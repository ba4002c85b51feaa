package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Graph projection of the driver's relational tables (FIXTURES.md §3) into
 * the canonical PropertyGraph shape. This is the bulk-import path — the
 * Spark-native analog of the reference's neo4j-admin import
 * (community/import-tool/.../ImportCommand.java): a parallel read of source
 * tables, a deterministic id assignment, and two columnar outputs.
 *
 * Id scheme: each label gets a disjoint id range (labelIndex << 44 | key) so
 * ids are stable across runs and never collide — the graph equivalent of the
 * reference's per-store id spaces. Deterministic ids make tests and
 * incremental MERGE reproducible (no monotonically_increasing_id).
 */
object TpchGraph {

  val LabelBase: Map[String, Long] = Map(
    "Region"   -> (1L << 44),
    "Nation"   -> (2L << 44),
    "Customer" -> (3L << 44),
    "Supplier" -> (4L << 44),
    "Part"     -> (5L << 44),
    "Order"    -> (6L << 44),
    "User"     -> (7L << 44),
    "Document" -> (8L << 44))

  val RelBase: Map[String, Long] = Map(
    "IN_REGION"   -> (21L << 44),
    "FROM"        -> (22L << 44),
    "PLACED"      -> (23L << 44),
    "CONTAINS"    -> (24L << 44),
    "SUPPLIED_BY" -> (25L << 44))

  def nodeId(label: String, key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lit(LabelBase(label)) + key.cast("long")

  private def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** All property columns across labels — union schema with NULLs for
    * absent properties (Cypher: missing property IS NULL). */
  private val nodePropCols = Seq(
    "key", "name", "acctbal", "mktsegment", "status", "totalprice",
    "orderdate", "priority", "brand", "ptype", "psize", "retailprice",
    "lang", "source", "nChars", "text")

  private def toNodes(df: DataFrame, label: String): DataFrame = {
    val present = df.columns.toSet
    val props = nodePropCols.map(c => if (present(c)) col(c) else lit(null).as(c))
    df.select((col("id") +: lit(Array(label)).as("labels") +: props): _*)
  }

  /** Memoized graph handle per (session, dir): the assembled DataFrames are
    * lazy (no data is persisted) but building them costs ~8 parquet file
    * listings + schema reads — a real engine opens its store once, not per
    * query. The graph value is immutable (writes derive NEW snapshots), so
    * sharing the instance is safe; it also lets Cypher's plan cache hit
    * (keyed on graph identity) across repeated queries. */
  private val loaded =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), PropertyGraph]

  def load(spark: SparkSession, dir: String): PropertyGraph = {
    if (loaded.size > 32) loaded.clear() // bound: don't pin dead sessions
    loaded.computeIfAbsent((spark, dir), { case (s, d) => doLoad(s, d) })
  }

  /** Drop the memo. Benchmarks call this before sweeping persistent RDDs:
    * a graph handle surviving the sweep could reference a lazily
    * localCheckpoint'ed snapshot whose blocks the sweep just freed — and a
    * truncated-lineage RDD cannot recompute (missing-block errors, not
    * slowness). Clearing first means nothing live spans the sweep. */
  def clearMemo(): Unit = loaded.clear()

  private def doLoad(spark: SparkSession, dir: String): PropertyGraph = {
    val region   = table(spark, dir, "region")
    val nation   = table(spark, dir, "nation")
    val customer = table(spark, dir, "customer")
    val supplier = table(spark, dir, "supplier")
    val part     = table(spark, dir, "part")
    val orders   = table(spark, dir, "orders")
    val lineitem = table(spark, dir, "lineitem")

    val nodes = Seq(
      toNodes(region.select(nodeId("Region", col("r_regionkey")).as("id"),
        col("r_regionkey").cast("long").as("key"), col("r_name").as("name")), "Region"),
      toNodes(nation.select(nodeId("Nation", col("n_nationkey")).as("id"),
        col("n_nationkey").cast("long").as("key"), col("n_name").as("name")), "Nation"),
      toNodes(customer.select(nodeId("Customer", col("c_custkey")).as("id"),
        col("c_custkey").as("key"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), col("c_mktsegment").as("mktsegment")), "Customer"),
      toNodes(supplier.select(nodeId("Supplier", col("s_suppkey")).as("id"),
        col("s_suppkey").as("key"), col("s_name").as("name"),
        col("s_acctbal").as("acctbal")), "Supplier"),
      toNodes(part.select(nodeId("Part", col("p_partkey")).as("id"),
        col("p_partkey").as("key"), col("p_name").as("name"),
        col("p_brand").as("brand"), col("p_type").as("ptype"),
        col("p_size").cast("long").as("psize"),
        col("p_retailprice").as("retailprice")), "Part"),
      toNodes(orders.select(nodeId("Order", col("o_orderkey")).as("id"),
        col("o_orderkey").as("key"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("totalprice"), col("o_orderdate").as("orderdate"),
        col("o_orderpriority").as("priority")), "Order")
    ).reduce(_ unionByName _)

    val relPropCols = Seq("qty", "price", "discount", "tax", "shipdate")
    def toRels(df: DataFrame): DataFrame = {
      val present = df.columns.toSet
      val props = relPropCols.map(c => if (present(c)) col(c) else lit(null).as(c))
      df.select((Seq(col("id"), col("src"), col("dst"), col("type")) ++ props): _*)
    }

    val rels = Seq(
      toRels(nation.select(
        (lit(RelBase("IN_REGION")) + col("n_nationkey").cast("long")).as("id"),
        nodeId("Nation", col("n_nationkey")).as("src"),
        nodeId("Region", col("n_regionkey")).as("dst"),
        lit("IN_REGION").as("type"))),
      toRels(customer.select(
        (lit(RelBase("FROM")) + col("c_custkey")).as("id"),
        nodeId("Customer", col("c_custkey")).as("src"),
        nodeId("Nation", col("c_nationkey")).as("dst"),
        lit("FROM").as("type"))),
      toRels(supplier.select(
        (lit(RelBase("FROM")) + lit(1L << 40) + col("s_suppkey")).as("id"),
        nodeId("Supplier", col("s_suppkey")).as("src"),
        nodeId("Nation", col("s_nationkey")).as("dst"),
        lit("FROM").as("type"))),
      toRels(orders.select(
        (lit(RelBase("PLACED")) + col("o_orderkey")).as("id"),
        nodeId("Customer", col("o_custkey")).as("src"),
        nodeId("Order", col("o_orderkey")).as("dst"),
        lit("PLACED").as("type"))),
      toRels(lineitem.select(
        (lit(RelBase("CONTAINS")) + col("l_orderkey") * 16 + col("l_linenumber")).as("id"),
        nodeId("Order", col("l_orderkey")).as("src"),
        nodeId("Part", col("l_partkey")).as("dst"),
        lit("CONTAINS").as("type"),
        col("l_quantity").as("qty"), col("l_extendedprice").as("price"),
        col("l_discount").as("discount"), col("l_tax").as("tax"),
        col("l_shipdate").as("shipdate"))),
      toRels(lineitem.select(
        (lit(RelBase("SUPPLIED_BY")) + col("l_orderkey") * 16 + col("l_linenumber")).as("id"),
        nodeId("Order", col("l_orderkey")).as("src"),
        nodeId("Supplier", col("l_suppkey")).as("dst"),
        lit("SUPPLIED_BY").as("type"),
        col("l_quantity").as("qty")))
    ).reduce(_ unionByName _)

    PropertyGraph(nodes, rels)
  }
}
