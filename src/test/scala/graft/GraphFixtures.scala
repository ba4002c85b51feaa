package graft

import graft.graph.PropertyGraph
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Tiny deterministic graph shapes for per-operator golden tests — ports of
 * the reference runtime-spec-suite generators
 * (community/cypher/runtime-spec-suite/.../GraphCreation.scala:130-560:
 * nodeGraph :184, bipartiteGraph :130, chainGraphs :211, circleGraph :493,
 * starGraph :520, gridGraph :376).
 */
object GraphFixtures {

  private val nodeSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("labels", ArrayType(StringType), nullable = false),
    StructField("name", StringType, nullable = true)))

  private val relSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false),
    StructField("type", StringType, nullable = false)))

  def graph(spark: SparkSession,
      nodes: Seq[(Long, Seq[String], String)],
      rels: Seq[(Long, Long, Long, String)]): PropertyGraph = {
    val n = spark.createDataFrame(
      spark.sparkContext.parallelize(nodes.map(t => Row(t._1, t._2, t._3)), 2), nodeSchema)
    val r = spark.createDataFrame(
      spark.sparkContext.parallelize(rels.map(t => Row(t._1, t._2, t._3, t._4)), 2), relSchema)
    PropertyGraph(n, r)
  }

  /** n isolated nodes with the given label. */
  def nodeGraph(spark: SparkSession, n: Int, label: String = "N"): PropertyGraph =
    graph(spark, (0L until n).map(i => (i, Seq(label), s"n$i")), Seq.empty)

  /** Directed chain 0 -> 1 -> … -> n-1 of type T. */
  def chainGraph(spark: SparkSession, n: Int, tpe: String = "T"): PropertyGraph =
    graph(spark,
      (0L until n).map(i => (i, Seq("N"), s"n$i")),
      (0L until (n - 1)).map(i => (100 + i, i, i + 1, tpe)))

  /** Directed circle 0 -> 1 -> … -> n-1 -> 0. */
  def circleGraph(spark: SparkSession, n: Int, tpe: String = "T"): PropertyGraph =
    graph(spark,
      (0L until n).map(i => (i, Seq("N"), s"n$i")),
      (0L until n).map(i => (100 + i, i, (i + 1) % n, tpe)))

  /** Star: center 0, ring nodes 1..n each with center -> ring edge. */
  def starGraph(spark: SparkSession, n: Int, tpe: String = "T"): PropertyGraph =
    graph(spark,
      (0L, Seq("Center"), "c") +: (1L to n).map(i => (i, Seq("Ring"), s"r$i")),
      (1L to n).map(i => (100 + i, 0L, i, tpe)))

  /** Bipartite: lefts 0..n1-1 (label A) each connected to every right
    * n1..n1+n2-1 (label B). */
  def bipartiteGraph(spark: SparkSession, n1: Int, n2: Int, tpe: String = "T"): PropertyGraph =
    graph(spark,
      (0L until n1).map(i => (i, Seq("A"), s"a$i")) ++
        (0L until n2).map(i => (n1 + i, Seq("B"), s"b$i")),
      (for (i <- 0L until n1; j <- 0L until n2)
        yield (1000 + i * n2 + j, i, n1 + j, tpe)))

  /** w×h grid, right+down edges; node id = row*w+col. Known BFS distances:
    * dist((0,0) -> (r,c)) = r+c. */
  def gridGraph(spark: SparkSession, w: Int, h: Int): PropertyGraph = {
    val nodes = for (r <- 0 until h; c <- 0 until w)
      yield ((r * w + c).toLong, Seq("G"), s"g$r-$c")
    val right = for (r <- 0 until h; c <- 0 until w - 1)
      yield ((1000 + r * w + c).toLong, (r * w + c).toLong, (r * w + c + 1).toLong, "R")
    val down = for (r <- 0 until h - 1; c <- 0 until w)
      yield ((2000 + r * w + c).toLong, (r * w + c).toLong, ((r + 1) * w + c).toLong, "D")
    graph(spark, nodes, right ++ down)
  }

  def edges(g: PropertyGraph): DataFrame = g.rels.select("src", "dst")
}
