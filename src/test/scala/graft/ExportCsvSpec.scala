package graft

import graft.graph.PropertyGraph
import graft.sources.ExportCsv
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Export → import round-trip in the reference import tool's CSV header
  * format: ids, multi-labels, rel types, and property TYPES all survive. */
class ExportCsvSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def graph: PropertyGraph = {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType)),
      StructField("name", StringType), StructField("age", LongType),
      StructField("score", DoubleType), StructField("active", BooleanType),
      StructField("joined", DateType)))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType),
      StructField("since", LongType)))
    PropertyGraph(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L, Seq("Person", "Admin"), "Alice, PhD", 30L, 9.5,
          true, java.sql.Date.valueOf("2020-01-02")),
        Row(2L, Seq("Person"), "Bob", 25L, 7.25, false,
          java.sql.Date.valueOf("2021-06-30")),
        Row(3L, Seq("Person"), null, null, null, null, null)), 2), nodeSchema),
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(10L, 1L, 2L, "KNOWS", 2015L),
        Row(11L, 2L, 3L, "LIKES", null)), 2), relSchema))
  }

  test("round-trip preserves ids, labels, types, and typed properties") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val g = graph
    ExportCsv.exportGraph(g, dir)
    val g2 = ExportCsv.importGraph(spark, dir)
    assert(g2.nodes.schema.map(f => f.name -> f.dataType.simpleString) ==
      g.nodes.schema.map(f => f.name -> f.dataType.simpleString))
    assert(g2.rels.schema.map(f => f.name -> f.dataType.simpleString) ==
      g.rels.schema.map(f => f.name -> f.dataType.simpleString))
    assert(g2.nodes.collect().map(_.toSeq).toSet ==
      g.nodes.collect().map(_.toSeq).toSet)
    assert(g2.rels.collect().map(_.toSeq).toSet ==
      g.rels.collect().map(_.toSeq).toSet)
    // the multi-label node keeps both labels through the ';' join
    val alice = g2.nodes.filter(col("id") === 1L).first()
    assert(alice.getSeq[String](1) == Seq("Person", "Admin"))
    // header spelled exactly as the import tool expects
    val headers = spark.read.text(s"$dir/nodes").collect().map(_.getString(0))
      .filter(_.startsWith("id:ID"))
    assert(headers.nonEmpty && headers.forall(_.startsWith("id:ID,:LABEL,")),
      s"unexpected node header: ${headers.take(1).mkString}")
    val relHeaders = spark.read.text(s"$dir/rels").collect().map(_.getString(0))
      .filter(_.startsWith(":START_ID"))
    assert(relHeaders.nonEmpty &&
      relHeaders.forall(_.startsWith(":START_ID,:END_ID,:TYPE,id:long")),
      s"unexpected rel header: ${relHeaders.take(1).mkString}")
  }
}
