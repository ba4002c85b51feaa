package graft

import graft.cypher.Cypher
import graft.graph.{GraphStore, PropertyGraph, Schema}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema objects: CREATE/DROP/SHOW INDEX + CONSTRAINT, validation-on-create,
  * commit-time enforcement, catalog introspection procs. */
class SchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def graph(names: Seq[(Long, String)]): PropertyGraph = {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType)),
      StructField("name", StringType)))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType)))
    PropertyGraph(
      spark.createDataFrame(spark.sparkContext.parallelize(
        names.map { case (i, n) => Row(i, Seq("P"), n) }, 2), nodeSchema),
      spark.createDataFrame(spark.sparkContext.parallelize(Seq.empty[Row], 1), relSchema))
  }

  test("unique constraint validates on creation and rejects duplicates") {
    val clean = graph(Seq(1L -> "a", 2L -> "b", 3L -> null))
    // nulls are ignored by uniqueness (Cypher semantics)
    val g2 = Schema.createConstraint(clean, "uq", "P", "name", "unique")
    assert(g2.schema.constraints.map(_.name) == Seq("uq"))
    val dup = graph(Seq(1L -> "a", 2L -> "a"))
    val ex = intercept[IllegalStateException] {
      Schema.createConstraint(dup, "uq", "P", "name", "unique")
    }
    assert(ex.getMessage.contains("duplicate"))
  }

  test("existence constraint rejects NULLs; node key = both") {
    val g = graph(Seq(1L -> "a", 2L -> null))
    intercept[IllegalStateException] {
      Schema.createConstraint(g, "ex", "P", "name", "exists")
    }
    val clean = graph(Seq(1L -> "a", 2L -> "b"))
    val g2 = Schema.createConstraint(clean, "nk", "P", "name", "node_key")
    assert(g2.schema.constraints.head.kind == "node_key")
  }

  test("GraphStore.commit refuses a snapshot violating its constraints") {
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    val store = new GraphStore(spark, dir)
    val g = Schema.createConstraint(graph(Seq(1L -> "a", 2L -> "b")),
      "uq", "P", "name", "unique")
    val v0 = store.commit(g)
    assert(v0 == 0)
    // introduce a duplicate, keep the constraint riding on the graph value
    val bad = g.copy(nodes = g.nodes.unionByName(
      graph(Seq(9L -> "a")).nodes))
    intercept[IllegalStateException] { store.commit(bad) }
    assert(store.currentVersion == 0) // pointer never flipped
  }

  test("Cypher surface: CREATE/SHOW/DROP constraint and index") {
    val g = graph(Seq(1L -> "a", 2L -> "b"))
    val (g2, _) = Cypher.execute(spark, g,
      "CREATE CONSTRAINT uq_name FOR (n:P) REQUIRE n.name IS UNIQUE")
    val (g3, _) = Cypher.execute(spark, g2,
      "CREATE INDEX idx_name FOR (n:P) ON (n.name)")
    val shown = Cypher.run(spark, g3, "SHOW CONSTRAINTS").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(shown.toSeq == Seq(("uq_name", "P", "name", "unique")))
    val idx = Cypher.run(spark, g3, "SHOW INDEXES").collect().map(_.getString(0))
    assert(idx.toSeq == Seq("idx_name"))
    // introspection procs see the same catalog
    val viaProc = Cypher.run(spark, g3, "CALL db.constraints() YIELD name RETURN name")
      .collect().map(_.getString(0))
    assert(viaProc.toSeq == Seq("uq_name"))
    val (g4, _) = Cypher.execute(spark, g3, "DROP CONSTRAINT uq_name")
    assert(Cypher.run(spark, g4, "SHOW CONSTRAINTS").collect().isEmpty)
    val procs = Cypher.run(spark, g4, "SHOW PROCEDURES").collect()
      .map(_.getString(0))
    assert(procs.contains("db.labels") && procs.contains("db.constraints"))
    // writes that would violate a live constraint are caught at commit time
    intercept[IllegalStateException] {
      Schema.validate(g3.copy(nodes = g3.nodes.unionByName(
        graph(Seq(9L -> "a")).nodes)))
    }
  }

  test("constraint survives write clauses (rides on the graph value)") {
    val g = graph(Seq(1L -> "a"))
    val (g2, _) = Cypher.execute(spark, g,
      "CREATE CONSTRAINT uq FOR (n:P) REQUIRE n.name IS UNIQUE")
    val (g3, _) = Cypher.execute(spark, g2, "CREATE (:P {name: 'b'})")
    assert(g3.schema.constraints.map(_.name) == Seq("uq"))
  }
}
