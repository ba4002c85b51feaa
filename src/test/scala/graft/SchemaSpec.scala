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

  test("CREATE VECTOR INDEX catalogs the index; procedures resolve it by name") {
    import spark.implicits._
    val nodes = Seq(
      (1L, Seq("Doc"), Seq(1.0f, 0.0f)), (2L, Seq("Doc"), Seq(0.0f, 1.0f)),
      (3L, Seq("Other"), Seq(1.0f, 0.1f))) // outside the indexed label
      .toDF("id", "labels", "vec")
    val rels = Seq.empty[(Long, Long, Long, String)].toDF("id", "src", "dst", "type")
    val g = PropertyGraph(nodes, rels)
    val (g2, _) = Cypher.execute(spark, g,
      """CREATE VECTOR INDEX v_ix FOR (n:Doc) ON (n.vec)
        |OPTIONS {dimensions: 2, similarity: 'cosine'}""".stripMargin)
    val shown = Cypher.run(spark, g2, "SHOW INDEXES").collect()
      .map(r => (r.getString(0), r.getString(3)))
    assert(shown.contains(("v_ix", "vector")))
    // name resolution scopes the scan to :Doc — node 3 matches the query
    // vector best but is outside the index
    val top = graft.functions.Procedures.call(spark, g2,
      "db.index.vector.queryNodes", "v_ix", Int.box(1), Seq(1.0, 0.0)).collect()
    assert(top.map(_.getAs[Long]("id")).toSeq == Seq(1L))
    // a vector index never drives the range sort layout
    assert(Schema.applyLayout(g2).nodes eq g2.nodes)
  }

  test("schema catalog survives tx commits, DETACH DELETE, and store round-trips") {
    val g = graph(Seq(1L -> "a", 2L -> "b"))
    val g1 = Schema.createConstraint(g, "uq_n", "P", "name", "unique")
    // per-batch commits must not drop the catalog (defaultTxCommit)
    val (g2, _) = Cypher.execute(spark, g1,
      """MATCH (p:P) CALL { WITH p CREATE (:Tag {name: p.name}) }
        |IN TRANSACTIONS OF 1 ROWS""".stripMargin)
    assert(g2.schema.constraints.map(_.name) == Seq("uq_n"))
    // DETACH DELETE must not drop the catalog either
    val (g3, _) = Cypher.execute(spark, g2,
      "MATCH (p:P {name: 'a'}) DETACH DELETE p")
    assert(g3.schema.constraints.map(_.name) == Seq("uq_n"))
    // versioned store persists and restores the catalog
    val dir = java.nio.file.Files.createTempDirectory("graft_store_schema").toString
    val store = new GraphStore(spark, dir)
    store.commit(g3)
    assert(store.load().schema.constraints == g3.schema.constraints)
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
