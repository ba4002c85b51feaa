package graft
import graft.cypher.Cypher
import org.scalatest.funsuite.AnyFunSuite
class GrammarSurfaceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  test("type expressions, IS labels, UNION DISTINCT") {
    val (g, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      "CREATE (:A {k:1})-[:R]->(:B {k:2}), (:A {k:3})-[:S]->(:C {k:4})")
    def run(q: String) = Cypher.run(spark, g, q).collect().map(_.toSeq.toList).toList
    assert(run("MATCH ()-[r:!R]->(m) RETURN m.k AS k") == List(List(4L)))
    assert(run("MATCH ()-[r:%]->(m) RETURN m.k AS k ORDER BY k") == List(List(2L), List(4L)))
    assert(run("MATCH (n:(A|B)&!C) RETURN count(*) AS c") == List(List(3L)))
    assert(run("MATCH (n IS A) RETURN count(*) AS c") == List(List(2L)))
    assert(run("RETURN 1 AS x UNION DISTINCT RETURN 1 AS x") == List(List(1L)))
    val (g2, _) = Cypher.execute(spark, g, "MATCH (n:A {k:1}) SET n IS D")
    assert(Cypher.run(spark, g2, "MATCH (n:D) RETURN n.k AS k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("whole-pattern MERGE with unbound endpoints") {
    val (g0, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      "CREATE (:Z {k: 0})")
    // nothing matches -> creates the whole chain once
    val (g1, _) = Cypher.execute(spark, g0,
      "MERGE (a:A {x: 1})-[:T]->(b:B {y: 2})")
    def count(g: graft.graph.PropertyGraph, q: String) =
      Cypher.run(spark, g, q).collect()(0).getLong(0)
    assert(count(g1, "MATCH (:A {x: 1})-[:T]->(:B {y: 2}) RETURN count(*) AS c") == 1L)
    // second MERGE matches -> no new rel
    val (g2, _) = Cypher.execute(spark, g1,
      "MERGE (a:A {x: 1})-[:T]->(b:B {y: 2})")
    assert(count(g2, "MATCH ()-[r:T]->() RETURN count(*) AS c") == 1L)
    // ON CREATE marks only the creating run
    val (g3, _) = Cypher.execute(spark, g2,
      "MERGE (a:A {x: 1})-[:T]->(c:C) ON CREATE SET a.made = true")
    assert(count(g3, "MATCH (a:A {made: true}) RETURN count(*) AS c") == 1L)
  }

  test("properties()/keys() over null and map values") {
    val g = TckHarness.emptyGraph(spark)
    val r = Cypher.run(spark, g,
      """RETURN properties(CASE WHEN null THEN null END) AS p,
        |keys({a: 1, b: 2}) AS ks""".stripMargin).collect()(0)
    assert(r.isNullAt(0))
    assert(r.getSeq[String](1).sorted == Seq("a", "b"))
  }
}
