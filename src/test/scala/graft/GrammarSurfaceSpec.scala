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
}
