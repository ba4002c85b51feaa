package graft

import graft.cypher.Cypher
import org.scalatest.funsuite.AnyFunSuite

/** Full-query-body subquery expressions (reference ExistsExpression /
  * CountExpression / CollectExpression): multi-clause, WITH-starting and
  * UNION bodies with implicit outer-scope correlation, in WHERE, RETURN,
  * SET and CREATE positions. */
class SubqueryExprSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def g0 = {
    val (g, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      """CREATE (a:Person {name: 'Ann', age: 30}),
        |(b:Person {name: 'Bob', age: 20}), (c:Person {name: 'Cat', age: 40}),
        |(a)-[:KNOWS]->(b), (b)-[:KNOWS]->(c)""".stripMargin)
    g
  }

  private def run(q: String) =
    Cypher.run(spark, g0, q).collect().map(_.toSeq.toList).toList

  test("EXISTS with full body and RETURN in WHERE") {
    val rows = run(
      """MATCH (p:Person)
        |WHERE EXISTS { MATCH (p)-[:KNOWS]->(f) WHERE f.age > 25 RETURN f }
        |RETURN p.name AS name ORDER BY name""".stripMargin)
    assert(rows == List(List("Bob")))
  }

  test("COUNT with full body in RETURN") {
    val rows = run(
      """MATCH (p:Person)
        |RETURN p.name AS name,
        |  COUNT { MATCH (p)-[:KNOWS]->(f) RETURN f.name } AS c
        |ORDER BY name""".stripMargin)
    assert(rows == List(List("Ann", 1L), List("Bob", 1L), List("Cat", 0L)))
  }

  test("COLLECT with ORDER BY body") {
    val rows = run(
      """MATCH (p:Person {name: 'Ann'})
        |RETURN COLLECT { MATCH (f:Person) WHERE f.age < 35
        |  RETURN f.name ORDER BY f.age DESC } AS names""".stripMargin)
    assert(rows == List(List(List("Ann", "Bob"))))
  }

  test("COLLECT with WITH-starting uncorrelated body") {
    val rows = run(
      "RETURN COLLECT { WITH 1 AS x RETURN x + 1 } AS xs")
    assert(rows == List(List(List(2L))))
  }

  test("COUNT with UNION body") {
    val rows = run(
      """MATCH (p:Person {name: 'Bob'})
        |RETURN COUNT {
        |  MATCH (p)-[:KNOWS]->(f) RETURN f.name AS n
        |  UNION
        |  MATCH (g)-[:KNOWS]->(p) RETURN g.name AS n } AS c""".stripMargin)
    assert(rows == List(List(2L)))
  }

  test("COUNT in SET value") {
    val (g1, _) = Cypher.execute(spark, g0,
      "MATCH (p:Person) SET p.friends = COUNT { MATCH (p)-[:KNOWS]->(f) RETURN f }")
    val rows = Cypher.run(spark, g1,
      "MATCH (p:Person) RETURN p.name AS n, p.friends AS f ORDER BY n")
      .collect().map(_.toSeq.toList).toList
    assert(rows == List(List("Ann", 1L), List("Bob", 1L), List("Cat", 0L)))
  }

  test("COUNT in CREATE property evaluates pre-statement") {
    val (g1, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      """UNWIND [1, 2] AS i
        |CREATE (n:N {id: i, cnt: COUNT { MATCH (m:N) RETURN m }})""".stripMargin)
    val rows = Cypher.run(spark, g1,
      "MATCH (n:N) RETURN n.id AS id, n.cnt AS cnt ORDER BY id")
      .collect().map(_.toSeq.toList).toList
    assert(rows == List(List(1L, 0L), List(2L, 0L)))
  }

  test("EXISTS in inline node pattern WHERE") {
    val rows = run(
      """MATCH (p:Person WHERE EXISTS { MATCH (p)-[:KNOWS]->(f) RETURN f })
        |RETURN p.name AS name ORDER BY name""".stripMargin)
    assert(rows == List(List("Ann"), List("Bob")))
  }
}
