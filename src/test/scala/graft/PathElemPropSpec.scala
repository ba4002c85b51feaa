package graft
import graft.cypher.Cypher
import org.scalatest.funsuite.AnyFunSuite

/** Property reads on lambda variables iterating path elements:
  * all(i IN nodes(p) WHERE i.foo = ...) hydrates a per-position parallel
  * property array (the pathElemNeeds machinery, extended from
  * labels()/type()). */
class PathElemPropSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  test("filter on path node properties") {
    val (g, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      """CREATE (a:A {foo: 'bar'})-[:REL {w: 1}]->(b:B {foo: 'bar'})
        |-[:REL {w: 2}]->(c:C {foo: 'bar'})-[:REL {w: 3}]->(d:D {foo: 'bar'}),
        |(c)-[:REL {w: 9}]->(:E {foo: 'nope'})""".stripMargin)
    val rows = Cypher.run(spark, g,
      """MATCH p = (pA)-[:REL*3..3]->(pB)
        |WHERE all(i IN nodes(p) WHERE i.foo = 'bar')
        |RETURN pB.foo AS f""".stripMargin).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("bar"))
    val sums = Cypher.run(spark, g,
      """MATCH p = (:A)-[:REL*3..3]->(x)
        |RETURN x.foo AS f,
        |  reduce(s = 0, r IN relationships(p) | s + r.w) AS tw
        |ORDER BY f""".stripMargin).collect()
    assert(sums.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("bar", 6L), ("nope", 12L)))
  }

  test("indexed and head/last path-element property reads") {
    val (g, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      """CREATE (:A {foo: 'a'})-[:REL {w: 1}]->(:B {foo: 'b'})
        |-[:REL {w: 2}]->(:C {foo: 'c'})""".stripMargin)
    val r = Cypher.run(spark, g,
      """MATCH p = (:A)-[:REL*2..2]->(:C)
        |RETURN nodes(p)[0].foo AS f0, nodes(p)[-1].foo AS fl,
        |  relationships(p)[1].w AS w1,
        |  head(nodes(p)).foo AS hf, last(nodes(p)).foo AS lf""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "a" && r.getString(1) == "c")
    assert(r.getLong(2) == 2L)
    assert(r.getString(3) == "a" && r.getString(4) == "c")
  }
}
