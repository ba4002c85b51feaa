package graft
import graft.cypher.Cypher
import org.scalatest.funsuite.AnyFunSuite
class OptionalSelectorSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  test("exists after WITH + optional shortest") {
    val (g, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      """CREATE (p:Person {name:'Bosse'})-[:HAS_DOG]->(:Dog {name:'R'}),
        |(:Person {name:'Nobody'})""".stripMargin)
    val r1 = Cypher.run(spark, g,
      """MATCH (person:Person)
        |WITH person
        |WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
        |RETURN person.name AS name""".stripMargin).collect()
    assert(r1.map(_.getString(0)).toSeq == Seq("Bosse"))
    val r2 = Cypher.run(spark, g,
      """MATCH (p:Person)
        |OPTIONAL MATCH q = ANY SHORTEST (p)-[:HAS_DOG]->+(d:Dog)
        |RETURN p.name AS name, length(q) AS l ORDER BY name""".stripMargin)
      .collect()
    assert(r2.map(r => (r.getString(0), Option(r.get(1)))).toSeq ==
      Seq(("Bosse", Some(1)), ("Nobody", None)))
  }
}
