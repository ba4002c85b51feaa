package graft

import graft.cypher.Cypher
import org.scalatest.funsuite.AnyFunSuite

/** Writes inside correlated CALL {} subqueries (reference SubqueryForeach,
  * LogicalPlan.scala:3897 / TransactionApply :4039): the per-outer-row
  * write idiom `MATCH (n) CALL { WITH n CREATE … }` in its Foreach shape
  * (no inner RETURN), its Apply shape (inner RETURN), and with
  * SET/MERGE/DELETE bodies. */
class CallWriteSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def seeded() = {
    val (g, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      "CREATE (:P {id: 1}), (:P {id: 2}), (:P {id: 3})")
    g
  }

  test("correlated CALL with CREATE (Foreach shape)") {
    val (g2, res) = Cypher.execute(spark, seeded(),
      "MATCH (n:P) CALL { WITH n CREATE (:Log {of: n.id}) } RETURN count(*) AS c")
    assert(res.get.collect()(0).getLong(0) == 3L)
    val (_, logs) = Cypher.execute(spark, g2,
      "MATCH (l:Log) RETURN l.of AS of ORDER BY of")
    assert(logs.get.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("correlated CALL with CREATE and inner RETURN (Apply shape)") {
    val (g2, res) = Cypher.execute(spark, seeded(),
      """MATCH (n:P) CALL { WITH n CREATE (m:Log {of: n.id + 10})
        |RETURN m.of AS of } RETURN of ORDER BY of""".stripMargin)
    assert(res.get.collect().map(_.getLong(0)).toSeq == Seq(11L, 12L, 13L))
    val (_, logs) = Cypher.execute(spark, g2,
      "MATCH (l:Log) RETURN count(*) AS c")
    assert(logs.get.collect()(0).getLong(0) == 3L)
  }

  test("correlated CALL with SET") {
    val (g2, _) = Cypher.execute(spark, seeded(),
      "MATCH (n:P) CALL { WITH n SET n.seen = n.id * 2 }")
    val (_, res) = Cypher.execute(spark, g2,
      "MATCH (n:P) RETURN n.seen AS s ORDER BY s")
    assert(res.get.collect().map(_.getLong(0)).toSeq == Seq(2L, 4L, 6L))
  }

  test("correlated CALL with MERGE is idempotent across outer rows") {
    val (g2, _) = Cypher.execute(spark, seeded(),
      "MATCH (n:P) CALL { WITH n MERGE (:Hub {kind: 'one'}) }")
    val (_, res) = Cypher.execute(spark, g2,
      "MATCH (h:Hub) RETURN count(*) AS c")
    assert(res.get.collect()(0).getLong(0) == 1L)
  }

  test("correlated CALL with DELETE") {
    val (g2, _) = Cypher.execute(spark, seeded(),
      "MATCH (n:P) WHERE n.id < 3 CALL { WITH n DELETE n }")
    val (_, res) = Cypher.execute(spark, g2,
      "MATCH (n:P) RETURN n.id AS id")
    assert(res.get.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }
}
