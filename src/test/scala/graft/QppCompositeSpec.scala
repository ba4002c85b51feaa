package graft

import graft.cypher.Cypher
import org.scalatest.funsuite.AnyFunSuite

/** Quantified path patterns with composite bodies: multi-hop inner chains,
  * constrained interior nodes, and QPPs inside SHORTEST selectors. */
class QppCompositeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def g0 = {
    val (g, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      """CREATE (s:S {k: 0}), (a1:A {k: 1}), (b1:B {k: 2}),
        |(a2:A {k: 3}), (b2:B {k: 4}), (t:T {k: 5}),
        |(s)-[:E]->(a1), (a1)-[:E]->(b1), (b1)-[:E]->(a2),
        |(a2)-[:E]->(b2), (b2)-[:E]->(t)""".stripMargin)
    g
  }

  test("multi-hop QPP in plain MATCH") {
    // (s)(()-->(:A)-->(:B))+(x): 1 iteration ends at b1, 2 at b2
    val rows = Cypher.run(spark, g0,
      """MATCH (s:S) MATCH (s) (()-[:E]->(:A)-[:E]->(:B)){1,3} (x)
        |RETURN x.k AS k ORDER BY k""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(2L, 4L))
  }

  test("constrained single-hop QPP in plain MATCH") {
    // every iteration must END on :A or :B alternately — here just :A
    val rows = Cypher.run(spark, g0,
      """MATCH (s:S) MATCH (s) (()-[:E]->(:A)){1,1} (x)
        |RETURN x.k AS k""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L))
  }

  test("QPP group WHERE on the final inner node") {
    val rows = Cypher.run(spark, g0,
      """MATCH (s:S) MATCH (s) (()-[:E]->(y) WHERE y.k < 3){1,2} (x)
        |RETURN x.k AS k ORDER BY k""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(1L, 2L))
  }

  test("one-hop QPP inside a SHORTEST selector") {
    val rows = Cypher.run(spark, g0,
      """MATCH p = ANY SHORTEST (s:S) ((a)-[:E]->(b))+ (t:T)
        |RETURN length(p) AS l""".stripMargin)
      .collect().map(_.getAs[Number](0).longValue).toSeq
    assert(rows == Seq(5L))
  }

  test("multi-hop QPP inside a SHORTEST selector") {
    val rows = Cypher.run(spark, g0,
      """MATCH p = ANY SHORTEST (s:S)-[:E]->(:A) (()-[:E]->(:B)-[:E]->(:A)){0,2} ()-[:E]->(:B)-[:E]->(t:T)
        |RETURN length(p) AS l""".stripMargin)
      .collect().map(_.getAs[Number](0).longValue).toSeq
    assert(rows == Seq(5L))
  }
}
