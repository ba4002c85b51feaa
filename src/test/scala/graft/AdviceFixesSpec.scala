package graft

import graft.cypher.Cypher
import graft.graph.PropertyGraph
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Regressions for the round-3 review findings: decorrelated subqueries must
  * key on entity ids only (NULL property values must not break the join-back),
  * relationship MERGE must treat the inline property map as part of the match
  * key, SET must be able to introduce a never-seen property key, and
  * replace() must be fully literal. */
class AdviceFixesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** Nodes with a nullable `name` (union schema) — node 2's name is NULL but
    * it still has relationships; node 3 is isolated with NULL name. */
  private lazy val g: PropertyGraph = {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType)),
      StructField("name", StringType)))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType)))
    PropertyGraph(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L, Seq("P"), "x"), Row(2L, Seq("P"), null),
        Row(3L, Seq("P"), null)), 2), nodeSchema),
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(10L, 1L, 2L, "T"), Row(11L, 2L, 1L, "T")), 2), relSchema))
  }

  test("EXISTS keeps rows whose referenced variable has a NULL property") {
    // both 1 and 2 have outgoing :T rels; a.name is hydrated (RETURN uses it)
    // so the decorrelated semi-join must not key on the NULL name column
    val rows = Cypher.run(spark, g,
      "MATCH (a:P) WHERE EXISTS { (a)-[:T]->() } RETURN id(a) AS i, a.name AS n ORDER BY i")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("NOT EXISTS drops rows with a real match even when a property is NULL") {
    val rows = Cypher.run(spark, g,
      "MATCH (a:P) WHERE NOT EXISTS { (a)-[:T]->() } RETURN id(a) AS i, a.name AS n")
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("COUNT subquery under OR counts matches for NULL-property rows") {
    val rows = Cypher.run(spark, g,
      "MATCH (a:P) WHERE COUNT { (a)-[:T]->() } = 1 OR id(a) = 3 " +
        "RETURN id(a) AS i, a.name AS n ORDER BY i").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("OPTIONAL MATCH finds the match when the outer row has a NULL property") {
    val rows = Cypher.run(spark, g,
      "MATCH (a:P) OPTIONAL MATCH (a)-[:T]->(b) " +
        "RETURN id(a) AS i, a.name AS n, id(b) AS bi ORDER BY i").collect()
    val byId = rows.map(r => r.getLong(0) -> (if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(byId == Map(1L -> 2L, 2L -> 1L, 3L -> -1L))
  }

  private def people: PropertyGraph = {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType)),
      StructField("name", StringType)))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType),
      StructField("since", LongType)))
    PropertyGraph(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L, Seq("Person"), "Alice"), Row(2L, Seq("Person"), "Bob")), 2), nodeSchema),
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(10L, 1L, 2L, "KNOWS", 2015L)), 2), relSchema))
  }

  test("rel MERGE: inline props are part of the match key") {
    // existing KNOWS has since=2015 — MERGE {since: 2020} must CREATE
    val (g2, _) = Cypher.execute(spark, people,
      """MATCH (a:Person {name: 'Alice'}), (b:Person {name: 'Bob'})
        |MERGE (a)-[:KNOWS {since: 2020}]->(b)""".stripMargin)
    assert(g2.rels.filter(col("type") === "KNOWS").count() == 2)
    // same props again → matches, no third rel
    val (g3, _) = Cypher.execute(spark, g2,
      """MATCH (a:Person {name: 'Alice'}), (b:Person {name: 'Bob'})
        |MERGE (a)-[:KNOWS {since: 2020}]->(b)""".stripMargin)
    assert(g3.rels.filter(col("type") === "KNOWS").count() == 2)
  }

  test("rel MERGE: different types between the same endpoints get distinct ids") {
    val (g2, _) = Cypher.execute(spark, people,
      """MATCH (a:Person {name: 'Alice'}), (b:Person {name: 'Bob'})
        |MERGE (a)-[:LIKES]->(b) MERGE (a)-[:FOLLOWS]->(b)""".stripMargin)
    val ids = g2.rels.filter(col("type").isin("LIKES", "FOLLOWS"))
      .select("id").collect().map(_.getLong(0))
    assert(ids.length == 2 && ids.distinct.length == 2)
  }

  test("SET can introduce a property key the graph has never seen") {
    val (g2, _) = Cypher.execute(spark, people,
      "MATCH (p:Person {name: 'Alice'}) SET p.nickname = 'Al'")
    val rows = g2.nodes.select("name", "nickname").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(rows == Map("Alice" -> Some("Al"), "Bob" -> None))
  }

  test("replace() treats $ and \\ in the replacement literally") {
    val r = Cypher.run(spark, g,
      "RETURN replace('cost', 'o', '$1') AS a, replace('ab', 'b', '$0z') AS b")
      .collect()(0)
    assert(r.getString(0) == "c$1st" && r.getString(1) == "a$0z")
  }

  test("unbound-target SHORTEST applies the target's inline property map") {
    // targets constrained to {name:'x'} = node 1 only; node 1's own shortest
    // reachable node is 2 (1 hop, name NULL) so an unconstrained search
    // would return length 1 for a=1 instead of the 2-hop loop back to 1
    val rows = Cypher.run(spark, g,
      """MATCH p = SHORTEST 1 (a:P)-[:T*1..2]->({name: 'x'})
        |RETURN id(a) AS i, length(p) AS l ORDER BY i""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).longValue)).toSeq
    assert(rows == Seq((1L, 2L), (2L, 1L)))
  }

  test("integer division is exact past 2^53 and truncates toward zero") {
    val r = Cypher.run(spark, g,
      "RETURN 9007199254740993 / 1 AS big, -7 / 2 AS neg, 10 / 3 AS pos")
      .collect()(0)
    // via double, 2^53+1 would round to 9007199254740992
    assert(r.getLong(0) == 9007199254740993L)
    assert(r.getLong(1) == -3L && r.getLong(2) == 3L)
  }

  test("fulltext/vector node procedures reject unknown properties clearly") {
    val e = intercept[Exception] {
      Cypher.run(spark, g,
        "CALL db.index.fulltext.queryNodes('no_such_prop', 'x', 5)").collect()
    }
    assert(e.getMessage.contains("unknown node property"))
  }

  test("undirected MERGE creates the rel in the pattern's left-to-right direction") {
    val (g1, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      "CREATE (:P {k: 2}), (:P {k: 1})")
    // left endpoint has the LARGER node id ordering risk: a canonical
    // (least, greatest) store would flip it
    val (g2, _) = Cypher.execute(spark, g1,
      "MATCH (a:P {k: 2}), (b:P {k: 1}) MERGE (a)-[:T]-(b)")
    val fwd = Cypher.run(spark, g2,
      "MATCH (a:P)-[:T]->(b:P) RETURN a.k AS ak, b.k AS bk").collect()
    assert(fwd.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((2L, 1L)))
    // merging again in either orientation must NOT create a second rel
    val (g3, _) = Cypher.execute(spark, g2,
      "MATCH (a:P {k: 1}), (b:P {k: 2}) MERGE (a)-[:T]-(b)")
    val n = Cypher.run(spark, g3, "MATCH ()-[r:T]->() RETURN count(*) AS c")
      .collect()(0).getLong(0)
    assert(n == 1L)
  }

  test("SET is visible through another variable aliasing the same entity") {
    val (g1, _) = Cypher.execute(spark, TckHarness.emptyGraph(spark),
      "CREATE (:Q {y: 0})")
    val (_, res) = Cypher.execute(spark, g1,
      "MATCH (a:Q), (b:Q) WHERE id(a) = id(b) SET a.x = 1 RETURN b.x AS bx")
    assert(res.get.collect()(0).getLong(0) == 1L)
  }
}
