package graft

import graft.cypher.Cypher
import graft.graph.PropertyGraph
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Cypher three-valued-logic and edge-case semantics (openCypher TCK
  * shapes): NULL propagation, comparisons with NULL, empty matches,
  * OPTIONAL MATCH as first clause behavior, UNWIND of null/empty. */
class CypherNullSemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private lazy val g: PropertyGraph = {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType)),
      StructField("name", StringType), StructField("age", LongType)))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType)))
    PropertyGraph(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L, Seq("P"), "a", 10L), Row(2L, Seq("P"), "b", null),
        Row(3L, Seq("P"), null, 30L)), 2), nodeSchema),
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq.empty[Row], 1), relSchema))
  }

  private def run(q: String) = Cypher.run(spark, g, q)

  test("conversions return NULL on unconvertible input, not an error") {
    val r = run(
      """RETURN toInteger('abc') AS a, toInteger('4.7') AS b,
        |  toFloat('x') AS c, toBoolean('maybe') AS d,
        |  toBoolean('true') AS e, toIntegerOrNull('7') AS f""".stripMargin)
      .collect()(0)
    assert(r.isNullAt(0) && r.getLong(1) == 4L && r.isNullAt(2) && r.isNullAt(3))
    assert(r.getBoolean(4) && r.getLong(5) == 7L)
  }

  test("NULL comparisons filter out (ternary logic), IS NULL catches them") {
    assert(run("MATCH (n:P) WHERE n.age > 5 RETURN count(*) AS c")
      .collect()(0).getLong(0) == 2) // null age row excluded
    assert(run("MATCH (n:P) WHERE n.age IS NULL RETURN count(*) AS c")
      .collect()(0).getLong(0) == 1)
    // NOT (null > 5) is still null → excluded
    assert(run("MATCH (n:P) WHERE NOT (n.age > 5) RETURN count(*) AS c")
      .collect()(0).getLong(0) == 0)
  }

  test("missing property evaluates to NULL, not an error") {
    val r = run("MATCH (n:P {name: 'a'}) RETURN n.nonexistent AS x").collect()(0)
    assert(r.isNullAt(0))
  }

  test("aggregates skip NULLs; count(*) does not") {
    val r = run("MATCH (n:P) RETURN count(*) AS everything, count(n.age) AS ages, " +
      "sum(n.age) AS total, collect(n.name) AS names").collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 2 && r.getLong(2) == 40)
    assert(r.getSeq[String](3).sorted == Seq("a", "b")) // collect drops NULL
  }

  test("MATCH with no results yields empty, aggregation still returns one row") {
    assert(run("MATCH (n:Nope) RETURN n.name AS x").collect().isEmpty)
    assert(run("MATCH (n:Nope) RETURN count(*) AS c").collect()(0).getLong(0) == 0)
  }

  test("UNWIND of an empty list or NULL produces no rows") {
    assert(run("UNWIND [] AS x RETURN x").collect().isEmpty)
    assert(run("WITH [1,2] AS l UNWIND l[5..9] AS x RETURN x").collect().isEmpty)
  }

  test("coalesce and CASE handle NULL branches") {
    val rows = run(
      """MATCH (n:P) RETURN coalesce(n.name, 'unknown') AS nm,
        |CASE WHEN n.age IS NULL THEN -1 ELSE n.age END AS a
        |ORDER BY nm""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("a", 10L), ("b", -1L), ("unknown", 30L)))
  }

  test("OPTIONAL MATCH with zero matches keeps every outer row") {
    val rows = run(
      """MATCH (n:P) OPTIONAL MATCH (n)-[:NOPE]->(m)
        |RETURN count(*) AS c, count(m) AS ms""".stripMargin).collect()(0)
    assert(rows.getLong(0) == 3 && rows.getLong(1) == 0)
  }

  test("IN with NULL element semantics") {
    assert(run("MATCH (n:P) WHERE n.age IN [10, 30] RETURN count(*) AS c")
      .collect()(0).getLong(0) == 2)
  }
}
