package graft

import graft.cypher.Cypher
import graft.graph.PropertyGraph
import graft.ops.Ranking
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 advice regressions: null edge weights are ignored (not NPE)
  * by the RDD-driven pageRank loop, the `p#` storage-prefix escape is
  * injective for user keys that literally start with `p#`, the
  * orderability encoder no longer claims non-string-keyed maps with null
  * values are empty, and concurrent parses don't corrupt parser state. */
class Round15AdviceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("weightedPageRank ignores null-weight edges instead of crashing") {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType),
      StructField("weight", DoubleType)))
    val edges = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 2L, 1.0), Row(2L, 3L, 2.0), Row(3L, 1L, 1.0),
      Row(1L, 3L, null) // rel missing the weight property
    ), 2), schema)
    val withNull = Ranking.weightedPageRank(edges, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val noNull = Ranking.weightedPageRank(edges.na.drop("any"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // old DataFrame semantics: the null-weight edge contributes nothing
    assert(withNull.keySet == noNull.keySet)
    noNull.foreach { case (n, v) => assert(math.abs(withNull(n) - v) < 1e-12) }
  }

  test("property key literally named p#x survives the storage round trip") {
    assert(PropertyGraph.colProp(PropertyGraph.propCol("p#x")) == "p#x")
    assert(PropertyGraph.colProp(PropertyGraph.propCol("id")) == "id")
    assert(PropertyGraph.propCol("p#x") != PropertyGraph.propCol("x"))
    // end to end: properties()/keys() report the literal key name
    var g = TckHarness.emptyGraph(spark)
    val (g2, _) = Cypher.execute(spark, g, "CREATE (:N {`p#x`: 7})")
    g = g2
    val (_, res) = Cypher.execute(spark, g,
      "MATCH (n:N) RETURN keys(n) AS ks, n.`p#x` AS v")
    val row = res.get.collect().head
    assert(row.getAs[scala.collection.Seq[String]]("ks").toSeq == Seq("p#x"))
    assert(row.getAs[Long]("v") == 7L)
  }

  test("orderability encoder only treats MAP<VOID,VOID> as the {} literal") {
    import graft.functions.Orderability
    // the `{}` literal's type still encodes (rank Map, size 0)
    assert(Orderability.encoderAt(0, MapType(NullType, NullType)).isDefined)
    // a non-string-keyed map with VOID values must NOT silently encode
    // as '{}' — keys would vanish from ordering/comparison
    assert(Orderability.encoderAt(0, MapType(IntegerType, NullType)).isEmpty)
  }

  test("concurrent parses do not corrupt shared parser state") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // one query exercising the pattern-comprehension WHERE flag, one with
    // label alternation — interleaved un-synchronized these mis-parse
    val q1 = "MATCH (a) RETURN [(a)-->(b) WHERE b.x > 1 | b.x] AS xs"
    val q2 = "MATCH (n:A|B) RETURN n"
    val futs = (1 to 16).map { i =>
      Future(graft.cypher.CypherParser.parse(if (i % 2 == 0) q1 else q2))
    }
    futs.foreach(fu => Await.result(fu, 60.seconds)) // no parse exceptions
  }
}
