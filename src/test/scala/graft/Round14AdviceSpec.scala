package graft

import graft.cypher.Cypher
import graft.graph.PropertyGraph
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 advice regressions: cross-iteration QPP group WHEREs drain
  * inside EXISTS{} / pattern-expression sub-plans (no leak into the next
  * clause), the deferral substitution recurses into nested iterator
  * predicates, unit UNION CALL bodies keep the importing-branch set-based
  * plan, the default shortest-path depth cap errors loudly instead of
  * silently pruning, and map-alias entity provenance is cleared on
  * re-projection. */
class Round14AdviceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** U observers (h property) + an N chain n1->n2->n3 with rising h + M
    * bystanders for leak detection. */
  private def chainGraph(): PropertyGraph = {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType)),
      StructField("h", LongType),
      StructField("xs", ArrayType(LongType)),
      StructField("num", LongType), StructField("name", StringType)))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType)))
    PropertyGraph(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L, Seq("U"), 0L, null, null, "u-low"),
        Row(2L, Seq("U"), 10L, null, null, "u-high"),
        Row(3L, Seq("N"), 1L, Seq(5L, 6L), null, "n1"),
        Row(4L, Seq("N"), 2L, Seq(7L, 8L), null, "n2"),
        Row(5L, Seq("N"), 3L, Seq(9L, 11L), null, "n3"),
        Row(6L, Seq("M"), null, null, 42L, "m1")), 2), nodeSchema),
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(10L, 3L, 4L, "T"), Row(11L, 4L, 5L, "T")), 2), relSchema))
  }

  // ---- deferredGroupWhere drains inside subquery-expression sub-plans ----

  test("cross-iteration QPP group WHERE inside EXISTS{} filters the sub-plan") {
    val (_, res) = Cypher.execute(spark, chainGraph(),
      "MATCH (u:U) WHERE EXISTS { ((a:N)-[:T]->(b:N) WHERE b.h > u.h)+ } " +
        "RETURN u.name AS name")
    // only u-low (h=0) has any hop with b.h > u.h; u-high (h=10) has none
    assert(res.get.collect().map(_.getAs[String]("name")).toSeq == Seq("u-low"))
  }

  test("deferred group WHERE does NOT leak into the next MATCH clause") {
    val (_, res) = Cypher.execute(spark, chainGraph(),
      "MATCH (u:U) WHERE EXISTS { ((a:N)-[:T]->(b:N) WHERE b.h > u.h)+ } " +
        "WITH u MATCH (m:M) RETURN u.name AS name, m.num AS num")
    // before the fix the deferred conjunct joined the SECOND clause's
    // pending WHERE, wrongly filtering (or failing analysis on) the M scan
    val rows = res.get.collect().map(r =>
      (r.getAs[String]("name"), r.getAs[Long]("num"))).toSet
    assert(rows == Set(("u-low", 42L)))
  }

  test("cross-iteration group WHERE inside a pattern comprehension drains too") {
    val (_, res) = Cypher.execute(spark, chainGraph(),
      "MATCH (u:U) RETURN u.name AS name, " +
        "size([((a:N)-[:T]->(b:N) WHERE b.h > u.h)+ | a]) AS c ORDER BY name")
    val rows = res.get.collect().map(r =>
      (r.getAs[String]("name"), r.getAs[Number]("c").longValue)).toSeq
    // u-high sees zero matches; u-low sees the three QPP solutions
    // (n1->n2, n2->n3, n1->n2->n3)
    assert(rows.map(_._1) == Seq("u-high", "u-low"))
    assert(rows.toMap.apply("u-high") == 0L)
    assert(rows.toMap.apply("u-low") == 3L)
  }

  // ---- subst recursion into nested iterator predicates -------------------

  test("cross-iteration group WHERE with nested all() substitutes the group var") {
    // all xs of every hop's b must exceed u.h: u-low (0) passes every hop,
    // u-high (10) fails (no xs element of n2 exceeds 10 except n3's 11 —
    // but 9 <= 10 fails all())
    val (_, res) = Cypher.execute(spark, chainGraph(),
      "MATCH (u:U) MATCH ((a:N)-[:T]->(b:N) WHERE all(y IN b.xs WHERE y > u.h))+ " +
        "RETURN DISTINCT u.name AS name")
    assert(res.get.collect().map(_.getAs[String]("name")).toSeq == Seq("u-low"))
  }

  // ---- unit UNION CALL bodies: importing branches stay set-based ---------

  test("unit UNION CALL body with importing branches applies both branches") {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType)),
      StructField("num", LongType)))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType)))
    val g = PropertyGraph(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L, Seq("N"), 2L), Row(2L, Seq("N"), 3L)), 2), nodeSchema),
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], relSchema))
    val (_, res) = Cypher.execute(spark, g,
      "MATCH (n:N) CALL { WITH n SET n.x = n.num * 2 " +
        "UNION WITH n SET n.y = n.num * 3 } " +
        "RETURN n.x AS x, n.y AS y ORDER BY x")
    val rows = res.get.collect().map(r =>
      (r.getAs[Long]("x"), r.getAs[Long]("y"))).toSeq
    assert(rows == Seq((4L, 6L), (6L, 9L)))
  }

  // ---- default shortest-path cap errors loudly ---------------------------

  private def longChain(n: Int): PropertyGraph = {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType))))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType)))
    val nodes = (0 until n).map { i =>
      val lbl = if (i == 0) Seq("Start", "N")
        else if (i == n - 1) Seq("End", "N") else Seq("N")
      Row(i.toLong, lbl)
    }
    val rels = (0 until n - 1).map(i =>
      Row((100 + i).toLong, i.toLong, (i + 1).toLong, "T"))
    PropertyGraph(
      spark.createDataFrame(spark.sparkContext.parallelize(nodes, 2), nodeSchema),
      spark.createDataFrame(spark.sparkContext.parallelize(rels, 2), relSchema))
  }

  test("unbounded shortestPath past the default depth cap raises, not empty") {
    // 18 nodes => 17 hops > the default cap of 15
    val ex = intercept[Exception] {
      val (_, res) = Cypher.execute(spark, longChain(18),
        "MATCH p = shortestPath((a:Start)-[:T*]->(b:End)) " +
          "RETURN size(relationships(p)) AS n")
      res.get.collect()
    }
    assert(ex.getMessage.contains("did not converge"),
      s"expected loud non-convergence error, got: ${ex.getMessage}")
  }

  test("explicit upper bound still PRUNES (no row, no error)") {
    val (_, res) = Cypher.execute(spark, longChain(18),
      "MATCH p = shortestPath((a:Start)-[:T*..5]->(b:End)) " +
        "RETURN size(relationships(p)) AS n")
    assert(res.get.count() == 0L)
  }

  test("unbounded shortestPath within the cap still answers") {
    val (_, res) = Cypher.execute(spark, longChain(6),
      "MATCH p = shortestPath((a:Start)-[:T*]->(b:End)) " +
        "RETURN size(relationships(p)) AS n")
    assert(res.get.collect().map(_.getAs[Number]("n").longValue).toSeq ==
      Seq(5L))
  }

  // ---- map-alias entity provenance is cleared on re-projection -----------

  private def namedGraph(): PropertyGraph = {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType)),
      StructField("num", LongType), StructField("name", StringType)))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType)))
    PropertyGraph(
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(1L, Seq("N"), 5L, "x")), 1), nodeSchema),
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], relSchema))
  }

  test("re-projecting a map alias with a VALUE field sheds the entity binding") {
    val (_, res) = Cypher.execute(spark, namedGraph(),
      "MATCH (n:N) WITH {k: n} AS m, n AS n0 " +
        "WITH {k: n0.name} AS m RETURN m.k AS v")
    // before the fix the stale m.k = NodeVar binding treated the string as
    // an entity id (wrong join/hydration); now it is the plain value
    assert(res.get.collect().map(_.getAs[String]("v")).toSeq == Seq("x"))
  }

  test("items of the SAME projection still read the previous scope's provenance") {
    // m.k keeps the NodeVar provenance for items of THIS projection (x can
    // be used in entity position later) even though m is rebound in the
    // same WITH — the clearing applies to the NEXT scope only
    val (_, res) = Cypher.execute(spark, namedGraph(),
      "MATCH (n:N) WITH {k: n} AS m " +
        "WITH m.k AS x, {k: 1} AS m MATCH (x) RETURN m.k AS mk")
    val rows = res.get.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[Long]("mk") == 1L)
  }
}
