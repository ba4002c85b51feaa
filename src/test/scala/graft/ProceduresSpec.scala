package graft

import graft.functions.Procedures
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Procedure registry: built-ins + user registration. */
class ProceduresSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("db.labels and db.relationshipTypes list the star fixture (reference single-column signature)") {
    val g = GraphFixtures.starGraph(spark, 5)
    val labels = Procedures.call(spark, g, "db.labels").collect()
    assert(labels.head.schema.fieldNames.toSeq == Seq("label"))
    assert(labels.map(_.getString(0)).toSet == Set("Center", "Ring"))
    val types = Procedures.call(spark, g, "db.relationshipTypes").collect()
    assert(types.head.schema.fieldNames.toSeq == Seq("relationshipType"))
    assert(types.map(_.getString(0)).toSet == Set("T"))
    val counts = Procedures.call(spark, g, "graft.stats.labels").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("Center" -> 1L, "Ring" -> 5L))
  }

  test("db.schema.visualization yields the label-type-label summary") {
    val g = GraphFixtures.starGraph(spark, 3)
    val rows = Procedures.call(spark, g, "db.schema.visualization").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("Center", "T", "Ring", 3L)))
  }

  test("db.index.fulltext.queryNodes ranks the matching node first") {
    val g = GraphFixtures.graph(spark,
      nodes = Seq((1L, Seq("Doc"), "spark joins and windows explained"),
        (2L, Seq("Doc"), "gardening tips for spring"),
        (3L, Seq("Doc"), "spark shuffle internals")),
      rels = Seq.empty)
    val top = Procedures.call(spark, g, "db.index.fulltext.queryNodes",
      "name", "spark joins", Int.box(2)).collect()
    assert(top.head.getAs[Long]("id") == 1L)
    assert(top.map(_.getAs[Long]("id")).toSet == Set(1L, 3L))
  }

  test("db.index.fulltext.queryRelationships ranks rels by a text property") {
    import spark.implicits._
    val nodes = Seq((1L, Seq("N"), "a"), (2L, Seq("N"), "b")).toDF("id", "labels", "name")
    val rels = Seq(
      (10L, 1L, 2L, "R", "spark joins and windows explained"),
      (11L, 1L, 2L, "R", "gardening tips for spring"),
      (12L, 1L, 2L, "R", "spark shuffle internals"))
      .toDF("id", "src", "dst", "type", "caption")
    val g = graft.graph.PropertyGraph(nodes, rels)
    val top = Procedures.call(spark, g, "db.index.fulltext.queryRelationships",
      "caption", "spark joins", Int.box(2)).collect()
    assert(top.head.getAs[Long]("id") == 10L)
    assert(top.map(_.getAs[Long]("id")).toSet == Set(10L, 12L))
  }

  test("fulltext analyzers: whitespace keeps case, english drops stopwords") {
    val g = GraphFixtures.graph(spark,
      nodes = Seq((1L, Seq("Doc"), "The Spark Engine"),
        (2L, Seq("Doc"), "the spark engine"),
        (3L, Seq("Doc"), "unrelated text")),
      rels = Seq.empty)
    // whitespace analyzer is case-sensitive: "Spark" hits doc 1 only
    val ws = Procedures.call(spark, g, "db.index.fulltext.queryNodes",
      "name", "Spark", Int.box(5), "whitespace").collect()
    assert(ws.map(_.getAs[Long]("id")).toSeq == Seq(1L))
    // standard analyzer lowercases: both spark docs match
    val std = Procedures.call(spark, g, "db.index.fulltext.queryNodes",
      "name", "spark", Int.box(5)).collect()
    assert(std.map(_.getAs[Long]("id")).toSet == Set(1L, 2L))
    // english analyzer: a stopword-only query has no effective terms
    intercept[IllegalArgumentException] {
      Procedures.call(spark, g, "db.index.fulltext.queryNodes",
        "name", "the", Int.box(5), "english")
    }
  }

  test("db.index.vector.queryRelationships ranks rels by a vector property") {
    import spark.implicits._
    val nodes = Seq((1L, Seq("N"), "a")).toDF("id", "labels", "name")
    val rels = Seq(
      (10L, 1L, 1L, "R", Seq(1.0f, 0.0f)),
      (11L, 1L, 1L, "R", Seq(0.0f, 1.0f)))
      .toDF("id", "src", "dst", "type", "vec")
    val g = graft.graph.PropertyGraph(nodes, rels)
    val top = Procedures.call(spark, g, "db.index.vector.queryRelationships",
      "vec", Int.box(1), Seq(0.9, 0.1)).collect()
    assert(top.map(_.getAs[Long]("id")).toSeq == Seq(10L))
  }

  test("CALL … YIELD … WHERE filters the yielded rows") {
    val g = GraphFixtures.starGraph(spark, 4)
    val rows = graft.cypher.Cypher.run(spark, g,
      """CALL graft.stats.labels() YIELD label, nodeCount WHERE nodeCount > 1
        |RETURN label""".stripMargin).collect().map(_.getString(0))
    assert(rows.toSeq == Seq("Ring"))
  }

  test("graft.shortestPath.dijkstra takes the cheaper two-hop path via CALL…YIELD") {
    import spark.implicits._
    val nodes = Seq((0L, Seq("N"), "a"), (1L, Seq("N"), "b"), (2L, Seq("N"), "c"))
      .toDF("id", "labels", "name")
    val rels = Seq(
      (100L, 0L, 1L, "T", 1.0), (101L, 1L, 2L, "T", 1.0), // 0->1->2 cost 2
      (102L, 0L, 2L, "T", 5.0))                           // direct edge cost 5
      .toDF("id", "src", "dst", "type", "w")
    val g = graft.graph.PropertyGraph(nodes, rels)
    val rows = graft.cypher.Cypher.run(spark, g,
      """CALL graft.shortestPath.dijkstra(0, 2, 'w')
        |YIELD targetNode, totalCost, relIds
        |RETURN targetNode, totalCost, relIds""".stripMargin).collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 2L && rows.head.getDouble(1) == 2.0)
    assert(rows.head.getSeq[Long](2) == Seq(100L, 101L))
    // open target set ([]) returns every reached node
    val all = Procedures.call(spark, g, "graft.shortestPath.dijkstra",
      Seq(0L), Seq.empty, "w").collect()
    assert(all.map(_.getAs[Long]("targetNode")).toSet == Set(0L, 1L, 2L))
    // direction IN walks edges backwards; BOTH reaches everything from 2
    val in = Procedures.call(spark, g, "graft.shortestPath.dijkstra",
      Seq(2L), Seq(0L), "w", Double.box(1.0), Seq.empty, Int.box(50), "IN").collect()
    assert(in.length == 1 && in.head.getAs[Double]("totalCost") == 2.0)
    val both = Procedures.call(spark, g, "graft.shortestPath.dijkstra",
      Seq(1L), Seq.empty, "w", Double.box(1.0), Seq.empty, Int.box(50), "BOTH").collect()
    assert(both.map(_.getAs[Long]("targetNode")).toSet == Set(0L, 1L, 2L))
  }

  test("graft.allPairsShortestPaths covers every pair incl. the diagonal") {
    import spark.implicits._
    val nodes = Seq((1L, Seq("N")), (2L, Seq("N")), (3L, Seq("N")))
      .toDF("id", "labels")
    val rels = Seq(
      (10L, 1L, 2L, "T", 1.0), (11L, 2L, 3L, "T", 1.0), // 1->2->3 cost 2
      (12L, 1L, 3L, "T", 3.0))                          // direct cost 3
      .toDF("id", "src", "dst", "type", "w")
    val g = graft.graph.PropertyGraph(nodes, rels)
    val got = Procedures.call(spark, g, "graft.allPairsShortestPaths", "w")
      .collect()
      .map(r => (r.getAs[Long]("sourceNode"), r.getAs[Long]("targetNode")) ->
        r.getAs[Double]("totalCost")).toMap
    assert(got == Map(
      (1L, 1L) -> 0.0, (1L, 2L) -> 1.0, (1L, 3L) -> 2.0,
      (2L, 2L) -> 0.0, (2L, 3L) -> 1.0, (3L, 3L) -> 0.0))
    // BOTH symmetrizes: every pair reachable, d(3,1) = 2 via reversed edges
    val both = Procedures.call(spark, g, "graft.allPairsShortestPaths",
      "w", Double.box(1.0), Seq.empty, "BOTH").collect()
    assert(both.length == 9)
    val b = both.map(r => (r.getAs[Long]("sourceNode"),
      r.getAs[Long]("targetNode")) -> r.getAs[Double]("totalCost")).toMap
    assert(b((3L, 1L)) == 2.0 && b((2L, 1L)) == 1.0)
  }

  test("centrality procedures dispatch through CALL with typed args") {
    // star: center 0 → ring 1..4; betweenness 0 from all sources, and
    // closeness from the center only
    val g = GraphFixtures.starGraph(spark, 4)
    val bt = Procedures.call(spark, g, "graft.centrality.betweenness",
      Seq.empty[Long]).collect()
    assert(bt.isEmpty) // star center is source/target only, never interior
    val cl = Procedures.call(spark, g, "graft.centrality.closeness",
      Seq(Long.box(0L))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(cl == Seq((0L, 4L, 1.0))) // four dist-1 neighbors
    val core = Procedures.call(spark, g, "graft.kcore", Int.box(1))
      .collect().map(_.getLong(0)).toSet
    assert(core == Set(0L, 1L, 2L, 3L, 4L))
    assert(Procedures.call(spark, g, "graft.kcore", Int.box(2)).count() == 0)
    val sim = Procedures.call(spark, g, "graft.nodesimilarity",
      Int.box(3), Seq("T"), "IN").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // ring nodes all point at... star has center→ring only; IN orientation
    // gives ring→center edges, so every ring pair shares {center}: J=1
    assert(sim.size == 6 && sim.values.forall(_ == 1.0))
  }

  test("db.index.vector.createNodeIndex registers a named index CALL-side") {
    val g = GraphFixtures.nodeGraph(spark, 3, "Doc")
    val (g2, _) = graft.cypher.Cypher.execute(spark, g,
      "CALL db.index.vector.createNodeIndex('emb_idx', 'Doc', 'name', 4, 'cosine')")
    assert(g2.schema.indexes.exists(i =>
      i.name == "emb_idx" && i.label == "Doc" && i.prop == "name" &&
        i.kind == "vector"))
    // invalid similarity function rejected like the reference
    intercept[IllegalArgumentException] {
      graft.cypher.Cypher.execute(spark, g,
        "CALL db.index.vector.createNodeIndex('x', 'Doc', 'name', 4, 'taxicab')")
    }
  }

  test("db.create.setNodeVectorProperty stores float32 and queryNodes sees it") {
    val g = GraphFixtures.nodeGraph(spark, 3, "Doc")
    val (g2, _) = graft.cypher.Cypher.execute(spark, g,
      "CALL db.create.setNodeVectorProperty(1, 'emb', [1.0, 0.0])")
    // space-efficient representation: float32, not Cypher's double list
    assert(g2.nodes.schema("emb").dataType.asInstanceOf[
      org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.FloatType)
    val (g3, _) = graft.cypher.Cypher.execute(spark, g2,
      "CALL db.create.setNodeVectorProperty(2, 'emb', [0.0, 1.0])")
    val top = Procedures.call(spark, g3, "db.index.vector.queryNodes",
      "emb", Int.box(1), Seq(0.9, 0.1)).collect()
    assert(top.head.getAs[Long]("id") == 1L)
  }

  test("vector index similarity function and dimension are honored") {
    val g = GraphFixtures.nodeGraph(spark, 3, "Doc")
    val (g2, _) = graft.cypher.Cypher.execute(spark, g,
      """CALL db.create.setNodeVectorProperty([0, 1], 'emb', [0.0, 0.0])
        |CALL db.index.vector.createNodeIndex('eidx', 'Doc', 'emb', 2, 'EUCLIDEAN')
        |RETURN 1 AS ok""".stripMargin)
    val (g3, _) = graft.cypher.Cypher.execute(spark, g2,
      "CALL db.create.setNodeVectorProperty(0, 'emb', [1.0, 1.0])")
    val (g4, _) = graft.cypher.Cypher.execute(spark, g3,
      "CALL db.create.setNodeVectorProperty(1, 'emb', [5.0, 5.0])")
    // euclidean: [1,1] is closer to [0,0] than [5,5]; cosine would TIE them
    // (same direction), so a cosine-ranked result betrays the config
    val top = Procedures.call(spark, g4, "db.index.vector.queryNodes",
      "eidx", Int.box(1), Seq(0.1, 0.1)).collect()
    assert(top.head.getAs[Long]("id") == 0L)
    // wrong query dimension rejected
    intercept[IllegalArgumentException] {
      Procedures.call(spark, g4, "db.index.vector.queryNodes",
        "eidx", Int.box(1), Seq(1.0, 2.0, 3.0)).collect()
    }
  }

  test("user procedures register and dispatch") {
    Procedures.register("my.top_degree", (s, g, args) => {
      val k = args.head.asInstanceOf[Int]
      g.rels.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        .orderBy(col("deg").desc, col("id")).limit(k)
    })
    val g = GraphFixtures.starGraph(spark, 4)
    val r = Procedures.call(spark, g, "my.top_degree", 1).collect()(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 4L)
  }

  test("user aggregation functions register through spark.udaf (UserAggregationFunction analog)") {
    import org.apache.spark.sql.expressions.Aggregator
    import org.apache.spark.sql.{Encoder, Encoders}
    val gmean = new Aggregator[Double, (Double, Long), Double] {
      def zero = (0.0, 0L)
      def reduce(b: (Double, Long), a: Double) = (b._1 + math.log(a), b._2 + 1)
      def merge(x: (Double, Long), y: (Double, Long)) = (x._1 + y._1, x._2 + y._2)
      def finish(r: (Double, Long)) = math.exp(r._1 / r._2)
      def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    spark.udf.register("gmean", org.apache.spark.sql.functions.udaf(gmean))
    import spark.implicits._
    val r = Seq(1.0, 10.0, 100.0).toDF("x")
      .agg(org.apache.spark.sql.functions.expr("gmean(x)")).collect()(0).getDouble(0)
    assert(math.abs(r - 10.0) < 1e-9)
  }
}
