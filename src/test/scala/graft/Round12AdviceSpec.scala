package graft

import graft.cypher.{Cypher, CypherParser}
import graft.functions.expressions.CypherCompare
import graft.graph.PropertyGraph
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 advice regressions: exact long-vs-double comparison above 2^53,
  * NaN ordering inside structured comparisons, parser thread-safety of the
  * GPM syntax-mixing flags, the '%' wildcard never collapsing into a
  * concrete CREATE/MERGE label, the narrowed self-reading CALL{} trigger,
  * and the exact duration orderability primary key. */
class Round12AdviceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def mkGraph(nodes: Seq[Row], rels: Seq[Row] = Nil): PropertyGraph = {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType)),
      StructField("c", LongType)))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType)))
    PropertyGraph(
      spark.createDataFrame(spark.sparkContext.parallelize(nodes, 2), nodeSchema),
      spark.createDataFrame(spark.sparkContext.parallelize(rels, 2), relSchema))
  }

  // ---- CypherCompare exact numerics (reference MathUtil
  // .compareLongAgainstDouble: long-vs-double is compared exactly) ----

  test("long = double above 2^53 compares exactly, not via rounding") {
    val l = 9007199254740993L // 2^53 + 1; rounds to 2^53 as a double
    val d = 9007199254740992.0
    assert(CypherCompare.eq3(l, LongType, d, DoubleType) ==
      java.lang.Boolean.FALSE)
    assert(CypherCompare.cmp(l, LongType, d, DoubleType) ==
      CypherCompare.Ord(1))
    assert(CypherCompare.cmp(d, DoubleType, l, LongType) ==
      CypherCompare.Ord(-1))
    // and an exactly-representable equal pair stays TRUE
    assert(CypherCompare.eq3(9007199254740992L, LongType, d, DoubleType) ==
      java.lang.Boolean.TRUE)
  }

  test("NaN has no order in structured comparison; -0.0 equals 0.0") {
    assert(CypherCompare.cmp(Double.NaN, DoubleType, 1.0, DoubleType) ==
      CypherCompare.Undef)
    assert(CypherCompare.cmp(1L, LongType, Double.NaN, DoubleType) ==
      CypherCompare.Undef)
    assert(CypherCompare.eq3(Double.NaN, DoubleType, Double.NaN, DoubleType) ==
      java.lang.Boolean.FALSE)
    assert(CypherCompare.cmp(-0.0, DoubleType, 0.0, DoubleType) ==
      CypherCompare.Ord(0))
    assert(CypherCompare.cmp(1L, LongType, Double.PositiveInfinity,
      DoubleType) == CypherCompare.Ord(-1))
    assert(CypherCompare.cmp(1L, LongType, Double.NegativeInfinity,
      DoubleType) == CypherCompare.Ord(1))
  }

  // ---- parser thread-safety of the mixing flags ----

  test("concurrent parses do not interleave syntax-mixing state") {
    val mixing = "MATCH (a:A:B)-->(b:C&D) RETURN b" // colon-conj + GPM labels
    val legal = "MATCH (a:A:B)-[r:R*1..2]->(b) RETURN b" // legacy only
    // serial sanity: the fixture queries behave as assumed
    intercept[IllegalArgumentException](CypherParser.parse(mixing))
    CypherParser.parse(legal)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (1 to 64).map { i =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean =
            if (i % 2 == 0)
              try { CypherParser.parse(mixing); false } // must ALWAYS throw
              catch { case _: IllegalArgumentException => true }
            else
              try { CypherParser.parse(legal); true }   // must NEVER throw
              catch { case _: Exception => false }
        })
      }
      assert(tasks.forall(_.get()), "a parse saw another thread's mix flags")
    } finally pool.shutdown()
  }

  // ---- '%' wildcard is not a concrete label ----

  test("CREATE/MERGE with a '%' wildcard label atom is rejected") {
    val g = mkGraph(Seq(Row(1L, Seq("A"), 0L)))
    val e = intercept[Exception] {
      Cypher.execute(spark, g, "MERGE (n:A&%) RETURN n")
    }
    assert(!e.getMessage.contains("NullPointerException"))
    // and nothing was created labeled literally "%"
    val g2 = mkGraph(Seq(Row(1L, Seq("A"), 0L)))
    intercept[Exception] {
      Cypher.execute(spark, g2, "CREATE (n:A&%)")
    }
  }

  // ---- self-reading CALL{} narrowing ----

  test("uncorrelated write CALL{} that reads its own label runs per row") {
    val g = mkGraph(Seq(
      Row(1L, Seq("Src"), 0L), Row(2L, Seq("Src"), 0L),
      Row(3L, Seq("Src"), 0L), Row(10L, Seq("Counter"), 0L)))
    val (_, rows) = Cypher.execute(spark, g,
      """MATCH (s:Src)
        |CALL { MATCH (n:Counter) SET n.c = n.c + 1 RETURN n.c AS c }
        |RETURN c ORDER BY c""".stripMargin)
    assert(rows.get.collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("uncorrelated write CALL{} over a disjoint label stays set-based") {
    val g = mkGraph(Seq(
      Row(1L, Seq("Src"), 0L), Row(2L, Seq("Src"), 0L),
      Row(10L, Seq("Other"), 0L), Row(11L, Seq("Other"), 0L)))
    val (g2, _) = Cypher.execute(spark, g,
      "MATCH (s:Src) CALL { MATCH (x:Other) CREATE (:Thing) }")
    val n = Cypher.run(spark, g2,
      "MATCH (t:Thing) RETURN count(*) AS n").collect()(0).getLong(0)
    assert(n == 4L) // |Src| × |Other| creations either way
  }

  // ---- create-only tx bodies skip the stale-cache refresh but SET
  // bodies still read through earlier commits ----

  test("IN TRANSACTIONS body with SET sees earlier batches' writes") {
    val g = mkGraph(Seq(
      Row(1L, Seq("N"), 0L), Row(2L, Seq("N"), 0L),
      Row(3L, Seq("N"), 0L), Row(4L, Seq("N"), 0L)))
    // each 1-row batch increments EVERY :N node's counter; the last
    // node's own hydrated `c` must reflect the three earlier commits
    val (g2, _) = Cypher.execute(spark, g,
      """MATCH (m:N)
        |CALL { WITH m MATCH (n:N) SET n.c = n.c + 1 }
        |IN TRANSACTIONS OF 1 ROWS""".stripMargin)
    val cs = Cypher.run(spark, g2,
      "MATCH (n:N) RETURN n.c AS c ORDER BY c").collect().map(_.getLong(0))
    assert(cs.toSeq == Seq(4L, 4L, 4L, 4L))
  }

  // ---- runtime warning at the unbounded-leg search horizon ----

  test("unbounded-leg search warns when the frontier outlives the cap") {
    // a 32-node chain: the ONLY :S → :E path is 31 hops, past the 30-hop
    // cap — the search must come back empty AND fire the horizon hook so
    // "no path" is distinguishable from "horizon exceeded"
    val nodes = (0L to 31L).map(i => Row(i,
      if (i == 0L) Seq("S") else if (i == 31L) Seq("E") else Seq("M"), 0L))
    val rels = (0L until 31L).map(i => Row(100L + i, i, i + 1L, "R"))
    val g = mkGraph(nodes, rels)
    val fired = new java.util.concurrent.atomic.AtomicInteger(0)
    val old = graft.ops.Trail.onHorizon
    graft.ops.Trail.onHorizon = (_, _) => fired.incrementAndGet()
    try {
      val rows = Cypher.run(spark, g,
        "MATCH p = ANY SHORTEST (a:S)-[:R]->+(b:E) RETURN length(p) AS l")
        .collect()
      assert(rows.isEmpty, s"31-hop path must be past the horizon, got ${rows.toSeq}")
      assert(fired.get() > 0, "horizon hook must fire when the frontier is alive at the cap")
      // a REACHABLE pair does not warn
      fired.set(0)
      val ok = Cypher.run(spark, mkGraph(nodes.take(3) :+ Row(31L, Seq("E"), 0L),
          Seq(Row(100L, 0L, 1L, "R"), Row(101L, 1L, 31L, "R"))),
        "MATCH p = ANY SHORTEST (a:S)-[:R]->+(b:E) RETURN length(p) AS l")
        .collect()
      assert(ok.map(_.getInt(0)).toSeq == Seq(2))
      assert(fired.get() == 0, "no warning when the search exhausts before the cap")
    } finally graft.ops.Trail.onHorizon = old
  }

  // ---- duration orderability beyond 2^53 seconds ----

  test("durations with averages differing past 2^53 seconds order exactly") {
    val g = mkGraph(Seq(Row(1L, Seq("A"), 0L)))
    // old lossy double key: both encode to 2^53; the nanos-first tiebreak
    // would then sort d2 (0 ns) BEFORE d1 (999999999 ns) — wrong order
    val rows = Cypher.run(spark, g,
      """UNWIND [duration({seconds: 9007199254740993}),
        |        duration({seconds: 9007199254740992, nanoseconds: 999999999})] AS d
        |RETURN d ORDER BY d""".stripMargin).collect()
    assert(rows.length == 2)
    val first = rows(0).toString
    assert(first.contains("9007199254740992") || first.contains("0.999999999") ||
      first.contains("999999999"),
      s"smaller-average duration must sort first, got $first then ${rows(1)}")
  }
}
