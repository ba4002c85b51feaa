package graft

import graft.cypher.Cypher
import org.scalatest.funsuite.AnyFunSuite

/** String functions over wrong-typed dynamic properties must raise a
  * TypeError at runtime, not silently return null — the reference contract
  * (TrimFunctionsAcceptance.feature:222-252 "Then a TypeError should be
  * raised at runtime"; CypherFunctions' string coercion throws
  * CypherTypeException). A mixed-typed property key (strings on some
  * labels, an INT on :BadData) stores orderability-encoded; every typed
  * string function must decode the string slot and raise on any other
  * non-null rank. NULL inputs still flow through as NULL. */
class StringTypeErrorSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** :A/:B carry string s-values, :BadData stores the same key as INT —
    * reconcileTypes widens the column to the variant encoding. */
  private def mixedGraph() = {
    var g = TckHarness.emptyGraph(spark)
    Seq(
      "CREATE (:A {s: '  hello  '})",
      "CREATE (:B {s: 'world'})",
      "CREATE (:BadData {s: 1234})",
      "CREATE (:NullData)").foreach { stmt =>
      val (g2, _) = Cypher.execute(spark, g, stmt); g = g2
    }
    g
  }

  private def raisesTypeError(query: String): Unit = {
    val g = mixedGraph()
    val thrown =
      try { Cypher.execute(spark, g, query)._2.foreach(_.collect()); false }
      catch {
        case t: Throwable =>
          def hasTypeError(e: Throwable): Boolean =
            e != null && (Option(e.getMessage).exists(_.contains("TypeError")) ||
              hasTypeError(e.getCause))
          assert(hasTypeError(t), s"wrong error for $query: $t")
          true
      }
    assert(thrown, s"expected a TypeError for: $query")
  }

  for (fn <- Seq("trim(n.s)", "ltrim(n.s)", "rtrim(n.s)", "btrim(n.s)",
      "toUpper(n.s)", "toLower(n.s)", "replace(n.s, 'l', 'L')",
      "split(n.s, 'l')", "substring(n.s, 1)", "left(n.s, 2)",
      "right(n.s, 2)"))
    test(s"$fn raises TypeError on an INT-typed dynamic property") {
      raisesTypeError(s"MATCH (n:BadData) RETURN $fn AS v")
    }

  test("string functions still work on the string-typed rows") {
    val g = mixedGraph()
    val (_, res) = Cypher.execute(spark, g,
      "MATCH (n:A) RETURN trim(n.s) AS t, toUpper(n.s) AS u, " +
        "substring(n.s, 2, 5) AS sub, replace(n.s, 'hello', 'hi') AS r")
    val row = res.get.collect().head
    assert(row.getAs[String]("t") == "hello")
    assert(row.getAs[String]("u") == "  HELLO  ")
    assert(row.getAs[String]("sub") == "hello")
    assert(row.getAs[String]("r") == "  hi  ")
  }

  test("NULL property flows through string functions as NULL, no raise") {
    val g = mixedGraph()
    val (_, res) = Cypher.execute(spark, g,
      "MATCH (n:NullData) RETURN trim(n.s) AS t, toUpper(n.s) AS u, " +
        "left(n.s, 2) AS l")
    val row = res.get.collect().head
    assert(row.isNullAt(0) && row.isNullAt(1) && row.isNullAt(2))
  }
}
