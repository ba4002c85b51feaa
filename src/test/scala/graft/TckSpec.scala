package graft

import graft.cypher.Cypher
import graft.graph.PropertyGraph
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/**
 * openCypher-TCK-style conformance runner (the reference's primary
 * correctness corpus: community/cypher/compatibility-spec-suite consumes
 * org.opencypher:tck feature files through a Gherkin runner with a
 * per-engine denylist, .../features/tck/BaseTCKTests.scala +
 * .../tck/denylist/interpreted.txt). This runner executes the same
 * given-graph / when-query / expected-rows scenario shape from feature
 * files under src/test/resources/tck — scenarios AUTHORED for this suite
 * in the public TCK format (the artifact itself is not vendored; zero
 * egress), covering the implemented Cypher surface. A committed denylist
 * (denylist.txt, reference denylist line format) skips documented
 * divergences; the summary test prints scenario counts.
 *
 * Step grammar supported: Given an empty graph / any graph; And having
 * executed: <docstring>; And parameters are: <table>; When executing
 * query: <docstring>; Then the result should be(, in (any )?order)?:
 * <table> / should be empty; Then a(n) XxxError should be raised …;
 * And no side effects (ignored — side-effect accounting is not modeled).
 */
class TckSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  // ---- scenario model ---------------------------------------------------

  private case class Scenario(feature: String, name: String,
      setup: Seq[String], params: Map[String, Any], query: String,
      expect: Expectation)
  private sealed trait Expectation
  private case class Rows(header: Seq[String], rows: Seq[Seq[String]],
      ordered: Boolean) extends Expectation
  private case object Empty extends Expectation
  private case class Error(kind: String) extends Expectation

  // ---- gherkin subset parser -------------------------------------------

  private def parseFeature(text: String, fallbackName: String): Seq[Scenario] = {
    val lines = text.linesIterator.toVector
    var feature = fallbackName
    val out = Seq.newBuilder[Scenario]
    var i = 0
    def at(j: Int): String = if (j < lines.length) lines(j).trim else ""
    // docstring starting at lines(j) == `"""`; returns (content, next index)
    def docstring(j: Int): (String, Int) = {
      require(at(j) == "\"\"\"", s"expected docstring at line $j: ${at(j)}")
      val indent = lines(j).indexOf("\"\"\"")
      val buf = Seq.newBuilder[String]
      var k = j + 1
      while (at(k) != "\"\"\"") {
        buf += (if (lines(k).length >= indent) lines(k).drop(indent) else lines(k).trim)
        k += 1
      }
      (buf.result().mkString("\n"), k + 1)
    }
    def table(j: Int): (Seq[Seq[String]], Int) = {
      val buf = Seq.newBuilder[Seq[String]]
      var k = j
      while (at(k).startsWith("|")) {
        buf += splitRow(at(k))
        k += 1
      }
      (buf.result(), k)
    }
    while (i < lines.length) {
      val l = at(i)
      if (l.startsWith("Feature:")) { feature = l.drop(8).trim; i += 1 }
      else if (l.startsWith("Scenario:")) {
        val name = l.drop(9).trim
        i += 1
        var setup = Seq.empty[String]
        var params = Map.empty[String, Any]
        var query = ""
        var expect: Expectation = Empty
        var done = false
        while (!done && i < lines.length) {
          val s = at(i)
          if (s.startsWith("Scenario:") || s.startsWith("Feature:")) done = true
          else if (s == "Given an empty graph" || s == "Given any graph") i += 1
          else if (s == "And having executed:" || s == "When having executed:") {
            val (d, k) = docstring(i + 1); setup :+= d; i = k
          } else if (s == "And parameters are:") {
            val (t, k) = table(i + 1)
            params = t.map(r => r(0) -> tckToScala(parseTck(r(1)))).toMap
            i = k
          } else if (s == "When executing query:") {
            val (d, k) = docstring(i + 1); query = d; i = k
          } else if (s.startsWith("Then the result should be empty")) {
            expect = Empty; i += 1
          } else if (s.startsWith("Then the result should be")) {
            val ordered = s.contains(", in order")
            val (t, k) = table(i + 1)
            expect = Rows(t.head, t.tail, ordered)
            i = k
          } else if (s.matches("Then an? \\w+ should be raised.*")) {
            expect = Error(s); i += 1
          } else if (s == "And no side effects" ||
              s.startsWith("And the side effects should be")) {
            if (s.endsWith(":")) { val (_, k) = table(i + 1); i = k } else i += 1
          } else if (s.isEmpty || s.startsWith("#")) i += 1
          else throw new IllegalArgumentException(
            s"unsupported TCK step in $feature / $name: $s")
        }
        out += Scenario(feature, name, setup, params, query, expect)
      } else i += 1
    }
    out.result()
  }

  /** split a gherkin table row `| a | b |` respecting quotes/brackets */
  private def splitRow(row: String): Seq[String] = {
    val inner = row.trim.stripPrefix("|").stripSuffix("|")
    val cells = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false
    inner.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case c @ ('[' | '{' | '(') if !inStr => depth += 1; cur += c
      case c @ (']' | '}' | ')') if !inStr => depth -= 1; cur += c
      case '|' if depth == 0 && !inStr => cells += cur.result().trim; cur.clear()
      case c => cur += c
    }
    cells += cur.result().trim
    cells.result()
  }

  // ---- TCK literal values ----------------------------------------------

  private sealed trait TckV
  private case object TckNull extends TckV
  private case class TckBool(b: Boolean) extends TckV
  private case class TckInt(v: Long) extends TckV
  private case class TckFloat(v: Double) extends TckV
  private case class TckStr(s: String) extends TckV
  private case class TckList(xs: Seq[TckV]) extends TckV
  private case class TckMap(m: Seq[(String, TckV)]) extends TckV

  private def parseTck(cell: String): TckV = {
    val p = new TckParser(cell.trim); val v = p.value(); p.ws()
    require(p.eof, s"trailing content in TCK value: $cell"); v
  }

  private final class TckParser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (!eof && s(i).isWhitespace) i += 1
    private def peek: Char = s(i)
    def value(): TckV = {
      ws()
      if (s.startsWith("null", i)) { i += 4; TckNull }
      else if (s.startsWith("true", i)) { i += 4; TckBool(true) }
      else if (s.startsWith("false", i)) { i += 5; TckBool(false) }
      else if (peek == '\'') str()
      else if (peek == '[') list()
      else if (peek == '{') map()
      else num()
    }
    private def str(): TckV = {
      i += 1; val b = new StringBuilder
      while (s(i) != '\'') {
        if (s(i) == '\\' && i + 1 < s.length) { b += s(i + 1); i += 2 }
        else { b += s(i); i += 1 }
      }
      i += 1; TckStr(b.result())
    }
    private def list(): TckV = {
      i += 1; ws()
      val xs = Seq.newBuilder[TckV]
      if (peek == ']') { i += 1; return TckList(Nil) }
      var more = true
      while (more) {
        xs += value(); ws()
        if (peek == ',') { i += 1 } else { require(peek == ']'); i += 1; more = false }
      }
      TckList(xs.result())
    }
    private def map(): TckV = {
      i += 1; ws()
      val es = Seq.newBuilder[(String, TckV)]
      if (peek == '}') { i += 1; return TckMap(Nil) }
      var more = true
      while (more) {
        ws()
        val ks = new StringBuilder
        while (s(i) != ':') { ks += s(i); i += 1 }
        i += 1
        val v = value(); ws()
        es += ((ks.result().trim, v))
        if (peek == ',') { i += 1 } else { require(peek == '}'); i += 1; more = false }
      }
      TckMap(es.result())
    }
    private def num(): TckV = {
      val start = i
      if (peek == '-' || peek == '+') i += 1
      while (!eof && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
        ((s(i) == '-' || s(i) == '+') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) i += 1
      val t = s.substring(start, i)
      require(t.nonEmpty, s"bad TCK value at '$s'")
      if (t.contains('.') || t.toLowerCase.contains('e')) TckFloat(t.toDouble)
      else TckInt(t.toLong)
    }
  }

  private def tckToScala(v: TckV): Any = v match {
    case TckNull => null
    case TckBool(b) => b
    case TckInt(x) => x
    case TckFloat(x) => x
    case TckStr(x) => x
    case TckList(xs) => xs.map(tckToScala)
    case TckMap(m) => m.map { case (k, x) => k -> tckToScala(x) }.toMap
  }

  // ---- canonical rendering (both sides) ---------------------------------

  private def canonTck(v: TckV): String = v match {
    case TckNull => "null"
    case TckBool(b) => b.toString
    case TckInt(x) => x.toString
    case TckFloat(x) => canonDouble(x)
    case TckStr(x) => "'" + x + "'"
    case TckList(xs) => xs.map(canonTck).mkString("[", ", ", "]")
    case TckMap(m) => m.sortBy(_._1)
      .map { case (k, x) => s"$k: ${canonTck(x)}" }.mkString("{", ", ", "}")
  }

  private def canonDouble(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isInfinite) (if (d > 0) "Inf" else "-Inf")
    else if (d == math.floor(d) && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  private def canonAny(v: Any): String = v match {
    case null => "null"
    case s: String => "'" + s + "'"
    case b: Boolean => b.toString
    case b: java.lang.Boolean => b.toString
    case n @ (_: Long | _: Int | _: Short | _: Byte) => n.toString
    case d: Double => canonDouble(d)
    case f: Float => canonDouble(f.toDouble)
    case d: java.math.BigDecimal => canonDouble(d.doubleValue)
    case seq: scala.collection.Seq[_] => seq.map(canonAny).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] => m.toSeq
      .map { case (k, x) => k.toString -> canonAny(x) }.sortBy(_._1)
      .map { case (k, x) => s"$k: $x" }.mkString("{", ", ", "}")
    case r: Row => // struct values render as maps over their fields
      r.schema.fieldNames.sorted.toSeq
        .map(f => s"$f: ${canonAny(r.getAs[Any](f))}").mkString("{", ", ", "}")
    case other => other.toString
  }

  // ---- execution --------------------------------------------------------

  private def emptyGraph(): PropertyGraph = {
    val nodes = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("labels", ArrayType(StringType), nullable = false))))
    val rels = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("id", LongType, nullable = false),
        StructField("src", LongType, nullable = false),
        StructField("dst", LongType, nullable = false),
        StructField("type", StringType, nullable = false))))
    PropertyGraph(nodes, rels)
  }

  private def runScenario(sc: Scenario): Unit = {
    var g = emptyGraph()
    sc.setup.foreach { stmt =>
      val (g2, _) = Cypher.execute(spark, g, stmt, sc.params); g = g2
    }
    sc.expect match {
      case Error(_) =>
        val thrown =
          try { Cypher.execute(spark, g, sc.query, sc.params)._2.foreach(_.collect()); false }
          catch { case _: Throwable => true }
        assert(thrown, s"expected an error for: ${sc.query}")
      case Empty =>
        val res = Cypher.execute(spark, g, sc.query, sc.params)._2
        assert(res.forall(_.count() == 0L),
          s"expected empty result for: ${sc.query}")
      case Rows(header, rows, ordered) =>
        val df = Cypher.execute(spark, g, sc.query, sc.params)._2
          .getOrElse(fail(s"query returned no result stream: ${sc.query}"))
        assert(df.columns.toSet == header.toSet,
          s"columns ${df.columns.toSeq} != expected $header")
        val got = df.collect().toSeq.map(r =>
          header.map(h => canonAny(r.getAs[Any](h))))
        val want = rows.map(_.map(c => canonTck(parseTck(c))))
        if (ordered)
          assert(got == want, s"ordered rows mismatch:\n got: $got\nwant: $want")
        else {
          val g1 = got.groupBy(identity).view.mapValues(_.size).toMap
          val g2 = want.groupBy(identity).view.mapValues(_.size).toMap
          assert(g1 == g2, s"row multiset mismatch:\n got:  ${got.sortBy(_.mkString)}\n want: ${want.sortBy(_.mkString)}")
        }
    }
  }

  // ---- registration -----------------------------------------------------

  private val tckDir = new java.io.File("src/test/resources/tck")
  private val denylist: Set[(String, String)] = {
    val f = new java.io.File(tckDir, "denylist.txt")
    if (!f.exists()) Set.empty
    else {
      val P = """Feature "([^"]+)": Scenario "([^"]+)".*""".r
      scala.io.Source.fromFile(f, "UTF-8").getLines().map(_.trim).collect {
        case P(feat, scen) => (feat, scen)
      }.toSet
    }
  }

  private val scenarios: Seq[Scenario] = {
    val files = Option(tckDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".feature")).sortBy(_.getName)
    files.flatMap { f =>
      parseFeature(scala.io.Source.fromFile(f, "UTF-8").mkString,
        f.getName.stripSuffix(".feature"))
    }.toSeq
  }

  private val (denied, active) =
    scenarios.partition(s => denylist((s.feature, s.name)))

  active.foreach { sc =>
    test(s"TCK: ${sc.feature} — ${sc.name}") { runScenario(sc) }
  }

  test("TCK summary: scenario counts") {
    info(s"${scenarios.size} scenarios parsed, ${active.size} active, " +
      s"${denied.size} denylisted")
    assert(active.nonEmpty, "no TCK scenarios found")
  }
}
