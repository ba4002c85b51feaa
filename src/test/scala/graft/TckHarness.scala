package graft

import graft.cypher.Cypher
import graft.graph.PropertyGraph
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * Shared Gherkin scenario harness for the openCypher-TCK-style feature
 * format (the reference's primary correctness corpus shape:
 * community/cypher/compatibility-spec-suite and the vendored acceptance
 * features under community/cypher/spec-suite-tools/.../acceptance/features).
 * Consumed by two suites: [[TckSpec]] (self-authored scenarios under
 * src/test/resources/tck) and [[AcceptanceSpec]] (the reference's own
 * public acceptance corpus, read as DATA from the read-only reference
 * checkout).
 *
 * Step grammar: Given an empty/any graph; Background: (feature-level
 * setup); And/When/Given having executed: <docstring>; And parameters
 * are: <table>; When/And executing (control )?query: <docstring>; Then
 * the result should be(, in (any )?order)?(ignoring element order for
 * lists)?: <table> / should be empty; Then a(n) XxxError should be
 * raised at compile time/runtime[: detail]; And no side effects / the
 * side effects should be: <table> (side-effect accounting not modeled —
 * table skipped); Scenario Outline: with Examples: <table> (textual
 * <var> substitution, one scenario per example row).
 *
 * Result cells support the TCK value grammar INCLUDING graph entities:
 * nodes `(:A:B {k: v})`, relationships `[:T {k: v}]`, and paths
 * `<(:A)-[:T]->(:B)>`. graft returns entity IDS for bare variables (the
 * documented columnar divergence, Cypher.scala header), so the harness
 * renders a returned id back to the entity's canonical text via the
 * post-query graph — labels sorted, properties sorted by key — and path
 * structs (nodes/rels id arrays) the same way, with per-segment
 * direction from the stored src/dst.
 */
object TckHarness {

  // ---- scenario model ---------------------------------------------------

  sealed trait Expectation
  case class Rows(header: Seq[String], rows: Seq[Seq[String]],
      ordered: Boolean, sortLists: Boolean = false) extends Expectation
  case object Empty extends Expectation
  case class Error(kind: String) extends Expectation
  /** an executed query whose result the scenario never inspects (e.g. a
    * write checked only through a later control query) */
  case object NoCheck extends Expectation

  case class Step(query: String, expect: Expectation)
  /** scenario-local procedure: `And there exists a procedure
    * ns.name(arg :: TYPE, …) :: (out :: TYPE, …):` + a result table */
  case class ProcDef(name: String, inCols: Seq[String], outCols: Seq[String],
      rows: Seq[Seq[String]])
  case class Scenario(feature: String, name: String, setup: Seq[String],
      params: Map[String, Any], steps: Seq[Step],
      unsupported: Option[String] = None,
      procs: Seq[ProcDef] = Nil,
      csvFiles: Seq[(String, Seq[Seq[String]])] = Nil,
      tags: Set[String] = Set.empty)

  // ---- gherkin subset parser -------------------------------------------

  def parseFeature(text: String, fallbackName: String): Seq[Scenario] = {
    val lines = text.linesIterator.toVector
    var feature = fallbackName
    var background = Vector.empty[String] // raw lines of the Background block
    var pendingTags = Set.empty[String]   // gherkin @tags precede their scenario
    val out = Seq.newBuilder[Scenario]
    var i = 0
    def at(j: Int): String = if (j < lines.length) lines(j).trim else ""
    def isHeader(s: String): Boolean =
      s.startsWith("Scenario:") || s.startsWith("Scenario Outline:") ||
        s.startsWith("Feature:") || s.startsWith("Background:") ||
        s.startsWith("@")
    // collect the raw body lines of a block starting after line i
    def bodyFrom(j: Int): (Vector[String], Int) = {
      var k = j
      var inDoc = false
      val buf = Vector.newBuilder[String]
      while (k < lines.length && (inDoc || !isHeader(at(k)))) {
        if (at(k) == "\"\"\"") inDoc = !inDoc
        buf += lines(k)
        k += 1
      }
      (buf.result(), k)
    }
    while (i < lines.length) {
      val l = at(i)
      if (l.startsWith("@")) {
        pendingTags ++= l.split("\\s+").filter(_.startsWith("@")); i += 1
      } else if (l.startsWith("Feature:")) {
        feature = l.drop(8).trim; pendingTags = Set.empty; i += 1
      } else if (l.startsWith("Background:")) {
        val (body, k) = bodyFrom(i + 1); background = body
        pendingTags = Set.empty; i = k
      } else if (l.startsWith("Scenario Outline:")) {
        val name = l.drop("Scenario Outline:".length).trim
        val (body, k) = bodyFrom(i + 1)
        out ++= expandOutline(feature, name, background ++ body)
          .map(applyTags(_, pendingTags))
        pendingTags = Set.empty
        i = k
      } else if (l.startsWith("Scenario:")) {
        val name = l.drop(9).trim
        val (body, k) = bodyFrom(i + 1)
        out += applyTags(parseScenario(feature, name, background ++ body),
          pendingTags)
        pendingTags = Set.empty
        i = k
      } else i += 1
    }
    out.result()
  }

  /** `@Fails` / `@ignore` mark scenarios the REFERENCE expects to fail or
    * skips — honored as a named skip class; other tags
    * (`@skipGrammarCheck`, `@allowCustomErrors`, …) do not affect
    * execution here. */
  private def applyTags(sc: Scenario, tags: Set[String]): Scenario = {
    val skip = tags.find(t => t == "@Fails" || t == "@ignore")
    skip match {
      case Some(t) if sc.unsupported.isEmpty =>
        sc.copy(tags = tags,
          unsupported = Some(s"tagged $t by the reference (expected failure/skip)"))
      case _ => sc.copy(tags = tags)
    }
  }

  /** expand a Scenario Outline's Examples rows by textual substitution */
  private def expandOutline(feature: String, name: String,
      body: Vector[String]): Seq[Scenario] = {
    val exIdx = body.indexWhere(_.trim.startsWith("Examples:"))
    if (exIdx < 0)
      return Seq(Scenario(feature, name, Nil, Map.empty, Nil,
        Some("Scenario Outline without Examples")))
    val (main, rest) = body.splitAt(exIdx)
    val tableLines = rest.drop(1).map(_.trim).filter(_.startsWith("|"))
    if (tableLines.isEmpty)
      return Seq(Scenario(feature, name, Nil, Map.empty, Nil,
        Some("empty Examples table")))
    val header = splitRow(tableLines.head)
    tableLines.tail.zipWithIndex.map { case (rowLine, idx) =>
      val row = splitRow(rowLine)
      val substituted = main.map { ln =>
        header.zip(row).foldLeft(ln) { case (acc, (h, v)) =>
          acc.replace(s"<$h>", v)
        }
      }
      parseScenario(feature, s"$name (example ${idx + 1})", substituted)
    }
  }

  private def parseScenario(feature: String, name: String,
      body: Vector[String]): Scenario = {
    var setup = Seq.empty[String]
    var params = Map.empty[String, Any]
    val steps = Seq.newBuilder[Step]
    val procs = Seq.newBuilder[ProcDef]
    val csvs = Seq.newBuilder[(String, Seq[Seq[String]])]
    var pendingQuery: Option[String] = None
    var i = 0
    def at(j: Int): String = if (j < body.length) body(j).trim else ""
    def docstring(j0: Int): (String, Int) = {
      // tolerate blank/comment lines between the step and its docstring
      var j = j0
      while (j < body.length && (at(j).isEmpty || at(j).startsWith("#"))) j += 1
      require(at(j) == "\"\"\"", s"expected docstring at: ${at(j)}")
      // strip the smaller of the delimiter's indent and the content's own
      // minimum indent — some features indent the content LESS than the
      // delimiter (AggregationAcceptance), and dropping the delimiter
      // indent there would eat leading characters
      val delimIndent = body(j).indexOf("\"\"\"")
      var k0 = j + 1
      var minContent = Int.MaxValue
      while (at(k0) != "\"\"\"") {
        if (body(k0).trim.nonEmpty)
          minContent = math.min(minContent, body(k0).takeWhile(_ == ' ').length)
        k0 += 1
      }
      val indent = math.min(delimIndent,
        if (minContent == Int.MaxValue) delimIndent else minContent)
      val buf = Seq.newBuilder[String]
      var k = j + 1
      while (at(k) != "\"\"\"") {
        buf += (if (body(k).length >= indent) body(k).drop(indent)
                else body(k).trim)
        k += 1
      }
      (buf.result().mkString("\n"), k + 1)
    }
    def table(j: Int): (Seq[Seq[String]], Int) = {
      val buf = Seq.newBuilder[Seq[String]]
      var k = j
      while (at(k).startsWith("|")) { buf += splitRow(at(k)); k += 1 }
      (buf.result(), k)
    }
    def flushPending(expect: Expectation): Unit = pendingQuery match {
      case Some(q) => steps += Step(q, expect); pendingQuery = None
      case None => throw new IllegalArgumentException(
        s"expectation without a preceding query in $feature / $name")
    }
    try {
      while (i < body.length) {
        val s = at(i)
        if (s == "Given an empty graph" || s == "Given any graph") i += 1
        else if (s == "And having executed:" || s == "When having executed:" ||
            s == "Given having executed:") {
          val (d, k) = docstring(i + 1); setup :+= d; i = k
        } else if (s == "And parameters are:") {
          val (t, k) = table(i + 1)
          params = t.map(r => r(0) -> tckToScala(parseTck(r(1)))).toMap
          i = k
        } else if (s == "When executing query:" || s == "And executing query:" ||
            s == "When executing control query:") {
          pendingQuery.foreach(q => steps += Step(q, NoCheck))
          val (d, k) = docstring(i + 1); pendingQuery = Some(d); i = k
        } else if (s.startsWith("Then the result should be empty")) {
          flushPending(Empty); i += 1
        } else if (s.startsWith("Then the result should be")) {
          val ordered = s.contains(", in order")
          val sortLists = s.contains("ignoring element order for lists")
          val (t, k) = table(i + 1)
          flushPending(Rows(t.head, t.tail, ordered, sortLists))
          i = k
        } else if (s.matches("Then an? \\w+ should be raised.*")) {
          flushPending(Error(s)); i += 1
        } else if (s == "And no side effects") i += 1
        else if (s.startsWith("And the side effects should be") ||
            s.startsWith("Then the side effects should be")) {
          if (s.endsWith(":")) { val (_, k) = table(i + 1); i = k } else i += 1
        } else if (s.matches(
            "(And|Given) there exists a procedure .*:")) {
          val sig = s.replaceFirst("^(And|Given) there exists a procedure ", "")
            .stripSuffix(":").trim
          val (t, k) = table(i + 1)
          procs += parseProcSig(sig, t)
          i = k
        } else if (s.matches(
            "(And|Given) there exists a CSV file with URL as \\$\\w+, with rows:")) {
          val param = s.replaceFirst(".*URL as \\$(\\w+).*", "$1")
          val (t, k) = table(i + 1)
          csvs += ((param, t))
          i = k
        } else if (s.isEmpty || s.startsWith("#")) i += 1
        else if (!s.matches("^(Given|When|Then|And|But)\\b.*")) i += 1
          // free-text scenario DESCRIPTION (gherkin prose between the
          // Scenario: header and the first step) — not a step
        else throw new IllegalArgumentException(s"unsupported TCK step: $s")
      }
      pendingQuery.foreach(q => steps += Step(q, NoCheck))
      Scenario(feature, name, setup, params, steps.result(),
        procs = procs.result(), csvFiles = csvs.result())
    } catch {
      case e: Exception =>
        Scenario(feature, name, Nil, Map.empty, Nil, Some(e.getMessage))
    }
  }

  /** `ns.name(arg :: TYPE, …) :: (out :: TYPE, …)` + result table */
  private def parseProcSig(sig: String, t: Seq[Seq[String]]): ProcDef = {
    val M = """([\w.]+)\s*\(([^)]*)\)\s*::\s*\(([^)]*)\)""".r
    sig match {
      case M(name, ins, outs) =>
        def cols(spec: String): Seq[String] = spec.split(",").toSeq
          .map(_.trim).filter(_.nonEmpty).map(_.split("::")(0).trim)
        val inCols = cols(ins)
        val outCols = cols(outs)
        // table: optional header (a bare `|` for void procs) + value rows
        val rows = if (t.isEmpty) Nil
          else t.tail // head is the column-name header
        ProcDef(name, inCols, outCols, rows)
      case _ => throw new IllegalArgumentException(s"bad procedure signature: $sig")
    }
  }

  /** split a gherkin table row `| a | b |` respecting quotes/brackets */
  def splitRow(row: String): Seq[String] = {
    // Gherkin cell escapes: `\|` is a literal pipe (the corpus escapes
    // label-expression pipes this way), `\\` a backslash, `\n` a newline
    val inner = row.trim.stripPrefix("|").stripSuffix("|")
    val cells = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var inStr = false
    var i = 0
    while (i < inner.length) {
      val c = inner(i)
      if (c == '\\' && i + 1 < inner.length &&
          (inner(i + 1) == '|' || inner(i + 1) == '\\' || inner(i + 1) == 'n')) {
        cur += (if (inner(i + 1) == 'n') '\n' else inner(i + 1))
        i += 2
      } else {
        c match {
          case '\'' => inStr = !inStr; cur += c
          // '<'/'>' deliberately NOT depth-tracked: the '>' in a path's
          // '->' would unbalance the count
          case '[' | '{' | '(' if !inStr => depth += 1; cur += c
          case ']' | '}' | ')' if !inStr => depth -= 1; cur += c
          case '|' if depth == 0 && !inStr =>
            cells += cur.result().trim; cur.clear()
          case _ => cur += c
        }
        i += 1
      }
    }
    cells += cur.result().trim
    cells.result()
  }

  // ---- TCK literal values ----------------------------------------------

  sealed trait TckV
  case object TckNull extends TckV
  case class TckBool(b: Boolean) extends TckV
  case class TckInt(v: Long) extends TckV
  case class TckFloat(v: Double) extends TckV
  case class TckStr(s: String) extends TckV
  case class TckList(xs: Seq[TckV]) extends TckV
  case class TckMap(m: Seq[(String, TckV)]) extends TckV
  case class TckNode(labels: Seq[String], props: Seq[(String, TckV)]) extends TckV
  case class TckRel(tpe: String, props: Seq[(String, TckV)]) extends TckV
  /** start node, then (rel, forward?, next node) segments */
  case class TckPath(start: TckNode,
      segs: Seq[(TckRel, Boolean, TckNode)]) extends TckV

  def parseTck(cell: String): TckV = {
    val p = new TckParser(cell.trim); val v = p.value(); p.ws()
    require(p.eof, s"trailing content in TCK value: $cell"); v
  }

  final class TckParser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (!eof && s(i).isWhitespace) i += 1
    private def peek: Char = s(i)
    private def expect(c: Char): Unit = {
      require(!eof && s(i) == c, s"expected '$c' at $i in: $s"); i += 1
    }
    def value(): TckV = {
      ws()
      if (s.startsWith("null", i)) { i += 4; TckNull }
      else if (s.startsWith("true", i)) { i += 4; TckBool(true) }
      else if (s.startsWith("false", i)) { i += 5; TckBool(false) }
      else if (peek == '\'') str()
      else if (peek == '(') node()
      else if (peek == '<') path()
      else if (peek == '[' && i + 1 < s.length && s(i + 1) == ':') rel()
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
    /** `(:A:B {k: v})` — labels then optional property map */
    private def node(): TckNode = {
      expect('('); ws()
      val labels = Seq.newBuilder[String]
      while (!eof && peek == ':') {
        i += 1
        val b = new StringBuilder
        while (!eof && (s(i).isLetterOrDigit || s(i) == '_')) { b += s(i); i += 1 }
        labels += b.result()
        ws()
      }
      val props = if (!eof && peek == '{') propMap() else Nil
      ws(); expect(')')
      TckNode(labels.result(), props)
    }
    /** `[:T {k: v}]` */
    private def rel(): TckRel = {
      expect('['); ws(); expect(':')
      val b = new StringBuilder
      while (!eof && (s(i).isLetterOrDigit || s(i) == '_')) { b += s(i); i += 1 }
      ws()
      val props = if (!eof && peek == '{') propMap() else Nil
      ws(); expect(']')
      TckRel(b.result(), props)
    }
    /** `<(:A)-[:T]->(:B)<-[:U]-(:C)>` */
    private def path(): TckPath = {
      expect('<'); ws()
      val start = node()
      val segs = Seq.newBuilder[(TckRel, Boolean, TckNode)]
      ws()
      while (!eof && peek != '>') {
        if (peek == '-') { // forward: -[:T]->(n)
          expect('-'); ws()
          val r = rel(); ws(); expect('-'); expect('>'); ws()
          val n = node(); ws()
          segs += ((r, true, n))
        } else { // backward: <-[:T]-(n)
          expect('<'); expect('-'); ws()
          val r = rel(); ws(); expect('-'); ws()
          val n = node(); ws()
          segs += ((r, false, n))
        }
      }
      expect('>')
      TckPath(start, segs.result())
    }
    private def propMap(): Seq[(String, TckV)] = map() match {
      case TckMap(m) => m
      case _ => Nil
    }
    private def list(): TckV = {
      i += 1; ws()
      val xs = Seq.newBuilder[TckV]
      if (peek == ']') { i += 1; return TckList(Nil) }
      var more = true
      while (more) {
        xs += value(); ws()
        if (peek == ',') { i += 1 } else { expect(']'); more = false }
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
        if (peek == ',') { i += 1 } else { expect('}'); more = false }
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

  def tckToScala(v: TckV): Any = v match {
    case TckNull => null
    case TckBool(b) => b
    case TckInt(x) => x
    case TckFloat(x) => x
    case TckStr(x) => x
    case TckList(xs) => xs.map(tckToScala)
    case TckMap(m) => m.map { case (k, x) => k -> tckToScala(x) }.toMap
    case other => throw new IllegalArgumentException(
      s"entity value not usable as a parameter: $other")
  }

  // ---- canonical rendering (both sides) ---------------------------------

  def canonTck(v: TckV, sortLists: Boolean = false): String = v match {
    case TckNull => "null"
    case TckBool(b) => b.toString
    case TckInt(x) => x.toString
    case TckFloat(x) => canonDouble(x)
    case TckStr(x) => "'" + x + "'"
    case TckList(xs) =>
      val rendered = xs.map(canonTck(_, sortLists))
      (if (sortLists) rendered.sorted else rendered).mkString("[", ", ", "]")
    case TckMap(m) => m.sortBy(_._1)
      .map { case (k, x) => s"$k: ${canonTck(x, sortLists)}" }
      .mkString("{", ", ", "}")
    case TckNode(labels, props) =>
      val ls = labels.sorted.map(":" + _).mkString
      val ps = if (props.isEmpty) ""
        else props.sortBy(_._1)
          .map { case (k, x) => s"$k: ${canonTck(x, sortLists)}" }
          .mkString(" {", ", ", "}")
      // no space between ( and : but between labels and props
      "(" + (if (ls.isEmpty && ps.nonEmpty) ps.trim else ls + ps) + ")"
    case TckRel(tpe, props) =>
      val ps = if (props.isEmpty) ""
        else props.sortBy(_._1)
          .map { case (k, x) => s"$k: ${canonTck(x, sortLists)}" }
          .mkString(" {", ", ", "}")
      s"[:$tpe$ps]"
    case TckPath(start, segs) =>
      val sb = new StringBuilder("<")
      sb ++= canonTck(start, sortLists)
      segs.foreach { case (r, fwd, n) =>
        sb ++= (if (fwd) "-" else "<-")
        sb ++= canonTck(r, sortLists)
        sb ++= (if (fwd) "->" else "-")
        sb ++= canonTck(n, sortLists)
      }
      sb += '>'
      sb.result()
  }

  def canonDouble(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isInfinite) (if (d > 0) "Inf" else "-Inf")
    else if (d == math.floor(d) && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString

  // ---- got-value → TckV (graph-aware) -----------------------------------

  /** column hint derived from the expected cells: when the expectation
    * shows entities, a returned LONG is that entity's id */
  sealed trait Hint
  case object HNone extends Hint
  case object HNode extends Hint
  case object HRel extends Hint
  case class HList(elem: Hint) extends Hint

  def hintOf(v: TckV): Hint = v match {
    case _: TckNode => HNode
    case _: TckRel => HRel
    case TckList(xs) =>
      xs.map(hintOf).find(_ != HNone).map(HList.apply).getOrElse(HNone)
    case _ => HNone
  }
  def mergeHints(hs: Seq[Hint]): Hint = hs.find(_ != HNone).getOrElse(HNone)

  /** snapshot of the post-query graph for entity rendering */
  final class EntityCtx(g: PropertyGraph) {
    private def props(r: Row, skip: Set[String]): Seq[(String, TckV)] =
      r.schema.fields.toSeq.collect {
        case f if !skip(f.name) && !f.name.contains("$") &&
            r.getAs[Any](f.name) != null =>
          graft.graph.PropertyGraph.colProp(f.name) ->
            anyToTck(r.getAs[Any](f.name))
      }
    lazy val nodes: Map[Long, TckNode] = g.nodes.collect().map { r =>
      r.getAs[Long]("id") -> TckNode(
        Option(r.getAs[scala.collection.Seq[String]]("labels"))
          .map(_.toSeq).getOrElse(Nil),
        props(r, Set("id", "labels")))
    }.toMap
    lazy val rels: Map[Long, (TckRel, Long, Long)] = g.rels.collect().map { r =>
      r.getAs[Long]("id") -> ((TckRel(r.getAs[String]("type"),
        props(r, Set("id", "src", "dst", "type"))),
        r.getAs[Long]("src"), r.getAs[Long]("dst")))
    }.toMap
    def node(id: Long): TckNode = nodes.getOrElse(id, TckNode(Nil, Nil))
    def rel(id: Long): TckRel = rels.get(id).map(_._1).getOrElse(TckRel("", Nil))
    def path(nodeIds: Seq[Long], relIds: Seq[Long]): TckPath = {
      val start = node(nodeIds.head)
      var cur = nodeIds.head
      val segs = relIds.zip(nodeIds.tail).map { case (rid, nid) =>
        val (r, src, _) = rels.getOrElse(rid, (TckRel("", Nil), cur, nid))
        val fwd = src == cur
        cur = nid
        (r, fwd, node(nid))
      }
      TckPath(start, segs)
    }
  }

  /** decode an orderability-encoded value (graft.functions.Orderability
    * struct {rank,s,b,d,l,repr}) back to a TCK value; the repr text
    * disambiguates INTEGER from FLOAT (both live in the `d` field). Entity
    * ranks (node/rel/path carry their ids in `s`) resolve through the graph
    * snapshot when one is provided. */
  private def decodeOrd(r: Row, ctx: EntityCtx = null): TckV = {
    val s = r.getAs[String]("s")
    val b = r.getAs[Any]("b")
    val d = r.getAs[Any]("d")
    // the deepest nesting level's layout carries no `l`
    val l = if (r.schema != null && r.schema.fieldNames.contains("l"))
      r.getAs[scala.collection.Seq[Any]]("l") else null
    val O = graft.functions.Orderability
    val rank = r.getAs[Any]("rank") match {
      case i: Int => i; case i: java.lang.Integer => i.intValue; case _ => -1
    }
    val repr = r.getAs[String]("repr")
    if (ctx != null && rank == O.RankNode && s != null) ctx.node(s.toLong)
    else if (ctx != null && rank == O.RankRel && s != null) ctx.rel(s.toLong)
    // temporal / point / duration ranks: repr is the value's canonical
    // text — the TCK spells those values as strings
    else if (rank >= O.RankPoint && rank <= O.RankDuration && repr != null)
      TckStr(repr)
    else if (ctx != null && rank == O.RankPath && s != null) {
      val parts = s.split("\\|", -1)
      val nodeIds = parts(0).split(",").filter(_.nonEmpty).map(_.toLong).toSeq
      val relIds =
        if (parts.length > 1)
          parts(1).split(",").filter(_.nonEmpty).map(_.toLong).toSeq
        else Nil
      if (nodeIds.isEmpty) TckNull else ctx.path(nodeIds, relIds)
    }
    else if (rank == O.RankMap) {
      // map encoding: d = size, l = sorted keys then values in key order
      val n = if (d == null) 0 else d.asInstanceOf[Double].toInt
      if (n == 0 || l == null) TckMap(Nil)
      else {
        val elems = l.toSeq
        val keys = elems.take(n).map {
          case rr: Row => rr.getAs[String]("s"); case other => other.toString }
        val vals = elems.slice(n, 2 * n).map {
          case rr: Row => decodeOrd(rr, ctx); case other => anyToTck(other) }
        TckMap(keys.zip(vals))
      }
    }
    else if (s != null) TckStr(s)
    else if (b != null) TckBool(b.asInstanceOf[Boolean])
    else if (d != null) {
      val repr = r.getAs[String]("repr")
      val dd = d.asInstanceOf[Double]
      if (repr != null && !repr.exists(ch => ch == '.' || ch == 'e' ||
        ch == 'E' || ch == 'I' || ch == 'N')) TckInt(dd.toLong)
      else TckFloat(dd)
    }
    else if (l != null) TckList(l.toSeq.map {
      case rr: Row => decodeOrd(rr, ctx)
      case other   => anyToTck(other)
    })
    else TckNull
  }

  private def isOrdRow(v: Any): Boolean = v match {
    case r: Row => r.schema != null &&
      r.schema.fieldNames.toSeq == Seq("rank", "s", "b", "d", "l", "repr")
    case _ => false
  }

  private def anyToTck(v: Any): TckV = v match {
    case null => TckNull
    case r: Row if isOrdRow(r) => decodeOrd(r)
    case s: String => TckStr(s)
    case b: Boolean => TckBool(b)
    case b: java.lang.Boolean => TckBool(b)
    case n: Long => TckInt(n)
    case n: Int => TckInt(n.toLong)
    case n: Short => TckInt(n.toLong)
    case n: Byte => TckInt(n.toLong)
    case d: Double => TckFloat(d)
    case f: Float => TckFloat(f.toDouble)
    case d: java.math.BigDecimal => TckFloat(d.doubleValue)
    case seq: scala.collection.Seq[_] => TckList(seq.toSeq.map(anyToTck))
    case m: scala.collection.Map[_, _] =>
      TckMap(m.toSeq.map { case (k, x) => k.toString -> anyToTck(x) })
    case r: Row =>
      TckMap(r.schema.fieldNames.toSeq.map(f => f -> anyToTck(r.getAs[Any](f))))
    case other => TckStr(other.toString)
  }

  def gotToTck(v: Any, hint: Hint, ctx: EntityCtx): TckV = v match {
    case null => TckNull
    case n: Long if hint == HNode => ctx.node(n)
    case n: Long if hint == HRel => ctx.rel(n)
    // marker-named struct for a heterogeneous list holding entities
    // (`__mix_<i>_<kind>` fields, Planner ListLit): render as a list
    case r: Row if r.schema != null && r.schema.fieldNames.nonEmpty &&
        r.schema.fieldNames.forall(_.startsWith("__mix_")) =>
      TckList(r.schema.fieldNames.toSeq.map { fn =>
        val x = r.getAs[Any](fn)
        val kind = fn.substring(fn.lastIndexOf('_') + 1)
        if (x == null) TckNull
        else kind match {
          case "node" => ctx.node(x.asInstanceOf[Long])
          case "rel"  => ctx.rel(x.asInstanceOf[Long])
          case "nodelist" => TckList(x.asInstanceOf[scala.collection.Seq[Any]]
            .toSeq.map(i => ctx.node(i.asInstanceOf[Long])))
          case "rellist" => TckList(x.asInstanceOf[scala.collection.Seq[Any]]
            .toSeq.map(i => ctx.rel(i.asInstanceOf[Long])))
          case _ => gotToTck(x, HNone, ctx)
        }
      })
    case r: Row if r.schema != null &&
        r.schema.fieldNames.toSeq == Seq("nodes", "rels", "length") =>
      val ns = Option(r.getAs[scala.collection.Seq[Long]]("nodes"))
        .map(_.toSeq).getOrElse(Nil)
      val rs = Option(r.getAs[scala.collection.Seq[Long]]("rels"))
        .map(_.toSeq).getOrElse(Nil)
      if (ns.isEmpty) TckNull else ctx.path(ns, rs)
    case r: Row if isOrdRow(r) => decodeOrd(r, ctx)
    case seq: scala.collection.Seq[_] =>
      val eh = hint match { case HList(e) => e; case h => h }
      TckList(seq.toSeq.map(gotToTck(_, eh, ctx)))
    case other => anyToTck(other)
  }

  // ---- execution --------------------------------------------------------

  def emptyGraph(spark: SparkSession): PropertyGraph = {
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

  def runScenario(spark: SparkSession, sc: Scenario): Unit = {
    sc.unsupported.foreach(reason =>
      throw new IllegalArgumentException(s"unsupported scenario: $reason"))
    // scenario-local procedures: a table-valued proc over the declared
    // rows; input columns (if any) filter rows by the call's arguments
    sc.procs.foreach(registerProc(spark, _))
    // scenario-local CSV files: written to a temp file, URL via the param
    var params = sc.params
    sc.csvFiles.foreach { case (param, t) =>
      val f = java.io.File.createTempFile("tck_csv_", ".csv")
      f.deleteOnExit()
      def cell(c: String): String = parseTck(c) match {
        case TckStr(s) => s
        case other => canonTck(other)
      }
      val text = (t.head.mkString(",") +:
        t.tail.map(_.map(cell).mkString(","))).mkString("\n")
      java.nio.file.Files.write(f.toPath, text.getBytes("UTF-8"))
      params += (param -> f.toURI.toString)
    }
    var g = emptyGraph(spark)
    sc.setup.foreach { stmt =>
      val (g2, _) = Cypher.execute(spark, g, stmt, params); g = g2
    }
    sc.steps.foreach { case Step(query, expect) =>
      expect match {
        case Error(_) =>
          val thrown =
            try {
              val (g2, res) = Cypher.execute(spark, g, query, params)
              res.foreach(_.collect())
              g = g2
              false
            } catch { case _: Throwable => true }
          assert(thrown, s"expected an error for: $query")
        case NoCheck =>
          val (g2, res) = Cypher.execute(spark, g, query, params)
          res.foreach(_.collect())
          g = g2
        case Empty =>
          val (g2, res) = Cypher.execute(spark, g, query, params)
          assert(res.forall(_.count() == 0L),
            s"expected empty result for: $query")
          g = g2
        case Rows(header, rows, ordered, sortLists) =>
          val (g2, resOpt) = Cypher.execute(spark, g, query, params)
          val df = resOpt.getOrElse(
            throw new AssertionError(s"query returned no result stream: $query"))
          assert(df.columns.toSet == header.toSet,
            s"columns ${df.columns.toSeq} != expected $header")
          val collected = df.collect().toSeq
          g = g2
          val ctx = new EntityCtx(g)
          val want = rows.map(_.map(c => parseTck(c)))
          val hints = header.indices.map(ci =>
            mergeHints(want.map(r => hintOf(r(ci)))))
          val got = collected.map(r => header.zip(hints).map { case (h, hint) =>
            canonTck(gotToTck(r.getAs[Any](h), hint, ctx), sortLists) })
          val wantS = want.map(_.map(c => canonTck(c, sortLists)))
          if (ordered)
            assert(got == wantS, s"ordered rows mismatch:\n got: $got\nwant: $wantS")
          else {
            val g1 = got.groupBy(identity).view.mapValues(_.size).toMap
            val g2m = wantS.groupBy(identity).view.mapValues(_.size).toMap
            assert(g1 == g2m,
              s"row multiset mismatch:\n got:  ${got.sortBy(_.mkString)}\n want: ${wantS.sortBy(_.mkString)}")
          }
      }
    }
  }

  /** Register a scenario-local procedure: a table-valued proc over the
    * declared rows (reference TCK "there exists a procedure" step). Input
    * columns, when present, filter the rows by the call's arguments; a
    * void signature yields an empty (0-column, 0-row) relation. */
  private def registerProc(spark: SparkSession, pd: ProcDef): Unit = {
    import org.apache.spark.sql.functions.{col, lit}
    graft.functions.Procedures.register(pd.name, (sp, _, args) => {
      if (pd.outCols.isEmpty) sp.emptyDataFrame
      else {
        val allCols = pd.inCols ++ pd.outCols
        val parsed: Seq[Seq[Any]] =
          pd.rows.map(_.map(c => tckToScala(parseTck(c))))
        def dtOf(i: Int): DataType = parsed.flatMap(r => Option(r(i)))
          .collectFirst {
            case _: Long => LongType
            case _: Double => DoubleType
            case _: Boolean => BooleanType
            case _: String => StringType
          }.getOrElse(StringType)
        val schema = StructType(allCols.zipWithIndex.map { case (c, i) =>
          StructField(c, dtOf(i), nullable = true) })
        var df = sp.createDataFrame(
          sp.sparkContext.parallelize(parsed.map(Row(_: _*)), 1), schema)
        pd.inCols.zipWithIndex.foreach { case (c, i) =>
          df = df.filter(col(c) === lit(args(i)))
        }
        df.select(pd.outCols.map(col): _*)
      }
    })
  }

  // ---- denylist + discovery --------------------------------------------

  /** reference denylist line format (`Feature "X": Scenario "Y"`), plus a
    * feature-level form `Feature "X": ALL` for whole unsupported surfaces.
    * Anything after `//` on a line is a reason comment. */
  def loadDenylist(f: java.io.File): (Set[(String, String)], Set[String]) = {
    if (!f.exists()) return (Set.empty, Set.empty)
    val P = """Feature "([^"]+)": Scenario "([^"]+)".*""".r
    val F = """Feature "([^"]+)": ALL.*""".r
    val lines = scala.io.Source.fromFile(f, "UTF-8").getLines()
      .map(_.replaceAll("//.*$", "").trim).filter(_.nonEmpty).toSeq
    val scen = lines.collect { case P(feat, s) => (feat, s) }.toSet
    val feats = lines.collect { case F(feat) => feat }.toSet
    (scen, feats)
  }

  def loadScenarios(dir: java.io.File): Seq[Scenario] = {
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".feature")).sortBy(_.getName)
    val raw = files.flatMap { f =>
      parseFeature(scala.io.Source.fromFile(f, "UTF-8").mkString,
        f.getName.stripSuffix(".feature"))
    }.toSeq
    // a corpus may repeat a scenario name within a feature — disambiguate
    // deterministically (file order) so test names and denylist keys are
    // stable and unique
    val seen = scala.collection.mutable.Map.empty[(String, String), Int]
    raw.map { sc =>
      val k = (sc.feature, sc.name)
      val n = seen.getOrElse(k, 0) + 1
      seen(k) = n
      if (n == 1) sc else sc.copy(name = s"${sc.name} #$n")
    }
  }
}
