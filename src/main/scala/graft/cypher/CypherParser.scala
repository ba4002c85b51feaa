package graft.cypher

import scala.util.parsing.combinator.RegexParsers
import Ast._

/**
 * Recursive-descent parser for the openCypher subset (grammar reference:
 * community/cypher/front-end/antlr-parser/src/main/antlr4/.../CypherParser.g4
 * — productions oC_Match, oC_With, oC_Return, oC_PatternElement,
 * oC_Expression precedence ladder :: oC_OrExpression → … → oC_Atom).
 *
 * Built on scala-parser-combinators rather than ANTLR: the subset is small
 * enough that combinator grammars stay readable, and the jar ships with
 * Spark. Keywords are case-insensitive; identifiers may be backtick-quoted.
 */
object CypherParser extends RegexParsers {

  // ---- GPM syntax-mixing flags (reference GpmSyntaxMixingAcceptance) ----
  // The reference rejects, QUERY-WIDE (subqueries included), mixing of:
  //   axis 1: `:` label conjunction (`:A:B`) with GPM-only label/type
  //           syntax (&, !, %, |, parenthesized expressions, IS introducer)
  //   axis 2: legacy var-length (`*m..n`) with QPP quantifiers ({m,n} + *)
  //   axis 3: legacy shortestPath()/allShortestPaths() with GQL selectors
  //           or QPP quantifiers
  // Parse-time GPM syntax-mixing flags, reset per top-level clause. Held
  // in a PER-THREAD context (not fields on this singleton object):
  // concurrent parse() calls from different threads would otherwise
  // interleave flag updates, producing spurious 'syntax mixing' errors or
  // silently missing required ones.
  // label-axis flags are PARTITIONED by usage (reference
  // checkIfMixingLabelExpressionWithOldSyntax): legacy/GPM conflict only
  // within the READ partition (MATCH patterns, predicates) or within the
  // WRITE partition (CREATE/SET/REMOVE); MERGE contributes to both.
  private final class MixCtx {
    var usage = 1 // bitmask: 1=read, 2=write
    var colonConjR = false; var colonConjW = false
    var gpmLabelsR = false; var gpmLabelsW = false
    var varLength = false; var qpp = false
    var legacyShortest = false; var selector = false
    var depth = 0
    var suppressVarLen = false
  }
  private val mixCtx: ThreadLocal[MixCtx] =
    ThreadLocal.withInitial(() => new MixCtx)
  private def mix: MixCtx = mixCtx.get()
  private def markColonConj(): Unit = {
    if ((mix.usage & 1) != 0) mix.colonConjR = true
    if ((mix.usage & 2) != 0) mix.colonConjW = true
  }
  private def markGpmLabels(): Unit = {
    if ((mix.usage & 1) != 0) mix.gpmLabelsR = true
    if ((mix.usage & 2) != 0) mix.gpmLabelsW = true
  }
  /** run `p` with the label-usage context set to `usage` */
  private def inUsage[T](usage: Int)(p: => Parser[T]): Parser[T] =
    Parser { in =>
      val saved = mix.usage
      mix.usage = usage
      try p(in) finally mix.usage = saved
    }
  private def resetMixFlags(): Unit = {
    mix.usage = 1
    mix.colonConjR = false; mix.colonConjW = false
    mix.gpmLabelsR = false; mix.gpmLabelsW = false
    mix.varLength = false; mix.qpp = false
    mix.legacyShortest = false; mix.selector = false
  }
  private def checkMixFlags(): Unit = {
    if ((mix.colonConjR && mix.gpmLabelsR) || (mix.colonConjW && mix.gpmLabelsW))
      throw new IllegalArgumentException(
        "syntax mixing: `:` label conjunction cannot be combined with GPM " +
          "label expression syntax (&, !, %, |, IS) in the same statement")
    if (mix.varLength && mix.qpp) throw new IllegalArgumentException(
      "syntax mixing: var-length relationships (`*m..n`) cannot be " +
        "combined with quantified path patterns in the same statement")
    if (mix.legacyShortest && mix.selector)
      throw new IllegalArgumentException(
        "syntax mixing: shortestPath()/allShortestPaths() cannot be " +
          "combined with path selectors or explicit match modes")
  }
  /** true when a parsed label DNF uses GPM-only operators */
  private def gpmDnf(g: LabelDnf): Boolean =
    g.size > 1 || g.exists(conj => conj.size > 1 ||
      conj.exists(a => a.negated || a.name == "%"))

  // comments: // to end of line, /* ... */ block (non-nesting, like the
  // reference grammar's BLOCK_COMMENT lexer rule)
  override protected val whiteSpace = """(\s|//[^\n]*|/\*(?s:.*?)\*/)+""".r

  // `IS` and `END` are CONTEXTUAL in the reference grammar (a variable may
  // be named `end` — pervasive in the acceptance corpus; `collect(i) AS is`
  // is legal): keyword uses (`IS NULL`, `CASE … END`) match via K() before
  // the identifier alternative, so they need not be globally reserved.
  private val reserved = Set(
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "UNWIND", "AS",
    "ORDER", "BY", "SKIP", "LIMIT", "DISTINCT", "UNION", "ALL",
    "AND", "OR", "XOR", "NOT", "IN", "STARTS", "ENDS", "CONTAINS",
    "NULL", "TRUE", "FALSE", "CASE", "WHEN", "THEN", "ELSE",
    "ASC", "DESC", "ASCENDING", "DESCENDING", "EXISTS",
    "CREATE", "MERGE", "SET", "REMOVE", "DELETE", "DETACH", "NODETACH", "ON",
    "FOREACH", "CALL", "YIELD", "INSERT", "FINISH")

  /** Case-insensitive keyword with word boundary. */
  private def K(w: String): Parser[String] = ("(?i)" + w + "\\b").r ^^ (_ => w)

  private def ident: Parser[String] =
    "`" ~> "[^`]+".r <~ "`" |
    "[a-zA-Z_][a-zA-Z0-9_]*".r ^? (
      { case s if !reserved(s.toUpperCase) => s },
      s => s"reserved word '$s' cannot be used as identifier")

  /** Alias position (`AS x`): like ident, plus `exists` — reserved only
    * for the subquery keyword; the reference allows it as an alias. */
  private def aliasName: Parser[String] = ident | """(?i)exists\b""".r

  /** Symbolic name in an unambiguous position (label, rel type, property
    * key, map key): reserved words are allowed there, as in the reference
    * grammar (`:Order` is a legal label). */
  private def symName: Parser[String] =
    "`" ~> "[^`]+".r <~ "`" | "[a-zA-Z_][a-zA-Z0-9_]*".r

  // identifier in function-name position (count/exists are not reserved here)
  /** clause-starting keywords can never name a function/procedure — without
    * this, `WITH * MATCH (m)` mis-parses `MATCH (m)` as a call expression
    * and the star item's not(expression) guard fails (EXISTS/COUNT stay
    * callable: `exists(n.prop)` is a legacy function). */
  private val nonFuncKw = Set(
    "MATCH", "OPTIONAL", "WHERE", "RETURN", "WITH", "UNWIND", "ORDER",
    "SKIP", "LIMIT", "UNION", "CREATE", "MERGE", "SET", "REMOVE", "DELETE",
    "DETACH", "NODETACH", "FOREACH", "CALL", "YIELD", "INSERT", "FINISH",
    "WHEN", "THEN", "ELSE", "AS", "DISTINCT")
  private def funcName: Parser[String] = "[a-zA-Z_][a-zA-Z0-9_.]*".r ^? (
    { case s if !nonFuncKw(s.toUpperCase) => s },
    s => s"'$s' cannot name a function")

  // ---- literals ---------------------------------------------------------

  // underscores as digit-group separators (reference Cypher 5 lexer,
  // LiteralAcceptance): single `_` BETWEEN digits (and directly after the
  // 0x/0o radix prefix); leading/trailing/doubled underscores and `E_1`
  // stay unmatched, so those literals fail to parse, as required
  private def deUnderscore(s: String): String = s.replace("_", "")
  private def numberLit: Parser[Expr] =
    """-?0[xX]_?[0-9a-fA-F](_?[0-9a-fA-F])*""".r ^^ (s =>
      Lit(java.lang.Long.parseLong(
        deUnderscore(s).replaceFirst("0[xX]", ""), 16) *
        (if (s.startsWith("-")) -1L else 1L))) |
    """-?0[oO]_?[0-7](_?[0-7])*""".r ^^ (s =>
      Lit(java.lang.Long.parseLong(
        deUnderscore(s).replaceFirst("0[oO]", ""), 8) *
        (if (s.startsWith("-")) -1L else 1L))) |
    """-?\d(_?\d)*\.\d(_?\d)*([eE][+-]?\d(_?\d)*)?[fF]?""".r ^^ (s =>
      Lit(deUnderscore(s.stripSuffix("f").stripSuffix("F")).toDouble)) |
    """-?\d(_?\d)*[eE][+-]?\d(_?\d)*[fF]?""".r ^^ (s =>
      Lit(deUnderscore(s.stripSuffix("f").stripSuffix("F")).toDouble)) |
    """-?\d(_?\d)*""".r ^^ { s =>
      // `0_66` spells the DEPRECATED leading-zero octal syntax with a
      // separator — the reference raises (modern octal is 0o); a plain
      // multi-digit 0-prefixed literal stays as-is
      val digits = s.stripPrefix("-")
      if (digits.length > 1 && digits.charAt(0) == '0' && digits.contains('_'))
        throw new IllegalArgumentException(
          s"invalid literal `$s`: deprecated octal syntax — use 0o")
      Lit(deUnderscore(s).toLong)
    }

  // doubled quotes ('' / "") are the in-kind escape, as in the reference
  private def stringLit: Parser[Expr] =
    """'(''|\\.|[^'\\])*'""".r ^^ (s =>
      Lit(unescape(s.substring(1, s.length - 1).replace("''", "'")))) |
    """"(""|\\.|[^"\\])*"""".r ^^ (s =>
      Lit(unescape(s.substring(1, s.length - 1).replace("\"\"", "\""))))

  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        // (increments handled per-case below)
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 'b' => b.append('\b'); i += 2
          case 'f' => b.append('\f'); i += 2
          case 'u' if i + 5 < s.length => // \uXXXX BMP escape
            b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => b.append(other); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  private def literal: Parser[Expr] =
    K("NULL") ^^ (_ => Lit(null)) |
    K("TRUE") ^^ (_ => Lit(true)) |
    K("FALSE") ^^ (_ => Lit(false)) |
    numberLit | stringLit

  // ---- expressions (precedence ladder per oC_Expression) ----------------

  def expression: Parser[Expr] = orExpr

  private def orExpr: Parser[Expr] =
    xorExpr ~ rep(K("OR") ~> xorExpr) ^^ { case h ~ t => t.foldLeft(h)(BinOp("OR", _, _)) }

  private def xorExpr: Parser[Expr] =
    andExpr ~ rep(K("XOR") ~> andExpr) ^^ { case h ~ t => t.foldLeft(h)(BinOp("XOR", _, _)) }

  private def andExpr: Parser[Expr] =
    notExpr ~ rep(K("AND") ~> notExpr) ^^ { case h ~ t => t.foldLeft(h)(BinOp("AND", _, _)) }

  private def notExpr: Parser[Expr] =
    K("NOT") ~> notExpr ^^ (UnaryOp("NOT", _)) | comparison

  /** Chained comparisons `a < b <= c` become pairwise conjunctions, matching
    * the reference's desugaring (front-end ast rewrite). */
  private def comparison: Parser[Expr] =
    postfixPred ~ rep(("<>" | "<=" | ">=" | "=~" | "=" | "<" | ">") ~ postfixPred) ^^ {
      case h ~ Nil => h
      case h ~ t =>
        val operands = h +: t.map(_._2)
        val preds = t.zipWithIndex.map { case (op ~ _, i) =>
          val (l, r) = (operands(i), operands(i + 1))
          if (op == "=~") StringPred("=~", l, r) else BinOp(op, l, r): Expr
        }
        preds.reduce(BinOp("AND", _, _))
    }

  /** Cypher 5 type spec for `IS :: TYPE`: name [NOT NULL], LIST<...> nests. */
  private def typeSpec: Parser[(String, Boolean)] =
    typeNameP ~ opt(K("NOT") ~ K("NULL")) ^^ { case t ~ nn => (t, nn.isDefined) }

  private def typeNameP: Parser[String] =
    (K("LIST") ~> "<" ~> typeSpec <~ ">") ^^ {
      case (t, nn) => s"LIST<$t${if (nn) " NOT NULL" else ""}>" } |
    (K("LOCAL") ~ "(?i)datetime\\b".r) ^^ (_ => "LOCAL DATETIME") |
    (K("ZONED") ~ "(?i)datetime\\b".r) ^^ (_ => "ZONED DATETIME") |
    "[a-zA-Z]+".r ^^ (_.toUpperCase)

  /** `IS [NOT] [NFC|NFD|NFKC|NFKD] NORMALIZED` (reference
    * normalizeFunction rewrite: desugars to `e = normalize(e, form)`). */
  private def normalizedPred: Parser[Expr => Expr] =
    (K("IS") ~> opt(K("NOT")) ~
        opt(K("NFKC") | K("NFKD") | K("NFC") | K("NFD")) <~ K("NORMALIZED")) ^^ {
      case n ~ f => (e: Expr) => {
        val eq = BinOp("=", e,
          Func("normalize", Seq(e, Lit(f.getOrElse("NFC")))))
        if (n.isDefined) UnaryOp("NOT", eq) else eq
      }
    }

  /** IN / STARTS WITH / ENDS WITH / CONTAINS / IS [NOT] NULL / IS [NOT] ::
    * / IS [NOT] TYPED / bare :: / IS [NOT] NORMALIZED postfixes. */
  private def postfixPred: Parser[Expr] =
    addExpr ~ rep(
      K("IN") ~> addExpr ^^ (r => (e: Expr) => BinOp("IN", e, r)) |
      (K("STARTS") ~ K("WITH")) ~> addExpr ^^ (r => (e: Expr) => StringPred("STARTS WITH", e, r)) |
      (K("ENDS") ~ K("WITH")) ~> addExpr ^^ (r => (e: Expr) => StringPred("ENDS WITH", e, r)) |
      K("CONTAINS") ~> addExpr ^^ (r => (e: Expr) => StringPred("CONTAINS", e, r)) |
      ((K("IS") ~ K("NOT") ~ ("::" | K("TYPED"))) ~> typeSpec) ^^ (
        t => (e: Expr) => TypePredicate(e, t._1, t._2, negated = true)) |
      ((K("IS") ~ ("::" | K("TYPED"))) ~> typeSpec) ^^ (
        t => (e: Expr) => TypePredicate(e, t._1, t._2, negated = false)) |
      ("::" ~> typeSpec) ^^ (
        t => (e: Expr) => TypePredicate(e, t._1, t._2, negated = false)) |
      normalizedPred |
      (K("IS") ~ K("NOT") ~ K("NULL")) ^^ (_ => (e: Expr) => IsNull(e, negated = true)) |
      (K("IS") ~ K("NULL")) ^^ (_ => (e: Expr) => IsNull(e, negated = false)) |
      // `n:Label` / `n:A|B&!C` / chained `n:A:B` label-expression
      // predicate (HasLabels) — a chained `:` is the legacy colon
      // CONJUNCTION, which the mixing rules track
      not("::") ~> ":" ~> labelGroupExprPos ~
          rep(not("::") ~> ":" ~> labelGroupExprPos) ^^ {
        case g ~ more =>
          if (gpmDnf(g) || more.exists(gpmDnf)) markGpmLabels()
          if (more.nonEmpty) markColonConj()
          val dnf = (g +: more).reduce(andDnf)
          (e: Expr) => HasLabel(e, dnf) }
    ) ^^ { case h ~ fs => fs.foldLeft(h)((e, f) => f(e)) }

  private def addExpr: Parser[Expr] =
    mulExpr ~ rep(("||" | "+" | "-") ~ mulExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (l, op ~ r) => BinOp(op, l, r) }
    }

  private def mulExpr: Parser[Expr] =
    powExpr ~ rep(("*" | "/" | "%") ~ powExpr) ^^ {
      case h ~ t => t.foldLeft(h) { case (l, op ~ r) => BinOp(op, l, r) }
    }

  private def powExpr: Parser[Expr] =
    unaryExpr ~ rep("^" ~> unaryExpr) ^^ {
      case h ~ Nil => h
      case h ~ t => // right-associative
        val all = h +: t
        all.init.foldRight(all.last)(BinOp("^", _, _))
    }

  private def unaryExpr: Parser[Expr] =
    "-" ~> unaryExpr ^^ (UnaryOp("-", _)) |
    "+" ~> unaryExpr |
    postfixAtom

  /** `.prop`, `[idx]`, `[a..b]` postfixes on an atom. */
  private def postfixAtom: Parser[Expr] =
    atom ~ rep(
      ("{" ~> repsep(mapProjItem, ",") <~ "}") ^^ (
        items => (e: Expr) => MapProjection(e, items)) |
      "." ~> symName ^^ (k => (e: Expr) => Prop(e, k)) |
      ("[" ~> opt(expression) ~ (".." ~> opt(expression)) <~ "]") ^^ {
        case f ~ t => (e: Expr) => Slice(e, f, t)
      } |
      ("[" ~> expression <~ "]") ^^ (i => (e: Expr) => Index(e, i))
    ) ^^ { case h ~ fs => fs.foldLeft(h)((e, f) => f(e)) }

  private def mapProjItem: Parser[Either[String, (String, Expr)]] =
    ("." ~ "*") ^^ (_ => Left("*")) | // n{.*} — all properties
    "." ~> symName ^^ (Left(_)) |
    symName ~ (":" ~> expression) ^^ { case k ~ v => Right((k, v)) } |
    ident ^^ (v => Right((v, Variable(v)))) // {x} shorthand for {x: x}

  /** Cypher 5 extended CASE: with a subject, each WHEN may be a bare value
    * (equality), a comparison/IS NULL/IS ::/STARTS WITH/... applied to the
    * subject, or a comma list of such alternatives (OR). Desugared at parse
    * time into the generic predicate form, matching the reference's
    * normalizeCaseExpressions rewrite. */
  private def extWhenAlt: Parser[Expr => Expr] =
    (K("IS") ~ K("NOT") ~ K("NULL")) ^^ (_ => (s: Expr) => IsNull(s, negated = true)) |
    (K("IS") ~ K("NULL")) ^^ (_ => (s: Expr) => IsNull(s, negated = false)) |
    normalizedPred |
    ((K("IS") ~ K("NOT") ~ ("::" | K("TYPED"))) ~> typeSpec) ^^ (
      t => (s: Expr) => TypePredicate(s, t._1, t._2, negated = true)) |
    ((K("IS") ~ ("::" | K("TYPED"))) ~> typeSpec) ^^ (
      t => (s: Expr) => TypePredicate(s, t._1, t._2, negated = false)) |
    ("::" ~> typeSpec) ^^ (
      t => (s: Expr) => TypePredicate(s, t._1, t._2, negated = false)) |
    (K("STARTS") ~ K("WITH")) ~> addExpr ^^ (
      r => (s: Expr) => StringPred("STARTS WITH", s, r)) |
    (K("ENDS") ~ K("WITH")) ~> addExpr ^^ (
      r => (s: Expr) => StringPred("ENDS WITH", s, r)) |
    K("CONTAINS") ~> addExpr ^^ (r => (s: Expr) => StringPred("CONTAINS", s, r)) |
    K("IN") ~> addExpr ^^ (r => (s: Expr) => BinOp("IN", s, r)) |
    ("<>" | "<=" | ">=" | "=~" | "=" | "<" | ">") ~ addExpr ^^ {
      case op ~ r => (s: Expr) =>
        if (op == "=~") StringPred("=~", s, r) else BinOp(op, s, r)
    } |
    expression ^^ (v => (s: Expr) => BinOp("=", s, v))

  private def caseExpr: Parser[Expr] =
    K("CASE") ~> opt(not(K("WHEN")) ~> expression) >> {
      case None => // generic form: WHEN <predicate>
        rep1(K("WHEN") ~> expression ~ (K("THEN") ~> expression)) ~
          opt(K("ELSE") ~> expression) <~ K("END") ^^ {
          case whens ~ dflt =>
            CaseExpr(None, whens.map { case w ~ t => (w, t) }, dflt)
        }
      case Some(subj) => // subject form, incl. extended WHEN operators
        rep1(K("WHEN") ~> rep1sep(extWhenAlt, ",") ~ (K("THEN") ~> expression)) ~
          opt(K("ELSE") ~> expression) <~ K("END") ^^ {
          case whens ~ dflt =>
            CaseExpr(None, whens.map { case alts ~ t =>
              (alts.map(f => f(subj)).reduce(BinOp("OR", _, _)), t)
            }, dflt)
        }
    }

  private def existsExpr: Parser[Expr] =
    K("EXISTS") ~> "{" ~> opt(K("MATCH")) ~> rep1sep(pathPattern, ",") ~
        opt(K("WHERE") ~> expression) <~ "}" ^^ {
      case Seq(p) ~ w => PatternExists(p, w, negated = false)
      case ps ~ w => // comma-joined patterns: the full-query form
        SubqueryExpr("exists",
          Query(Seq(SingleQuery(Seq(MatchClause(false, ps, w)))), unionAll = false))
    } |
    // full-query body (multi-clause / WITH-starting / UNION — reference
    // ExistsExpression): outer variables implicitly in scope
    K("EXISTS") ~> "{" ~> query <~ "}" ^^ (q => SubqueryExpr("exists", q)) |
    K("EXISTS") ~> "(" ~> pathPattern <~ ")" ^^ (p => PatternExists(p, None, negated = false))

  private def countSubquery: Parser[Expr] =
    "(?i)count".r ~> "{" ~> opt(K("MATCH")) ~> rep1sep(pathPattern, ",") ~
      opt(K("WHERE") ~> expression) <~ "}" ^^ {
      case Seq(p) ~ w => PatternCount(p, w)
      case ps ~ w => // comma-joined patterns: the full-query form
        SubqueryExpr("count",
          Query(Seq(SingleQuery(Seq(MatchClause(false, ps, w)))), unionAll = false))
    } |
    "(?i)count".r ~> "{" ~> query <~ "}" ^^ (q => SubqueryExpr("count", q))


  private def iterPredicate: Parser[Expr] =
    ("""(?i)(all|any|none|single)""".r <~ "(") ~ ident ~ (K("IN") ~> expression) ~
      (K("WHERE") ~> expression) <~ ")" ^^ {
      case kind ~ v ~ l ~ p => IterPredicate(kind.toLowerCase, v, l, p)
    }

  private def reduceExpr: Parser[Expr] =
    "(?i)reduce".r ~> "(" ~> ident ~ ("=" ~> expression) ~ ("," ~> ident) ~
      (K("IN") ~> expression) ~ ("|" ~> expression) <~ ")" ^^ {
      case acc ~ init ~ v ~ l ~ step => Reduce(acc, init, v, l, step)
    }

  private def listComprehension: Parser[Expr] =
    "[" ~> ident ~ (K("IN") ~> expression) ~ opt(K("WHERE") ~> expression) ~
      opt("|" ~> expression) <~ "]" ^^ {
      case v ~ l ~ w ~ p => ListComprehension(v, l, w, p)
    }

  /** `[(a)-[:T]->(b) WHERE … | expr]` — starts with a node pattern, which
    * disambiguates it from list literals/comprehensions. An optional
    * leading `p =` names the path, projectable as `| p` (reference
    * PatternComprehension.projectNamedPath). */
  /** shortestPath((a)-[*]->(b)) in expression position — the argument is
    * a PATTERN, not an expression, so the generic funcCall cannot parse
    * it; tried before funcCall in the atom alternation. */
  private def shortestPathExpr: Parser[Expr] =
    "(?i)(allShortestPaths|shortestPath)".r ~ ("(" ~> pathPattern <~ ")") ^^ {
      case kw ~ p =>
        require(p.hops.nonEmpty,
          "shortestPath() takes a relationship pattern")
        ShortestPathExpr(p, kw.toLowerCase.startsWith("all"))
    }

  private def patternComprehension: Parser[Expr] =
    "[" ~> opt(ident <~ "=" <~ not("~")) ~ pathPattern ~
      opt(K("WHERE") ~> patCompWhere(expression)) ~
      ("|" ~> expression) <~ "]" ^^ {
      case pv ~ p ~ w ~ proj =>
        PatternComprehension(p.copy(name = pv.orElse(p.name)), w, proj)
    }

  private def collectSubquery: Parser[Expr] =
    "(?i)collect".r ~> "{" ~> opt(K("MATCH")) ~> pathPattern ~
      opt(K("WHERE") ~> expression) ~ (K("RETURN") ~> expression) ~
      opt(orderBy) ~ opt(skipP) ~ opt(limitP) <~ "}" ^^ {
      case p ~ w ~ proj ~ ob ~ sk ~ li =>
        // an AGGREGATING projection (`COLLECT { MATCH … RETURN count(x) }`)
        // is a full subquery, not a comprehension: the body aggregates to
        // one row per outer key (the planner's grouped-body pass)
        if (Planner.containsAgg(proj))
          SubqueryExpr("collect", Query(Seq(SingleQuery(Seq(
            MatchClause(optional = false, Seq(p), w),
            ReturnClause(false, Seq(ReturnItem(proj, None)),
              ob.getOrElse(Nil), sk, li)))), unionAll = false))
        else PatternComprehension(p, w, proj, ob.getOrElse(Nil), sk, li)
    } |
    // full-query body (reference CollectExpression): the inner query must
    // end in a single-item RETURN; yields the list of its values
    "(?i)collect".r ~> "{" ~> query <~ "}" ^^ (q => SubqueryExpr("collect", q))

  private def countStar: Parser[Expr] =
    "(?i)count\\s*\\(\\s*\\*\\s*\\)".r ^^ (_ => CountStar)

  /** SQL-style trim spec (Cypher 5): trim([BOTH|LEADING|TRAILING] [chars]
    * FROM input) — desugars onto the 2-arg trim/ltrim/rtrim functions. */
  private def trimSpecExpr: Parser[Expr] =
    "(?i)trim".r ~> "(" ~>
      opt("(?i)(BOTH|LEADING|TRAILING)\\b".r) ~
      opt(not(K("FROM")) ~> expression) ~
      (K("FROM") ~> expression) <~ ")" ^^ {
      case spec ~ chars ~ input =>
        // `$from`-suffixed internal names: the FROM grammar form mandates a
        // SINGLE trim character (reference error contract), while the plain
        // ltrim(s, chars)/rtrim/btrim function calls accept a char SET
        val fn = spec.map(_.toUpperCase) match {
          case Some("LEADING")  => "ltrim$from"
          case Some("TRAILING") => "rtrim$from"
          case _                => "trim$from"
        }
        Func(fn, input +: chars.toSeq, distinct = false)
    }

  private def funcCall: Parser[Expr] =
    // ALL is the explicit no-op set quantifier (`sum(ALL x)` = `sum(x)`)
    funcName ~ ("(" ~> opt(K("DISTINCT") ^^ (_ => true) |
        K("ALL") ~ not("(" | ",") ^^ (_ => false)) ~
      repsep(expression, ",") <~ ")") ^^ {
      case name ~ (d ~ args) => Func(name.toLowerCase, args, d.contains(true))
    }

  // parameter names are unambiguous after `$` — reserved words allowed
  // (`$skip`, `$limit` are idiomatic pagination parameters)
  private def param: Parser[Expr] = "$" ~> symName ^^ Param.apply

  private def listLit: Parser[Expr] =
    "[" ~> repsep(expression, ",") <~ "]" ^^ ListLit.apply

  private def mapLitExpr: Parser[Expr] = mapLit ^^ (m => MapLit(m))

  /** Bare pattern in expression position — `WHERE (c)-[:T]->(:Order)` —
    * is an existence predicate (reference rewriter
    * normalizeExistsPatternExpressions.scala). Requires ≥1 hop so plain
    * parenthesized expressions are untouched. */
  private def patternPredicate: Parser[Expr] =
    pathPattern ^? (
      { case p if p.hops.nonEmpty =>
        PatternExists(p, None, negated = false, bare = true) },
      _ => "single node is not a pattern predicate")

  private def atom: Parser[Expr] =
    literal | caseExpr | existsExpr | countStar | countSubquery |
    collectSubquery | iterPredicate | reduceExpr | trimSpecExpr |
    shortestPathExpr | funcCall | param |
    patternComprehension | listComprehension | listLit | mapLitExpr |
    patternPredicate |
    "(" ~> expression <~ ")" |
    ident ^^ Variable.apply

  // ---- patterns ---------------------------------------------------------

  private def mapLit: Parser[Seq[(String, Expr)]] =
    "{" ~> repsep(symName ~ (":" ~> expression), ",") <~ "}" ^^ (_.map { case k ~ v => (k, v) })

  // Cypher 5 / GQL label expressions as full boolean algebra over labels
  // (reference label-expression grammar): atoms (possibly !-negated,
  // % = any-label wildcard), & conjunction, | disjunction, parenthesized
  // sub-expressions and negated groups — normalized to DNF at parse time
  // (label expressions are tiny, distribution cannot blow up in practice).
  private type LabelDnf = Seq[Seq[LabelAtom]]
  private def andDnf(a: LabelDnf, b: LabelDnf): LabelDnf =
    for (x <- a; y <- b) yield x ++ y
  private def notDnf(d: LabelDnf): LabelDnf =
    d.foldLeft(Seq(Seq.empty[LabelAtom]): LabelDnf) { (acc, conj) =>
      andDnf(acc, conj.map(a => Seq(LabelAtom(a.name, !a.negated))))
    }
  private def labelUnary: Parser[LabelDnf] =
    "!" ~> labelUnary ^^ notDnf |
    "(" ~> labelExprDnf <~ ")" |
    ("%" | symName) ^^ (l => Seq(Seq(LabelAtom(l, negated = false))))
  private def labelConj: Parser[LabelDnf] =
    rep1sep(labelUnary, "&") ^^ (_.reduce(andDnf))
  // `|:` is the legacy alternation spelling; plain `|` the GQL one
  private def labelExprDnf: Parser[LabelDnf] =
    rep1sep(labelConj, "|" ~ opt(":")) ^^ (_.flatten)
  private def labelGroup: Parser[LabelDnf] = labelExprDnf

  /** true while parsing a pattern comprehension's WHERE, where a label
    * alternation's `| x` may actually be the comprehension's projection
    * bar (`[p = (n)-->() WHERE last(nodes(p)):End | p]`, reference
    * LabelExpressionAcceptance) */
  private var inPatCompWhere = false
  private def patCompWhere[T](p: Parser[T]): Parser[T] = Parser { in =>
    val old = inPatCompWhere
    inPatCompWhere = true
    try p(in) finally inPatCompWhere = old
  }
  /** fails when a just-parsed label alternation atom is directly followed
    * by `]` inside a pattern-comprehension WHERE — that atom was the
    * projection, not a label */
  private def barOk: Parser[Unit] = Parser { in =>
    if (!inPatCompWhere) Success((), in)
    else {
      val s = in.source.toString
      var i = in.offset
      while (i < s.length && s.charAt(i).isWhitespace) i += 1
      if (i < s.length && s.charAt(i) == ']')
        Failure("label alternation would swallow the projection bar", in)
      else Success((), in)
    }
  }
  /** label DNF at EXPRESSION postfix position: `|` continuations yield to
    * the comprehension projection bar when the alternation atom would end
    * the comprehension */
  private def labelGroupExprPos: Parser[LabelDnf] =
    labelConj ~ rep((("|" ~ opt(":")) ~> labelConj) <~ barOk) ^^ {
      case h ~ t => (h +: t).flatten
    }

  def nodePattern: Parser[NodePattern] =
    // `IS` directly followed by a label token is the GQL label INTRODUCER
    // (`(IS A&B)`), not a variable named `is`
    "(" ~> opt(not(K("IS") ~ ("%" | "!" | "(" | symName)) ~> ident) ~
      rep((":" ^^ (_ => false) | K("IS") ^^ (_ => true)) ~
        labelGroup ^^ { case is ~ g => (is, g) }) ~ opt(mapLit) ~
      opt(K("WHERE") ~> expression) <~ ")" ^^ {
      case v ~ groupsTagged ~ m ~ w =>
        val groups = groupsTagged.map(_._2)
        if (groups.size > 1) markColonConj()
        if (groupsTagged.exists(_._1) || groups.exists(gpmDnf))
          markGpmLabels()
        val simple = groups.forall(g =>
          g.size == 1 && g.head.forall(a => !a.negated && a.name != "%"))
        if (simple) // plain `:A:B` — AND of positive labels
          NodePattern(v, groups.flatMap(_.head.map(_.name)),
            m.getOrElse(Seq.empty), None, w)
        else {
          // AND the groups: distribute into one disjunction of conjunctions
          val dnf = groups.foldLeft(Seq(Seq.empty[LabelAtom])) { (acc, g) =>
            for (a <- acc; conj <- g) yield a ++ conj
          }
          NodePattern(v, Nil, m.getOrElse(Seq.empty), Some(dnf), w)
        }
    }

  /** Relationship type expression after `:`/`IS` — plain alternation
    * `A|B` stays a types list (index-friendly scan pruning); anything with
    * negation/%/parens/& compiles to a DNF filter over the single type. */
  private def relTypes: Parser[Either[Seq[String], Seq[Seq[LabelAtom]]]] =
    (":" ^^ (_ => false) | K("IS") ^^ (_ => true)) ~ labelExprDnf ^^ {
      case is ~ dnf =>
      if (is) markGpmLabels()
      if (dnf.forall(c => c.size == 1 && !c.head.negated && c.head.name != "%"))
        Left(dnf.map(_.head.name))
      else { markGpmLabels(); Right(dnf) }
    }

  private def varLength: Parser[(Int, Option[Int])] =
    "*" ~> opt("""\d+""".r) ~ opt(".." ~> opt("""\d+""".r)) ^^ {
      case lo ~ hi =>
        if (!mix.suppressVarLen) mix.varLength = true
        val min = lo.map(_.toInt)
        hi match {
          case None        => (min.getOrElse(1), min)              // * or *n (exact)
          case Some(upper) => (min.getOrElse(1), upper.map(_.toInt)) // *a..b / *..b / *a..
        }
    }

  private def relDetail: Parser[(Option[String], Either[Seq[String], Seq[Seq[LabelAtom]]], Option[(Int, Option[Int])], Seq[(String, Expr)], Option[Expr])] =
    "[" ~> opt(not(K("IS") ~ ("%" | "!" | "(" | symName)) ~> ident) ~
      opt(relTypes) ~ opt(varLength) ~ opt(mapLit) ~
      opt(K("WHERE") ~> expression) <~ "]" ^^ {
      case v ~ ts ~ vl ~ m ~ w =>
        (v, ts.getOrElse(Left(Seq.empty)), vl, m.getOrElse(Seq.empty), w)
    }

  def relPattern: Parser[RelPattern] =
    ("<-" ~> opt(relDetail) <~ "-") ^^ (d => mk(d, In)) |
    ("-" ~> opt(relDetail) <~ "->") ^^ (d => mk(d, Out)) |
    ("-" ~> opt(relDetail) <~ "-") ^^ (d => mk(d, Both))

  private def mk(d: Option[(Option[String], Either[Seq[String], Seq[Seq[LabelAtom]]], Option[(Int, Option[Int])], Seq[(String, Expr)], Option[Expr])],
      dir: Dir): RelPattern = d match {
    case Some((v, Left(ts), vl, m, w)) =>
      RelPattern(v, ts, dir, vl, m, where = w)
    case Some((v, Right(dnf), vl, m, w)) =>
      RelPattern(v, Seq.empty, dir, vl, m, where = w, typeExpr = Some(dnf))
    case None => RelPattern(None, Seq.empty, dir, None, Seq.empty)
  }

  /** Quantified path pattern `((x)-[r:T]->(y)){min,max}` / `+` / `*`
    * (GQL QPP, reference Trail): desugars to a RelPattern whose varLength is
    * the quantifier and whose qppVars carry the inner group variables. */
  private def qppQuantifier: Parser[(Int, Option[Int])] =
    ("{" ~> opt("""\d+""".r) ~ opt("," ~> opt("""\d+""".r)) <~ "}" ^^ {
      case lo ~ None      => val n = lo.map(_.toInt).getOrElse(1); (n, Some(n)) // {n}
      case lo ~ Some(hi)  => (lo.map(_.toInt).getOrElse(0), hi.map(_.toInt))   // {a,b}
    } |
    "+" ^^ (_ => (1, None)) |
    "*" ^^ (_ => (0, None))) ^^ { q =>
      mix.qpp = true
      // reference: lower bound <= upper bound, upper bound positive
      q._2.foreach { hi => require(hi >= 1 && hi >= q._1,
        s"quantifier upper bound must be positive and >= the lower bound, got {${q._1},$hi}") }
      q }

  /** Alternation between path shapes inside a quantified group:
    * `(-[:X]->() | -[:Y]->()-[:Z]->()){1,3}` — each branch a chain of
    * single or BOUNDED var-length hops (`-[:X*1..2]->`) starting from the
    * current node (GQL path-term alternation; reference NFA.scala
    * arbitrary regular path patterns). Desugars to a RelPattern carrying
    * the branches, quantified in branch traversals. */
  private def altBranch: Parser[Seq[(RelPattern, NodePattern)]] =
    Parser { in =>
      // bounded var-length hops INSIDE an alternation branch are part of
      // this engine's alternation extension, not legacy `*` syntax — they
      // must not trip the var-length×QPP mixing check
      val saved = mix.suppressVarLen
      mix.suppressVarLen = true
      try rep1(relPattern ~ nodePattern ^^ { case r ~ n => (r, n) })(in)
      finally mix.suppressVarLen = saved
    }

  private def altQppHop: Parser[((RelPattern, NodePattern), Boolean)] =
    ("(" ~> altBranch ~ rep1("|" ~> altBranch) <~ ")") ~ qppQuantifier ~
      opt(nodePattern) ^^ {
      case (b0 ~ bs) ~ q ~ nextOpt =>
        val next = nextOpt.getOrElse(NodePattern(None, Nil, Nil))
        val branches = b0 +: bs
        branches.flatten.foreach { case (r, _) =>
          require(r.varLength.forall(_._2.isDefined),
            "var-length hops inside an alternation need a bounded upper end")
        }
        ((RelPattern(None, Seq.empty, Out, Some(q), Seq.empty,
          branches = Some(branches)), next), nextOpt.isDefined)
    }

  private def qppHop: Parser[((RelPattern, NodePattern), Boolean)] = {
    val chainP = nodePattern ~ rep1(relPattern ~ nodePattern ^^ {
      case r ~ n => (r, n) })
    // the chain may carry its OWN paren level before a group WHERE —
    // `(((n)-[r]->(m)) WHERE n.p <= m.p)+` (GQL parenthesized path pattern)
    ("(" ~> (("(" ~> chainP <~ ")") | chainP) ~
      opt(K("WHERE") ~> expression) <~ ")") ~ qppQuantifier ~
      opt(nodePattern) ^^ {
      case (x ~ chain ~ w) ~ q ~ nextOpt =>
        val next = nextOpt.getOrElse(NodePattern(None, Nil, Nil))
        val (r0, y0) = chain.head
        val xPlain = x.labels.isEmpty && x.labelExpr.isEmpty &&
          x.props.isEmpty && x.where.isEmpty
        val simpleInner = chain.size == 1 && w.isEmpty && xPlain &&
          r0.varLength.isEmpty && y0.labels.isEmpty && y0.labelExpr.isEmpty &&
          y0.props.isEmpty && y0.where.isEmpty
        if (simpleInner) {
          // plain one-hop group: the original qppVars encoding (group
          // variables bind to per-path arrays)
          ((r0.copy(varLength = Some(q),
            qppVars = Some((x.variable, r0.variable, y0.variable))), next),
            nextOpt.isDefined)
        } else {
          // multi-hop chains and constrained interior nodes compile as a
          // SINGLE-BRANCH alternation: whole-chain composite edges with
          // per-hop boundary constraints (labels/props/inline WHERE on
          // interior nodes ride on the chain's node patterns); a
          // constrained LEADING node rides on headNode and filters each
          // traversal's start
          chain.foreach { case (r, _) =>
            require(r.varLength.forall(_._2.isDefined),
              "var-length hops inside a quantified group need a bounded " +
                "upper end")
          }
          // a trailing group WHERE naming only the LAST inner node folds
          // into that node's inline predicate; one naming only the HEAD
          // folds into the leading node (applied per iteration start)
          var x2 = x
          var gw: Option[Expr] = None
          val chain2 = w match {
            case None => chain
            case Some(pred) =>
              val lastVar = chain.last._2.variable
              val idents = exprIdents(pred)
              val groupVars = (x.variable ++
                chain.flatMap(c => c._2.variable) ++
                chain.flatMap(c => c._1.variable)).toSet
              if (lastVar.isDefined && idents.subsetOf(Set(lastVar.get)))
                chain.init :+ (chain.last._1,
                  chain.last._2.copy(where = Some(pred)))
              else if (x.variable.isDefined &&
                  idents.subsetOf(Set(x.variable.get))) {
                x2 = x.copy(where = Some(
                  x.where.fold(pred)(w0 => BinOp("AND", w0, pred))))
                chain
              } else {
                // multi-variable group WHERE filters every traversal of
                // the composite edge set (planner branchEdges); one that
                // references NON-LOCAL singletons (`WHERE a.h > x.h`, GQL
                // cross-iteration references) defers to a per-iteration
                // post-filter over the group arrays (planner
                // expandComposite) — the planner validates scoping
                gw = Some(pred)
                chain
              }
          }
          // inline node WHEREs that read OTHER iteration variables
          // (`(b WHERE a.age < b.age)`, reference GpmTests) lift into the
          // group WHERE — per-node boundary sets compile in isolation
          val chain3 = chain2.map { case (r0, n0) =>
            n0.where match {
              case Some(wn)
                  if !exprIdents(wn).subsetOf(n0.variable.toSet) =>
                gw = Some(gw.fold(wn)(g0 => BinOp("AND", g0, wn)))
                (r0, n0.copy(where = None))
              case _ => (r0, n0)
            }
          }
          x2.where.filter(wh =>
              !exprIdents(wh).subsetOf(x2.variable.toSet)).foreach { wh =>
            gw = Some(gw.fold(wh)(g0 => BinOp("AND", g0, wh)))
            x2 = x2.copy(where = None)
          }
          ((RelPattern(None, Seq.empty, Out, Some(q), Seq.empty,
            branches = Some(Seq(chain3)),
            headNode = Some(x2), groupWhere = gw), next),
            nextOpt.isDefined)
        }
    }
  }

  /** identifiers syntactically referenced by an expression (parser-side
    * conservative walk for the quantified-group WHERE restriction). */
  private def exprIdents(e: Expr): Set[String] = e match {
    case Variable(v)       => Set(v)
    case Prop(s, _)        => exprIdents(s)
    case Func(_, args, _)  => args.flatMap(exprIdents).toSet
    case BinOp(_, l, r)    => exprIdents(l) ++ exprIdents(r)
    case UnaryOp(_, o)     => exprIdents(o)
    case IsNull(o, _)      => exprIdents(o)
    case HasLabel(o, _)    => exprIdents(o)
    case StringPred(_, l, r) => exprIdents(l) ++ exprIdents(r)
    case ListLit(xs)       => xs.flatMap(exprIdents).toSet
    case Index(b, i)       => exprIdents(b) ++ exprIdents(i)
    // a pattern predicate references its pattern's named elements (anon
    // and locally-introduced ones over-approximate, which only makes the
    // head/tail fold more conservative)
    case PatternExists(p, w, _, _) =>
      ((p.first +: p.hops.map(_._2)).flatMap(_.variable) ++
        p.hops.flatMap(_._1.variable)).toSet ++
        w.map(exprIdents).getOrElse(Set.empty)
    case PatternCount(p, w) =>
      ((p.first +: p.hops.map(_._2)).flatMap(_.variable) ++
        p.hops.flatMap(_._1.variable)).toSet ++
        w.map(exprIdents).getOrElse(Set.empty)
    case PatternComprehension(p, w, proj, ob, sk, li) =>
      ((p.first +: p.hops.map(_._2)).flatMap(_.variable) ++
        p.hops.flatMap(_._1.variable)).toSet ++
        w.map(exprIdents).getOrElse(Set.empty) ++ exprIdents(proj) ++
        ob.flatMap(s => exprIdents(s.expr)) ++
        sk.map(exprIdents).getOrElse(Set.empty) ++
        li.map(exprIdents).getOrElse(Set.empty)
    // a full-query subquery expression may reference anything from the
    // outer scope — over-approximate with every identifier it mentions
    case SubqueryExpr(_, q) =>
      q.parts.flatMap(_.clauses).flatMap {
        case WithClause(_, items, _, _, _, w) =>
          items.flatMap(i => exprIdents(i.expr)) ++
            w.toSeq.flatMap(exprIdents)
        case ReturnClause(_, items, _, _, _) =>
          items.flatMap(i => exprIdents(i.expr))
        case MatchClause(_, ps, w, _, _) =>
          ps.flatMap(p => (p.first +: p.hops.map(_._2)).flatMap(_.variable) ++
            p.hops.flatMap(_._1.variable)) ++ w.toSeq.flatMap(exprIdents)
        case _ => Nil
      }.toSet
    case MapLit(es)        => es.flatMap(kv => exprIdents(kv._2)).toSet
    case Slice(l, f, t)    => exprIdents(l) ++
      f.map(exprIdents).getOrElse(Set.empty) ++
      t.map(exprIdents).getOrElse(Set.empty)
    case TypePredicate(o, _, _, _) => exprIdents(o)
    case CaseExpr(s, ws, d) =>
      s.map(exprIdents).getOrElse(Set.empty) ++
        ws.flatMap(w => exprIdents(w._1) ++ exprIdents(w._2)) ++
        d.map(exprIdents).getOrElse(Set.empty)
    // lambda forms: the binder is local, everything else escapes
    case IterPredicate(_, v, l, pr) => exprIdents(l) ++ (exprIdents(pr) - v)
    case Reduce(a, init, v, l, st)  =>
      exprIdents(init) ++ exprIdents(l) ++ (exprIdents(st) - a - v)
    case ListComprehension(v, l, w, pr) =>
      exprIdents(l) ++ (w.map(exprIdents).getOrElse(Set.empty) ++
        pr.map(exprIdents).getOrElse(Set.empty) - v)
    case MapProjection(s, items) =>
      exprIdents(s) ++ items.flatMap {
        case Right((_, x)) => exprIdents(x); case _ => Set.empty[String] }
    case _                 => Set.empty
  }

  /** GQL quantified relationship `-[:T]->+` / `->*` / `->{a,b}` — shorthand
    * for the one-hop QPP, desugared onto varLength like `*a..b`. */
  private def quantifiedRelHop: Parser[((RelPattern, NodePattern), Boolean)] =
    relPattern ~ qppQuantifier ~ opt(nodePattern) ^^ {
      case r ~ q ~ n =>
        require(r.varLength.isEmpty, "nested quantifiers are not supported")
        // qppVars marks the hop as a quantified RELATIONSHIP (GPM syntax),
        // distinguishing `-[:R]->+` from legacy `-[:R*]->`
        ((r.copy(varLength = Some(q),
          qppVars = r.qppVars.orElse(Some((None, None, None)))),
          n.getOrElse(NodePattern(None, Nil, Nil))), n.isDefined)
    }

  def pathPattern: Parser[PathPattern] = {
    val hop: Parser[((RelPattern, NodePattern), Boolean)] =
      altQppHop | qppHop | quantifiedRelHop |
      relPattern ~ nodePattern ^^ { case r ~ n => ((r, n), true) }
    nodePattern ~ rep(hop) ^^ {
      case first ~ hops => PathPattern(first, hops.map(_._1))
    } |
    // leading quantified group with no anchor node (`MATCH ((a)-->(b))+ (x)`)
    // — GQL juxtaposition implies an anonymous endpoint. A path written
    // with NO node pattern at all and an all-optional minimum (every
    // quantifier min 0) could match zero nodes — the reference raises
    // ("Top level path must have a minimum length > 0").
    rep1(hop) ^^ { hops =>
      val minLen = hops.map { case ((r, _), _) =>
        r.varLength.map(_._1).getOrElse(1) }.sum
      require(minLen > 0 || hops.exists(_._2),
        "a top-level path pattern must have a minimum length greater " +
          "than 0 (add a node pattern or a positive lower bound)")
      PathPattern(NodePattern(None, Nil, Nil), hops.map(_._1))
    }
  }

  // ---- clauses ----------------------------------------------------------

  /** The pattern a GQL selector applies to: plain, or PARENTHESIZED with
    * an optional inner path naming and an optional path-pattern WHERE —
    * `ANY SHORTEST (p = (a)-->+(b) WHERE …)` (reference
    * ParenthesizedPath). Returns (innerName, pattern, where). */
  private def selGroup: Parser[(Option[String], PathPattern, Option[Expr])] =
    // the pattern itself may sit in ANOTHER paren level —
    // `(p = ((start)((a)-[r]->(b))+(end)) WHERE length(p) > 3)` (GQL
    // parenthesized path pattern with a whole-path pre-filter)
    ("(" ~> opt(ident <~ "=") ~
        (("(" ~> pathPattern <~ ")") | pathPattern) ~
        opt(K("WHERE") ~> expression) <~ ")") ^^ {
      case n ~ p ~ w => (n, p, w)
    } |
    pathPattern ^^ (p => (None, p, None))

  private def noise = opt(K("PATH") | K("PATHS"))

  private def shortestPart: Parser[ShortestPart] =
    opt(ident <~ "=") ~ "(?i)(allShortestPaths|shortestPath)".r ~
      ("(" ~> pathPattern <~ ")") ^^ {
      case v ~ kw ~ p =>
        mix.legacyShortest = true
        require(p.hops.forall { case (r, _) =>
          r.qppVars.isEmpty && r.branches.isEmpty },
          "shortestPath()/allShortestPaths() cannot be applied to a " +
            "quantified path pattern")
        ShortestPart(v, p, kw.toLowerCase.startsWith("all"), legacy = true)
    } |
    // GQL path selectors (reference StatefulShortestPath selectors):
    // ANY SHORTEST [PATH[S]] ≡ SHORTEST 1; ALL SHORTEST ≡ allShortestPaths;
    // SHORTEST k [PATH[S]] [GROUP[S]]
    opt(ident <~ "=") ~ (K("ANY") ~> K("SHORTEST") ~> noise ~> selGroup) ^^ {
      case v ~ ((n, p, w)) =>
        mix.selector = true
        ShortestPart(v.orElse(n), p, all = false, k = Some(1), where = w)
    } |
    opt(ident <~ "=") ~ (K("ALL") ~> K("SHORTEST") ~> noise ~> selGroup) ^^ {
      case v ~ ((n, p, w)) =>
        mix.selector = true
        ShortestPart(v.orElse(n), p, all = true, where = w)
    } |
    opt(ident <~ "=") ~ (K("SHORTEST") ~> """\d+""".r) ~
      (noise ~> opt(K("GROUPS") | K("GROUP"))) ~ selGroup ^^ {
      case v ~ kk ~ g ~ ((n, p, w)) =>
        mix.selector = true
        ShortestPart(v.orElse(n), p, all = false, k = Some(kk.toInt),
          groups = g.isDefined, where = w)
    } |
    // SHORTEST [PATH] GROUP without a count: k = 1 (reference selector
    // grammar `SHORTEST UNSIGNED_DECIMAL_INTEGER? PATH? GROUP`)
    opt(ident <~ "=") ~ (K("SHORTEST") ~> noise ~>
      (K("GROUPS") | K("GROUP")) ~> selGroup) ^^ {
      case v ~ ((n, p, w)) =>
        mix.selector = true
        ShortestPart(v.orElse(n), p, all = false, k = Some(1), groups = true,
          where = w)
    } |
    // ANY [k] [PATH]: "any k paths" — satisfied deterministically by the
    // k shortest (the reference leaves the choice to the implementation)
    opt(ident <~ "=") ~ (K("ANY") ~> opt("""\d+""".r)) ~
      (noise ~> selGroup) ^^ {
      case v ~ kk ~ ((n, p, w)) =>
        mix.selector = true
        ShortestPart(v.orElse(n), p, all = false,
          k = Some(kk.map(_.toInt).getOrElse(1)), where = w)
    }

  /** `p = (a)-[r]->(b)` — plain named path (reference ProjectNamedPath).
    * An `ALL [PATH]` selector prefix is the explicit spelling of the
    * default MATCH semantics (reference selector grammar `ALL PATH?`). */
  private def namedPathPattern: Parser[PathPattern] =
    opt(ident <~ "=") ~ (opt(K("ALL") ~ opt(K("PATH") | K("PATHS"))) ~>
      pathPattern) ^^ { case n ~ p => p.copy(name = n) }

  /** Planner hints (reference UsingIndexHint/UsingScanHint/UsingJoinHint):
    * accepted for source compatibility and ignored — scan and join choices
    * are delegated to Catalyst/AQE costing (documented divergence). */
  private def usingHint: Parser[Unit] =
    K("USING") ~> (
      (K("INDEX") ~ opt(K("SEEK")) ~ ident ~ ":" ~ symName ~ "(" ~
        rep1sep(symName, ",") ~ ")") ^^ (_ => ()) |
      (K("SCAN") ~ ident ~ ":" ~ symName) ^^ (_ => ()) |
      (K("JOIN") ~ K("ON") ~ rep1sep(ident, ",")) ^^ (_ => ()))

  /** GQL match modes: `REPEATABLE ELEMENTS` relaxes relationship
    * uniqueness for the MATCH; `DIFFERENT NODES` adds pairwise node
    * distinctness. `DIFFERENT RELATIONSHIPS` spells out the DEFAULT
    * semantics (relationship uniqueness only, NO node distinctness —
    * reference MatchMode.DifferentRelationships is the implicit mode),
    * so it parses to a distinct token the planner treats as default.
    * All are GPM-side on the selector mixing axis. */
  private def matchMode: Parser[String] =
    (K("REPEATABLE") ~ (K("ELEMENTS") | K("ELEMENT"))) ^^ { _ =>
      mix.selector = true; "repeatable" } |
    (K("DIFFERENT") ~ (K("NODES") | K("NODE"))) ^^ { _ =>
      mix.selector = true; "different" } |
    (K("DIFFERENT") ~ (K("RELATIONSHIPS") | K("RELATIONSHIP"))) ^^ { _ =>
      mix.selector = true; "diffrels" }

  private def matchClause: Parser[Clause] =
    opt(K("OPTIONAL")) ~ (K("MATCH") ~> opt(matchMode)) ~
      rep1sep(shortestPart ^^ (Left(_)) | namedPathPattern ^^ (Right(_)), ",") ~
      (rep(usingHint) ~> opt(K("WHERE") ~> expression)) ^^ {
      case o ~ mode ~ parts ~ w =>
        MatchClause(o.isDefined, parts.collect { case Right(p) => p }, w,
          parts.collect { case Left(s) => s },
          mode = mode.getOrElse(""))
    }

  private def unwindClause: Parser[Clause] =
    K("UNWIND") ~> expression ~ (K("AS") ~> aliasName) ^^ {
      case e ~ a => UnwindClause(e, a)
    }

  /** Capture the raw consumed source text of an expression — unaliased
    * return items surface under their original text (reference semantics:
    * `RETURN type(r)` yields a column literally named `type(r)`). */
  private def sourced(p: Parser[Expr]): Parser[(Expr, String)] = Parser { in =>
    p(in) match {
      case Success(t, rest) =>
        val raw = in.source.subSequence(in.offset, rest.offset).toString.trim
        Success((t, raw), rest)
      case ns: NoSuccess => ns
    }
  }

  private def returnItem: Parser[ReturnItem] =
    "*" ~ guard("," | not(expression)) ^^ (_ => ReturnItem(Variable("*"), None)) |
    sourced(expression) ~ opt(K("AS") ~> aliasName) ^^ {
      case (e, src) ~ a =>
        ReturnItem(e, a, if (a.isEmpty) Some(src) else None)
    }

  private def sortItem: Parser[SortItem] =
    expression ~ opt(K("ASCENDING") | K("ASC") | K("DESCENDING") | K("DESC")) ^^ {
      case e ~ d => SortItem(e, !d.exists(x => x == "DESC" || x == "DESCENDING"))
    }

  private def orderBy: Parser[Seq[SortItem]] =
    K("ORDER") ~> K("BY") ~> rep1sep(sortItem, ",")

  private def skipP: Parser[Expr] = K("SKIP") ~> expression
  private def limitP: Parser[Expr] = K("LIMIT") ~> expression

  private def withClause: Parser[Clause] =
    K("WITH") ~> opt(K("DISTINCT")) ~ rep1sep(returnItem, ",") ~
      opt(orderBy) ~ opt(skipP) ~ opt(limitP) ~ opt(K("WHERE") ~> expression) ^^ {
      case d ~ items ~ ob ~ sk ~ li ~ w =>
        WithClause(d.isDefined, items, ob.getOrElse(Seq.empty), sk, li, w)
    }

  private def returnClause: Parser[Clause] =
    K("RETURN") ~> opt(K("DISTINCT")) ~ rep1sep(returnItem, ",") ~
      opt(orderBy) ~ opt(skipP) ~ opt(limitP) ^^ {
      case d ~ items ~ ob ~ sk ~ li =>
        ReturnClause(d.isDefined, items, ob.getOrElse(Seq.empty), sk, li)
    }

  // ---- write clauses ----------------------------------------------------

  private def setItem: Parser[SetItem] =
    ident ~ ("+=" ~> expression) ^^ {
      case v ~ e => SetPropsFromMap(v, e, additive = true)
    } |
    ident ~ ("." ~> symName) ~ ("=" ~> expression) ^^ {
      case v ~ k ~ e => SetProp(v, k, e)
    } |
    ident ~ ("=" ~> expression) ^^ {
      case v ~ e => SetPropsFromMap(v, e, additive = false)
    } |
    // `SET n:A:B` / GQL `SET n IS A` — `&`-conjoined positives also parse
    ident ~ rep1((":" ^^ (_ => false) | K("IS") ^^ (_ => true)) ~
        rep1sep(symName, "&") ^^ { case is ~ g => (is, g) }) ^^ {
      case v ~ tagged =>
        val ls = tagged.map(_._2)
        if (ls.size > 1) { mix.usage = 2; markColonConj(); mix.usage = 1 }
        if (tagged.exists(_._1) || ls.exists(_.size > 1)) {
          mix.usage = 2; markGpmLabels(); mix.usage = 1
        }
        SetLabelsItem(v, ls.flatten) }

  private def removeItem: Parser[SetItem] =
    ident ~ ("." ~> symName) ^^ { case v ~ k => RemoveProp(v, k) } |
    // `REMOVE (<expr>).prop` / `REMOVE ([…][0]).prop` — an entity-valued
    // expression subject (reference RemoveAcceptance visibility scenarios)
    ("(" ~> expression <~ ")") ~ ("." ~> symName) ^^ {
      case e ~ k => RemovePropExpr(e, k) } |
    (patternComprehension | listComprehension) ~
        opt("[" ~> expression <~ "]") ~ ("." ~> symName) ^^ {
      case e ~ idx ~ k =>
        RemovePropExpr(idx.fold(e)(i => Index(e, i)), k) } |
    ident ~ rep1((":" ^^ (_ => false) | K("IS") ^^ (_ => true)) ~
        rep1sep(symName, "&") ^^ { case is ~ g => (is, g) }) ^^ {
      case v ~ tagged =>
        val ls = tagged.map(_._2)
        if (ls.size > 1) { mix.usage = 2; markColonConj(); mix.usage = 1 }
        if (tagged.exists(_._1) || ls.exists(_.size > 1)) {
          mix.usage = 2; markGpmLabels(); mix.usage = 1
        }
        RemoveLabelsItem(v, ls.flatten) }

  /** CREATE, plus the GQL-conformance `INSERT` spelling (reference
    * insertClause): same pattern surface — `&`-conjoined positive labels
    * already parse through labelGroup and collapse to a plain label list. */
  private def createClause: Parser[Clause] =
    (K("CREATE") ^^ (_ => false) | K("INSERT") ^^ (_ => true)) ~
      inUsage(2)(rep1sep(opt(ident <~ "=") ~ pathPattern ^^ {
        case n ~ p => p.copy(name = n.orElse(p.name)) }, ",")) ^^ {
        case ins ~ ps => CreateClause(ps, insert = ins)
      }

  private def mergeClause: Parser[Clause] =
    K("MERGE") ~> inUsage(3)(opt(ident <~ "=") ~ pathPattern ^^ {
      case n ~ p => p.copy(name = n) }) ~
      rep((K("ON") ~ K("MATCH") ~ K("SET")) ~> rep1sep(setItem, ",") ^^ (("m", _)) |
          (K("ON") ~ K("CREATE") ~ K("SET")) ~> rep1sep(setItem, ",") ^^ (("c", _))) ^^ {
      case p ~ actions =>
        MergeClause(p,
          actions.collect { case ("m", is) => is }.flatten,
          actions.collect { case ("c", is) => is }.flatten)
    }

  private def setClause: Parser[Clause] =
    K("SET") ~> rep1sep(setItem, ",") ^^ SetClause.apply

  private def removeClause: Parser[Clause] =
    K("REMOVE") ~> rep1sep(removeItem, ",") ^^ RemoveClause.apply

  /** `[DETACH|NODETACH] DELETE` — NODETACH (reference deleteClause) is the
    * explicit spelling of the default: error on attached relationships. */
  private def deleteClause: Parser[Clause] =
    // DELETE null is legal and a no-op (deleting NO_VALUE does nothing in
    // the reference); non-variable targets are entity-valued expressions
    // (`DELETE (COLLECT {…}[0])`, `DETACH DELETE [comprehension][0]`)
    opt(K("DETACH") | K("NODETACH")) ~
      (K("DELETE") ~> rep1sep(expression, ",")) ^^ {
      case d ~ targets =>
        val vars = targets.collect { case Variable(v) => v }
        val exprs = targets.filter {
          case Variable(_) | Lit(null) => false
          case _ => true
        }
        DeleteClause(vars, d.contains("DETACH"), exprs)
    }

  private def foreachClause: Parser[Clause] =
    K("FOREACH") ~> "(" ~> ident ~ (K("IN") ~> expression) ~
      ("|" ~> rep1(writeClause)) <~ ")" ^^ {
      case v ~ l ~ us => ForeachClause(v, l, us)
    }

  private def writeClause: Parser[Clause] =
    createClause | mergeClause | setClause | removeClause | deleteClause |
      foreachClause

  // ---- schema commands (CREATE INDEX/CONSTRAINT, DROP, SHOW) -------------

  private def schemaTarget: Parser[(String, String)] =
    (K("FOR") ~> "(" ~> ident ~ (":" ~> symName) <~ ")") >> { case v ~ label =>
      (K("REQUIRE") | K("ON")) ~> opt("(") ~> (ident <~ ".") ~ symName <~ opt(")") ^? (
        { case v2 ~ prop if v2 == v => (label, prop) },
        { case v2 ~ _ => s"schema command variable mismatch: $v vs $v2" })
    }

  private def createConstraintClause: Parser[Clause] =
    // the name is optional (`CREATE CONSTRAINT FOR (p:Person) REQUIRE …`);
    // an unnamed schema command gets a deterministic generated name, like
    // the reference's generated constraint names
    (K("CREATE") ~> K("CONSTRAINT") ~> opt(not(K("FOR")) ~> ident)) ~
      schemaTarget ~
      (K("IS") ~> (K("UNIQUE") ^^ (_ => "unique") |
        (K("NOT") ~ K("NULL")) ^^ (_ => "exists") |
        (K("NODE") ~ K("KEY")) ^^ (_ => "node_key"))) ^^ {
      case name ~ ((label, prop)) ~ kind =>
        CreateConstraintClause(name.getOrElse(s"constraint_${label}_$prop"),
          label, prop, kind)
    }

  /** `CREATE [RANGE|TEXT|POINT|VECTOR|FULLTEXT] INDEX name FOR (n:Label)
    * ON (n.prop) [OPTIONS {…}]` — typed indexes per the reference
    * (SchemaLogicalPlan CreateIndex index types; CREATE VECTOR INDEX per
    * VectorIndexProcedures). OPTIONS (e.g. vector dimensions/similarity)
    * parse and are advisory — the columnar layouts don't need them. */
  private def createIndexClause: Parser[Clause] =
    (K("CREATE") ~> opt(
      K("RANGE") ^^ (_ => "range") | K("TEXT") ^^ (_ => "text") |
      K("POINT") ^^ (_ => "point") | K("VECTOR") ^^ (_ => "vector") |
      K("FULLTEXT") ^^ (_ => "fulltext"))) ~
      (K("INDEX") ~> opt(not(K("FOR")) ~> ident)) ~ schemaTarget ~
      opt(K("OPTIONS") ~> mapLit) ^^ {
      case kind ~ name ~ ((label, prop)) ~ _ =>
        CreateIndexClause(name.getOrElse(s"index_${label}_$prop"),
          label, prop, kind.getOrElse("range"))
    }

  private def dropSchemaClause: Parser[Clause] =
    K("DROP") ~> (K("INDEX") ^^ (_ => true) | K("CONSTRAINT") ^^ (_ => false)) ~ ident ^^ {
      case isIndex ~ name => DropSchemaClause(isIndex, name)
    }

  private def showSchemaClause: Parser[Clause] =
    K("SHOW") ~> (K("INDEXES") ^^ (_ => "indexes") |
      K("CONSTRAINTS") ^^ (_ => "constraints") |
      K("PROCEDURES") ^^ (_ => "procedures") |
      K("FUNCTIONS") ^^ (_ => "functions")) ^^ ShowSchemaClause.apply

  private def schemaClause: Parser[Clause] =
    createConstraintClause | createIndexClause | dropSchemaClause | showSchemaClause

  /** `IN [k] CONCURRENT TRANSACTIONS`: k is a scheduler hint in the
    * reference (worker-pool width) — parsed and validated, not needed
    * here: Spark's parallelism lives inside each distributed batch job. */
  private def callSubquery: Parser[Clause] =
    opt(K("OPTIONAL")) ~ (K("CALL") ~> "{" ~> query <~ "}") ~
      opt(K("IN") ~> opt("""\d+""".r) ~ opt(K("CONCURRENT")) ~
        (K("TRANSACTIONS") ~>
          opt(K("OF") ~> expression <~ (K("ROWS") | K("ROW"))) ~
          opt(K("ON") ~> K("ERROR") ~> (K("CONTINUE") ^^ (_ => "continue") |
            K("BREAK") ^^ (_ => "break") | K("FAIL") ^^ (_ => "fail"))) ~
          opt(K("REPORT") ~> K("STATUS") ~> K("AS") ~> ident))) ^^ {
      case o ~ q ~ None => CallSubquery(q, optional = o.isDefined)
      case o ~ q ~ Some(conc ~ isConc ~ (size ~ onErr ~ status)) =>
        require(conc.isEmpty || isConc.isDefined,
          "a transaction concurrency needs the CONCURRENT keyword: " +
            "IN <n> CONCURRENT TRANSACTIONS") // reference default: 1000 rows
        // literal batch size resolves here; any other expression is
        // constant-folded by the planner (reference accepts expressions)
        val (szLit, szExpr) = size match {
          case None              => (Some(1000L), None)
          case Some(Lit(l: Long)) => (Some(l), None)
          case Some(e)           => (None, Some(e))
        }
        CallSubquery(q, szLit,
          optional = o.isDefined, onError = onErr.getOrElse("fail"),
          statusVar = status, concurrent = isConc.isDefined,
          inTransactionsOfExpr = szExpr)
    }

  private def callClause: Parser[Clause] =
    K("CALL") ~> funcName ~ opt("(" ~> repsep(expression, ",") <~ ")") ~
      opt(K("YIELD") ~> rep1sep(ident, ",") ~ opt(K("WHERE") ~> expression)) ^^ {
      case name ~ args ~ ys =>
        CallClause(name, args.getOrElse(Seq.empty),
          ys.map(_._1).getOrElse(Seq.empty), ys.flatMap(_._2))
    }

  private def finishClause: Parser[Clause] =
    K("FINISH") ^^ (_ => FinishClause())

  /** `LOAD CSV [WITH HEADERS] FROM <url> AS row [FIELDTERMINATOR ';']`
    * (reference LoadCSV, LogicalPlan.scala:2581) */
  private def loadCsvClause: Parser[Clause] =
    K("LOAD") ~> K("CSV") ~> opt(K("WITH") ~ K("HEADERS")) ~
      (K("FROM") ~> expression) ~ (K("AS") ~> aliasName) ~
      opt(K("FIELDTERMINATOR") ~> stringLit) ^^ {
      case h ~ u ~ a ~ t =>
        LoadCsvClause(h.isDefined, u, a,
          t.collect { case Lit(s: String) => s })
    }

  private def clause0: Parser[Clause] =
    matchClause | unwindClause | schemaClause | writeClause | callSubquery |
      callClause | withClause | returnClause | loadCsvClause | finishClause

  /** Top-level clause with the GPM syntax-mixing check: the mixing scope
    * is ONE top-level clause INCLUDING any subqueries nested in it
    * (GpmSyntaxMixingAcceptance: "different statements - OK" across
    * top-level clauses, "within a CALL subquery - syntax error" across the
    * body clauses of one CALL). */
  private def clause: Parser[Clause] = Parser { in =>
    if (mix.depth == 0) resetMixFlags()
    mix.depth += 1
    val res =
      try clause0(in)
      finally mix.depth -= 1
    res match {
      case s @ Success(_, _) => if (mix.depth == 0) checkMixFlags(); s
      case ns => ns
    }
  }

  private def singleQuery: Parser[SingleQuery] = rep1(clause) ^^ SingleQuery.apply

  private def query: Parser[Query] =
    singleQuery ~ rep((K("UNION") ~>
        opt(K("ALL") | K("DISTINCT") ^^ (_ => "DISTINCT"))) ~ singleQuery) ^^ {
      case h ~ Nil => Query(Seq(h), unionAll = false)
      case h ~ t =>
        // UNION DISTINCT is the explicit spelling of plain UNION
        val alls = t.map { case a ~ _ => a.contains("ALL") }.distinct
        require(alls.size == 1, "mixing UNION and UNION ALL is not supported")
        Query(h +: t.map { case _ ~ q => q }, unionAll = alls.head)
    }

  /** Parse a full query; throws IllegalArgumentException with position info
    * on syntax errors. */
  /** A group variable (bound inside a quantified path pattern) may appear
    * in exactly ONE quantified group and never as a singleton pattern
    * variable (reference: "A group variable can only appear in a single
    * quantified path pattern"; expression reuse — equijoins — is fine). */
  private def validateGroupVars(q: Query): Unit = {
    val groupVars = scala.collection.mutable.ListBuffer.empty[String]
    val singletons = scala.collection.mutable.ListBuffer.empty[String]
    def nodeVars(n: NodePattern): Seq[String] = n.variable.toSeq
    def branchVars(bs: Seq[Seq[(RelPattern, NodePattern)]]): Seq[String] =
      bs.flatten.flatMap { case (r, n) => r.variable.toSeq ++ nodeVars(n) }
    def walkPath(p: PathPattern): Unit = {
      singletons ++= nodeVars(p.first)
      p.hops.foreach { case (r, n) =>
        if (r.varLength.isDefined &&
            (r.qppVars.isDefined || r.branches.isDefined)) {
          groupVars ++= (r.qppVars.toSeq.flatMap(t =>
            t._1.toSeq ++ t._2.toSeq ++ t._3.toSeq) ++
            r.variable.toSeq ++
            r.branches.toSeq.flatMap(branchVars)).distinct
          // the hop's FAR node is outside the group (a juxtaposed anchor)
          singletons ++= nodeVars(n)
        } else {
          singletons ++= r.variable.toSeq
          singletons ++= nodeVars(n)
        }
      }
    }
    def walkClause(c: Clause): Unit = c match {
      case m: MatchClause =>
        m.patterns.foreach(walkPath)
        m.shortest.foreach(sp => walkPath(sp.pattern))
      case cr: CreateClause => cr.patterns.foreach(walkPath)
      case mg: MergeClause  => walkPath(mg.pattern)
      case cs: CallSubquery => cs.innerQ.parts.foreach(_.clauses.foreach(walkClause))
      case _ => ()
    }
    q.parts.foreach(_.clauses.foreach(walkClause))
    val dupGroups = groupVars.groupBy(identity).collect {
      case (v, occ) if occ.size > 1 => v }
    val crossUse = groupVars.toSet intersect singletons.toSet
    val bad = (dupGroups ++ crossUse).toSeq.distinct
    require(bad.isEmpty,
      s"a group variable can only appear in a single quantified path " +
        s"pattern: ${bad.mkString(", ")}")
  }

  // The parser object carries per-parse mutable state (the mix flags,
  // `inPatCompWhere`), so parses must not interleave across threads —
  // the top-level entry is synchronized. Callers already funnel through
  // Cypher.parse's cache lock; this guards direct callers too. Parse is
  // microseconds against plan/execute, so the lock is not a bottleneck.
  def parse(text: String): Query = synchronized {
    resetMixFlags()
    parseAll(query <~ opt(";"), text) match {
    case Success(q, _) => validateGroupVars(q); q
    case NoSuccess(msg, next) =>
      throw new IllegalArgumentException(
        s"Cypher syntax error at line ${next.pos.line}, column ${next.pos.column}: $msg\n${next.pos.longString}")
    case other => throw new IllegalArgumentException(s"Cypher parse failure: $other")
  } }
}
