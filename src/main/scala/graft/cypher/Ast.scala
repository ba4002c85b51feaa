package graft.cypher

/**
 * Abstract syntax tree for the openCypher subset graft compiles to Spark
 * plans. Shape mirrors the reference front-end AST
 * (community/cypher/front-end/ast/.../ast/Clause.scala — Match/With/Return,
 * expressions under expressions/.../Expression.scala), reduced to the
 * constructs the planner supports. The reference's 1,864-line ANTLR grammar
 * (front-end/antlr-parser/.../CypherParser.g4) defines the full language;
 * rule names below (OC_* comments) cite the productions each node covers.
 */
object Ast {

  // ---- expressions ------------------------------------------------------

  sealed trait Expr

  /** Literal: null, Boolean, Long, Double or String. */
  final case class Lit(value: Any) extends Expr
  final case class ListLit(items: Seq[Expr]) extends Expr
  final case class MapLit(entries: Seq[(String, Expr)]) extends Expr
  final case class Variable(name: String) extends Expr
  /** `$name` — query parameter. */
  final case class Param(name: String) extends Expr
  /** `subject.key` property access (oC_PropertyLookup). */
  final case class Prop(subject: Expr, key: String) extends Expr
  /** Function invocation; `distinct` only meaningful for aggregates. */
  final case class Func(name: String, args: Seq[Expr], distinct: Boolean = false) extends Expr
  case object CountStar extends Expr
  /** Binary op: + - * / % ^ = <> < <= > >= AND OR XOR IN */
  final case class BinOp(op: String, lhs: Expr, rhs: Expr) extends Expr
  /** Unary: NOT, - */
  final case class UnaryOp(op: String, operand: Expr) extends Expr
  final case class IsNull(operand: Expr, negated: Boolean) extends Expr
  /** STARTS WITH | ENDS WITH | CONTAINS | =~ */
  final case class StringPred(op: String, lhs: Expr, rhs: Expr) extends Expr
  /** `x IS [NOT] :: TYPE [NOT NULL]` — Cypher 5 type predicate expression
    * (reference expressions/TypePredicateExpression). `tpe` is the
    * normalized CIP-100 type name. */
  final case class TypePredicate(operand: Expr, tpe: String, notNull: Boolean,
      negated: Boolean) extends Expr
  final case class CaseExpr(subject: Option[Expr], whens: Seq[(Expr, Expr)],
      default: Option[Expr]) extends Expr
  /** `list[idx]` */
  final case class Index(list: Expr, idx: Expr) extends Expr
  /** `list[from..to]` (either bound optional) */
  final case class Slice(list: Expr, from: Option[Expr], to: Option[Expr]) extends Expr
  /** `EXISTS { MATCH <pattern> [WHERE …] }` / bare pattern predicate in WHERE. */
  final case class PatternExists(pattern: PathPattern, where: Option[Expr],
      negated: Boolean,
      // bare = written as a BARE pattern in expression position (not an
      // explicit EXISTS{…}/EXISTS()): value positions read it as the list
      // of matched paths and it may not introduce new variables
      bare: Boolean = false) extends Expr
  /** `COUNT { <pattern> [WHERE …] }` subquery expression
    * (NestedPlanExpression in the reference). */
  final case class PatternCount(pattern: PathPattern, where: Option[Expr]) extends Expr
  /** Pattern comprehension `[(n)-->(b) WHERE … | expr]` and
    * `COLLECT { MATCH <pattern> [WHERE …] RETURN expr }` — both lower to the
    * RollUpApply shape (reference
    * ReplacePatternComprehensionWithCollectSubquery.scala). */
  /** shortestPath()/allShortestPaths() in EXPRESSION position (RETURN/
    * WITH item): evaluates to the path value (or null when no path) /
    * the list of paths. Reference ShortestPathAcceptance "Find a
    * shortest path in an expression context". */
  final case class ShortestPathExpr(pattern: PathPattern, all: Boolean)
      extends Expr
  final case class PatternComprehension(pattern: PathPattern, where: Option[Expr],
      projection: Expr, orderBy: Seq[SortItem] = Nil,
      skip: Option[Expr] = None, limit: Option[Expr] = None) extends Expr
  /** Full-query subquery expression — `EXISTS { <query> }`,
    * `COUNT { <query> }`, `COLLECT { <query> }` with arbitrary bodies
    * (multi-clause, WITH-starting, UNION; reference ExistsExpression/
    * CountExpression/CollectExpression): outer-scope variables are
    * implicitly imported, correlation inferred from the free variables.
    * The single-pattern forms keep their dedicated nodes above. */
  final case class SubqueryExpr(kind: String, q: Query) extends Expr

  /** `n:Label` / `n:A|B&!C` as a boolean expression (reference HasLabels /
    * label-expression predicate): DNF over (possibly negated) label atoms. */
  final case class HasLabel(subject: Expr, dnf: Seq[Seq[LabelAtom]]) extends Expr
  /** Map projection `v {.key, alias: expr}` → struct. */
  final case class MapProjection(subject: Expr,
      items: Seq[Either[String, (String, Expr)]]) extends Expr
  /** `all/any/none/single(x IN list WHERE pred)` iterator predicates. */
  final case class IterPredicate(kind: String, variable: String, list: Expr,
      pred: Expr) extends Expr
  /** `reduce(acc = init, x IN list | expr)`. */
  final case class Reduce(acc: String, init: Expr, variable: String, list: Expr,
      step: Expr) extends Expr
  /** List comprehension `[x IN list WHERE p | e]`. */
  final case class ListComprehension(variable: String, list: Expr,
      where: Option[Expr], projection: Option[Expr]) extends Expr

  // ---- patterns ---------------------------------------------------------

  sealed trait Dir
  case object Out extends Dir   // -[]->
  case object In extends Dir    // <-[]-
  case object Both extends Dir  // -[]-

  /** Label expression atom: `L` or `!L` (Cypher 5 label expressions). */
  final case class LabelAtom(name: String, negated: Boolean)

  /** `(v:L1:L2 {k: e, …})` (oC_NodePattern). `labels` is the plain
    * AND-of-positive-labels fast path; `labelExpr` carries a Cypher 5 label
    * expression (`:A|B`, `:A&B`, `:!A` — disjunction of conjunctions of
    * atoms, the surface form of Union/Intersection/SubtractionNodeByLabels
    * scans) when the pattern uses one. */
  final case class NodePattern(variable: Option[String], labels: Seq[String],
      props: Seq[(String, Expr)],
      labelExpr: Option[Seq[Seq[LabelAtom]]] = None,
      where: Option[Expr] = None) // Cypher 5 inline `(n:L WHERE n.x > 1)`

  /** `-[v:T1|T2 *min..max {k: e}]->` (oC_RelationshipPattern). A parsed
    * quantified path pattern `((x)-[r:T]->(y)){min,max}` also lands here:
    * varLength carries the quantifier and `qppVars` the inner group
    * variables (x, r, y), which bind to per-path arrays. */
  final case class RelPattern(variable: Option[String], types: Seq[String],
      dir: Dir, varLength: Option[(Int, Option[Int])], props: Seq[(String, Expr)],
      qppVars: Option[(Option[String], Option[String], Option[String])] = None,
      where: Option[Expr] = None, // Cypher 5 inline `[r:T WHERE r.x > 1]`
      // type EXPRESSION `[:!A]` / `[:(!A&B)|C]` / `[:%]` — DNF over the
      // single type when plain alternation doesn't fit `types`
      typeExpr: Option[Seq[Seq[LabelAtom]]] = None,
      // Alternation BETWEEN path shapes inside a quantified group —
      // `(-[:X]->() | -[:Y]->()-[:Z]->()){1,3}` (GQL path-term alternation,
      // reference NFA.scala general regular path patterns): each branch is
      // a fixed-hop chain; varLength carries the group quantifier (counted
      // in branch traversals, not rels).
      branches: Option[Seq[Seq[(RelPattern, NodePattern)]]] = None,
      // constrained LEADING node of a quantified group
      // (`((x:A)-->(y))+`): every traversal's start node must satisfy it
      // (reference NFA per-state predicates)
      headNode: Option[NodePattern] = None,
      // group-scoped WHERE over SEVERAL iteration variables
      // (`(((n)-[r]->(m)) WHERE n.p <= m.p)+`): filters every traversal of
      // the composite edge set (reference QPP inner predicates)
      groupWhere: Option[Expr] = None)

  /** A linear path: node (rel node)*. `name` carries a path-variable binding
    * `p = (a)-[r]->(b)` (reference front-end projectNamedPaths rewriter /
    * ProjectNamedPath expression) — the planner then projects the node-id
    * sequence, rel-id sequence and hop count as `p$nodes`/`p$rels`/`p$length`. */
  final case class PathPattern(first: NodePattern, hops: Seq[(RelPattern, NodePattern)],
      name: Option[String] = None)

  /** `p = shortestPath((a)-[:T*..d]->(b))` (reference FindShortestPaths);
    * `all = true` for allShortestPaths (every minimal-hop tie);
    * `k = Some(n)` for the GQL `SHORTEST n <pattern>` selector (reference
    * StatefulShortestPath) — the pattern may concatenate several var-length
    * legs. */
  final case class ShortestPart(pathVar: Option[String], pattern: PathPattern,
      all: Boolean = false, k: Option[Int] = None,
      // SHORTEST k GROUPS (GQL selector; reference StatefulShortestPath
      // .Selector.ShortestGroups): every path whose length falls in the k
      // smallest distinct lengths per pair
      groups: Boolean = false,
      // parenthesized path-pattern WHERE `ANY SHORTEST ((a)-->+(b) WHERE …)`
      // — applied to the selected paths (the reference filters BEFORE the
      // selector inside the NFA; post-filtering is a documented divergence
      // observable when a predicate-failing path displaces a shorter one)
      where: Option[Expr] = None,
      // legacy shortestPath()/allShortestPaths() function form — EXEMPT
      // from the CIP-60 "only one selective path pattern per graph
      // pattern" rule that governs GQL selectors
      legacy: Boolean = false)

  // ---- clauses ----------------------------------------------------------

  sealed trait Clause
  /** `mode`: "" (default), "repeatable" (REPEATABLE ELEMENTS — no
    * relationship-uniqueness predicates), "diffrels" (DIFFERENT
    * RELATIONSHIPS — the default semantics spelled out) or "different"
    * (DIFFERENT NODES —
    * pairwise node distinctness), the GQL match modes. */
  final case class MatchClause(optional: Boolean, patterns: Seq[PathPattern],
      where: Option[Expr], shortest: Seq[ShortestPart] = Nil,
      mode: String = "") extends Clause
  final case class UnwindClause(expr: Expr, alias: String) extends Clause
  /** `src` is the raw source text of an unaliased item — the reference
    * names unaliased columns by the expression's original text
    * (`RETURN type(r)` → column `type(r)`). */
  final case class ReturnItem(expr: Expr, alias: Option[String],
      src: Option[String] = None)
  final case class SortItem(expr: Expr, ascending: Boolean)
  final case class WithClause(distinct: Boolean, items: Seq[ReturnItem],
      orderBy: Seq[SortItem], skip: Option[Expr], limit: Option[Expr],
      where: Option[Expr]) extends Clause
  final case class ReturnClause(distinct: Boolean, items: Seq[ReturnItem],
      orderBy: Seq[SortItem], skip: Option[Expr], limit: Option[Expr]) extends Clause

  // ---- write clauses (reference Create :1217, Merge :2602, SetPipe,
  //      DeletePipe; compiled onto graft.ops.UpdateOps) ------------------

  sealed trait SetItem
  /** `SET v.key = expr` */
  final case class SetProp(variable: String, key: String, value: Expr) extends SetItem
  /** `SET v = {map}` (replace — other properties null out) / `SET v += {map}`
    * (merge) — reference SetNodePropertiesFromMap / SetPropertiesFromMap. */
  final case class SetPropsFromMap(variable: String, map: Expr,
      additive: Boolean) extends SetItem
  /** `SET v:Label1:Label2` */
  final case class SetLabelsItem(variable: String, labels: Seq[String]) extends SetItem
  /** `REMOVE v.key` */
  final case class RemoveProp(variable: String, key: String) extends SetItem
  /** `REMOVE (<expr>).prop` — the subject is an entity-valued expression
    * (CASE over entities, an indexed pattern comprehension, …). */
  final case class RemovePropExpr(subject: Expr, key: String) extends SetItem
  /** `REMOVE v:Label` */
  final case class RemoveLabelsItem(variable: String, labels: Seq[String]) extends SetItem

  /** `FINISH` (reference finishClause, GQL): explicit no-result terminator —
    * the query executes (including writes) and returns zero rows. */
  final case class FinishClause() extends Clause
  /** `insert = true` for the GQL `INSERT` spelling: same surface, stricter
    * error contract (directed relationships only, no re-use of bound
    * variables — reference insertClause semantics). */
  final case class CreateClause(patterns: Seq[PathPattern],
      insert: Boolean = false) extends Clause
  final case class MergeClause(pattern: PathPattern, onMatch: Seq[SetItem],
      onCreate: Seq[SetItem]) extends Clause
  final case class SetClause(items: Seq[SetItem]) extends Clause
  final case class RemoveClause(items: Seq[SetItem]) extends Clause
  final case class DeleteClause(variables: Seq[String], detach: Boolean,
      /** entity-valued expression targets (`DELETE (COLLECT {…}[0])`) —
        * evaluated against the pre-delete snapshot like variable targets */
      exprs: Seq[Expr] = Nil) extends Clause
  /** `FOREACH (v IN list | update…)` (reference Foreach :2082). */
  /** LOAD CSV: with headers binds `alias` to a per-line struct keyed by
    * the header names (all STRING fields); without, to a STRING list */
  final case class LoadCsvClause(withHeaders: Boolean, url: Expr,
      alias: String, sep: Option[String]) extends Clause

  final case class ForeachClause(variable: String, list: Expr,
      updates: Seq[Clause]) extends Clause
  /** `CALL proc.name(args) [YIELD a, b [WHERE pred]]` (reference procedure
    * calls; YIELD…WHERE filters the yielded rows in place). */
  final case class CallClause(procedure: String, args: Seq[Expr],
      yields: Seq[String], where: Option[Expr] = None) extends Clause
  /** `CALL { <inner query> } [IN TRANSACTIONS [OF n ROWS]
    * [ON ERROR CONTINUE|BREAK|FAIL] [REPORT STATUS AS s]]` — subquery
    * (reference CALL-subquery / TransactionApply-TransactionForeach family,
    * LogicalPlan.scala:4039/:4100). `inTransactionsOf` batches the inner
    * write over chunks of n input rows with a commit per chunk; a failed
    * batch rolls back and `onError` decides whether the statement fails
    * (default), skips on (continue), or stops starting batches (break);
    * `statusVar` binds the per-row {started, committed, errorMessage}. */
  final case class CallSubquery(innerQ: Query,
      inTransactionsOf: Option[Long] = None,
      optional: Boolean = false,
      onError: String = "fail",
      statusVar: Option[String] = None,
      concurrent: Boolean = false,
      /** non-literal `OF <expr> ROWS` batch size — constant-folded by the
        * planner (the reference accepts any expression there). */
      inTransactionsOfExpr: Option[Expr] = None) extends Clause {
    /** Single-part body (the common case; unions reject where unsupported). */
    def inner: SingleQuery = {
      require(innerQ.parts.size == 1,
        "this CALL {} shape does not support UNION bodies")
      innerQ.parts.head
    }
  }

  // ---- schema commands (reference SchemaLogicalPlan.scala: CreateIndex,
  //      CreateConstraint, DropIndexOnName, ShowIndexes, ShowConstraints) --

  /** `CREATE [kind] INDEX name FOR (n:Label) ON (n.prop)` —
    * kind ∈ range (default) / text / point / vector / fulltext */
  final case class CreateIndexClause(name: String, label: String,
      prop: String, kind: String = "range") extends Clause
  /** `CREATE CONSTRAINT name FOR (n:Label) REQUIRE n.prop IS UNIQUE |
    * IS NOT NULL | IS NODE KEY` → kind unique/exists/node_key */
  final case class CreateConstraintClause(name: String, label: String,
      prop: String, kind: String) extends Clause
  final case class DropSchemaClause(isIndex: Boolean, name: String) extends Clause
  /** `SHOW INDEXES` / `SHOW CONSTRAINTS` / `SHOW PROCEDURES` */
  final case class ShowSchemaClause(what: String) extends Clause

  final case class SingleQuery(clauses: Seq[Clause])
  /** Top level: one or more single queries combined by UNION [ALL]. */
  final case class Query(parts: Seq[SingleQuery], unionAll: Boolean)
}
