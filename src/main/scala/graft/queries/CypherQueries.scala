package graft.queries

import graft.cypher.Cypher
import graft.graph.TpchGraph
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The correctness gate for the Cypher surface: every query here is a Cypher
 * STRING compiled by the engine (parse → plan → DataFrame), and the oracle
 * re-derives the answer relationally in DuckDB — so parser, planner,
 * expression compiler and the underlying operators are all on the hook.
 * Several mirror hand-built twins (q_graph_expand, q_var_expand, …) so a
 * front-end regression shows up as a Cypher-only failure.
 */
object CypherQueries {

  private def cq(name: String, cypher: String, oracle: String): QueryDef =
    QueryDef(name,
      (s, d) => Cypher.run(s, TpchGraph.load(s, d), cypher),
      Some(oracle))

  val defs: Seq[QueryDef] = Seq(

    // flagship (SURVEY §7.2): expand + far-node predicate + aggregate + top-k
    cq("q_cypher_agg_topk",
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.totalprice > 100000
        |RETURN c.name AS name, count(o) AS n
        |ORDER BY n DESC, name ASC LIMIT 10""".stripMargin,
      """SELECT c_name AS name, count(*) AS n
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE o_totalprice > 100000
        |GROUP BY c_name ORDER BY n DESC, name ASC LIMIT 10""".stripMargin),

    // heterogeneous COLUMN through WITH → ORDER BY → RETURN (VERDICT r11
    // task 2 receipt): the variant encoding rides the projection chain
    // and toString() decodes; global order is List < String < Boolean <
    // Number, NULL last (ascending)
    cq("q_cypher_mixed_col",
      """UNWIND [3, 'b', true, 2.5, 'a', null, [1, 2]] AS x
        |WITH x ORDER BY x
        |RETURN toString(x) AS s""".stripMargin,
      """SELECT s FROM (VALUES ('[1, 2]'), ('a'), ('b'), ('true'),
        |  ('2.5'), ('3'), ('null')) AS t(s)""".stripMargin),

    // path projection in a pattern comprehension (VERDICT r11 task 3
    // receipt): `[p = (c)-[:PLACED]->(:Order) | p]` hydrates the named
    // path per match; size() counts the customer's orders
    cq("q_cypher_pattern_path",
      """MATCH (c:Customer) WHERE c.key <= 30
        |RETURN c.key AS ckey,
        |       size([p = (c)-[:PLACED]->(:Order) | p]) AS n_paths""".stripMargin,
      """SELECT c_custkey AS ckey, CAST(count(o_orderkey) AS INT) AS n_paths
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |WHERE c_custkey <= 30 GROUP BY c_custkey""".stripMargin),

    // two QPP GROUP VARIABLES projected out of one quantified pattern
    // (VERDICT r11 task 4 receipt): per-hop rel and end-node arrays,
    // element property reads through the entity-list machinery
    cq("q_cypher_qpp_groupvars",
      """MATCH (c:Customer) ((a)-[r:FROM|IN_REGION]->(b)){2,2} (x)
        |WHERE c.key <= 50
        |RETURN c.key AS ckey, size(r) AS depth,
        |       b[0].name AS nation, b[1].name AS region""".stripMargin,
      """SELECT c_custkey AS ckey, 2 AS depth, n_name AS nation,
        |  r_name AS region
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_custkey <= 50""".stripMargin),

    // Expand(All) twin of q_graph_expand
    cq("q_cypher_expand",
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WHERE o.totalprice > 300000
        |RETURN c.key AS c_key, count(*) AS n_big_orders""".stripMargin,
      """SELECT c_custkey AS c_key, count(*) AS n_big_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE o_totalprice > 300000 GROUP BY c_custkey""".stripMargin),

    // two-hop pattern: customer -> nation -> region (multi-hop path plan)
    cq("q_cypher_two_hop",
      """MATCH (c:Customer)-[:FROM]->(n:Nation)-[:IN_REGION]->(r:Region)
        |RETURN n.name AS nation, r.name AS region, count(c) AS customers""".stripMargin,
      """SELECT n_name AS nation, r_name AS region, count(*) AS customers
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name""".stripMargin),

    // var-length twin of q_var_expand: depth-tagged reach set
    cq("q_cypher_var_expand",
      """MATCH (c:Customer)-[rs:FROM|IN_REGION*1..2]->(x)
        |WHERE c.key < 200
        |RETURN c.key AS c_key, x.name AS reached, size(rs) AS depth""".stripMargin,
      """SELECT c_custkey AS c_key, n_name AS reached, 1 AS depth
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey < 200
        |UNION ALL
        |SELECT c_custkey, r_name, 2
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_custkey < 200""".stripMargin),

    // endpoints-only var-length → pruningVarExpander rewrite (frontier BFS,
    // no path enumeration — gated by PlanAuditSpec); unbounded upper end
    // walks to frontier exhaustion. Parts sit exactly 2 hops out
    // (PLACED then CONTAINS), nations/orders at 1 — the :Part filter keeps
    // the reachable set single-label.
    cq("q_cypher_var_expand_pruned",
      """MATCH (c:Customer)-[*1..]->(n:Part)
        |WHERE c.key < 50
        |RETURN DISTINCT c.key AS c_key, n.key AS p_key""".stripMargin,
      """SELECT DISTINCT c_custkey AS c_key, CAST(l_partkey AS BIGINT) AS p_key
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_custkey < 50""".stripMargin),

    // per-step WHERE inside a var-length pattern (Cypher 5 inline form;
    // reference VarLengthExpandPipe.scala:83-123 relationship predicate):
    // every traversed rel must satisfy it — compiled to an edge-set
    // pre-filter (stepFilteredRels), so the predicate is evaluated |E|
    // times total, not once per partial path. PLACED rels carry no qty
    // (the IS NULL arm admits them); CONTAINS rels filter on qty.
    cq("q_cypher_var_expand_where",
      """MATCH (c:Customer)-[rs:PLACED|CONTAINS*2..2 WHERE rs.qty IS NULL OR rs.qty >= 45]->(p:Part)
        |WHERE c.key < 100
        |RETURN c.key AS c_key, p.key AS p_key, size(rs) AS depth""".stripMargin,
      """SELECT c_custkey AS c_key, CAST(l_partkey AS BIGINT) AS p_key, 2 AS depth
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_custkey < 100 AND l_quantity >= 45""".stripMargin),

    // per-step WHERE inside shortestPath: the BFS walks the pre-filtered
    // edge set (every Part sits exactly 2 hops out via PLACED→CONTAINS)
    cq("q_cypher_shortest_step_where",
      """MATCH (c:Customer) WHERE c.key < 20
        |MATCH p = shortestPath((c)-[r:PLACED|CONTAINS* WHERE r.qty IS NULL OR r.qty >= 45]->(x:Part))
        |RETURN c.key AS c_key, x.key AS p_key, length(p) AS hops""".stripMargin,
      """SELECT DISTINCT c_custkey AS c_key, CAST(l_partkey AS BIGINT) AS p_key, 2 AS hops
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_custkey < 20 AND l_quantity >= 45""".stripMargin),

    // OPTIONAL MATCH + aggregation over the optional side
    cq("q_cypher_optional",
      """MATCH (n:Nation)
        |OPTIONAL MATCH (n)<-[:FROM]-(c:Customer) WHERE c.acctbal > 9000
        |RETURN n.name AS nation, count(c) AS rich_customers""".stripMargin,
      """SELECT n_name AS nation, count(c_custkey) AS rich_customers
        |FROM nation LEFT JOIN customer
        |  ON c_nationkey = n_nationkey AND c_acctbal > 9000
        |GROUP BY n_name""".stripMargin),

    // EXISTS / NOT EXISTS pattern predicates (SemiApply/AntiSemiApply)
    cq("q_cypher_exists",
      """MATCH (s:Supplier)
        |WHERE EXISTS { (s)<-[:SUPPLIED_BY]-(:Order) }
        |RETURN count(*) AS n_active""".stripMargin,
      """SELECT count(*) AS n_active FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""".stripMargin),

    cq("q_cypher_not_exists",
      """MATCH (p:Part)
        |WHERE NOT EXISTS { (:Order)-[:CONTAINS]->(p) }
        |RETURN count(*) AS n_unsold""".stripMargin,
      """SELECT count(*) AS n_unsold FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin),

    // bare pattern predicate in WHERE (reference rewriter
    // normalizeExistsPatternExpressions): `(s)<--(:Order)` without the
    // EXISTS keyword, plus a negated one under OR → flag lowering
    cq("q_cypher_pattern_predicate",
      """MATCH (s:Supplier)
        |WHERE (s)<-[:SUPPLIED_BY]-(:Order) OR s.acctbal < 0
        |RETURN count(*) AS n_kept""".stripMargin,
      """SELECT count(*) AS n_kept FROM supplier
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
        |   OR s_acctbal < 0""".stripMargin),

    // WITH pipeline: aggregate → filter on the aggregate → re-aggregate
    cq("q_cypher_with_pipeline",
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |WITH c, count(o) AS n_orders WHERE n_orders >= 10
        |RETURN c.mktsegment AS segment, count(*) AS loyal, max(n_orders) AS busiest""".stripMargin,
      """WITH co AS (SELECT c_custkey, count(*) AS n_orders
        |  FROM customer JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey HAVING count(*) >= 10)
        |SELECT c_mktsegment AS segment, count(*) AS loyal, max(n_orders) AS busiest
        |FROM co JOIN customer ON co.c_custkey = customer.c_custkey
        |GROUP BY c_mktsegment""".stripMargin),

    // expression surface: CASE, string predicates, arithmetic, round
    cq("q_cypher_expressions",
      """MATCH (c:Customer)
        |WHERE c.name ENDS WITH '1' AND c.acctbal > 0
        |RETURN c.key AS key,
        |  CASE WHEN c.acctbal >= 5000 THEN 'high' ELSE 'low' END AS band,
        |  toInteger(floor(c.acctbal / 100)) AS hundreds,
        |  toUpper(c.mktsegment) AS seg""".stripMargin,
      """SELECT c_custkey AS key,
        |  CASE WHEN c_acctbal >= 5000 THEN 'high' ELSE 'low' END AS band,
        |  CAST(floor(c_acctbal / 100) AS BIGINT) AS hundreds,
        |  upper(c_mktsegment) AS seg
        |FROM customer WHERE c_name LIKE '%1' AND c_acctbal > 0""".stripMargin),

    // UNWIND + grouping on the exploded value
    cq("q_cypher_unwind",
      """UNWIND [1, 2, 3, 4, 5] AS x
        |RETURN x % 2 AS parity, count(*) AS n, sum(x) AS total""".stripMargin,
      """SELECT x % 2 AS parity, count(*) AS n, CAST(sum(x) AS BIGINT) AS total
        |FROM (SELECT CAST(unnest([1,2,3,4,5]) AS BIGINT) AS x)
        |GROUP BY x % 2""".stripMargin),

    // UNION distinct across two label scans
    cq("q_cypher_union",
      """MATCH (n:Nation) RETURN n.name AS name
        |UNION
        |MATCH (r:Region) RETURN r.name AS name""".stripMargin,
      """SELECT n_name AS name FROM nation
        |UNION SELECT r_name FROM region""".stripMargin),

    // DISTINCT + ORDER BY + SKIP/LIMIT pagination
    cq("q_cypher_pagination",
      """MATCH (c:Customer)-[:PLACED]->(o:Order)
        |RETURN DISTINCT c.key AS key ORDER BY key SKIP 5 LIMIT 20""".stripMargin,
      """SELECT DISTINCT o_custkey AS key FROM orders
        |ORDER BY key LIMIT 20 OFFSET 5""".stripMargin),

    // undirected + multi-label scan: every node a Nation touches
    cq("q_cypher_undirected",
      """MATCH (n:Nation)-[r]-(x)
        |RETURN n.name AS nation, count(*) AS degree""".stripMargin,
      """WITH deg AS (
        |  SELECT n_nationkey AS k, count(*) AS d FROM nation GROUP BY n_nationkey
        |  UNION ALL SELECT c_nationkey, count(*) FROM customer GROUP BY c_nationkey
        |  UNION ALL SELECT s_nationkey, count(*) FROM supplier GROUP BY s_nationkey)
        |SELECT n_name AS nation, CAST(sum(d) AS BIGINT) AS degree
        |FROM nation JOIN deg ON k = n_nationkey GROUP BY n_name""".stripMargin),

    // parameterized inline property map + rel property read
    cq("q_cypher_rel_props",
      """MATCH (o:Order)-[c:CONTAINS]->(p:Part)
        |WHERE c.qty >= 45 AND p.psize > 40
        |RETURN p.brand AS brand, count(*) AS n, round(sum(c.price), 2) AS revenue""".stripMargin,
      """SELECT p_brand AS brand, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_quantity >= 45 AND p_size > 40
        |GROUP BY p_brand""".stripMargin),

    // PathPropagatingBFS :2880 — shortestPath with the rel-id path in the
    // output (unit-weight frontier relaxation); path unique per pair here.
    cq("q_cypher_shortest_path_out",
      """MATCH (c:Customer) WHERE c.key < 20
        |MATCH p = shortestPath((c)-[:FROM|IN_REGION*..4]->(x))
        |WHERE x.name IS NOT NULL
        |RETURN c.key AS ckey, x.name AS reached, length(p) AS hops,
        |  reduce(acc = '', r IN relationships(p) | acc || ',' || toString(r)) AS path""".stripMargin,
      // rel-id scheme: FROM id = (22<<44)+custkey, IN_REGION id = (21<<44)+nationkey
      """SELECT c_custkey AS ckey, n_name AS reached, 1 AS hops,
        |  ',' || CAST(387028092977152 + c_custkey AS VARCHAR) AS path
        |FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey < 20
        |UNION ALL
        |SELECT c_custkey, r_name, 2,
        |  ',' || CAST(387028092977152 + c_custkey AS VARCHAR) ||
        |  ',' || CAST(369435906932736 + n_nationkey AS VARCHAR)
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey WHERE c_custkey < 20""".stripMargin),

    // Scalar-function tail (reference expressions/functions catalog): math
    // tail, trim variants, char_length, isEmpty, nullIf, valueType, list
    // coercions, vector similarity scores, localdatetime, duration.inMonths.
    cq("q_cypher_fn_tail",
      """MATCH (n:Nation) WHERE n.key < 3
        |RETURN n.key AS k,
        |  round(degrees(asin(0.5)), 4) AS deg,
        |  round(radians(180), 4) AS rad,
        |  round(acos(0.5), 4) AS ac,
        |  round(cot(1.0), 4) AS ct,
        |  round(haversin(1.0), 4) AS hav,
        |  isNaN(1.5) AS nan,
        |  btrim('xxhixx', 'x') AS bt,
        |  ltrim('xxhi', 'x') AS lt,
        |  rtrim('hixx', 'x') AS rt,
        |  char_length(n.name) AS cl,
        |  isEmpty('') AS ie,
        |  nullIf(n.name, 'ALGERIA') AS ni,
        |  valueType(n.name) AS vt,
        |  toIntegerList(['1', '2', 'x'])[0] AS til,
        |  toStringList([7, 8])[1] AS tsl,
        |  round(vector.similarity.euclidean([1.0, 2.0], [1.0, 2.0]), 4) AS veuc,
        |  round(vector.similarity.cosine([1.0, 0.0], [0.0, 1.0]), 4) AS vcos,
        |  localdatetime('2020-01-02T03:04:05') AS ldt,
        |  duration.inMonths(date('2020-01-15'), date('2021-03-20')).months AS mon
        |ORDER BY k""".stripMargin,
      """SELECT n_nationkey AS k,
        |  round(degrees(asin(0.5)), 4) AS deg,
        |  round(radians(180), 4) AS rad,
        |  round(acos(0.5), 4) AS ac,
        |  round(cot(1.0), 4) AS ct,
        |  round((1 - cos(1.0)) / 2, 4) AS hav,
        |  isnan(CAST(1.5 AS DOUBLE)) AS nan,
        |  trim('xxhixx', 'x') AS bt,
        |  ltrim('xxhi', 'x') AS lt,
        |  rtrim('hixx', 'x') AS rt,
        |  length(n_name) AS cl,
        |  length('') = 0 AS ie,
        |  nullif(n_name, 'ALGERIA') AS ni,
        |  'STRING NOT NULL' AS vt,
        |  CAST(1 AS BIGINT) AS til,
        |  '8' AS tsl,
        |  CAST(1.0 AS DOUBLE) AS veuc,
        |  CAST(0.5 AS DOUBLE) AS vcos,
        |  TIMESTAMP '2020-01-02 03:04:05' AS ldt,
        |  CAST(14 AS BIGINT) AS mon
        |FROM nation WHERE n_nationkey < 3 ORDER BY k""".stripMargin),

    // Cypher 5 type predicate `IS :: TYPE` — folds against the static
    // columnar schema, NULL split per row (reference TypePredicateExpression).
    cq("q_cypher_type_predicate",
      """MATCH (c:Customer) WHERE c.key <= 10 AND c.name IS :: STRING
        |RETURN c.key AS k, c.acctbal IS :: FLOAT AS isf,
        |       c.key IS NOT :: STRING AS nis,
        |       c.name IS :: STRING NOT NULL AS nn
        |ORDER BY k""".stripMargin,
      """SELECT c_custkey AS k, true AS isf, true AS nis,
        |  c_name IS NOT NULL AS nn
        |FROM customer WHERE c_custkey <= 10 ORDER BY k""".stripMargin),

    // Named plain path (reference ProjectNamedPath): p = fixed 2-hop pattern;
    // nodes(p)/relationships(p)/length(p) must follow written pattern order.
    cq("q_cypher_named_path",
      """MATCH p = (c:Customer {key: 7})-[:PLACED]->(o:Order)-[l:CONTAINS]->(pt:Part)
        |RETURN o.key AS okey, length(p) AS hops,
        |  reduce(acc = '', r IN relationships(p) | acc || ',' || toString(r)) AS rels,
        |  reduce(acc = '', n IN nodes(p) | acc || ',' || toString(n)) AS ns
        |ORDER BY okey, rels""".stripMargin,
      // id scheme (TpchGraph.scala): Customer 3<<44 + key, Order 6<<44 + key,
      // Part 5<<44 + key; PLACED 23<<44 + orderkey, CONTAINS 24<<44 + okey*16+line
      """SELECT o_orderkey AS okey, 2 AS hops,
        |  ',' || CAST(404620279021568 + o_orderkey AS VARCHAR) ||
        |  ',' || CAST(422212465065984 + l_orderkey * 16 + l_linenumber AS VARCHAR) AS rels,
        |  ',' || CAST(52776558133255 AS VARCHAR) ||
        |  ',' || CAST(105553116266496 + o_orderkey AS VARCHAR) ||
        |  ',' || CAST(87960930222080 + l_partkey AS VARCHAR) AS ns
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_custkey = 7 ORDER BY okey, rels""".stripMargin),

    // label expression scan `:A|B` — UnionNodeByLabelsScan surface form.
    cq("q_cypher_label_expr",
      """MATCH (n:Customer|Supplier) WHERE n.key < 30
        |RETURN count(*) AS n""".stripMargin,
      """SELECT (SELECT count(*) FROM customer WHERE c_custkey < 30) +
        |  (SELECT count(*) FROM supplier WHERE s_suppkey < 30) AS n""".stripMargin),

    // Selector leg relationship variables (reference: quantified-leg group
    // variables bind per matched path) + indexed path-element property
    // reads: `r` binds the whole rel array of the single quantified leg,
    // nodes(p)[-1] reads the far end's property.
    cq("q_cypher_selector_legvars",
      """MATCH p = ANY SHORTEST (c:Customer)-[r:FROM|IN_REGION]->+(x:Region)
        |WHERE c.key < 30
        |RETURN c.key AS ckey, size(r) AS hops,
        |       nodes(p)[-1].name AS rname""".stripMargin,
      """SELECT c_custkey AS ckey, 2 AS hops, r_name AS rname
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_custkey < 30""".stripMargin),

    // Entity-list variables through projections (NodeListVar): nodes(p)
    // aliased by WITH, then indexed / head(reverse(..)) property access
    // hydrates per-position parallel arrays.
    cq("q_cypher_nodeslist",
      """MATCH p = (c:Customer)-[:FROM]->(:Nation)-[:IN_REGION]->(:Region)
        |WHERE c.key < 30
        |WITH nodes(p) AS ns, c.key AS ckey
        |RETURN ckey, ns[1].name AS nation,
        |       head(reverse(ns)).name AS region""".stripMargin,
      """SELECT c_custkey AS ckey, n_name AS nation, r_name AS region
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_custkey < 30""".stripMargin),

    // Whole-pattern MERGE with an UNBOUND endpoint (reference MergePipe,
    // MergeLegacyAcceptance "Using a single bound node"): the first MERGE
    // creates one Audit node + rel per input row; re-running it matches
    // what was created (per-row read-own-writes), creating nothing new.
    QueryDef("q_merge_unbound",
      (s, d) => {
        val g = TpchGraph.load(s, d)
        val merge =
          "MATCH (c:Customer) WHERE c.key <= 4 MERGE (c)-[:AUDITED]->(a:Audit)"
        val (g2, _) = Cypher.execute(s, g, merge)
        val (g3, _) = Cypher.execute(s, g2, merge) // idempotent re-run
        val (_, res) = Cypher.execute(s, g3,
          "MATCH (:Customer)-[r:AUDITED]->(x:Audit) " +
            "RETURN count(r) AS rels, count(DISTINCT x) AS audits")
        res.get
      },
      Some("""SELECT count(*) AS rels, count(*) AS audits
             |FROM customer WHERE c_custkey <= 4""".stripMargin)),

    // Schema commands (reference SchemaLogicalPlan.scala): CREATE
    // CONSTRAINT validates the data (nation names are unique), CREATE INDEX
    // records the layout, SHOW surfaces the catalog.
    QueryDef("q_cypher_schema_commands",
      (s, d) => {
        val g = TpchGraph.load(s, d)
        val (g2, _) = Cypher.execute(s, g,
          "CREATE CONSTRAINT uq_nation FOR (n:Nation) REQUIRE n.name IS UNIQUE")
        val (g3, _) = Cypher.execute(s, g2,
          "CREATE INDEX idx_cust_key FOR (c:Customer) ON (c.key)")
        Cypher.run(s, g3, "SHOW CONSTRAINTS")
          .unionByName(Cypher.run(s, g3, "SHOW INDEXES"))
      },
      Some("""SELECT 'uq_nation' AS name, 'Nation' AS label,
             |  'name' AS property, 'unique' AS type
             |UNION ALL
             |SELECT 'idx_cust_key', 'Customer', 'key', 'range'""".stripMargin)),

    // NodeIndexScan (IS NOT NULL existence scan, SURVEY §2 #11): the union
    // node schema has totalprice only on Orders, so the existence scan
    // selects exactly that label's rows without naming it.
    cq("q_node_index_scan",
      """MATCH (n) WHERE n.totalprice IS NOT NULL
        |RETURN count(*) AS n, round(sum(n.totalprice), 2) AS total""".stripMargin,
      """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders""".stripMargin),

    // Relationship index seek variants (SURVEY §2 #13): range predicate over
    // a relationship property (qty) + existence scan over shipdate.
    cq("q_rel_index_range",
      """MATCH ()-[r:CONTAINS]->() WHERE r.qty >= 45
        |RETURN count(*) AS n, round(sum(r.qty), 2) AS total_qty""".stripMargin,
      """SELECT count(*) AS n, round(sum(l_quantity), 2) AS total_qty
        |FROM lineitem WHERE l_quantity >= 45""".stripMargin),

    // GQL SHORTEST k selector through the Cypher surface (reference
    // StatefulShortestPath): two typed legs, k best trails per pair by
    // (hops, path). Every customer→order→part trail is exactly 2 hops, so
    // ties resolve purely on the deterministic rel-id order.
    cq("q_cypher_shortest_k",
      """MATCH (c:Customer) WHERE c.key < 20
        |MATCH p = SHORTEST 2 (c)-[:PLACED*1..1]->()-[:CONTAINS*1..1]->(x:Part)
        |RETURN c.key AS source_key, x.key AS part_key, length(p) AS hops,
        |  reduce(acc = '', r IN relationships(p) | acc || ',' || toString(r)) AS path""".stripMargin,
      """WITH cand AS (
        |  SELECT c_custkey AS source_key, CAST(l_partkey AS BIGINT) AS part_key,
        |    CAST(404620279021568 + o_orderkey AS BIGINT) AS e1,
        |    CAST(422212465065984 + o_orderkey * 16 + l_linenumber AS BIGINT) AS e2
        |  FROM customer JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_custkey < 20),
        |ranked AS (SELECT *, row_number() OVER (
        |    PARTITION BY source_key, part_key ORDER BY e1, e2) AS rn FROM cand)
        |SELECT source_key, part_key, 2 AS hops,
        |  ',' || e1 || ',' || e2 AS path
        |FROM ranked WHERE rn <= 2""".stripMargin),

    // weighted shortest path on the procedure surface (reference
    // graph-algo Dijkstra.java): CALL graft.shortestPath.dijkstra with an
    // open target set, PLACED defaulting to weight 1, CONTAINS weighted by
    // qty. Same tie-break contract as q_weighted_shortest (dist, then
    // lexicographic edge ids). Node-id scheme: Customer = (3<<44)+key,
    // Part = (5<<44)+key.
    cq("q_cypher_weighted_shortest",
      s"""CALL graft.shortestPath.dijkstra([${(0 until 50).map(52776558133248L + _).mkString(", ")}],
         |  [], 'qty', 1.0, ['PLACED', 'CONTAINS'], 5)
         |YIELD sourceNode, targetNode, totalCost, relIds
         |WITH sourceNode, targetNode, totalCost, relIds
         |WHERE targetNode >= 87960930222080 AND targetNode < 105553116266496
         |RETURN sourceNode - 52776558133248 AS custkey,
         |       targetNode - 87960930222080 AS partkey,
         |       round(totalCost, 2) AS dist,
         |       reduce(acc = '', r IN relIds | acc || ',' || toString(r)) AS path""".stripMargin,
      """WITH cand AS (
        |  SELECT c.c_custkey AS custkey, l.l_partkey AS partkey,
        |    1.0 + l.l_quantity AS dist,
        |    CAST(404620279021568 + o.o_orderkey AS BIGINT) AS e1,
        |    CAST(422212465065984 + o.o_orderkey * 16 + l.l_linenumber AS BIGINT) AS e2
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  WHERE c.c_custkey < 50),
        |ranked AS (SELECT *,
        |    row_number() OVER (PARTITION BY custkey, partkey ORDER BY dist, e1, e2) AS rn
        |  FROM cand)
        |SELECT custkey, partkey, round(dist, 2) AS dist,
        |  ',' || e1 || ',' || e2 AS path
        |FROM ranked WHERE rn = 1""".stripMargin),

    // general-NFA SHORTEST: labeled + property-filtered INTERIOR node
    // (reference NFA.scala:157 per-state node predicates) — only paths
    // through open ('O') orders count; closed-order paths to the same part
    // must not appear even when shorter lexicographically.
    cq("q_shortest_nfa_labeled",
      """MATCH (c:Customer) WHERE c.key < 20
        |MATCH p = SHORTEST 1 (c)-[:PLACED*1..1]->(:Order {status: 'O'})-[:CONTAINS*1..1]->(x:Part)
        |RETURN c.key AS source_key, x.key AS part_key, length(p) AS hops""".stripMargin,
      """SELECT DISTINCT c_custkey AS source_key,
        |  CAST(l_partkey AS BIGINT) AS part_key, 2 AS hops
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_custkey < 20 AND o_orderstatus = 'O'""".stripMargin),

    // unbounded var-length WITH path enumeration (reference VarLengthExpand
    // without an upper bound, terminating via relationship uniqueness):
    // the FROM|IN_REGION lattice is a 2-level DAG, so the frontier dies
    // after customer->nation->region — no bound required.
    cq("q_cypher_var_unbounded",
      """MATCH (c:Customer) WHERE c.key <= 50
        |MATCH p = (c)-[:FROM|IN_REGION*]->(x)
        |RETURN c.key AS ckey, length(p) AS hops, x AS target""".stripMargin,
      """SELECT c_custkey AS ckey, 1 AS hops,
        |  CAST((CAST(2 AS BIGINT) << 44) + c_nationkey AS BIGINT) AS target
        |FROM customer WHERE c_custkey <= 50
        |UNION ALL
        |SELECT c_custkey, 2,
        |  CAST((CAST(1 AS BIGINT) << 44) + n_regionkey AS BIGINT)
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |WHERE c_custkey <= 50""".stripMargin),

    // non-linear NFA: alternation BETWEEN path shapes inside a quantified
    // group (reference NFA.scala arbitrary regular path patterns) —
    // `(-[:FROM]->() | -[:PLACED]->()-[:SUPPLIED_BY]->()){1,2}` reaches the
    // customer's nation in 1 rel, its suppliers in one 2-rel branch
    // traversal, and supplier nations in 3 rels (branch2 then branch1);
    // SHORTEST 1 keeps the min-hop path per (customer, target) pair, so a
    // supplier nation that IS the customer's own nation stays at 1 hop.
    // endpoint inline WHERE in SHORTEST (GQL node predicates on the start
    // AND the unbound target — boundary-set semi-joins, no cartesian):
    // targets are nation 2 (1 hop via FROM) and region 2 (2 hops via
    // FROM then IN_REGION).
    cq("q_cypher_shortest_endpoint_where",
      """MATCH p = SHORTEST 1 (c:Customer WHERE c.key < 10)-[:FROM|IN_REGION*1..2]->(x WHERE x.key = 2)
        |RETURN c.key AS ckey, x AS target, length(p) AS hops""".stripMargin,
      """SELECT c_custkey AS ckey,
        |  CAST((CAST(2 AS BIGINT) << 44) + 2 AS BIGINT) AS target,
        |  1 AS hops
        |FROM customer WHERE c_custkey < 10 AND c_nationkey = 2
        |UNION ALL
        |SELECT c_custkey,
        |  CAST((CAST(1 AS BIGINT) << 44) + 2 AS BIGINT), 2
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |WHERE c_custkey < 10 AND n_regionkey = 2""".stripMargin),

    cq("q_shortest_nfa_alt",
      """MATCH (c:Customer) WHERE c.key < 20
        |MATCH p = SHORTEST 1 (c) (-[:FROM]->()|-[:PLACED]->()-[:SUPPLIED_BY]->()){1,2} (x)
        |RETURN c.key AS ckey, x AS target, length(p) AS hops""".stripMargin,
      """WITH own AS (
        |  SELECT c_custkey AS ckey,
        |    CAST((CAST(2 AS BIGINT) << 44) + c_nationkey AS BIGINT) AS target,
        |    1 AS hops
        |  FROM customer WHERE c_custkey < 20),
        |sups AS (
        |  SELECT DISTINCT c_custkey AS ckey,
        |    CAST((CAST(4 AS BIGINT) << 44) + l_suppkey AS BIGINT) AS target,
        |    2 AS hops
        |  FROM customer JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  WHERE c_custkey < 20),
        |supnat AS (
        |  SELECT DISTINCT c.c_custkey AS ckey,
        |    CAST((CAST(2 AS BIGINT) << 44) + s.s_nationkey AS BIGINT) AS target,
        |    3 AS hops
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
        |  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  WHERE c.c_custkey < 20)
        |SELECT ckey, target, CAST(MIN(hops) AS INT) AS hops
        |FROM (SELECT * FROM own UNION ALL SELECT * FROM sups
        |      UNION ALL SELECT * FROM supnat) u
        |GROUP BY ckey, target""".stripMargin),

    // nodes(p) — the node-id sequence of a shortestPath (reference
    // functions/Nodes.scala), carried alongside the rel-id path.
    // node-id scheme: Customer = (3<<44)+key, Nation = (2<<44)+key,
    // Region = (1<<44)+key.
    cq("q_cypher_shortest_nodes_out",
      """MATCH (c:Customer) WHERE c.key < 20
        |MATCH p = shortestPath((c)-[:FROM|IN_REGION*..4]->(x))
        |WHERE x.name IS NOT NULL
        |RETURN c.key AS ckey, x.name AS reached, length(p) AS hops,
        |  reduce(acc = '', n IN nodes(p) | acc || ',' || toString(n)) AS nds""".stripMargin,
      """SELECT c_custkey AS ckey, n_name AS reached, 1 AS hops,
        |  ',' || CAST(52776558133248 + c_custkey AS VARCHAR) ||
        |  ',' || CAST(35184372088832 + n_nationkey AS VARCHAR) AS nds
        |FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey < 20
        |UNION ALL
        |SELECT c_custkey, r_name, 2,
        |  ',' || CAST(52776558133248 + c_custkey AS VARCHAR) ||
        |  ',' || CAST(35184372088832 + n_nationkey AS VARCHAR) ||
        |  ',' || CAST(17592186044416 + r_regionkey AS VARCHAR)
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey WHERE c_custkey < 20""".stripMargin),

    // correlated CALL subquery: per-nation aggregate over imported key.
    // avg is computed as round(sum)/count: the exact sum has 2 decimals so
    // rounding it is never at a half-ulp boundary, unlike avg() whose
    // summation-order noise can flip round(x.xx5, 2) between engines.
    cq("q_cypher_call_correlated",
      """MATCH (n:Nation)
        |CALL { WITH n MATCH (n)<-[:FROM]-(c:Customer)
        |       RETURN round(round(sum(c.acctbal), 2) / count(c.acctbal), 4) AS avg_bal }
        |RETURN n.name AS nation, avg_bal""".stripMargin,
      """SELECT n_name AS nation,
        |  round(round(sum(c_acctbal), 2) / count(c_acctbal), 4) AS avg_bal
        |FROM nation JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin),

    // temporal construction/truncation/component access through Cypher.
    cq("q_cypher_temporal",
      """MATCH (o:Order) WHERE o.key < 2000
        |RETURN o.orderdate.year AS y,
        |  date.truncate('month', o.orderdate) AS m, count(*) AS n""".stripMargin,
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  date_trunc('month', o_orderdate) AS m, count(*) AS n
        |FROM orders WHERE o_orderkey < 2000 GROUP BY 1, 2""".stripMargin),

    // CALL procedure + CALL{} subquery through the Cypher surface.
    cq("q_cypher_call",
      """CALL db.relationshipTypes() YIELD relationshipType
        |CALL { MATCH (n:Nation) RETURN count(*) AS nations }
        |RETURN relationshipType, nations""".stripMargin,
      """SELECT t AS relationshipType,
        |  (SELECT count(*) FROM nation) AS nations
        |FROM (
        |  SELECT 'IN_REGION' AS t
        |  UNION ALL SELECT 'FROM'
        |  UNION ALL SELECT 'PLACED'
        |  UNION ALL SELECT 'CONTAINS'
        |  UNION ALL SELECT 'SUPPLIED_BY')""".stripMargin),

    // MultiNodeIndexSeek :2790 — two pushed-filter scans (brand equality,
    // acctbal range) feeding a two-hop join.
    cq("q_cypher_multi_seek",
      """MATCH (p:Part {brand: 'Brand#13'})<-[:CONTAINS]-(o:Order)-[:SUPPLIED_BY]->(s:Supplier)
        |WHERE s.acctbal > 5000
        |RETURN count(*) AS n""".stripMargin,
      """SELECT count(*) AS n
        |FROM lineitem l1 JOIN part ON l1.l_partkey = p_partkey
        |JOIN lineitem l2 ON l2.l_orderkey = l1.l_orderkey
        |JOIN supplier ON l2.l_suppkey = s_suppkey
        |WHERE p_brand = 'Brand#13' AND s_acctbal > 5000""".stripMargin),

    // COUNT{} subquery expression (NestedPlanExpression :2880) — per-row
    // correlated count lowered to a decorrelated aggregate join.
    cq("q_cypher_count_subquery",
      """MATCH (n:Nation)
        |RETURN n.name AS nation,
        |  COUNT { (n)<-[:FROM]-(:Customer) } AS customers,
        |  COUNT { (n)<-[:FROM]-(:Supplier) } AS suppliers""".stripMargin,
      """SELECT n_name AS nation,
        |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey) AS customers,
        |  (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey) AS suppliers
        |FROM nation""".stripMargin),

    // SelectOrAntiSemiApply :3604 — pattern predicate under OR lowers to a
    // flag join instead of a plain semi/anti join.
    cq("q_cypher_select_or_anti",
      """MATCH (p:Part)
        |WHERE p.psize > 49 OR NOT EXISTS { (:Order)-[:CONTAINS]->(p) }
        |RETURN count(*) AS n""".stripMargin,
      """SELECT count(*) AS n FROM part
        |WHERE p_size > 49 OR NOT EXISTS
        |  (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)""".stripMargin),

    // shortestPath() with unbound far node: minimal hop counts from small
    // customers to everything reachable over FROM/IN_REGION (nation=1,
    // region=2 — each reached exactly once, unlike path enumeration).
    cq("q_cypher_shortest",
      """MATCH (c:Customer) WHERE c.key < 30
        |MATCH p = shortestPath((c)-[:FROM|IN_REGION*..4]->(x))
        |WHERE x.name IS NOT NULL
        |RETURN c.key AS ckey, x.name AS reached, length(p) AS hops""".stripMargin,
      """SELECT c_custkey AS ckey, n_name AS reached, 1 AS hops
        |FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey < 30
        |UNION ALL
        |SELECT c_custkey, r_name, 2
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey WHERE c_custkey < 30""".stripMargin),

    // shortestPath with BOTH endpoints unbound: the start seeds from
    // AllNodesScan (reference FindShortestPaths plans from any leaf) and
    // the search runs multi-source; only nations expand over IN_REGION.
    cq("q_cypher_shortest_unbound",
      """MATCH p = shortestPath((a)-[:IN_REGION*..3]->(b))
        |WHERE a.name IS NOT NULL AND b.name IS NOT NULL
        |RETURN a.name AS src, b.name AS dst, length(p) AS hops""".stripMargin,
      """SELECT n_name AS src, r_name AS dst, 1 AS hops
        |FROM nation JOIN region ON n_regionkey = r_regionkey""".stripMargin),

    // quantified path pattern with group variables: size(r) plays depth.
    cq("q_cypher_qpp",
      """MATCH (c:Customer) ((a)-[r:FROM|IN_REGION]->(b)){1,2} (x)
        |WHERE c.key < 200
        |RETURN c.key AS c_key, x.name AS reached, size(r) AS depth""".stripMargin,
      """SELECT c_custkey AS c_key, n_name AS reached, 1 AS depth
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_custkey < 200
        |UNION ALL
        |SELECT c_custkey, r_name, 2
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_custkey < 200""".stripMargin),

    // ---- write path through the Cypher surface (UpdateOps underneath):
    // each runs an updating query, then READS the updated snapshot back —
    // the oracle re-derives the post-update state relationally.

    QueryDef("q_cypher_write_create",
      (s, d) => {
        val (g2, _) = Cypher.execute(s, TpchGraph.load(s, d),
          "MATCH (c:Customer) WHERE c.acctbal < 0 CREATE (f:Flagged {ckey: c.key})")
        Cypher.run(s, g2, "MATCH (f:Flagged) RETURN f.ckey AS ckey")
      },
      Some("SELECT c_custkey AS ckey FROM customer WHERE c_acctbal < 0")),

    // UNION in an updating query (reference planUnion has no single-part
    // restriction): both branches' CREATEs commit in one statement, RETURN
    // streams union, and a re-read of the snapshot sees both label sets.
    QueryDef("q_cypher_union_write",
      (s, d) => {
        val (g2, ret) = Cypher.execute(s, TpchGraph.load(s, d),
          """MATCH (c:Customer) WHERE c.acctbal < 0
            |CREATE (:Debtor {ckey: c.key}) RETURN c.key AS key
            |UNION ALL
            |MATCH (n:Nation) CREATE (:Audited2 {nkey: n.key})
            |RETURN n.key AS key""".stripMargin)
        val returned = ret.get.count()
        Cypher.run(s, g2,
          """MATCH (x) WHERE x:Debtor OR x:Audited2
            |RETURN labels(x)[0] AS lbl,
            |  coalesce(x.ckey, x.nkey) AS key""".stripMargin)
          .withColumn("union_rows", lit(returned))
      },
      Some("""SELECT 'Debtor' AS lbl, CAST(c_custkey AS BIGINT) AS key,
             |  (SELECT count(*) FROM customer WHERE c_acctbal < 0) +
             |  (SELECT count(*) FROM nation) AS union_rows
             |FROM customer WHERE c_acctbal < 0
             |UNION ALL
             |SELECT 'Audited2', CAST(n_nationkey AS BIGINT),
             |  (SELECT count(*) FROM customer WHERE c_acctbal < 0) +
             |  (SELECT count(*) FROM nation)
             |FROM nation""".stripMargin)),

    // Parameterized pagination — dynamic SKIP/LIMIT (the reference's Limit
    // takes any Expression, LogicalPlan.scala:2565): `$skip`/`$limit`
    // parameters plus constant-foldable arithmetic on them plan as
    // plan-time offsets, the everyday driver pagination idiom.
    QueryDef("q_cypher_param_paging",
      (s, d) => Cypher.run(s, TpchGraph.load(s, d),
        """MATCH (c:Customer) RETURN c.key AS key
          |ORDER BY key SKIP $skip LIMIT $limit * 2 + 1""".stripMargin,
        Map("skip" -> 7L, "limit" -> 6L)),
      Some("""SELECT CAST(c_custkey AS BIGINT) AS key FROM customer
             |ORDER BY c_custkey LIMIT 13 OFFSET 7""".stripMargin)),

    // Writes inside a correlated CALL subquery (reference SubqueryForeach,
    // LogicalPlan.scala:3897): per-outer-row CREATE against the statement
    // snapshot — `MATCH … CALL { WITH n CREATE … }` is the everyday
    // per-row-write idiom. The trailing RETURN observes the pre-CALL
    // cardinality (the unit subquery yields one row per input), and a
    // follow-up read proves every per-row write landed.
    QueryDef("q_cypher_call_write",
      (s, d) => {
        val (g2, ret) = Cypher.execute(s, TpchGraph.load(s, d),
          """MATCH (n:Nation) CALL { WITH n
            |  CREATE (:NationLog {nkey: n.key, nm: n.name}) }
            |RETURN count(*) AS outer_rows""".stripMargin)
        val outerRows = ret.get.collect()(0).getLong(0)
        Cypher.run(s, g2,
          """MATCH (l:NationLog) RETURN l.nkey AS nkey, l.nm AS nm
            |ORDER BY nkey""".stripMargin)
          .withColumn("outer_rows", lit(outerRows))
      },
      Some("""SELECT CAST(n_nationkey AS BIGINT) AS nkey, n_name AS nm,
             |  (SELECT count(*) FROM nation) AS outer_rows
             |FROM nation""".stripMargin)),

    // Bulk-interchange round-trip (reference neo4j-admin database import,
    // header grammar import-util/.../csv/Type.java): export the
    // Nation/Region subgraph as import-tool CSVs, read them back, and
    // query the REIMPORTED graph — label/type/property fidelity is the
    // oracle's business.
    QueryDef("q_export_roundtrip",
      (s, d) => {
        val g = TpchGraph.load(s, d)
        val sub = graft.graph.PropertyGraph(
          g.nodes.filter(array_contains(col("labels"), "Nation") ||
            array_contains(col("labels"), "Region")),
          g.rels.filter(col("type") === "IN_REGION"))
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_csv_" +
          Integer.toHexString(d.hashCode)
        graft.sources.ExportCsv.exportGraph(sub, dir)
        val g2 = graft.sources.ExportCsv.importGraph(s, dir)
        Cypher.run(s, g2,
          """MATCH (n:Nation)-[:IN_REGION]->(r:Region)
            |RETURN r.name AS region, count(*) AS nations,
            |  min(n.name) AS first_nation""".stripMargin)
      },
      Some("""SELECT r_name AS region, count(*) AS nations,
             |  min(n_name) AS first_nation
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin)),

    // INSERT (GQL spelling of CREATE, &-conjoined labels) + FINISH (the
    // explicit no-result terminator): the write commits with zero returned
    // rows; the follow-up read sees both labels.
    QueryDef("q_cypher_insert_finish",
      (s, d) => {
        val (g2, ret) = Cypher.execute(s, TpchGraph.load(s, d),
          "MATCH (n:Nation) INSERT (:Audited&Tagged {nkey: n.key}) FINISH")
        require(ret.isEmpty, "FINISH must yield no result")
        Cypher.run(s, g2, "MATCH (a:Audited:Tagged) RETURN a.nkey AS nkey")
      },
      Some("SELECT CAST(n_nationkey AS BIGINT) AS nkey FROM nation")),

    QueryDef("q_cypher_write_merge",
      (s, d) => {
        val (g2, _) = Cypher.execute(s, TpchGraph.load(s, d),
          """MATCH (c:Customer)
            |MERGE (seg:Segment {name: c.mktsegment})""".stripMargin)
        Cypher.run(s, g2, "MATCH (seg:Segment) RETURN seg.name AS segment")
      },
      Some("SELECT DISTINCT c_mktsegment AS segment FROM customer")),

    // COLLECT{} with ORDER BY DESC + LIMIT — the sort/slice happens inside
    // the collected array (array_sort comparator + slice), one shuffle
    QueryDef("q_cypher_collect_order",
      (s, d) => {
        val df = Cypher.run(s, TpchGraph.load(s, d),
          """MATCH (r:Region)
            |RETURN r.name AS rname,
            |  COLLECT { MATCH (n:Nation)-[:IN_REGION]->(r)
            |            RETURN n.name ORDER BY n.name DESC LIMIT 3 } AS top3""".stripMargin)
        df.select(col("rname"), array_join(col("top3"), ",").as("top3"))
      },
      Some("""SELECT r_name AS rname,
             |  coalesce(string_agg(n_name, ',' ORDER BY n_name DESC), '') AS top3
             |FROM region LEFT JOIN (
             |  SELECT n_regionkey, n_name,
             |    row_number() OVER (PARTITION BY n_regionkey
             |                       ORDER BY n_name DESC) AS rn
             |  FROM nation) n ON n.n_regionkey = r_regionkey AND n.rn <= 3
             |GROUP BY r_name""".stripMargin)),

    // OPTIONAL CALL {} with per-input-row ORDER BY ... LIMIT 1: customers
    // without a qualifying order survive with a NULL yield; the inner
    // pagination is a row_number window partitioned by the importing key
    cq("q_cypher_optional_call",
      """MATCH (c:Customer) WHERE c.key <= 80
        |OPTIONAL CALL { WITH c
        |  MATCH (c)-[:PLACED]->(o:Order) WHERE o.totalprice > 400000
        |  RETURN o.key AS big_order ORDER BY o.totalprice DESC, o.key LIMIT 1 }
        |RETURN c.key AS ckey, big_order""".stripMargin,
      """SELECT ckey, big_order FROM (
        |  SELECT c_custkey AS ckey, o_orderkey AS big_order,
        |    row_number() OVER (PARTITION BY c_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM customer LEFT JOIN orders
        |    ON o_custkey = c_custkey AND o_totalprice > 400000
        |  WHERE c_custkey <= 80) WHERE rn = 1""".stripMargin),

    // shortestPath with inline-filtered (previously unbound) endpoints:
    // both bind via their own seeks, then the per-pair early-exit BFS runs
    cq("q_cypher_shortest_inline",
      """MATCH p = shortestPath(
        |  (a:Nation {name: 'NATION_1'})-[:IN_REGION*..2]-(b:Nation {name: 'NATION_6'}))
        |RETURN length(p) AS hops""".stripMargin,
      """SELECT 2 AS hops FROM nation a, nation b
        |WHERE a.n_name = 'NATION_1' AND b.n_name = 'NATION_6'
        |  AND a.n_regionkey = b.n_regionkey""".stripMargin),

    // GQL quantified relationship ->{1,2}: paths of 1 hop (orders) plus
    // 2 hops (order->CONTAINS->part = lineitems) per customer
    cq("q_cypher_gql_quantifier",
      """MATCH (c:Customer)-[:PLACED|CONTAINS]->{1,2}(x)
        |WHERE c.key <= 20
        |RETURN c.key AS ckey, count(*) AS paths""".stripMargin,
      """SELECT c_custkey AS ckey,
        |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey)
        |  + (SELECT count(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |     WHERE o_custkey = c_custkey) AS paths
        |FROM customer WHERE c_custkey <= 20""".stripMargin),

    // pattern comprehension [(c)-[:PLACED]->(o) | o.key] — RollUpApply
    // lowering; empty matches yield [] (not a dropped row). Arrays compare
    // as joined strings per the oracle convention.
    QueryDef("q_cypher_pattern_comprehension",
      (s, d) => {
        val df = Cypher.run(s, TpchGraph.load(s, d),
          """MATCH (c:Customer) WHERE c.key <= 50
            |RETURN c.key AS ckey, [(c)-[:PLACED]->(o) | o.key] AS orders""".stripMargin)
        df.select(col("ckey"), array_join(col("orders"), ",").as("orders"),
          size(col("orders")).as("n"))
      },
      Some("""SELECT c_custkey AS ckey,
             |  coalesce(string_agg(o_orderkey, ',' ORDER BY o_orderkey), '') AS orders,
             |  CAST(count(o_orderkey) AS INT) AS n
             |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |WHERE c_custkey <= 50
             |GROUP BY c_custkey""".stripMargin)),

    // CALL {} IN TRANSACTIONS OF n ROWS: batched MERGE over the customer
    // segments — 5 distinct segments upserted across multiple 40-row
    // commits; idempotent across batches (later batches MATCH the nodes
    // earlier commits created).
    QueryDef("q_cypher_tx_batch",
      (s, d) => {
        val (g2, _) = Cypher.execute(s, TpchGraph.load(s, d),
          """MATCH (c:Customer) WHERE c.key <= 200
            |CALL { WITH c
            |  MERGE (seg:Segment {name: c.mktsegment})
            |  ON CREATE SET seg.firstSeen = c.key
            |} IN TRANSACTIONS OF 40 ROWS""".stripMargin)
        Cypher.run(s, g2,
          "MATCH (seg:Segment) RETURN seg.name AS segment ORDER BY segment")
      },
      Some("""SELECT DISTINCT c_mktsegment AS segment FROM customer
             |WHERE c_custkey <= 200 ORDER BY segment""".stripMargin)),

    // CALL {} IN k CONCURRENT TRANSACTIONS (Cypher 5 concurrent batch
    // form): every batch reads the pre-statement snapshot (no batch sees a
    // sibling's writes), which on Spark collapses to one set-based job
    // with a single commit. Same final graph as the sequential form for
    // the conflict-free body, ~n× fewer commits.
    QueryDef("q_cypher_tx_concurrent",
      (s, d) => {
        val (g2, _) = Cypher.execute(s, TpchGraph.load(s, d),
          """MATCH (c:Customer) WHERE c.key <= 300
            |CALL { WITH c
            |  MERGE (seg:Segment {name: c.mktsegment})
            |} IN 4 CONCURRENT TRANSACTIONS OF 50 ROWS""".stripMargin)
        Cypher.run(s, g2,
          "MATCH (seg:Segment) RETURN seg.name AS segment ORDER BY segment")
      },
      Some("""SELECT DISTINCT c_mktsegment AS segment FROM customer
             |WHERE c_custkey <= 300 ORDER BY segment""".stripMargin)),

    // CALL {} IN TRANSACTIONS with an inner RETURN (TransactionApply, not
    // Foreach — reference LogicalPlan.scala:4039): per-batch RETURN rows
    // union into the statement result, batched-upsert-then-report.
    QueryDef("q_cypher_tx_batch_return",
      (s, d) => {
        val (_, rows) = Cypher.execute(s, TpchGraph.load(s, d),
          """MATCH (c:Customer) WHERE c.key <= 120
            |CALL { WITH c
            |  MERGE (seg:Segment {name: c.mktsegment})
            |  RETURN c.key AS ckey, seg.name AS segname
            |} IN TRANSACTIONS OF 50 ROWS
            |RETURN ckey, segname ORDER BY ckey""".stripMargin)
        rows.get
      },
      Some("""SELECT c_custkey AS ckey, c_mktsegment AS segname
             |FROM customer WHERE c_custkey <= 120
             |ORDER BY ckey""".stripMargin)),

    QueryDef("q_cypher_write_set",
      (s, d) => {
        val (g2, _) = Cypher.execute(s, TpchGraph.load(s, d),
          """MATCH (o:Order) WHERE o.totalprice > 400000
            |SET o:Big, o.priority = 'JUMBO'""".stripMargin)
        Cypher.run(s, g2,
          """MATCH (o:Big) RETURN o.priority AS priority, count(*) AS n""")
      },
      Some("""SELECT 'JUMBO' AS priority, count(*) AS n FROM orders
             |WHERE o_totalprice > 400000 HAVING count(*) > 0""".stripMargin)),

    // SET from map: += merges (comment survives, null removes mktsegment),
    // = replaces (every other property nulls out).
    QueryDef("q_cypher_set_map",
      (s, d) => {
        val (g2, _) = Cypher.execute(s, TpchGraph.load(s, d),
          """MATCH (c:Customer) WHERE c.key <= 20
            |SET c += {grade: 'gold', mktsegment: null}""".stripMargin)
        val (g3, _) = Cypher.execute(s, g2,
          """MATCH (c:Customer) WHERE c.key > 20 AND c.key <= 25
            |SET c = {grade: 'reset'}""".stripMargin)
        // replace-form rows lose `key` too (SET c = {...} removes every
        // other property) — they are only findable via the new grade
        Cypher.run(s, g3,
          """MATCH (c:Customer) WHERE c.key <= 25 OR c.grade = 'reset'
            |RETURN c.key AS k, c.grade AS grade, c.mktsegment AS seg,
            |       c.name AS name
            |ORDER BY k""".stripMargin)
      },
      Some("""SELECT c_custkey AS k, 'gold' AS grade,
             |  CAST(NULL AS VARCHAR) AS seg, c_name AS name
             |FROM customer WHERE c_custkey <= 20
             |UNION ALL
             |SELECT CAST(NULL AS BIGINT), 'reset', CAST(NULL AS VARCHAR),
             |  CAST(NULL AS VARCHAR)
             |FROM customer WHERE c_custkey > 20 AND c_custkey <= 25
             |ORDER BY k""".stripMargin)),

    QueryDef("q_cypher_write_delete",
      (s, d) => {
        val (g2, _) = Cypher.execute(s, TpchGraph.load(s, d),
          "MATCH (su:Supplier) WHERE su.key % 10 = 0 DETACH DELETE su")
        Cypher.run(s, g2,
          "MATCH (:Order)-[r:SUPPLIED_BY]->(:Supplier) RETURN count(*) AS n_links")
      },
      Some("""SELECT count(*) AS n_links FROM lineitem
             |JOIN supplier ON s_suppkey = l_suppkey
             |WHERE s_suppkey % 10 <> 0""".stripMargin))
  )
}
