package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Relational operator coverage (SURVEY §2.1-2.2, §2.4-2.7): scans, filters,
 * projections, joins (inner/outer/semi/anti/value/cartesian), aggregation,
 * distinct, sort/top/skip/limit, set ops, window functions.
 *
 * Each query names the logical operator(s) it exercises, mapped from the
 * reference inventory (LogicalPlan.scala line refs in SURVEY §2).
 */
object RelationalQueries {

  import QueryDef.t

  /** Skew-salted two-phase distinct count (graft.ops.Skew) — must equal
    * plain count(DISTINCT) exactly. */
  private val skewDefs: Seq[QueryDef] = Seq(
    QueryDef("q_skew_distinct",
      (s, d) => graft.ops.Skew.saltedDistinctCount(
        t(s, d, "lineitem").select(col("l_orderkey").as("okey"), col("l_suppkey")),
        "okey", "l_suppkey", salts = 8),
      Some("""SELECT l_orderkey AS okey, count(DISTINCT l_suppkey) AS n_distinct
             |FROM lineitem GROUP BY l_orderkey""".stripMargin)))

  val defs: Seq[QueryDef] = skewDefs ++ Seq(

    // Aggregation :728 (EagerAggregationPipe) — TPC-H Q1 shape: partial agg
    // map-side, single shuffle on the (tiny) grouping key.
    QueryDef("q_agg_group",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             |  round(avg(l_discount), 4) AS avg_disc,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Selection :3575 + Projection :3443 — predicate reaches the parquet scan
    // (PushedFilters), projection prunes to 4 columns (ReadSchema).
    QueryDef("q_filter_project",
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") < 5 && col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
             |FROM lineitem WHERE l_quantity < 5 AND l_returnflag = 'A'""".stripMargin)),

    // NodeHashJoin :2784 / Expand :2012 — Customer-PLACED->Order as the join
    // it is; small side broadcast by AQE.
    QueryDef("q_join_expand",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total")),
      Some("""SELECT c_custkey, c_name, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS total
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey, c_name""".stripMargin)),

    // Top :3913 — orderBy.limit compiles to TakeOrderedAndProject (no global
    // sort; per-partition heap + driver merge).
    QueryDef("q_top_k",
      (s, d) => t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin)),

    // Distinct :1899
    QueryDef("q_distinct",
      (s, d) => t(s, d, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct(),
      Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")),

    // SemiApply :3659 (EXISTS) — left-semi join, no row multiplication.
    QueryDef("q_semi_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name")),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""".stripMargin)),

    // AntiSemiApply :3676 (NOT EXISTS) — left-anti join.
    QueryDef("q_anti_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)),

    // OptionalExpand :2032 — left-outer; count(col) skips NULLs on both sides.
    QueryDef("q_optional_expand",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders")),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |GROUP BY c_custkey""".stripMargin)),

    // CartesianProduct :1171 — tiny×tiny only; anything larger must be a join.
    QueryDef("q_cartesian",
      (s, d) => {
        val r1 = t(s, d, "region").select(col("r_name").as("name_a"))
        val r2 = t(s, d, "region").select(col("r_name").as("name_b"))
        r1.crossJoin(r2).filter(col("name_a") < col("name_b"))
      },
      Some("""SELECT r1.r_name AS name_a, r2.r_name AS name_b
             |FROM region r1 CROSS JOIN region r2 WHERE r1.r_name < r2.r_name""".stripMargin)),

    // ValueHashJoin :4865 — equi-join on an arbitrary property expression.
    QueryDef("q_value_join",
      (s, d) => t(s, d, "customer")
        .join(t(s, d, "supplier"), col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_pairs")),
      Some("""SELECT c_nationkey AS nationkey, count(*) AS n_pairs
             |FROM customer JOIN supplier ON c_nationkey = s_nationkey
             |GROUP BY c_nationkey""".stripMargin)),

    // Union :4734 (distinct variant = Union + Distinct, LogicalPlanProducer
    // planUnion:2546).
    QueryDef("q_union_distinct",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .union(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct(),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |UNION SELECT s_nationkey FROM supplier""".stripMargin)),

    // INTERSECT/EXCEPT — absent in Cypher (SURVEY §2.7), free in Spark.
    QueryDef("q_except",
      (s, d) => t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .except(t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |EXCEPT SELECT s_nationkey FROM supplier""".stripMargin)),

    // Skip :3863 + Limit :2565 — deterministic under full ORDER BY.
    QueryDef("q_skip_limit",
      (s, d) => t(s, d, "orders").orderBy(col("o_orderkey")).offset(100).limit(20)
        .select(col("o_orderkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_orderkey LIMIT 20 OFFSET 100""".stripMargin)),

    // Sort :3875 — full sort, all columns out.
    QueryDef("q_sort",
      (s, d) => t(s, d, "nation").orderBy(col("n_name"), col("n_nationkey")),
      Some("SELECT * FROM nation ORDER BY n_name, n_nationkey")),

    // Top1WithTies :3923 — rank()=1 keeps ties.
    QueryDef("q_top1_with_ties",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice").desc)
        t(s, d, "orders").withColumn("rk", rank().over(w))
          .filter(col("rk") === 1)
          .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT o_orderstatus, o_orderkey, o_totalprice FROM (
             |  SELECT *, rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS rk
             |  FROM orders) WHERE rk = 1""".stripMargin)),

    // PartialTop :3234 — per-group top-n via row_number (deterministic tiebreak).
    QueryDef("q_partial_top",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        t(s, d, "orders").withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            col("rn").cast("int").as("rn"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
             |  SELECT *, row_number() OVER (PARTITION BY o_custkey
             |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders) WHERE rn <= 3""".stripMargin)),

    // Grouping + HAVING (Selection over Aggregation).
    QueryDef("q_group_having",
      (s, d) => t(s, d, "customer")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"), round(avg(col("c_acctbal")), 2).as("avg_bal"))
        .filter(col("n") > 10),
      Some("""SELECT c_nationkey, count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal
             |FROM customer GROUP BY c_nationkey HAVING count(*) > 10""".stripMargin)),

    // NodeCountFromCountStore :2748 — O(1) per-label counts (parquet footer
    // count; at scale, the GraphStats table).
    QueryDef("q_count_store",
      (s, d) => {
        val counts = Seq("region", "nation", "customer", "supplier", "part", "orders")
          .map(n => t(s, d, n).agg(count(lit(1)).as("cnt")).select(lit(n).as("label"), col("cnt")))
        counts.reduce(_ unionByName _)
      },
      Some("""SELECT 'region' AS label, count(*) AS cnt FROM region
             |UNION ALL SELECT 'nation', count(*) FROM nation
             |UNION ALL SELECT 'customer', count(*) FROM customer
             |UNION ALL SELECT 'supplier', count(*) FROM supplier
             |UNION ALL SELECT 'part', count(*) FROM part
             |UNION ALL SELECT 'orders', count(*) FROM orders""".stripMargin)),

    // RollUpApply :3534 — collect per-key list (order-normalized for compare).
    QueryDef("q_collect_list",
      (s, d) => t(s, d, "orders").filter(col("o_custkey") < 50)
        .groupBy(col("o_custkey"))
        .agg(array_join(array_sort(collect_list(col("o_orderkey"))), ",").as("order_keys")),
      Some("""SELECT o_custkey, string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS order_keys
             |FROM orders WHERE o_custkey < 50 GROUP BY o_custkey""".stripMargin)),

    // LetSemiApply :2537 — EXISTS bound as a boolean column.
    QueryDef("q_let_semi",
      (s, d) => {
        val hasBig = t(s, d, "orders").filter(col("o_totalprice") > 400000)
          .select(col("o_custkey")).distinct().withColumn("has_big", lit(true))
        t(s, d, "customer").join(hasBig, col("c_custkey") === col("o_custkey"), "left_outer")
          .select(col("c_custkey"), coalesce(col("has_big"), lit(false)).as("has_big"))
      },
      Some("""SELECT c_custkey, EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) AS has_big
             |FROM customer c""".stripMargin)),

    // SelectOrSemiApply :3615 — WHERE pred OR EXISTS{…}.
    QueryDef("q_select_or_semi",
      (s, d) => {
        val hasBig = t(s, d, "orders").filter(col("o_totalprice") > 450000)
          .select(col("o_custkey")).distinct().withColumn("has_big", lit(true))
        t(s, d, "customer").join(hasBig, col("c_custkey") === col("o_custkey"), "left_outer")
          .filter(col("c_acctbal") > 9900 || col("has_big"))
          .select(col("c_custkey"))
      },
      Some("""SELECT c_custkey FROM customer c
             |WHERE c.c_acctbal > 9900 OR EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)""".stripMargin))
  )
}
