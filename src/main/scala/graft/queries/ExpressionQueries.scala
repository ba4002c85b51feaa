package graft.queries

import org.apache.spark.sql.functions._

/**
 * Expression-surface coverage (SURVEY §2.9): string, math, temporal, CASE,
 * regex, list higher-order functions, map/JSON access, percentile/stddev
 * aggregates. All narrow map-stage work — stays in WholeStageCodegen.
 */
object ExpressionQueries {
  import QueryDef.t

  val defs: Seq[QueryDef] = Seq(

    // String functions (reference functions/ToUpper…Split etc., runtime
    // StringFunctions.scala) — lower/upper/substring/replace/trim/concat/
    // left/right/reverse/char_length.
    QueryDef("q_string_fns",
      (s, d) => t(s, d, "part").filter(col("p_partkey") < 200)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_up"),
          lower(col("p_type")).as("type_lo"),
          substring(col("p_name"), 1, 8).as("name_pre"),
          regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_us"),
          length(col("p_name")).cast("long").as("name_len"),
          reverse(col("p_brand")).as("brand_rev"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type")),
      Some("""SELECT p_partkey,
             |  upper(p_brand) AS brand_up, lower(p_type) AS type_lo,
             |  substring(p_name, 1, 8) AS name_pre,
             |  replace(p_name, ' ', '_') AS name_us,
             |  CAST(length(p_name) AS BIGINT) AS name_len,
             |  reverse(p_brand) AS brand_rev,
             |  p_brand || '/' || p_type AS brand_type
             |FROM part WHERE p_partkey < 200""".stripMargin)),

    // CONTAINS / STARTS WITH / ENDS WITH (NodeIndexContainsScan :2801,
    // NodeIndexEndsWithScan :2837 — here: pushed string predicates).
    QueryDef("q_string_predicates",
      (s, d) => t(s, d, "part")
        .filter(col("p_name").contains("green") ||
          col("p_type").startsWith("SMALL") && col("p_type").endsWith("TIN"))
        .select(col("p_partkey"), col("p_name"), col("p_type")),
      Some("""SELECT p_partkey, p_name, p_type FROM part
             |WHERE p_name LIKE '%green%'
             |   OR (p_type LIKE 'SMALL%' AND p_type LIKE '%TIN')""".stripMargin)),

    // Regex `=~` — Cypher is FULL match: anchor the pattern (SURVEY §2.9).
    QueryDef("q_regex_match",
      (s, d) => t(s, d, "customer")
        .filter(col("c_name").rlike("^Customer#0{6}1[0-9]{2}$"))
        .select(col("c_custkey"), col("c_name")),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE regexp_full_match(c_name, 'Customer#0{6}1[0-9]{2}')""".stripMargin)),

    // Math functions (functions/Abs…Sign; Cypher round = HALF_UP which is
    // DuckDB round's behavior too; Spark round is HALF_UP — they agree).
    QueryDef("q_math_fns",
      (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("abs_v"),
          ceil(col("l_extendedprice") / 1000).cast("long").as("ceil_v"),
          floor(col("l_extendedprice") / 1000).cast("long").as("floor_v"),
          round(col("l_quantity") / 7.0, 2).as("round_v"),
          sqrt(col("l_quantity")).as("sqrt_v"),
          signum(col("l_quantity") - 25).cast("int").as("sign_v"),
          pmod(col("l_orderkey"), lit(7)).cast("long").as("mod_v")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  abs(l_quantity - 25) AS abs_v,
             |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ceil_v,
             |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floor_v,
             |  round(l_quantity / 7.0, 2) AS round_v,
             |  sqrt(l_quantity) AS sqrt_v,
             |  CAST(sign(l_quantity - 25) AS INT) AS sign_v,
             |  l_orderkey % 7 AS mod_v
             |FROM lineitem WHERE l_orderkey < 100""".stripMargin)),

    // CASE expression (CaseExpression.scala) + conversions.
    QueryDef("q_case_expr",
      (s, d) => t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("bucket"))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n")),
      Some("""SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
             |            WHEN o_totalprice > 100000 THEN 'mid'
             |            ELSE 'low' END AS bucket, count(*) AS n
             |FROM orders GROUP BY 1""".stripMargin)),

    // Temporal component extraction (reference procedure/impl/temporal/*,
    // properties d.year/d.month…): year/month/day/quarter off a timestamp.
    QueryDef("q_temporal_extract",
      (s, d) => t(s, d, "orders")
        .select(
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          quarter(col("o_orderdate")).cast("long").as("q"))
        .groupBy(col("y"), col("m"), col("q")).agg(count(lit(1)).as("n"))
        .orderBy(col("y"), col("m")),
      Some("""SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
             |  quarter(o_orderdate) AS q, count(*) AS n
             |FROM orders GROUP BY 1, 2, 3 ORDER BY y, m""".stripMargin)),

    // date_trunc (temporal truncation, reference TemporalFunction truncate).
    QueryDef("q_date_trunc",
      (s, d) => t(s, d, "orders")
        .select(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
        .groupBy(col("month_start")).agg(count(lit(1)).as("n"))
        .orderBy(col("month_start")),
      Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |  count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY month_start""".stripMargin)),

    // Duration between dates (duration.between → day arithmetic here;
    // full 4-field duration struct is engine-internal, see functions/).
    QueryDef("q_date_diff",
      (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") < 200)
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("ship_days")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  date_diff('day', o_orderdate, l_shipdate) AS ship_days
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_orderkey < 200""".stripMargin)),

    // List higher-order functions (Cypher comprehensions →
    // transform/filter/aggregate, SURVEY §2.9 List): word lists per doc.
    QueryDef("q_list_hof",
      (s, d) => {
        val words = split(col("text"), "\\s+")
        t(s, d, "documents").filter(col("doc_id") < 100)
          .select(
            col("doc_id"),
            size(filter(words, w => length(w) > 5)).cast("long").as("n_long_words"),
            size(array_distinct(words)).cast("long").as("n_distinct"),
            aggregate(words, lit(0L), (acc, w) => acc + length(w)).as("total_chars"))
      },
      Some("""SELECT doc_id,
             |  CAST(len(list_filter(string_split_regex(text, '\s+'), w -> length(w) > 5)) AS BIGINT) AS n_long_words,
             |  CAST(len(list_distinct(string_split_regex(text, '\s+'))) AS BIGINT) AS n_distinct,
             |  list_sum(list_transform(string_split_regex(text, '\s+'), w -> length(w)))::BIGINT AS total_chars
             |FROM documents WHERE doc_id < 100""".stripMargin)),

    // UNWIND :4834 — explode drops empty/null lists exactly like Cypher.
    QueryDef("q_unwind",
      (s, d) => t(s, d, "documents").filter(col("doc_id") < 20)
        .select(col("doc_id"),
          explode(graft.functions.TextFunctions.tokens(col("text"))).as("word")),
      Some("""SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
             |  w -> length(w) > 0)) AS word
             |FROM documents WHERE doc_id < 20""".stripMargin)),

    // Map/JSON access (MapValue property access; events.props is JSON).
    QueryDef("q_json_access",
      (s, d) => t(s, d, "events").filter(col("event_id") < 500)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_val")),
      Some("""SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k_val
             |FROM events WHERE event_id < 500""".stripMargin)),

    // percentileCont (PercentileFunction.scala) — continuous interpolation
    // on both engines; rounded to absorb fp ulps.
    QueryDef("q_percentile",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 2).as("p50"),
          round(expr("percentile(l_quantity, 0.9)"), 2).as("p90"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  round(quantile_cont(l_quantity, 0.5), 2) AS p50,
             |  round(quantile_cont(l_quantity, 0.9), 2) AS p90
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // stdev (StdevFunction.scala) + min/max aggregates.
    QueryDef("q_stats_agg",
      (s, d) => t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd"),
          round(stddev_pop(col("l_quantity")), 4).as("sdp"),
          min(col("l_quantity")).as("mn"),
          max(col("l_quantity")).as("mx"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  round(stddev_samp(l_quantity), 4) AS sd,
             |  round(stddev_pop(l_quantity), 4) AS sdp,
             |  min(l_quantity) AS mn, max(l_quantity) AS mx
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // collect(DISTINCT …) — order-normalized for compare.
    QueryDef("q_collect_distinct",
      (s, d) => t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), "|").as("priorities")),
      Some("""SELECT o_orderstatus,
             |  string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // Window functions (Spark surplus vs Cypher — SURVEY §2.6): running sum
    // with an explicit ROWS frame (identical framing on both engines).
    QueryDef("q_window_running",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        t(s, d, "orders").filter(col("o_custkey") < 100)
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
             |FROM orders WHERE o_custkey < 100""".stripMargin)),

    // coalesce / nullif / type conversion (ToInteger/ToString/Coalesce/NullIf).
    QueryDef("q_null_fns",
      (s, d) => t(s, d, "customer").filter(col("c_custkey") < 100)
        .select(col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("-")).as("seg"),
          floor(col("c_acctbal")).cast("long").as("bal_int"),
          concat(col("c_custkey").cast("string"), lit(":"), col("c_nationkey").cast("string")).as("ck_str")),
      Some("""SELECT c_custkey,
             |  coalesce(nullif(c_mktsegment, 'BUILDING'), '-') AS seg,
             |  CAST(floor(c_acctbal) AS BIGINT) AS bal_int,
             |  CAST(c_custkey AS VARCHAR) || ':' || CAST(c_nationkey AS VARCHAR) AS ck_str
             |FROM customer WHERE c_custkey < 100""".stripMargin))
  )
}
