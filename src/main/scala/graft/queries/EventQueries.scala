package graft.queries

import graft.GraftSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream analytics over the `events` table — the batch twins of the
 * Structured Streaming surface (graft.streaming): tumbling windows,
 * session windows (gaps-and-islands), distinct users. The streaming
 * versions share the same expressions; these oracle-checked batch forms
 * pin their semantics.
 *
 * events.ts arrives as whatever physical type the driver generated
 * (LONG nanos under nanosAsLong, or tz-naive TIMESTAMP(MICROS)) —
 * GraftSession.normalizeTs converts either to TimestampType; DuckDB reads
 * the same column natively.
 */
object EventQueries {
  import QueryDef.t

  private def events(s: org.apache.spark.sql.SparkSession, d: String) =
    GraftSession.normalizeTs(t(s, d, "events"))

  val defs: Seq[QueryDef] = Seq(

    // Tumbling window aggregation (streaming: groupBy(window($"ts","1 hour"))).
    QueryDef("q_events_tumbling",
      (s, d) => events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total")),
      Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
             |  event_type, count(*) AS n, round(sum(value), 2) AS total
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Session windows (streaming: session_window($"ts", "30 minutes")) —
    // batch gaps-and-islands: a session breaks after >30 min idle.
    QueryDef("q_events_sessions",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
        events(s, d)
          .withColumn("us", unix_micros(col("ts")))
          .withColumn("gap",
            when(col("us") - lag(col("us"), 1).over(byUser) > 1800L * 1000000L, 1)
              .otherwise(when(lag(col("us"), 1).over(byUser).isNull, 1).otherwise(0)))
          .groupBy(col("user_id"))
          .agg(sum(col("gap")).cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
      },
      Some("""WITH g AS (SELECT user_id, epoch_us(ts) AS us,
             |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) > 1800000000
             |         OR lag(us) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) IS NULL
             |    THEN 1 ELSE 0 END AS gap
             |  FROM events)
             |SELECT user_id, CAST(sum(gap) AS BIGINT) AS n_sessions,
             |  count(*) AS n_events
             |FROM g GROUP BY user_id""".stripMargin)),

    // Retention cohorts (the standard product-analytics matrix): users
    // cohort by first-seen day; cell (cohort, offset) counts users active
    // offset days later. Two aggregates — first-seen per user (partial-
    // aggregable min), then distinct users per (cohort, offset).
    QueryDef("q_events_retention",
      (s, d) => {
        val e = events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val first = e.groupBy("user_id").agg(min(col("day")).as("cohort"))
        e.join(first, "user_id")
          .select(col("user_id"), col("cohort"),
            datediff(col("day"), col("cohort")).cast("long").as("offset"))
          .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
            col("offset"))
          .agg(countDistinct("user_id").as("active_users"))
      },
      Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
             |first AS (SELECT user_id, min(day) AS cohort FROM e
             |  GROUP BY user_id)
             |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
             |  CAST(day - cohort AS BIGINT) AS "offset",
             |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
             |FROM e JOIN first USING (user_id)
             |GROUP BY 1, 2""".stripMargin)),

    // Last-touch attribution: each purchase credits the user's most
    // recent preceding click/view within 24h (ties cannot occur — event
    // times are microsecond-distinct per user in the fixture, and the
    // window orders on the full (us, event_id) pair anyway).
    QueryDef("q_events_attribution",
      (s, d) => {
        val e = events(s, d).withColumn("us", unix_micros(col("ts")))
        val touches = e.filter(col("event_type").isin("click", "view"))
          .select(col("user_id"), col("us").as("t_us"),
            col("event_id").as("touch_id"), col("event_type").as("channel"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("us").as("p_us"),
            col("event_id").as("purchase_id"), col("value"))
        val w = Window.partitionBy("purchase_id")
          .orderBy(col("t_us").desc, col("touch_id").desc)
        purchases.join(touches, Seq("user_id"))
          .filter(col("t_us") <= col("p_us") &&
            col("t_us") > col("p_us") - 86400L * 1000000L)
          .withColumn("__rk", row_number().over(w))
          .filter(col("__rk") === 1)
          .groupBy("channel")
          .agg(count(lit(1)).as("purchases"),
            round(sum("value"), 2).as("attributed_value"))
      },
      Some("""WITH t AS (SELECT user_id, epoch_us(ts) AS t_us,
             |    event_id AS touch_id, event_type AS channel FROM events
             |  WHERE event_type IN ('click', 'view')),
             |p AS (SELECT user_id, epoch_us(ts) AS p_us,
             |    event_id AS purchase_id, value FROM events
             |  WHERE event_type = 'purchase'),
             |j AS (SELECT p.purchase_id, p.value, t.channel, row_number() OVER (
             |    PARTITION BY p.purchase_id
             |    ORDER BY t.t_us DESC, t.touch_id DESC) AS rk
             |  FROM p JOIN t ON t.user_id = p.user_id
             |  WHERE t.t_us <= p.p_us AND t.t_us > p.p_us - 86400000000)
             |SELECT channel, count(*) AS purchases,
             |  round(sum(value), 2) AS attributed_value
             |FROM j WHERE rk = 1 GROUP BY channel""".stripMargin)),

    // The attribution MACHINE at row level (batch mode of the streaming
    // flatMapGroupsWithState twin): per-purchase attributed rows must
    // match the SQL window-rank formulation exactly — this pins the
    // machine's ordering discipline (touches before same-instant
    // purchases, (us, id) tie-breaks) to the declarative semantics.
    QueryDef("q_events_attribution_rows",
      (s, d) => graft.streaming.EventStreams.attributionDetect(events(s, d))
        .select(col("purchase_id"), col("user_id"), col("channel"),
          round(col("value"), 2).as("value")),
      Some("""WITH t AS (SELECT user_id, epoch_us(ts) AS t_us,
             |    event_id AS touch_id, event_type AS channel FROM events
             |  WHERE event_type IN ('click', 'view')),
             |p AS (SELECT user_id, epoch_us(ts) AS p_us,
             |    event_id AS purchase_id, value FROM events
             |  WHERE event_type = 'purchase'),
             |j AS (SELECT p.purchase_id, p.user_id, p.value, t.channel,
             |    row_number() OVER (PARTITION BY p.purchase_id
             |      ORDER BY t.t_us DESC, t.touch_id DESC) AS rk
             |  FROM p JOIN t ON t.user_id = p.user_id
             |  WHERE t.t_us <= p.p_us AND t.t_us > p.p_us - 86400000000)
             |SELECT purchase_id, user_id, channel, round(value, 2) AS value
             |FROM j WHERE rk = 1""".stripMargin)),

    // Sliding windows (streaming: window($"ts","1 hour","30 minutes")) —
    // each event lands in exactly two windows; the oracle materializes both
    // 30-minute-aligned window starts per event.
    QueryDef("q_events_sliding",
      (s, d) => graft.streaming.EventStreams.slidingCounts(events(s, d)),
      Some("""SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
             |  count(*) AS n
             |FROM (
             |  SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS ws, event_type
             |  FROM events
             |  UNION ALL
             |  SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES,
             |    event_type
             |  FROM events)
             |GROUP BY 1, 2""".stripMargin)),

    // Streaming-dedup batch twin: dropDuplicates on the business key
    // (user_id, event_type) — the ingest-side exact-dedup stage.
    QueryDef("q_events_dedup",
      (s, d) => graft.streaming.EventStreams
        .dedupEvents(events(s, d), Seq("user_id", "event_type"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n
             |FROM events GROUP BY event_type""".stripMargin)),

    // Exact count(DISTINCT …) per group.
    QueryDef("q_events_distinct_users",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
             |  count(*) AS n_events
             |FROM events GROUP BY event_type""".stripMargin)),

    // Stream-stream interval join batch twin: click→purchase funnel within
    // 1 hour per user. Micros-exact comparison on both sides (Spark ts is
    // TIMESTAMP(µs) after the nanos conversion; the oracle compares
    // epoch_us so the boundary can't drift a nanosecond).
    QueryDef("q_events_funnel",
      (s, d) => {
        val ev = events(s, d)
        graft.streaming.EventStreams.funnelJoin(ev, ev)
      },
      Some("""SELECT c.user_id, c.event_id AS click_id,
             |  p.event_id AS purchase_id, p.value AS purchase_value
             |FROM events c JOIN events p ON p.user_id = c.user_id
             |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
             |  AND epoch_us(p.ts) > epoch_us(c.ts)
             |  AND epoch_us(p.ts) <= epoch_us(c.ts) + 3600000000""".stripMargin)),

    // approx_count_distinct (HLL) — reference has exact-only aggregation
    // (SURVEY §2.5 gap). Sketch estimates are implementation-specific, so
    // the oracle pins the ERROR BOUND instead of the estimate: the engine
    // emits the exact count plus a within-tolerance flag (|approx−exact|
    // ≤ 2·rsd·exact at the default rsd 0.05), the oracle derives exact
    // counts and asserts the flag true — a deterministic, hash-checkable
    // row. Point estimates remain spec-pinned in AggregationSpec.
    QueryDef("q_events_approx_distinct",
      (s, d) => events(s, d)
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("__approx"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("__approx") - col("exact_users")) <=
            lit(0.10) * col("exact_users")).as("within_tol")),
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
             |  true AS within_tol
             |FROM events GROUP BY event_type""".stripMargin)),

    // Graph ingestion (batch twin of GraphIngest.ingestGraph): one MERGE
    // batch of the whole events table into a fresh store, then the graph's
    // per-label node counts, rel count, and the ON MATCH-maintained
    // last-seen maximum — all re-derivable relationally.
    QueryDef("q_graph_ingest",
      (s, d) => {
        val dir = java.nio.file.Files.createTempDirectory("graft_q_ingest").toString
        graft.streaming.GraphIngest.ingestBatch(events(s, d), dir)
        val g = new graft.graph.GraphStore(s, dir).load()
        val users = g.nodes.filter(array_contains(col("labels"), "User"))
        val evs = g.nodes.filter(array_contains(col("labels"), "Event"))
        users.agg(count(lit(1)).as("n_users"), max(col("seen_us")).as("max_seen"))
          .crossJoin(evs.agg(count(lit(1)).as("n_events")))
          .crossJoin(g.rels.agg(count(lit(1)).as("n_rels")))
      },
      Some("""SELECT
             |  (SELECT count(DISTINCT user_id) FROM events) AS n_users,
             |  (SELECT max(epoch_us(ts)) FROM events) AS max_seen,
             |  (SELECT count(DISTINCT event_id) FROM events) AS n_events,
             |  (SELECT count(DISTINCT event_id) FROM events) AS n_rels""".stripMargin)),

    // Event-time sequence detection (flatMapGroupsWithState custom state):
    // greedy earliest signup→click→purchase per user with strictly
    // increasing event time. The oracle pins the FIRST completion per user
    // — nested earliest-after-earliest mins are exactly the greedy machine
    // (full multi-completion equality incl. streaming replay is locked in
    // EventStreamsSpec).
    QueryDef("q_events_sequence",
      (s, d) => graft.streaming.EventStreams.sequenceDetect(
          events(s, d), Seq("signup", "click", "purchase"))
        .groupBy(col("user_id"))
        .agg(min(col("completed_us")).as("first_us")),
      Some("""WITH a AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
             |    WHERE event_type = 'signup' GROUP BY user_id),
             |b AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
             |    JOIN a ON a.user_id = e.user_id
             |    WHERE e.event_type = 'click' AND epoch_us(e.ts) > a.t1
             |    GROUP BY e.user_id),
             |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
             |    JOIN b ON b.user_id = e.user_id
             |    WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > b.t2
             |    GROUP BY e.user_id)
             |SELECT user_id, t3 AS first_us FROM c""".stripMargin))
  )
}
