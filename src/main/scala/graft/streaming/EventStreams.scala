package graft.streaming

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Structured Streaming surface over the events table — the Spark-native
 * replacement for the reference's transaction-log-driven ingest (neo4j has
 * no streaming query engine; its closest analog is the TransactionEventListener
 * hook, community/kernel/.../event/TransactionEventListener.java — graft
 * instead exposes the standard readStream → watermark → window → sink
 * pipeline, which is what an analytics engine at 100 TB/day actually needs).
 *
 * Each transform is written against a plain DataFrame so the SAME code path
 * serves batch and streaming (the Structured Streaming contract): the batch
 * twins in EventQueries pin semantics through the DuckDB oracle, and
 * EventStreamsSpec replays the parquet through a file-source stream and
 * asserts equality with the batch result.
 */
object EventStreams {

  /** Schema of the driver's events table AFTER nanos→timestamp conversion
    * (parquet TIMESTAMP(NANOS) arrives as LONG under nanosAsLong). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source: file-based micro-batches over an events directory.
    * At cluster scale the same transforms run off Kafka — only this reader
    * changes. */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .withColumn("ts", GraftSession.nanosToTimestamp(col("ts")))

  /** Tumbling-window counts + sums per event type. With a watermark the
    * state store evicts windows older than the delay — bounded memory on an
    * unbounded stream. Works identically on a batch DataFrame. */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    withWm
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("total"))
  }

  /** Session windows per user (30-min idle gap): Spark's native
    * session_window keeps per-user state and merges adjacent windows —
    * the streaming form of the gaps-and-islands batch query. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    withWm
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
  }

  /** Sliding-window rates: each event lands in width/slide windows — the
    * third canonical window shape next to tumbling and session. Works
    * identically on a batch DataFrame (batch twin q_events_sliding). */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
      slide: String = "30 minutes",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    withWm
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
        col("event_type"), col("n"))
  }

  /** Streaming deduplication on a business key within the watermark — the
    * ingest-side exact-dedup stage of a training-data pipeline (late
    * duplicates beyond the delay age out of the state store; batch twin is
    * a plain dropDuplicates). */
  def dedupEvents(events: DataFrame, keys: Seq[String] = Seq("event_id"),
      watermarkDelay: String = "2 hours"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(keys)
    else events.dropDuplicates(keys)

  /** Stream-stream INTERVAL JOIN: pair each `leftType` event with the same
    * user's `rightType` events that follow within `within` (funnel
    * conversion — click→purchase attribution). Streaming needs watermarks
    * on BOTH sides plus a bounded time-range condition so each side's
    * state store can evict rows that can no longer match; the batch twin
    * (q_events_funnel) is the identical join condition. The join keys on
    * user_id, so both sides hash-partition the same way and at 100 TB the
    * state is per-user-bounded, not global. */
  def funnelJoin(left: DataFrame, right: DataFrame,
      leftType: String = "click", rightType: String = "purchase",
      within: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    val l0 = left.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("l_ts"))
    val r0 = right.filter(col("event_type") === rightType)
      .select(col("user_id").as("r_user"), col("event_id").as("purchase_id"),
        col("ts").as("r_ts"), col("value").as("purchase_value"))
    val (l, r) =
      if (left.isStreaming)
        (l0.withWatermark("l_ts", watermarkDelay),
          r0.withWatermark("r_ts", watermarkDelay))
      else (l0, r0)
    l.join(r,
        col("user_id") === col("r_user") &&
          col("r_ts") > col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr(s"INTERVAL $within"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        col("purchase_value"))
  }

  /** Per-type distinct users — streaming uses approx_count_distinct because
    * exact distinct needs unbounded state; batch twin q_events_distinct_users
    * is exact. */
  def approxDistinctUsers(events: DataFrame,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay) else events
    withWm.groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"))
  }
}
