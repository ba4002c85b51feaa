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

  /** Streaming source: file-based micro-batches over an events directory.
    * At cluster scale the same transforms run off Kafka — only this reader
    * changes. The schema is taken from the files themselves (one footer
    * read) so the stream tracks whatever physical ts type the driver
    * generated; normalizeTs converts it to TimestampType either way. */
  def readEvents(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    GraftSession.normalizeTs(
      spark.readStream
        .schema(spark.read.parquet(dir).schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .parquet(dir))

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
    * state is per-user-bounded, not global.
    *
    * Liveness note (not correctness): the type filters sit below the
    * watermarks, so each side's event time advances only with ITS type's
    * traffic — a quiet side delays eviction/output but never changes the
    * joined rows. attributionDetect documents the stronger variant (all
    * types drive the watermark) for single-operator state machines, where
    * a stalled watermark would also stall emission. */
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

  /** one buffered event in the sequence-detector state (micros, id, type) */
  case class SeqEv(us: Long, eventId: Long, tpe: String)
  case class AtEv(us: Long, eventId: Long, tpe: String, value: Double)
  case class AtSt(lastUs: Long, lastId: Long, lastChannel: String,
      pending: Seq[AtEv])

  /** per-user detector state: progress index into the type sequence, the
    * event time of the last accepted step, and events the watermark has
    * not yet released */
  case class SeqSt(idx: Int, lastUs: Long, pending: Seq[SeqEv])

  /**
   * Streaming LAST-TOUCH ATTRIBUTION per user — the stateful twin of the
   * batch q_events_attribution query: each purchase credits the user's
   * most recent preceding click/view within `windowUs`. Same event-time
   * discipline as [[sequenceDetect]]: out-of-order arrivals buffer in
   * state until the watermark passes them and are processed in
   * (event-time, event-id) order with touches applied before same-instant
   * purchases, so arrival order provably never changes an attribution.
   * State per user = one last-touch scalar triple + the in-watermark
   * buffer.
   *
   * @return (purchase_id, user_id, channel, value) — attributed
   *         purchases only
   */
  def attributionDetect(events: DataFrame, touchTypes: Seq[String] =
        Seq("click", "view"), purchaseType: String = "purchase",
      windowUs: Long = 86400L * 1000000L,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val touchSet = touchTypes.toSet
    // ordered fold: touches before equal-time purchases (batch `<=`)
    def ordKey(e: AtEv): (Long, Int, Long) =
      (e.us, if (touchSet(e.tpe)) 0 else 1, e.eventId)
    def machine(st0: AtSt, evs: Seq[AtEv]): (AtSt, Seq[(Long, String, Double)]) = {
      var (lu, li, lc) = (st0.lastUs, st0.lastId, st0.lastChannel)
      val out = Seq.newBuilder[(Long, String, Double)]
      evs.foreach { e =>
        if (touchSet(e.tpe)) { lu = e.us; li = e.eventId; lc = e.tpe }
        else if (e.tpe == purchaseType && lc != null &&
          lu <= e.us && lu > e.us - windowUs)
          out += ((e.eventId, lc, e.value))
      }
      (AtSt(lu, li, lc, Seq.empty), out.result())
    }
    // The STREAMING plan must not pre-filter event types: Catalyst pushes
    // the predicate through the watermark node into the scan, so filtered
    // events would stop advancing event time and the flush of buffered
    // state would stall on quiet channels (found the hard way — the
    // sentinel rows of the stream=batch spec never reached the watermark).
    // The machine itself ignores non-touch, non-purchase events; the
    // batch branch filters freely.
    val typeFilter = col("event_type").isin((touchTypes :+ purchaseType): _*)
    val rows = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("value"))
    if (!events.isStreaming) {
      rows.filter(typeFilter)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"), col("us"), col("event_type"),
          col("value"))
        .as[(Long, Long, Long, String, Double)]
        .groupByKey(_._1)
        .flatMapGroups { (uid: Long, it: Iterator[(Long, Long, Long, String, Double)]) =>
          val evs = it.map(t => AtEv(t._3, t._2, t._4, t._5)).toSeq.sortBy(ordKey)
          machine(AtSt(Long.MinValue, 0L, null, Seq.empty), evs)._2
            .map { case (pid, ch, v) => (pid, uid, ch, v) }.iterator
        }.toDF("purchase_id", "user_id", "channel", "value")
    } else {
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      rows.withWatermark("ts", watermarkDelay)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"), col("us"), col("event_type"),
          col("value"), col("ts"))
        .as[(Long, Long, Long, String, Double, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[AtSt, (Long, Long, String, Double)](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (uid: Long, it: Iterator[(Long, Long, Long, String, Double, java.sql.Timestamp)],
              state: GroupState[AtSt]) =>
            val st = state.getOption.getOrElse(
              AtSt(Long.MinValue, 0L, null, Seq.empty))
            // irrelevant types advance the watermark upstream but never
            // need buffering — state stays bounded by relevant traffic
            val all = st.pending ++ it
              .filter(t => touchSet(t._4) || t._4 == purchaseType)
              .map(t => AtEv(t._3, t._2, t._4, t._5))
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (ready, pending) = all.partition(_.us <= wmUs)
            val (st1, done) = machine(st, ready.sortBy(ordKey))
            state.update(st1.copy(pending = pending))
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(pending.map(_.us).min / 1000L + 1)
            done.map { case (pid, ch, v) => (pid, uid, ch, v) }.iterator
        }.toDF("purchase_id", "user_id", "channel", "value")
    }
  }

  /** Event-time SEQUENCE DETECTION per user (`flatMapGroupsWithState` —
    * the custom-state operator SURVEY §2.11 names): emit a row each time a
    * user's events complete `types` in order with strictly increasing
    * event time (greedy earliest match, deterministic tie-break on
    * (time, event_id); after a completion the machine restarts and the
    * next sequence must start strictly later).
    *
    * The streaming form is the textbook CORRECT event-time state machine:
    * out-of-order arrivals buffer in state and are processed only once the
    * watermark passes them, in event-time order — so arrival order never
    * changes the answer. An event-time timeout re-fires the group when the
    * watermark crosses its oldest buffered event, so buffered events flush
    * even if the user goes quiet. State per user is bounded by the
    * watermark delay window (pending) plus two scalars — at 100 TB the
    * state store holds |active users| × delay-window events, keyed and
    * hash-partitioned by user_id like every other per-user stage.
    *
    * @return (user_id LONG, completed_us LONG epoch-micros) — one row per
    *         completed sequence; batch input runs the same machine over
    *         fully-sorted per-user events (the oracle-checked twin)
    */
  def sequenceDetect(events: DataFrame, types: Seq[String],
      watermarkDelay: String = "2 hours"): DataFrame = {
    require(types.nonEmpty, "sequence needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    // greedy machine over time-ordered events
    def machine(idx0: Int, last0: Long, evs: Seq[SeqEv]): (Int, Long, Seq[Long]) = {
      var idx = idx0
      var last = last0
      val done = Seq.newBuilder[Long]
      evs.foreach { e =>
        if (e.tpe == types(idx) && e.us > last) {
          idx += 1
          last = e.us
          if (idx == types.length) { done += e.us; idx = 0 }
        }
      }
      (idx, last, done.result())
    }
    val rows = events.select(col("user_id"), col("event_id"), col("ts"),
      col("event_type"))
    if (!events.isStreaming) {
      rows.withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"), col("us"), col("event_type"))
        .as[(Long, Long, Long, String)]
        .groupByKey(_._1)
        .flatMapGroups { (uid: Long, it: Iterator[(Long, Long, Long, String)]) =>
          val evs = it.map(t => SeqEv(t._3, t._2, t._4)).toSeq
            .sortBy(e => (e.us, e.eventId))
          machine(0, Long.MinValue, evs)._3.map(us => (uid, us)).iterator
        }.toDF("user_id", "completed_us")
    } else {
      import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
      // the watermark column must flow into the stateful operator's input
      // for EventTimeTimeout, so ts stays in the projection
      rows.withWatermark("ts", watermarkDelay)
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"), col("us"), col("event_type"),
          col("ts"))
        .as[(Long, Long, Long, String, java.sql.Timestamp)]
        .groupByKey(_._1)
        .flatMapGroupsWithState[SeqSt, (Long, Long)](
          OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (uid: Long, it: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
              state: GroupState[SeqSt]) =>
            val st = state.getOption.getOrElse(SeqSt(0, Long.MinValue, Seq.empty))
            val all = st.pending ++ it.map(t => SeqEv(t._3, t._2, t._4))
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // release only what the watermark guarantees complete, in
            // event-time order; the rest stays buffered
            val (ready, pending) = all.partition(_.us <= wmUs)
            val (idx, last, done) =
              machine(st.idx, st.lastUs, ready.sortBy(e => (e.us, e.eventId)))
            state.update(SeqSt(idx, last, pending))
            if (pending.nonEmpty)
              // re-fire when the watermark reaches the oldest buffered event
              state.setTimeoutTimestamp(pending.map(_.us).min / 1000L + 1)
            done.map(us => (uid, us)).iterator
        }.toDF("user_id", "completed_us")
    }
  }
}
