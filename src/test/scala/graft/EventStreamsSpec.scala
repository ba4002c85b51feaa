package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming ≡ batch: replay the driver's events table through a file-source
 * micro-batch stream (3 files → 3 micro-batches) and assert the streaming
 * aggregations converge to exactly the batch answers — the Structured
 * Streaming correctness contract.
 */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private val srcParquet = "/root/testdata/sf0.001/events.parquet"

  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream").toString
    // split into 3 TIME-ORDERED files (arrival order = event order, as a
    // real ingest would deliver) so maxFilesPerTrigger=1 yields 3 micro-
    // batches and the watermark never classifies whole batches as late
    val ev = spark.read.parquet(srcParquet)
      .withColumn("__b", ntile(3).over(Window.orderBy(col("ts"))))
    (1 to 3).foreach { i =>
      ev.filter(col("__b") === i).drop("__b")
        .coalesce(1).write.mode("append").parquet(dir)
    }
    dir
  }

  private def batchEvents =
    GraftSession.normalizeTs(spark.read.parquet(srcParquet))

  private def runStream(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
  }

  test("streaming tumbling windows equal the batch aggregation") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runStream("tumbling", EventStreams.tumblingCounts(stream))
    val streamed = spark.table("tumbling").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val batch = EventStreams.tumblingCounts(batchEvents).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming session windows match independent gaps-and-islands batch") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runStream("sessions", EventStreams.sessionCounts(stream))
    val streamed = spark.table("sessions")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // independent implementation: lag-based session starts (the oracle form
    // of q_events_sessions), not session_window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val batch = batchEvents
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("gap",
        when(col("us") - lag(col("us"), 1).over(byUser) > 1800L * 1000000L, 1)
          .otherwise(when(lag(col("us"), 1).over(byUser).isNull, 1).otherwise(0)))
      .groupBy(col("user_id"))
      .agg(sum(col("gap")).cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming sliding windows equal the batch aggregation") {
    val stream = EventStreams.readEvents(spark, streamDir)
    runStream("sliding", EventStreams.slidingCounts(stream))
    val streamed = spark.table("sliding").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventStreams.slidingCounts(batchEvents).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("streaming dedup within watermark equals batch dropDuplicates") {
    // duplicate every event id by replaying the stream dir twice into a new
    // dir — the dedup stage must collapse them back to the originals
    val dupDir = java.nio.file.Files.createTempDirectory("graft_events_dup").toString
    val ev = spark.read.parquet(streamDir)
    ev.coalesce(1).write.mode("append").parquet(dupDir)
    ev.coalesce(1).write.mode("append").parquet(dupDir)
    val stream = EventStreams.readEvents(spark, dupDir, maxFilesPerTrigger = 2)
    val q = EventStreams.dedupEvents(stream)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("dedup").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val batch = EventStreams.dedupEvents(batchEvents)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("stream-stream funnel join equals the batch interval join") {
    val stream = EventStreams.readEvents(spark, streamDir)
    val joined = EventStreams.funnelJoin(stream, stream)
    val q = joined.writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnel").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = EventStreams.funnelJoin(batchEvents, batchEvents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size} rows")
    assert(batch.nonEmpty, "fixture produced no click->purchase pairs")
  }

  /** One event a week past max(ts) — written in whatever physical ts type
    * the source files carry, so the appended file unions cleanly. */
  private def sentinelRow(ev: org.apache.spark.sql.DataFrame) = {
    val bumped = ev.agg(max(col("ts")).as("ts")).withColumn("ts",
      ev.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          col("ts") + 7L * 24 * 3600 * 1000000000L
        case _ => col("ts") + expr("INTERVAL 7 DAYS")
      })
    ev.limit(1).drop("ts").crossJoin(bumped)
      .withColumn("user_id", lit(-1L))
      .withColumn("event_type", lit("sentinel"))
      .select(ev.columns.map(col): _*)
  }

  test("streaming sequence detection equals the batch machine") {
    // the buffered state machine only releases events the watermark has
    // passed, so a sentinel event far past the real data must flush the
    // tail (real deployments simply keep receiving data)
    val seqDir = java.nio.file.Files.createTempDirectory("graft_events_seq").toString
    val ev = spark.read.parquet(streamDir)
    ev.coalesce(1).write.mode("append").parquet(seqDir)
    sentinelRow(ev).coalesce(1).write.mode("append").parquet(seqDir)

    val types = Seq("signup", "click", "purchase")
    val stream = EventStreams.readEvents(spark, seqDir)
    val q = EventStreams.sequenceDetect(stream, types)
      .writeStream.format("memory").queryName("seqdet")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("seqdet").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventStreams.sequenceDetect(batchEvents, types).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "fixture produced no completed sequences")
    assert(streamed == batch,
      s"stream ${streamed.size} vs batch ${batch.size} completions")
  }

  test("streaming last-touch attribution equals the batch machine") {
    val atDir = java.nio.file.Files.createTempDirectory("graft_events_attr").toString
    val ev = spark.read.parquet(streamDir)
    // shuffle within the file too: attribution must be arrival-order-proof
    ev.orderBy(hash(col("event_id"))).coalesce(1)
      .write.mode("append").parquet(atDir)
    // TWO sentinel files: the first advances the watermark past the real
    // data, the second triggers the micro-batch in which the now-eligible
    // event-time timeouts actually fire — without it the final flush
    // races processAllAvailable/stop
    sentinelRow(ev).coalesce(1).write.mode("append").parquet(atDir)
    sentinelRow(ev).coalesce(1).write.mode("append").parquet(atDir)
    val q = EventStreams.attributionDetect(EventStreams.readEvents(spark, atDir))
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    val batch = EventStreams.attributionDetect(batchEvents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3))).toSet
    assert(batch.nonEmpty, "fixture produced no attributed purchases")
    assert(streamed == batch,
      s"stream ${streamed.size} vs batch ${batch.size} attributions")
  }

  test("sequence detection is arrival-order independent") {
    // shuffle arrival order WITHIN each micro-batch file: the watermark
    // buffering must still process events in event-time order
    val types = Seq("signup", "click", "purchase")
    val shufDir = java.nio.file.Files.createTempDirectory("graft_events_shuf").toString
    val ev = spark.read.parquet(streamDir)
    ev.orderBy(hash(col("event_id"))).coalesce(1)
      .write.mode("append").parquet(shufDir)
    sentinelRow(ev).coalesce(1).write.mode("append").parquet(shufDir)
    val q = EventStreams.sequenceDetect(EventStreams.readEvents(spark, shufDir), types)
      .writeStream.format("memory").queryName("seqshuf")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("seqshuf").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventStreams.sequenceDetect(batchEvents, types).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("streaming graph ingestion converges to the batch graph, idempotently") {
    import graft.streaming.GraphIngest
    val storeDir = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val q = GraphIngest.ingestGraph(EventStreams.readEvents(spark, streamDir), storeDir)
    q.processAllAvailable()
    q.stop()
    val store = new graft.graph.GraphStore(spark, storeDir)
    assert(store.currentVersion >= 2, "each micro-batch should commit a version")
    val g = store.load()
    val ev = batchEvents
    val nUsers = ev.select("user_id").distinct.count()
    val nEvents = ev.select("event_id").distinct.count()
    assert(g.nodes.count() == nUsers + nEvents)
    assert(g.rels.count() == nEvents)
    // ON MATCH kept the running last-seen timestamp per user
    val expSeen = ev.groupBy("user_id").agg(max(unix_micros(col("ts"))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotSeen = g.nodes.filter(array_contains(col("labels"), "User"))
      .select("id", "seen_us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotSeen == expSeen)
    // at-least-once: replaying the WHOLE stream into the same store is a
    // no-op (merge identities derive from user_id/event_id)
    val q2 = GraphIngest.ingestGraph(EventStreams.readEvents(spark, streamDir), storeDir)
    q2.processAllAvailable()
    q2.stop()
    val g2 = new graft.graph.GraphStore(spark, storeDir).load()
    assert(g2.nodes.count() == nUsers + nEvents && g2.rels.count() == nEvents)
    val seen2 = g2.nodes.filter(array_contains(col("labels"), "User"))
      .select("id", "seen_us")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seen2 == expSeen)
  }

  test("incremental micro-batches: stream really ran more than one batch") {
    val stream = EventStreams.readEvents(spark, streamDir)
    val q = EventStreams.tumblingCounts(stream).writeStream
      .format("memory").queryName("progress").outputMode("complete").start()
    q.processAllAvailable()
    val batches = q.recentProgress.count(_.numInputRows > 0)
    q.stop()
    assert(batches >= 3, s"expected >=3 non-empty micro-batches, saw $batches")
  }
}
