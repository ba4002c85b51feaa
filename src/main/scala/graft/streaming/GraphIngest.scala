package graft.streaming

import graft.graph.{GraphStore, PropertyGraph}
import graft.ops.UpdateOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/**
 * Streaming graph ingestion — the `readStream → foreachBatch MERGE into
 * nodes/rels` pipeline SURVEY §2.11 designs (the Spark-native analog of
 * the reference's transaction-log-driven ingest,
 * community/wal/.../log/entry/): each micro-batch upserts User nodes,
 * Event nodes and DID relationships into a versioned GraphStore through
 * the same UpdateOps merge operators the Cypher write surface uses.
 *
 * Idempotent by construction: node and rel identities derive from
 * user_id/event_id, and MERGE semantics make re-delivery a no-op — so
 * at-least-once replay after checkpoint recovery converges to the same
 * graph (the spec ingests every batch twice and asserts equality).
 *
 * The GraphStore commit rewrites the snapshot per batch — right for a
 * versioned parquet store at test scale; a 100 TB deployment points the
 * same per-batch merge at an ACID table format (the merge itself is
 * bounded by |batch| × join on id, not corpus size).
 */
object GraphIngest {

  /** User node ids are the raw user_id; event node ids live in a disjoint
    * tag range (bit 44, the TpchGraph id-scheme convention). */
  val EventTag: Long = 1L << 44

  private def emptyGraph(spark: SparkSession): PropertyGraph = {
    val nodeSchema = StructType(Seq(
      StructField("id", LongType), StructField("labels", ArrayType(StringType)),
      StructField("etype", StringType), StructField("value", DoubleType),
      StructField("us", LongType), StructField("seen_us", LongType)))
    val relSchema = StructType(Seq(
      StructField("id", LongType), StructField("src", LongType),
      StructField("dst", LongType), StructField("type", StringType),
      StructField("us", LongType)))
    PropertyGraph(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], nodeSchema),
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], relSchema))
  }

  /** MERGE one (micro-)batch of events into the store: User nodes keep a
    * running last-seen timestamp ON MATCH; Event nodes and DID rels insert
    * once and stay put on re-delivery. */
  def ingestBatch(batch: DataFrame, storeDir: String): Unit = {
    val spark = batch.sparkSession
    val store = new GraphStore(spark, storeDir)
    val g0 =
      if (store.currentVersion >= 0) store.load() else emptyGraph(spark)
    val ev = batch.select(col("event_id"), col("user_id"),
      col("event_type"), col("value"), unix_micros(col("ts")).as("us"))
    // ids ≥ 2^44 would cross the Event tag range and silently conflate
    // distinct nodes under MERGE — abort the batch with a clear error
    // instead (one bounded aggregate, not a per-row driver check)
    val oob = ev.filter(col("event_id") >= EventTag || col("event_id") < 0 ||
      col("user_id") >= EventTag || col("user_id") < 0).count()
    require(oob == 0,
      s"$oob event(s) with event_id/user_id outside [0, 2^44) — would " +
        "collide the Event node tag range (GraphIngest.EventTag)")

    val users = ev.groupBy(col("user_id").as("id"))
      .agg(max(col("us")).as("seen_us"))
      .withColumn("labels", lit(Array("User")))
    val g1 = UpdateOps.mergeNodes(g0, users,
      onMatch = Map("seen_us" -> greatest(col("seen_us"), col("src_seen_us"))))

    val eventNodes = ev.select((col("event_id") + EventTag).as("id"),
        col("event_type").as("etype"), col("value"), col("us"))
      .dropDuplicates("id")
      .withColumn("labels", lit(Array("Event")))
    val g2 = UpdateOps.mergeNodes(g1, eventNodes)

    val rels = ev.select((col("event_id") + EventTag).as("id"),
        col("user_id").as("src"), (col("event_id") + EventTag).as("dst"),
        lit("DID").as("type"), col("us"))
      .dropDuplicates("id")
    val fresh = rels.join(g2.rels.select(col("id")), Seq("id"), "left_anti")
    val g3 = g2.copy(rels = g2.rels.unionByName(fresh))
    store.commit(g3)
  }

  /** Start the ingestion stream: every micro-batch lands as one store
    * version (commit = the batch boundary, like the reference applying one
    * tx-log segment at a time). */
  def ingestGraph(events: DataFrame, storeDir: String): StreamingQuery =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, storeDir)
      }
      .start()
}
