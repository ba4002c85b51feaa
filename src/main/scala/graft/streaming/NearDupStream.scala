package graft.streaming

import graft.functions.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming near-duplicate detection — the crawl-ingest twin of the batch
 * MinHash+LSH pipeline (`Dedup.minhashCandidates`): documents arrive as a
 * stream, each is sketched map-side into the SAME fixed-seed k-minhash
 * band buckets the batch path uses (sketches written months apart stay
 * comparable), and a per-bucket `flatMapGroupsWithState` keeps the
 * smallest document id ever seen in the bucket. A document that lands in
 * a bucket already owned by a smaller id is emitted as a duplicate
 * candidate of that id — "first-seen wins", the semantics of dropping
 * re-crawled boilerplate as it arrives rather than re-running corpus-wide
 * dedup per day.
 *
 * Determinism: within a micro-batch ids sort before the state update, so
 * intra-batch arrival order never changes the answer; across batches the
 * result equals the batch canonicalization whenever ids are assigned in
 * arrival order (monotone ids — the natural crawl numbering), which is
 * what the spec replays. A candidate may be emitted once per matching
 * band; consumers take `min(dupOf)` per id or `dropDuplicates`, exactly
 * as with the batch candidate stream.
 *
 * Scale shape: state is ONE long per occupied bucket — |buckets| ≤
 * bands × |corpus|, spread across the shuffle partitions of the state
 * store, and an idle-bucket timeout (processing-time) bounds it to the
 * active crawl window when the corpus outgrows memory; eviction only
 * means a later re-crawl re-registers as an original, the standard
 * windowed-dedup trade-off (same as `EventStreams.dedupEvents`
 * in-watermark exact dedup). The sketch work is narrow map-side column
 * code shared verbatim with the batch path — no UDF shuffles, signatures
 * never ride through the band explode.
 */
object NearDupStream {

  /** (id, band, bucket) banded sketches — pure narrow column work, legal
    * on both batch and streaming frames. */
  def bandedSketches(docs: DataFrame, shingleSize: Int = 3, k: Int = 64,
      bands: Int = 16): DataFrame =
    Dedup.bandBuckets(
      Dedup.docSketches(docs, shingleSize, k).select("id", "sig"), k, bands)

  /**
   * Streaming candidate pairs (id, dupOf) with dupOf < id — id shares at
   * least one LSH band bucket with the earlier-seen dupOf. Append mode.
   * @param idleTimeout evict buckets idle this long (e.g. "7 days");
   *                    empty = keep state forever (exact, unbounded)
   */
  def candidates(docs: DataFrame, shingleSize: Int = 3, k: Int = 64,
      bands: Int = 16, idleTimeout: String = ""): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val timeoutConf = if (idleTimeout.isEmpty) GroupStateTimeout.NoTimeout
      else GroupStateTimeout.ProcessingTimeTimeout
    bandedSketches(docs, shingleSize, k, bands)
      .select(col("id"), col("band"), col("bucket"))
      .as[(Long, Int, Long)]
      .groupByKey { case (_, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, timeoutConf) {
        (_: (Int, Long), rows: Iterator[(Long, Int, Long)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val ids = rows.map(_._1).toArray.sorted
            val canon = math.min(
              state.getOption.getOrElse(Long.MaxValue), ids.head)
            state.update(canon)
            if (idleTimeout.nonEmpty) state.setTimeoutDuration(idleTimeout)
            ids.iterator.filter(_ > canon).map(id => (id, canon))
          }
      }
      .toDF("id", "dupOf")
  }

  /** Batch twin pinning the semantics: per (band, bucket) the minimum id
    * is canonical and every other member maps to it; one row per (id,
    * dupOf). Equal to replaying [[candidates]] over the same corpus in
    * monotone-id micro-batches. */
  def candidatesBatch(docs: DataFrame, shingleSize: Int = 3, k: Int = 64,
      bands: Int = 16): DataFrame =
    bandedSketches(docs, shingleSize, k, bands)
      .withColumn("dupOf",
        min(col("id")).over(Window.partitionBy("band", "bucket")))
      .filter(col("id") > col("dupOf"))
      .select("id", "dupOf").dropDuplicates("id", "dupOf")
}
