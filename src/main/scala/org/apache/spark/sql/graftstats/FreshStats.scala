package org.apache.spark.sql.graftstats

/**
 * Statistics reset for materialized checkpoints.
 *
 * `Dataset.localCheckpoint()` deliberately carries the ORIGINAL plan's
 * statistics onto the resulting `LogicalRDD` (Spark
 * `Dataset.checkpoint` → `LogicalRDD.fromDataset(originStats = …)`).
 * Spark's non-CBO size estimator (`SizeInBytesOnlyStatsPlanVisitor
 * .visitJoin`) MULTIPLIES child sizes, so an iterative
 * join→checkpoint→join loop (transactional write batches, frontier
 * searches) inherits a size estimate that grows as S^J per round —
 * after a few dozen rounds the `sizeInBytes` BigInt has millions of
 * digits and the driver burns minutes inside `BigInteger.multiply`
 * during planning. Rebuilding the frame as a bare scan of the SAME
 * already-materialized RDD drops the inherited estimate (falls back to
 * `spark.sql.defaultSizeInBytes`, a constant) and keeps planning O(plan)
 * per round.
 *
 * Lives under `org.apache.spark.sql` to reach the `private[sql]`
 * `internalCreateDataFrame`; no Spark internals are copied or modified.
 */
object FreshStats {
  /** `df` must already be a materialized checkpoint (its physical plan a
    * bare RDD scan): returns the same rows as a new frame with default
    * statistics. No data is recomputed or copied — the InternalRow RDD is
    * reused as-is. */
  def resetStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    ds.sparkSession.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }

  /** Reset only ABSURD inherited estimates (> Long.MaxValue bytes — no
    * real dataset is that large, only a compounding join product is):
    * genuinely small estimates stay, so stats-driven broadcast decisions
    * for small checkpointed frames are unchanged.
    *
    * The estimate is read DIRECTLY off the checkpoint's `LogicalRDD` leaf
    * (its carried originStats) — going through `optimizedPlan.stats` would
    * run the full Catalyst optimizer batch list per call, and iterative
    * loops (label propagation, k-core, k-truss) checkpoint every round:
    * at ~60 rounds × a few calls each that pure-driver overhead showed up
    * as a 1.4× wall regression on those queries at sf0.1. */
  def capStats(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val absurd = ds.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.stats.sizeInBytes > BigInt(Long.MaxValue)
      case _ => // not a bare checkpoint (caller contract says it is) —
        // fall back to the optimized plan's estimate
        ds.queryExecution.optimizedPlan.stats.sizeInBytes > BigInt(Long.MaxValue)
    }
    if (absurd) resetStats(df) else df
  }
}
