package graft.ops

import org.apache.spark.sql.DataFrame

/** Checkpoint helper for iterative loops: `df.freshCkpt()` =
  * `localCheckpoint()` + statistics cap. Spark's localCheckpoint carries
  * the ORIGINAL plan's size estimate onto the materialized scan, and the
  * non-CBO estimator multiplies join children — so frontier/commit loops
  * (BFS rounds, transactional batches, label propagation) compound the
  * estimate exponentially until the driver spends minutes multiplying
  * million-digit BigIntegers during planning. The cap resets only
  * estimates past Long.MaxValue bytes (only a compounded product gets
  * there), leaving honest small-frame stats — and their broadcast
  * decisions — untouched. See org.apache.spark.sql.graftstats.FreshStats. */
object Ckpt {
  implicit final class FreshCkptOps(private val df: DataFrame) extends AnyVal {
    def freshCkpt(): DataFrame =
      org.apache.spark.sql.graftstats.FreshStats.capStats(df.localCheckpoint())
  }
}
