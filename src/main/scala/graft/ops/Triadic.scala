package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * TriadicSelection (LogicalPlan.scala:4160, TriadicSelectionPipe) —
 * "friend-of-friend who is not already a friend": given edges, for each a
 * find c reachable via a->b->c where a->c does NOT exist (positive variant:
 * where it DOES).
 *
 * Spark mapping per SURVEY §2.3: 2-hop self-join, then a left-anti
 * (negative) / left-semi (positive) join against the 1-hop set. Both joins
 * shuffle on the same (a, c) key, so AQE coalesces them; the reference
 * builds an in-memory set per `a` — same algorithm, hash-partitioned.
 */
object Triadic {

  def triadicSelection(edges: DataFrame, positive: Boolean): DataFrame = {
    val e = edges.select(col("src").as("a"), col("dst").as("b"))
    val e2 = edges.select(col("src").as("b"), col("dst").as("c"))
    val twoHop = e.join(e2, Seq("b")).select("a", "b", "c").filter(col("a") =!= col("c"))
    val oneHop = edges.select(col("src").as("a"), col("dst").as("c"))
    val joinType = if (positive) "left_semi" else "left_anti"
    twoHop.join(oneHop, Seq("a", "c"), joinType)
  }
}
