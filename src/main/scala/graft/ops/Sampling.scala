package graft.ops

import graft.graph.PropertyGraph
import org.apache.spark.sql.functions._

/**
 * Deterministic graph sampling — the decimation step before prototyping an
 * expensive algorithm on a 100 TB graph: keep a seedless md5-keyed node
 * sample (the same engine-replayable convention as
 * `Curation.stratifiedSample` — growing the graph never flips an earlier
 * keep decision) and induce the subgraph on it. No reference analog (the
 * reference operates in-place); the standard scale-out practice.
 */
object Sampling {

  private def thr(rate: Double): String =
    if (rate >= 1.0) "zz"
    else f"${math.min(0xff, math.max(0, (rate * 256).round.toInt))}%02x"

  /**
   * Node-induced subgraph sample: a node survives iff the first two hex
   * digits of md5(id) fall below the rate threshold (quantized to 1/256);
   * a relationship survives iff BOTH endpoints do. Map-side node filter +
   * two id-keyed semi-joins — nothing collects, nothing seeds.
   */
  def nodeSample(g: PropertyGraph, rate: Double): PropertyGraph = {
    require(rate >= 0 && rate <= 1, s"rate out of range: $rate")
    val keep = substring(md5(col("id").cast("string")), 1, 2) < lit(thr(rate))
    val nodes = g.nodes.filter(keep)
    val ids = nodes.select(col("id"))
    PropertyGraph(nodes, g.rels
      .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi"))
  }
}
