package graft.ops

import graft.ops.Ckpt._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Minimum spanning forest — the distributed counterpart of the reference
 * ecosystem's spanning-tree algorithm (single-machine Prim there; a
 * priority queue doesn't distribute, so this is Borůvka's algorithm, the
 * textbook parallel MST).
 *
 * Each round: every current component picks its minimum outgoing edge
 * under the TOTAL order (weight, edge id) — the tie-break makes the MSF
 * unique, hence deterministic — those edges join the forest, and
 * components are recomputed over the grown forest. Component count at
 * least halves per round, so rounds are O(log V); each round is two hash
 * joins (endpoint relabel) + one partial-aggregable min per component +
 * one connected-components pass (which itself contracts in O(log V)
 * rounds with a driver-local fast path under the same bounded probe).
 * State rows are fixed-width id/weight tuples — no paths, no vectors.
 *
 * @param edges (id, src, dst, weight) — undirected semantics
 * @return the forest's edge rows (id, src, dst, weight)
 */
object SpanningTree {

  def minimumSpanningForest(edges: DataFrame, maxRounds: Int = 20): DataFrame = {
    val e = edges.select(col("id"), col("src"), col("dst"),
        col("weight").cast("double").as("weight"))
      .filter(col("src") =!= col("dst"))
      .freshCkpt()
    var comp = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .select(col("node"), col("node").as("comp"))
      .freshCkpt()
    var forestIds = e.sparkSession.range(0).select(col("id"))
    var r = 0
    var done = false
    while (!done && r < maxRounds) {
      r += 1
      val labeled = e
        .join(comp.select(col("node").as("src"), col("comp").as("cs")), "src")
        .join(comp.select(col("node").as("dst"), col("comp").as("cd")), "dst")
        .filter(col("cs") =!= col("cd"))
      // min outgoing edge per component, total order (weight, id)
      val chosen = labeled.select(col("cs").as("c"), col("weight"), col("id"))
        .unionByName(labeled.select(col("cd").as("c"), col("weight"), col("id")))
        .groupBy("c").agg(min(struct(col("weight"), col("id"))).as("__m"))
        .select(col("__m.id").as("id")).distinct()
        .localCheckpoint(false)
      if (chosen.isEmpty) done = true
      else {
        forestIds = forestIds.unionByName(chosen).distinct().freshCkpt()
        val forest = e.join(forestIds, Seq("id"), "left_semi")
        comp = comp.select("node")
          .join(Bfs.connectedComponents(forest.select(col("src"), col("dst")))
            .withColumnRenamed("component", "comp"), Seq("node"), "left_outer")
          .select(col("node"), coalesce(col("comp"), col("node")).as("comp"))
          .freshCkpt()
      }
    }
    require(done, s"minimumSpanningForest did not converge in $maxRounds rounds")
    e.join(forestIds, Seq("id"), "left_semi")
  }
}
