package graft

import graft.graph.TpchGraph
import graft.ops.Bfs
import org.apache.spark.sql.functions._

/** scratch: phase timing for the pruning-BFS query (not a spec) */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", "32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $name%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r
    }
    val d = "/root/testdata/sf0.1"
    val g = t("TpchGraph.load")(TpchGraph.load(spark, d))
    val edges = g.rels.select(col("src"), col("dst"))
    t("edges distinct+ckpt count") {
      edges.distinct().localCheckpoint(false).count()
    }
    val sources = g.nodesByLabel("Customer").filter(col("key") < 100)
      .select(col("id").as("source"))
    val pe = t("pruningExpand build+exec") {
      Bfs.pruningExpand(edges, sources, 1, 2).count()
    }
    println(s"rows=$pe")
    val full = t("full q_pruning_expand") {
      SparkEntry.queries("q_pruning_expand")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    val cy = t("q_cypher_var_expand_pruned") {
      SparkEntry.queries("q_cypher_var_expand_pruned")(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
