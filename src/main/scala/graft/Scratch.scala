package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Disposable phase-timing scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"SCRATCH $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    (1 to 3).foreach { round =>
      println(s"--- round $round")
      val orders = t("load")(spark.read.parquet(s"$sfDir/orders.parquet"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val seq0 = orders.select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).as("rn"))
      val edges = seq0.alias("a").join(seq0.alias("b"),
          col("a.o_custkey") === col("b.o_custkey") && col("b.rn") === col("a.rn") + 1)
        .select(col("a.o_orderkey").as("src"), col("b.o_orderkey").as("dst"))
      t("edges count")(println("  edges=" + edges.count()))
      val lr = t("listRanks call")(graft.ops.Bfs.listRanks(edges, maxLength = 64))
      t("listRanks force")(lr.write.format("noop").mode("overwrite").save())
      val agg = lr.groupBy(col("head")).agg(max(col("rank")).as("chain_hops"))
      val out = seq0.filter(col("rn") === 1)
        .select(col("o_orderkey").as("head"), col("o_custkey"))
        .join(agg, Seq("head"), "left_outer")
        .select(col("o_custkey").as("custkey"),
          coalesce(col("chain_hops"), lit(0L)).cast("int").as("chain_hops"))
      t("tail force")(out.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
