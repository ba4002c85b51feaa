package graft

/** Disposable profiling main: splits parse / plan / execute wall time for
  * named bench queries (run/execute both supported via SparkEntry). */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    try force(SparkEntry.entry(spark)) catch { case _: Throwable => }
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    args.foreach { name =>
      (1 to 3).foreach { i =>
        graft.cypher.Cypher.clearCaches()
        spark.sharedState.cacheManager.clearCache()
        val keep = graft.graph.RddGuard.liveIds()
        spark.sparkContext.getPersistentRDDs.values
          .filterNot(r => keep(r.id)).foreach(_.unpersist(blocking = false))
        System.gc()
        val fn = SparkEntry.queries(name)
        val (df, tPlan) = t(fn(spark, sfDir))
        val (_, tExec) = t(force(df))
        println(f"PROF $name%-32s run$i plan=$tPlan%7.3f exec=$tExec%7.3f total=${tPlan + tExec}%7.3f")
      }
    }
    spark.stop()
  }
}
