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
    // Between queries, release what the previous query leaked: write
    // queries localCheckpoint graph snapshots whose blocks stay in the
    // block manager while ANY reference (plan cache, listener state) is
    // live. Across 149 queries in one JVM that residue compounds — r6's
    // "4x regressions" (write_delete 10.5s, undirected 6.2s) all ran
    // ≤2.6s in isolation; the slowdown was accumulated state, not plans.
    // Caches are dropped FIRST: a DataFrame still reachable after the sweep
    // that references a localCheckpoint'ed RDD would hit missing-block
    // errors on reuse — truncated lineage cannot recompute. The plan cache
    // (which holds checkpoint-backed write snapshots) is cleared; the
    // TpchGraph memo deliberately SURVIVES the sweep: its frames are
    // pristine parquet lineage (doLoad never persists or checkpoints), so
    // unpersisting can't strand them, and re-assembling the graph (8
    // parquet listings + schema reads) would otherwise add ~0.4s to every
    // one of ~120 graph queries.
    def releaseLeaks(): Unit = {
      graft.cypher.Cypher.clearCaches()
      spark.sharedState.cacheManager.clearCache()
      // warm adjacency caches owned by live graph handles are exempt
      // (RddGuard): truncated-lineage blocks cannot recompute once freed
      val keep = graft.graph.RddGuard.liveIds()
      spark.sparkContext.getPersistentRDDs.values
        .filterNot(r => keep(r.id))
        .foreach(_.unpersist(blocking = false))
    }
    // Iterative (checkpoint-loop) queries run once UNTIMED first: their
    // serial-suite numbers historically measured planner/GC machine state,
    // not the engine (r12/r13 verdicts adjudicated 1.4-1.6x artifact swings
    // down to environment) — a warm pass pins JIT/codegen so the timed run
    // reflects the code. Everything else stays single-run (the suite is
    // already ~250 queries).
    val iterative = Set(
      "q_pagerank", "q_pagerank_weighted", "q_personalized_pagerank",
      "q_eigenvector", "q_hits", "q_label_propagation", "q_louvain",
      "q_hyperball", "q_connected_components", "q_scc", "q_betweenness",
      "q_closeness", "q_fastrp", "q_core_decomposition")
    // every run (warm pass included) is timed and its failure recorded —
    // a query that only succeeds because of warm-run side effects, or that
    // fails silently, must be visible in the artifact
    def timedRun(fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { force(fn(spark, sfDir)); None } catch {
        case t: Throwable => Some((t.getClass.getSimpleName + ": " +
          Option(t.getMessage).getOrElse("")).take(160))
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val cold = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      if (iterative(name)) {
        val (cdt, cerr) = timedRun(fn) // the COLD pass, timed + recorded
        cold(name) = cdt
        cerr.foreach(e => errors(s"$name(cold)") = e)
        releaseLeaks()
        System.gc()
      }
      val (dt, err) = timedRun(fn)
      err.foreach(e => errors(name) = e)
      releaseLeaks()
      // bill GC of the previous query's garbage to the gap between
      // queries, not to whichever later query happens to trigger the
      // collection — across ~200 queries in one JVM those deferred pauses
      // read as phantom multi-x regressions of innocent queries
      System.gc()
      name -> dt
    }
    spark.stop()
    // The harness keeps only a ~2000-char tail of the output, so the JSON
    // line must stay short: 4dp values, and per-query entries for the
    // slowest 55 only (the fast tail is timing noise anyway; "reported"
    // marks the truncation so n vs |queries| mismatches don't read as
    // corruption). The complete per-query map goes to bench_full.json.
    def f(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def jesc(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def jsonMap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + jesc(k) + "\":" + f(v) }.mkString("{", ",", "}")
    def jsonStrMap(rs: Seq[(String, String)]): String =
      rs.map { case (k, v) => "\"" + jesc(k) + "\":\"" + jesc(v) + "\"" }
        .mkString("{", ",", "}")
    // warmup policy is part of the artifact so rounds stay comparable:
    // iterative queries get ONE warm pass whose (cold) timing and any
    // failure are recorded — the headline number is the warm run.
    val policy = s""""warmup":{"policy":"iterative-cold-then-timed",""" +
      s""""warmed":${cold.size},"errors":${errors.size}}"""
    def line(rs: Seq[(String, Double)], total: Double, n: Int,
        extra: String): String =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","n":$n,""" +
        s""""reported":${rs.size},$policy,"queries":${jsonMap(rs)}""" +
        s"""$extra,"sf":"${jesc(sfDir)}"}"""
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val fullExtra = s""","cold":${jsonMap(cold.toSeq)}""" +
      s""","errors":${jsonStrMap(errors.toSeq)}"""
    java.nio.file.Files.writeString( // throws on a failed/truncated write
      java.nio.file.Paths.get("bench_full.json"),
      line(results, total, results.size, fullExtra) + "\n")
    val headline = results.sortBy(-_._2).take(55).sortBy(_._1)
    println(line(headline, total, results.size, ""))
  }
}
