package graft

/** Adjudication tool for the acceptance denylist: runs DENYLISTED scenarios
  * (optionally filtered by reason-class substring and/or feature substring)
  * and prints pass/fail with the first lines of each failure, so each denylist
  * line can become either a fix or a named reason class. Not a spec.
  *
  * Usage: Test/runMain graft.AccSweep [reasonSubstring] [featureSubstring]
  *   reasonSubstring: e.g. "result divergence" (default: run ALL denylisted)
  */
object AccSweep {
  def main(args: Array[String]): Unit = {
    val reasonFilter = args.headOption.getOrElse("")
    val featureFilter = if (args.length > 1) args(1) else ""
    val spark = GraftSession.builder("local[4]", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = new java.io.File(
      "/root/reference/community/cypher/spec-suite-tools/src/test/resources/acceptance/features")
    // load denylist WITH reasons
    val P = """Feature "([^"]+)": Scenario "([^"]+)"\s*//\s*(.*)""".r
    val denied: Map[(String, String), String] =
      scala.io.Source.fromFile("src/test/resources/acceptance-denylist.txt", "UTF-8")
        .getLines().collect { case P(f, s, r) => (f, s) -> r.trim }.toMap

    val scenarios = TckHarness.loadScenarios(dir)
    if (reasonFilter == "--unsupported") {
      // census of scenarios the HARNESS cannot parse (unsupported step
      // grammar), grouped by reason — the capability gap, not the engine's
      val unsup = scenarios.filter(_.unsupported.isDefined)
      println(s"=== ${unsup.size} unsupported-step scenarios ===")
      unsup.groupBy(_.unsupported.get.replaceAll("\\d+", "N").take(100))
        .toSeq.sortBy(-_._2.size).foreach { case (r, ss) =>
          println(s"${ss.size}  $r")
          ss.take(3).foreach(s => println(s"      e.g. ${s.feature} — ${s.name}"))
        }
      spark.stop()
      return
    }
    val targets = scenarios.filter { sc =>
      denied.get((sc.feature, sc.name)).exists { r =>
        r.contains(reasonFilter) && sc.feature.contains(featureFilter)
      } && sc.unsupported.isEmpty
    }
    println(s"=== ${targets.size} denylisted scenarios matching " +
      s"reason~'$reasonFilter' feature~'$featureFilter' ===")

    var passes = List.empty[String]
    var fails = List.empty[(String, String)]
    targets.foreach { sc =>
      val key = s"${sc.feature} — ${sc.name}"
      try {
        TckHarness.runScenario(spark, sc)
        passes ::= key
        println(s"PASS $key")
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(6).mkString(" ¶ ").take(900)
          fails ::= (key, msg)
          println(s"FAIL $key\n     $msg")
      }
    }
    println(s"\n=== summary: ${passes.size} now pass, ${fails.size} still fail ===")
    passes.reverse.foreach(k => println(s"  NOWPASS $k"))
    spark.stop()
  }
}
