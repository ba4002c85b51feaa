ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "neo4jspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The suite (~2700 tests) ran SERIALLY in one forked JVM over a local[4]
// session: ~70 min wall on this box, which is what turned the r15 driver's
// tests_ok gate into a timeout (VERIFY_r15: output truncated mid-suite, no
// failure). Split the suites round-robin into parallel forked groups, each
// in its OWN working directory so derby metastore_db / spark-warehouse /
// relative scratch paths never collide across JVMs.
val testGroups = 6
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val base = (Test / forkOptions).value
  val workRoot = target.value / "testwork"
  tests.sortBy(_.name).zipWithIndex.groupBy(_._2 % testGroups)
    .toSeq.sortBy(_._1).map { case (i, ts) =>
      val wd = workRoot / s"g$i"
      sbt.IO.createDirectory(wd)
      Tests.Group(s"g$i", ts.map(_._1),
        Tests.SubProcess(base.withWorkingDirectory(wd)))
    }
}
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, testGroups)
// The bench/verify contract is "print ONE parseable JSON line": route forked
// run output straight to stdout (no `[info] ` logger prefix) and drop the
// trailing `[success] Total time` line so the JSON stays the last line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g (box has 128 GiB): r16 diagnosed multi-second G1 young pauses and
  // allocation stalls late in full-suite JVMs at 8g — 8g means 4 MB G1
  // regions, so shuffle-fetch buffers and ExternalAppendOnlyMap growth
  // arrays allocate humongous and churn the old gen across ~250 queries;
  // 24g doubles the region size and the headroom (OPTIMIZATION_r16.md,
  // q_pagerank_weighted diagnosis)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // ~250 queries × several whole-stage-codegen classes each run the JDK 17
  // default 240 MB code cache to its rim; when it fills the JIT disables
  // itself and compute-dense loops run interpreted (~10x). Reserved ≠
  // committed — pages are committed on demand, so the only cost is
  // address space.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // extra JVM flags for local diagnostics (GC logs, JIT logging) without
  // touching the committed defaults: GRAFT_JVM_EXTRA="-Xlog:gc:..." sbt run
  sys.env.get("GRAFT_JVM_EXTRA").toSeq.flatMap(_.trim.split("\\s+").toSeq)
