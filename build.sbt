ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wikidatabotsspark"
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
// The driver parses Bench's one-line JSON from stdout; sbt's default
// LoggedOutput prefixes forked-process output with "[info] ", which
// breaks line-oriented JSON parsing. StdoutOutput passes the child's
// stdout/stderr through verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress the trailing "[success] Total time" line so the
// JSON stays the LAST stdout line (robust to last-line parsers too).
showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

// ---- parallel forked test groups (r16) ----
// The suite outgrew the driver's sbt-test wall budget (round 15's
// verify was killed mid-run: VERIFY_r15 tests_ok=false with no test
// failure). One sequential forked JVM ran 549 tests in ~34 min wall
// on a 32-core host at local[4] — mostly idle hardware. Suites are
// LPT-packed by their measured wall seconds (2026-08 full -oD run)
// into independent forked JVMs that run CONCURRENTLY; suites within a
// group still run sequentially, so per-suite isolation is unchanged.
// Each group gets its own java.io.tmpdir (isolates the IndexStore
// parquet artifacts + streaming checkpoints, which key off tmpdir)
// and its own spark.sql.warehouse.dir (isolates saveAsTable index
// tables) — the two places concurrent groups could otherwise race.
val testSuiteWeights: Map[String, Int] = Map(
  "graft.StreamingSpec" -> 305, "graft.IndexStoreSpec" -> 142,
  "graft.IvfIndexSpec" -> 132, "graft.EntrySkewSpec" -> 110,
  "graft.PropertySpec" -> 88, "graft.PlanShapeSpec" -> 65,
  "graft.ClusterIndexSpec" -> 57, "graft.TextAnalysisSpec" -> 54,
  "graft.RetrievalSpec" -> 48, "graft.EditIndexSpec" -> 36,
  "graft.NearDupIndexSpec" -> 32, "graft.SimilaritySpec" -> 29,
  "graft.DedupIndexSpec" -> 29, "graft.KmvSpec" -> 28,
  "graft.ImageHashIndexSpec" -> 25, "graft.QualitySpec" -> 24,
  "graft.DedupSpec" -> 23, "graft.FramesSpec" -> 20,
  "graft.EditSimilaritySpec" -> 15, "graft.TemporalSpec" -> 11,
  "graft.VideoHashSpec" -> 10, "graft.ImageHashSpec" -> 8,
  "graft.LayoutSpec" -> 8, "graft.HttpSpec" -> 5,
  "graft.PipelineSpec" -> 4, "graft.TextCleanSpec" -> 4,
  "graft.ReshapeRobustSpec" -> 4, "graft.AudioHashSpec" -> 4,
  "graft.QuantilesSpec" -> 4, "graft.HllSpec" -> 3,
  "graft.CountMinSpec" -> 3, "graft.BloomSpec" -> 2,
  "graft.EmbeddingsSpec" -> 2, "graft.SparqlWikidataSpec" -> 2)

Test / testGrouping := {
  val n = 5
  val weighted = (Test / definedTests).value
    // deterministic LPT: weight desc, then name — new suites default
    // to a mid weight so they spread rather than pile into one group
    .map(t => t -> testSuiteWeights.getOrElse(t.name, 30))
    .sortBy { case (t, w) => (-w, t.name) }
  val base = (Test / forkOptions).value
  val groupsDir = target.value / "testgroups"
  val bins = Array.fill(n)(Vector.empty[TestDefinition])
  val loads = Array.fill(n)(0L)
  weighted.foreach { case (t, w) =>
    val i = loads.zipWithIndex.minBy(_._1)._2
    bins(i) :+= t
    loads(i) += w
  }
  bins.toSeq.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    val tmp = groupsDir / s"g$i" / "tmp"
    val wh = groupsDir / s"g$i" / "warehouse"
    IO.createDirectory(tmp)
    IO.createDirectory(wh)
    Tests.Group(s"g$i", ts, Tests.SubProcess(base.withRunJVMOptions(
      base.runJVMOptions ++ Vector(
        s"-Djava.io.tmpdir=${tmp.getAbsolutePath}",
        s"-Dspark.sql.warehouse.dir=${wh.getAbsolutePath}",
        // each group JVM must size GC/JIT/common-pool threads for its
        // SLICE of the machine, not all 32 cores — five JVMs each
        // spawning 32-core thread pools measured 141 min of system
        // time (thread thrash) on a 32-min run
        "-XX:ActiveProcessorCount=6",
        // the shared-suite JVM never needs the full driver heap;
        // capping keeps five concurrent groups well inside the sandbox
        "-Xmx10g"))))
  }
}
// allow the forked groups to actually run concurrently (sbt's default
// caps ForkedTestGroup at 1)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(12),
  Tags.limit(Tags.ForkedTestGroup, 5))
