ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "thrillspark"
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
// Forked run output must reach stdout UNPREFIXED: the round driver parses
// graft.Bench's JSON line from stdout, and sbt's default logger prepends
// "[info] " which breaks that parse (BENCH_r01.json "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// r17 (VERDICT r16 #1): the 461-test suite is ~34 min of SEQUENTIAL Spark
// work (measured baseline: SpanIndex family 962 s, the staged-dedup
// equivalence test 349 s, Streaming ~250 s, Queries 190 s) — the round
// driver's `sbt test` window killed it mid-run (tests_ok: false with a
// timeout-shaped tail, >40k stages then the shutdown hook). The tests
// themselves are unchanged; they now run as forked JVM GROUPS balanced by
// measured duration, in parallel (guide §2.6 — independent jobs back-fill
// idle cores). Each group runs sequentially inside its own JVM with its
// own SparkSession, so no shared-session races; the two monster tests
// (SpanIndexChainedSpec, StagedDedupSpec) were split into their own
// classes and get dedicated groups. BucketedJoinSpec stays grouped with
// QueriesSpec: both touch catalog tables, and BucketedJoinSpec cleans the
// cwd spark-warehouse directory in a finally.
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val buckets = Map(
    "graft.SpanIndexChainedSpec" -> 1,
    "graft.StagedDedupSpec" -> 2,
    "graft.SpanIndexStoreChainSpec" -> 3, "graft.SpanIndexSpec" -> 3,
    "graft.SpanIndexCensusSpec" -> 4, "graft.FrequentItemsSpec" -> 4,
    "graft.TopKSpec" -> 4,
    "graft.StreamingSpec" -> 5,
    "graft.QueriesSpec" -> 6, "graft.BucketedJoinSpec" -> 6,
    "graft.SourcesSpec" -> 6, "graft.TablesSpec" -> 6,
    "graft.BenchSpec" -> 6, "graft.PlanInvariantsSpec" -> 6,
    "graft.FunctionsSpec" -> 7, "graft.ConnectedComponentsSpec" -> 7,
    "graft.InvarianceSpec" -> 7, "graft.CorpusSpec" -> 7,
    "graft.PropertySpec" -> 7,
  ) // everything else (SpanIndexAppendSpec + the sub-15 s specs) -> g0
  (Test / definedTests).value
    .groupBy(t => buckets.getOrElse(t.name, 0))
    .toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"g$i", ts,
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
// sbt's default restrictions serialize forked test groups (ForkedTestGroup
// limit 1); 8 concurrent local[4] sessions fit the 32-core sandbox.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8),
  Tags.limitAll(16))
