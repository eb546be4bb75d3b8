ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hqmasterdatawarehousespark"
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
// Driver budget (VERDICT r19 next #2): one forked JVM ran the 61 suites
// sequentially in ~35 min and the driver's test window killed it. Suites
// are split into four forked-JVM groups that sbt runs CONCURRENTLY —
// same tests, same in-suite ordering, and each group gets its own
// SparkSession/WorkMeter/listener state, so cross-suite isolation is
// STRONGER than the single shared-session JVM. Heavy suites (the
// race-schedule walks, the SQL concurrency specs, the soak/property
// suites — per-test timings from the r20 profiling run) are pinned to
// separate groups so no group exceeds the slowest walk suite; the rest
// round-robin by name.
// sbt's default concurrentRestrictions cap forked test groups at ONE
// running JVM — the groups below would serialize and pay 9 extra JVM
// startups for nothing. Five concurrent groups keeps peak heap at
// ~5 × Xmx (well inside the sandbox) while the wall clock tracks the
// slowest single suite.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(32),
  Tags.limit(Tags.ForkedTestGroup, 5))
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = (Test / forkOptions).value
  val pinned = Map(
    "graft.IndexConflictWalkSpec" -> 0, // 3 walk tests, ~8 min alone
    "graft.RowLevelConflictWalkSpec" -> 1, // 300-schedule DSv2 walk
    "graft.RebuildIndexSpec" -> 2,
    "graft.ManifestIndexSourceSpec" -> 2,
    "graft.GraftSqlSpec" -> 3,
    "graft.RowLevelSqlSpec" -> 3,
    "graft.ManifestTableSpec" -> 3,
    "graft.CoverageSpec" -> 4,
    "graft.ManifestRoundTripSpec" -> 4,
    "graft.SearchTvfSpec" -> 4,
    "graft.StreamingSpec" -> 4)
  val rest = tests.filterNot(t => pinned.contains(t.name))
  val groups = tests.filter(t => pinned.contains(t.name))
    .groupBy(t => pinned(t.name))
    .toSeq ++ rest.zipWithIndex.groupBy(_._2 % 4 + 5)
    .map { case (g, ts) => g -> ts.map(_._1) }.toSeq
  groups.map { case (g, ts) =>
    Tests.Group(s"g$g", ts, Tests.SubProcess(opts))
  }
}
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
