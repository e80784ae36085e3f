ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "steam_prices_data_engineeringspark"
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
// Driver contract: the bench/verify mains print ONE machine-parsed JSON
// line on stdout. Under the default LoggedOutput strategy sbt re-logs the
// forked JVM's stdout with an "[info] " prefix, which breaks any consumer
// that expects the line to start at column 0 (BENCH parse came back null
// four rounds running). StdoutOutput hands the child's stdout through
// unwrapped. showSuccess=false additionally drops the trailing
// "[success] Total time ..." line so the JSON line stays the LAST line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// The sequential one-JVM test run (368 tests) outgrew the driver's
// verification window (r13: the captured tail ends mid-suite with every
// visible test passing). Run suites in N forked JVMs concurrently:
// each group gets its OWN JVM and SparkSession (suites mutate session
// state — clearCache, conf.set — so sharing one session across
// concurrent suites is unsafe; separate JVMs keep per-suite semantics
// exactly). Temp dirs are per-test (Files.createTempDirectory), so
// groups never collide on the filesystem. 8 groups × local[4] = the
// box's 32 cores; heap is per-JVM (default -Xmx8g, 128 GiB box).
Test / testGrouping := {
  val groups = 8
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = (Test / forkOptions).value
  tests.zipWithIndex.groupBy(_._2 % groups).toSeq.sortBy(_._1).map {
    case (i, ts) => Tests.Group(s"g$i", ts.map(_._1), Tests.SubProcess(opts))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8),
  Tags.limitAll(32),
)
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
