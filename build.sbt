ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lstorespark"
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
// Stream the forked process's stdout RAW instead of through sbt's logger:
// the driver parses graft.Bench's single JSON line from stdout, and the
// logger's "[info] " prefix breaks that parse (BENCH_r01.json recorded
// "parsed": null for exactly this reason).
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
// Parallel forked test groups (round-17, verdict item 1): the suite grew to
// ~2,500 tests across 186 suites and ran ~55 min single-JVM-serial — longer
// than the driver's verify window, so VERIFY_r16 recorded tests_ok:false with
// zero failing assertions (a timeout, not a failure). Suites are round-robin
// partitioned into SPARK_GRAFT_TEST_GROUPS (default 8) forked JVMs that run
// CONCURRENTLY (each builds its own local[4] SparkSession; 8×4 = the host's
// 32 cores). Same tests, same assertions — only the wall-clock changes.
// Safe because: test temp dirs are all per-process unique
// (Files.createTempDirectory), memory-sink names collide only within one
// JVM (suites in a group still run sequentially), and FixtureCache installs
// derived layouts cross-JVM atomically (rename + adopt-the-winner).
val testGroupsN =
  scala.util.Try(sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "8").toInt)
    .getOrElse(8).max(1)
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val baseOpts = (Test / javaOptions).value.toVector
  tests.zipWithIndex.groupBy(_._2 % testGroupsN).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(
        name = s"group$i",
        tests = ts.map(_._1),
        // -Xmx appended last wins over the inherited 8g: 8 concurrent
        // sf0.001 test JVMs at 4g each stay far inside the sandbox.
        runPolicy = Tests.SubProcess(ForkOptions().withRunJVMOptions(
          baseOpts :+ "-Xmx4g")))
    }
}
// Allow the forked groups to actually run concurrently (sbt's default
// caps ForkedTestGroup at 1).
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupsN),
  Tags.limitAll(math.max(testGroupsN + 2, 10)))
