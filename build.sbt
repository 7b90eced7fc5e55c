ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "osm2orcspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// The bench driver parses a bounded stdout TAIL for Bench's final JSON
// line; 13 rounds of `parsed: null` say sbt's framing defeats it. Two
// fixes: forward the forked JVM's output raw (no `[info] ` line prefix,
// so the JSON line starts with '{'), and drop the `[success] Total
// time` trailer (so the JSON line is the LAST line of stdout).
outputStrategy := Some(StdoutOutput)
showSuccess := false
// showSuccess is consumed by the command engine, not a task — lint
// cannot see that
Global / excludeLintKeys += showSuccess
// Suites share one SparkSession and (as of round 3) a session-global
// cache registry (graft.Caches) whose lifecycle specs assert global
// storage state — concurrent suites race on it. Sequential execution
// matches the documented one-pipeline-at-a-time session contract.
Test / parallelExecution := false
run / fork := true
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
// Default forked-JVM heap: a quarter of physical RAM, clamped to
// [4g, 32g] (the bench/verify host is a 128 GiB local[32] box — the old
// flat 8g left cache-heavy self-joins one GC spike away from eviction
// thrash there, while a flat 32g would invite the OOM killer on a
// 16 GiB contributor machine). SPARK_DRIVER_MEM overrides.
val defaultHeapGb: Int = scala.util.Try {
  val kb = scala.io.Source.fromFile("/proc/meminfo").getLines()
    .collectFirst { case l if l.startsWith("MemTotal:") =>
      l.split("\\s+")(1).toLong }.get
  math.max(4L, math.min(32L, kb / 1024 / 1024 / 4)).toInt
}.getOrElse(8)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", s"${defaultHeapGb}g")}",
)
