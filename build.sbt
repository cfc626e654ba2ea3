ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "serenespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// The tree compiles warning-free; keep deprecations visible so the
// posture can't silently regress.
ThisBuild / scalacOptions ++= Seq("-deprecation", "-unchecked")
Test / fork := true
run / fork := true
// The bench/verify harness parses the LAST stdout line as JSON. Two
// sbt decorations used to break that: the "[info] " prefix on forked
// program output (StdoutOutput passes it through verbatim instead)
// and the "[success] Total time: ..." footer (showSuccess kills it).
// With both, `sbt "runMain graft.Bench"` ends stdout with the bare
// summary JSON line. tools/bench.sh wraps this for one-command runs.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // headroom for persisted frames at local[32] (the box has >100g
  // free); measured insensitive between 8g and 24g, 16g splits the
  // difference (overridable)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
