ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bayeslitespark"
// Suppress sbt's "[success] Total time …" footer: the driver parses the
// LAST stdout line of `runMain graft.Bench` as JSON, and the footer has
// trailed (and broken) that parse for three rounds (BENCH_r{11..13}.json
// all "parsed: null"). Exit codes still signal failure; test/compile
// output keeps its own per-suite summaries.
Global / showSuccess := false
// (read by sbt's command layer, not a task — exclude from the unused-key lint)
Global / excludeLintKeys += showSuccess
// Forked run output goes straight to stdout instead of through sbt's
// logger: no "[info] " prefix on Bench's JSON record lines, so a raw
// last-line `json.loads` works without stripping.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 8g forced roaming multi-second GC pauses onto whichever bench key
  // ran while the heap was full (the box has 128 GiB; local[32] churns
  // cached frames across ~76 keys) — 24g keeps collections rare
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)

// forward sbt's stdin to the forked run so the BQL shell REPL works
run / connectInput := true
