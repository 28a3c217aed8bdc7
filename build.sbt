ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nyc_taxi_lakehousespark"
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
// The driver scrapes stdout's tail for graft.Bench's one-line JSON summary.
// Two sbt behaviors used to bury it (BENCH_r08 "parsed": null): the logger
// prefixes forked output with [info]/[error], and a final
// "[success] Total time..." line lands after the JSON. StdoutOutput routes
// the forked JVM's stdout/stderr straight through (no prefixes, no
// re-routing of Spark WARNs onto stdout), and showSuccess drops the
// trailing [success] line, so the summary JSON is the true last line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by another setting —
// silence the false-positive unused-key lint for it.
Global / excludeLintKeys += showSuccess
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
  "-Dderby.system.home=/tmp/graft-derby",
  // 16g default (was 8g): the exact-percentile/grid family allocates
  // single large aggregation buffers; at 8g the r5 bench showed warm-run
  // degradation with in-suite GC pressure as the prime suspect (q102
  // dispersion [2.7, 17.9, 19.5]). The machine has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // The 106-query bench generates thousands of whole-stage-codegen classes
  // in one JVM; the JDK default 240 MB code cache fills mid-suite, the JIT
  // shuts off ("CodeCache is full"), and every per-row kernel after that
  // point runs interpreted — measured as 2.4-3.8x medians on the narrow
  // scan queries (q30/q35/q39/q49 fast in isolation, slow in-suite).
  // 2g as of the 222-query suite (1g was sized for ~106 queries; reserved
  // address space is committed on demand, so the larger cap is free).
  "-XX:ReservedCodeCacheSize=2g",
)
