ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "distributedmapreducespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// local-cluster[...] suites spawn real executor JVMs through the standalone
// launcher, which resolves the jars dir from SPARK_HOME and the scala
// version from SPARK_SCALA_VERSION (a release layout has no build dirs).
Test / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13",
)
// Suites share one local[4] SparkSession; running them in parallel starves
// the parallelism-probe tests (mtiming/rtiming) of executor threads.
Test / parallelExecution := false
run / fork := true
// Forked `run` output must reach stdout verbatim (no sbt "[info] " prefix):
// the driver parses Bench's single JSON line from stdout.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
// Heap sizing: local[32] runs driver + all 32 executor threads in ONE JVM,
// so this heap plays the role of an entire cluster's worth of executor
// memory. 8g was measurably undersized: once a long session accumulates
// normal working state, a streaming query's allocation burst drives full-GC
// pauses that bleed multi-second penalties into the NEXT several queries
// (BENCH_r03's q4_join_multi 6.3s vs 0.8s isolated — same plan, pure GC).
// 24g gives the same per-core memory a real 4-executor × 8-core × 6g
// cluster would have; numbers are then position-independent.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
