ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tabledemospark"
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
// Pass the forked process's stdout straight through instead of routing it
// via sbt's logger: the logger stamps every line with "[info] ", which
// breaks machine consumers that expect Bench/Verify to emit a bare JSON
// line (the bench driver json-parses the run output).
run / outputStrategy := Some(StdoutOutput)
// ... and drop the trailing "[success] Total time ..." line for the same
// reason: the JSON line should be the last thing a runMain prints.
showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // collector for the forked Spark JVM, A/B-measurable like the heap.
  // Default = the throughput collector: this is a batch/ETL engine with
  // no latency SLO on GC pauses, and the r22 A/B at equal box load
  // measured ParallelGC at 0.85x of G1 across a 21-query probe set
  // (G1's concurrent cycles + region management tax an allocation-heavy
  // 32-thread local run). SPARK_GRAFT_GC=UseG1GC restores the JDK
  // default; a latency-sensitive serving deployment would pick G1/ZGC.
  s"-XX:+${sys.env.getOrElse("SPARK_GRAFT_GC", "UseParallelGC")}",
)
