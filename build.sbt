ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bustubvectordbspark"
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
// Pass the forked JVM's stdout through VERBATIM instead of routing it
// via sbt's logger, which prefixes every line with "[info] ". The
// round driver tails stdout and json-parses line-by-line for Bench's
// one-line artifact — with the logger prefix no line ever parses
// (BENCH_r{1..6}.json all show parsed:null). StdoutOutput makes the
// JSON headline a bare line.
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
  // 32g, not 16g: the r10 isolated substring-dedup diagnosis (SubDiag,
  // 1M docs) read 70.8s at 16g with MemoryStore spill warnings, 33.8s
  // at 32g with none, 44.6s at 48g (GC overhead past the sweet spot) —
  // the 16g default was the super-linear term in the 1M scale points
  // on this 128GiB box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // One Bench/Verify JVM runs ~250 codegen-heavy query executions;
  // the JDK default 240MB JIT code cache fills on generated classes,
  // after which the compiler shuts off and later queries measure
  // 5-10x slow (interpreted). Size it so steady-state stays JIT'd.
  "-XX:ReservedCodeCacheSize=512m",
)
