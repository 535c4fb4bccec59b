ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "celestraktledatapipelinespark"
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
// Pipe the forked run's stdout through RAW (no sbt "[info] " line
// prefix): the bench/verify harness parses stdout JSON lines, and the
// logger prefix has broken that parse every round so far.
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
  // JIT code-cache headroom for the 186-query surface (r16, guide §7).
  // The default 240 MB ReservedCodeCacheSize is sized for a handful of
  // hot queries; a full bench/verify run compiles tens of thousands of
  // generated-code methods, and jcmd sampling mid-run showed the
  // non-profiled nmethod heap 95% full with the profiled heap being
  // flushed. Once it fills, C2 compilation stops and flushed codegen
  // re-runs INTERPRETED: a contended r16 baseline recorded a sweep
  // re-run of q126 at 458 s process-CPU vs 11 s for the same query
  // compiled — a 40x cliff that lands on whatever runs last. 512 MB
  // keeps the whole surface compiled; the cost is virtual reservation,
  // not resident memory.
  s"-XX:ReservedCodeCacheSize=${
    sys.env.getOrElse("SPARK_GRAFT_CODE_CACHE", "512m")}",
)
