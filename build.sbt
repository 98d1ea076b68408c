ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlvisualizationofcryptocurrencytradingdataspark"
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
// Pass the forked JVM's stdout through verbatim — the default
// LoggedOutput prefixes every line with "[info] ", which corrupts
// Bench's one-line JSON contract for anything parsing our stdout.
outputStrategy := Some(OutputStrategy.StdoutOutput)
// …and suppress sbt's own "[success] Total time: …" trailer, which
// otherwise lands on stdout AFTER Bench's JSON and breaks any parser
// that reads the last stdout line (BENCH_r01–r03 all failed this way).
Global / showSuccess := false
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
  // 31g keeps compressed oops enabled (the >32g cliff doubles pointer
  // width and badly hurts object-heavy operators)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "31g")}",
)
// Route Spark logs to stderr at ERROR for Bench/Verify/test runs only.
// Deliberately NOT in src/main/resources: baking rootLogger.level=error
// into the published jar would silence WARN diagnostics for every
// consumer of the artifact.
javaOptions += s"-Dlog4j2.configurationFile=${baseDirectory.value / "conf" / "log4j2.properties"}"
