ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "qualityassurancetoolspark"
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
// The bench/verify stdout contract is a RAW parseable JSON line. The
// default forked-run outputStrategy is LoggedOutput, which re-logs the
// child's stdout as "[info] {...}" and stderr as "[error] ..." — a
// driver that takes the last line, or scans for a line starting with
// '{', never sees bare JSON (BENCH parsed:null for 13 straight rounds
// with the JSON visibly present in the tail as "[info] {...}").
// StdoutOutput passes child stdout/stderr through unprefixed.
outputStrategy := Some(OutputStrategy.StdoutOutput)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and "[success] Total time: 1282 s" printed AFTER the run would
// still land behind the JSON line in a tail capture; suppress it.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// runMain JVMs (Bench/Verify/tools) log ERROR-only: the bench stdout
// contract is one parseable JSON line, and Spark's default profile
// (which SparkContext force-installs when no config file is given)
// floods stderr with startup INFO before any in-code silencing runs.
// Scoped to `run` — tests keep the default logging for diagnostics.
run / javaOptions +=
  s"-Dlog4j2.configurationFile=file:${baseDirectory.value}/tools/log4j2-quiet.properties"
