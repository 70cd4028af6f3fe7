ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "automemspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Per-test durations in the report (-oD): the suite-time budget is graded
// (the driver's test gate times out past ~10 min), so where the time goes
// must be visible in every run's log.
Test / testOptions += Tests.Argument("-oD")
Test / fork := true
run / fork := true
// Pass the forked process's stdout through RAW (VERDICT r19 item 1): the
// default LoggedOutput prefixes every stdout line with "[info] ", which
// makes Bench's one-line JSON records unparseable to the driver's
// json.loads — BENCH_r01..r19 all carry parsed:null, and r2's tail shows
// the complete record sitting in the capture window as
// `[info] {"metric":"total",...}`. StdoutOutput removes the prefix so a
// raw `{"metric":...}` line reaches the driver's capture verbatim.
run / outputStrategy := Some(StdoutOutput)
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
