ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ethindexerspark"
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
// DEFAULT test run excludes the multi-minute duration-contract tests
// (tagged org.scalatest.tags.Slow: the StreamingDedup 40/50-batch soaks,
// the randomized span-equivalence sweep) so `sbt test` fits a CI window
// (~15 min instead of ~58); `sbt testFull` runs the whole suite,
// duration contracts included.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-l", "org.scalatest.tags.Slow")
addCommandAlias("testFull", "; set Test / testOptions := Seq(); test")
// Forked run output goes straight to stdout, NOT through sbt's logger —
// the bench/verify drivers parse bare JSON lines and an "[info] " prefix
// breaks them. Suppressing the "[success] Total time" banner keeps the
// bench JSON as the LAST stdout line, inside the driver's bounded tail.
run / outputStrategy := Some(StdoutOutput)
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
