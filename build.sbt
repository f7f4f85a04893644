ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "graphmapreducespark"
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
// Forked run output goes STRAIGHT to this process's stdout/stderr instead
// of through sbt's logger: the default LoggedOutput strategy prefixes
// every child stdout line with "[info] " (even raw fd-1 writes — the pipe
// is at the process boundary), which made the Bench JSON line non-JSON to
// a strict parser (BENCH_r09/r10 "parsed": null). Side benefit: Spark's
// stderr logging stays on stderr instead of being folded into stdout as
// "[error] " lines, so the driver's 2000-char stdout tail holds only
// deliberate output.
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
  // local[32] runs executors in-process: size the single JVM for 32
  // concurrent tasks + block-manager storage (machine has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
