ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "similaritysearchjlspark"
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
// The bench/verify mains print a single machine-read JSON line; sbt's
// default LoggedOutput strategy prefixes forked stdout with "[info] ",
// which breaks line-oriented JSON parsing downstream. CustomOutput
// writes the forked process's output through unprefixed (StdoutOutput
// would inherit fds, but sbt then never reaps the fork under -batch
// with redirected stdio — measured: zombie JVM + indefinite hang).
run / outputStrategy := Some(OutputStrategy.CustomOutput(System.out))
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
  // local[32] runs 32 concurrent sort/seal tasks in ONE JVM. Measured
  // in round 1: an 8g heap GC-thrashes, and G1 on a lazily-GROWN heap
  // collapses under a 32-thread allocation storm (93s vs 7s for the
  // same build). Xms=Xmx sizes the GC regions up front; pages still
  // fault in lazily (no AlwaysPreTouch), so test JVMs stay cheap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  s"-XX:+${sys.env.getOrElse("SPARK_GC", "UseG1GC")}",
  s"-XX:${if (sys.env.get("SPARK_PRETOUCH").contains("0")) "-" else "+"}AlwaysPreTouch",
)
