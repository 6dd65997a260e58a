ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stedihumanbalancerediskafkasparkstreamingspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
//
// spark-sql-kafka-0-10 (the connector the reference ships via
// --packages in its submit scripts) is deliberately ABSENT: it is in
// neither /opt/spark/jars nor the offline coursier cache (verified by a
// full-filesystem search), so declaring it here would simply fail
// resolution. graft.io.KafkaSmoke therefore classloads for
// KafkaSourceProvider at runtime and skips cleanly when the connector
// (or a reachable broker) is missing; on a cluster with the connector
// on the classpath the same code runs the real round-trip. Deploys
// should add: "org.apache.spark" %% "spark-sql-kafka-0-10" % sparkVersion.
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver greps the last ~2000 chars of stdout for Bench's one-line JSON.
// sbt's default logger prefixes every forked-stdout line with "[info] ",
// which defeats that parse (BENCH_r01/r02 both landed parsed:null) — pass
// the forked process's output through verbatim instead.
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
)
