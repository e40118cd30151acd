ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "goosmspark"
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
val graftJvmHook: Seq[String] = sys.env
  .get("SPARK_GRAFT_JVM_OPTS")
  .toSeq
  .flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
// GC: G1, explicitly. ParallelGC was tried in round 4 to avoid G1's heap
// uncommit/recommit page-fault cost on this hypervisor, but ParallelGC has no
// concurrent class unloading — Spark's per-stage generated classes accumulate
// until the JIT stops compiling, making long-lived JVMs cumulatively ~10x
// slower (41-query gate: 1269 s vs 132 s with G1, same box/heap). The
// page-fault motivation is instead addressed by pinning -Xms=-Xmx for `run`
// below: with a fixed-size heap G1 never uncommits regions either, so each
// page faults exactly once.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+UseG1GC",
) ++ graftJvmHook
// -Xms pin only for run/bench mains: test forks stay elastic so concurrent
// `sbt test` forks on smaller hosts don't fail at startup reserving 8g each.
// The env hook is re-appended after the pin so it can still override -Xms
// (the JVM honors the last occurrence of a flag).
run / javaOptions ++= Seq(
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
) ++ graftJvmHook
