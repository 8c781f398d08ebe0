ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// keep "[success] Total time ..." off stdout so graft.Bench's final JSON
// line stays the LAST line of `sbt "runMain graft.Bench"` output
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
name := "pinotpulsarpluginspark"
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
// forked program output goes to stdout raw — never "[info] "-prefixed —
// so the driver's JSON-line scrape of `runMain graft.Bench` always parses
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
// Connector packaging — parity with the reference's shaded-jar deliverable
// (pom.xml:103-145). The reference must SHADE because it bundles the Pulsar
// client + its transitive tree next to Pinot's classpath; this connector's
// every dependency is Spark itself, provided by any cluster, so the plain
// package jar (library classes + the META-INF/services DataSourceRegister
// entry that resolves format("graft-events")) is already the complete
// `--jars` artifact — no relocation needed, nothing to shade. If a
// third-party client were ever added, swap this alias for sbt-assembly
// (unresolvable in this zero-egress build env).
lazy val assembly = taskKey[File]("Build the connector jar for spark-submit --jars")
assembly := (Compile / packageBin).value
