ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreducegospark"
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
// SpeculationSpec needs a local-cluster master (Spark disables
// speculation under local[...]), i.e. its own SparkContext — isolate
// it in a separate forked JVM so it never clashes with the shared
// local session the other suites use. sbt's default ForkedTestGroup
// restriction runs one group at a time. SPARK_HOME lets the
// local-cluster Worker spawn executor JVMs.
Test / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  // the executor launcher infers this from build directories that a
  // binary distribution doesn't have
  "SPARK_SCALA_VERSION" -> "2.13")
Test / testGrouping := {
  val opts = (Test / forkOptions).value
  val (cluster, rest) =
    (Test / definedTests).value.partition(_.name.contains("SpeculationSpec"))
  Seq(
    Tests.Group("main", rest, Tests.SubProcess(opts)),
    Tests.Group("local-cluster", cluster, Tests.SubProcess(opts)),
  ).filter(_.tests.nonEmpty)
}
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
  // local[32] at sf0.1 needs headroom for 32 concurrent task buffers;
  // the box has 128 GiB — 8g caused GC-bound variance in full runs
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+UseG1GC",
  // 37 queries × many whole-stage-codegen classes exhaust the default
  // 240 MB code cache mid-run; once it fills, JIT stops and random
  // later queries run interpreted 10-30× slower
  "-XX:ReservedCodeCacheSize=1g",
)
