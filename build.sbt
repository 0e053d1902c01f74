ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icebergloaderspark"
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
// Pass the forked JVM's stdout through verbatim — sbt's default logger
// prefixes every line with "[info] ", which corrupts the one-line JSON
// contract of graft.Bench / the driver's stdout-tail parse.
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
  // 8g thrashes GC once the query surface passes ~50 queries in one
  // JVM (random multi-second pauses attributed to whichever query is
  // running); 24g removed the spikes at ~75 queries but they returned
  // as the surface passed 85 — 40g keeps them gone on this 128 GiB box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "40g")}",
  // ~88 queries of whole-stage-codegen classes can overflow the 240 MB
  // default JIT code cache (newly generated query code then runs
  // interpreted); 1 GB removes that confound. NOTE: the episodic
  // 20-80x per-query bench slowdowns on this VM turned out to be
  // hypervisor CPU STEAL (see Bench.cpuStat) — this flag alone did not
  // stop them — but the headroom is kept so codegen volume never
  // contributes.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("GRAFT_EXTRA_JVM_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))

// Parallel per-suite test JVMs (round 20): the suite outgrew the
// driver's sbt-test budget (~46-52 min serial). Each suite forks its
// own JVM (own SparkSession at local[4], own temp warehouse), so
// session-conf-mutating suites (ConnectorSpec) stay isolated, and up
// to GRAFT_TEST_JVMS (default 4) suites run concurrently — 4 x
// local[4] = 16 threads on the 32-core box. Assertions are untouched;
// wall drops to ~max(longest suite, total/4).
Test / testGrouping := {
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withWorkingDirectory(Option(baseDirectory.value))
    .withOutputStrategy((Test / outputStrategy).value)
  (Test / definedTests).value.map { t =>
    Tests.Group(t.name, Seq(t), Tests.SubProcess(opts))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup,
    sys.env.get("GRAFT_TEST_JVMS").map(_.toInt).getOrElse(4)),
  Tags.limitAll(16))
