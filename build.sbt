ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "udacity_data_engineering_capstone_projectspark"
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
// Forked run output goes straight to this process's stdout/stderr with
// no sbt "[info]"/"[error]" line prefixes — harness-parsable JSON lines.
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
  // local[32] runs all executor threads in this one JVM: at 8g an
  // 80-query bench pass accumulates enough shuffle/broadcast churn
  // that GC pressure doubles individual query times (q22 measured
  // 2.5s at 24g vs 5.4s at 8g on the same code; the 105-query r4
  // suite showed a further ~15% mid-suite drag at 24g). The host has
  // 128 GiB; one forked JVM at a time makes 32g safe.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // A 246-query bench suite JIT-compiles tens of thousands of methods
  // (several whole-stage-codegen classes per query, warmup + two timed
  // passes): the JDK-17 default 240m ReservedCodeCacheSize saturates
  // its profiled-nmethods segment mid-run (observed pinned at its
  // ~116m ceiling with continuous sweeping), and sweep/deopt churn
  // taxes every later query — the r8 "15% broad drift" mechanism.
  // 512m keeps all three segments out of the flush regime.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
)
