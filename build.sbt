ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ycdatatransferclickhousefromyandexmetricaspark"
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
// Pass the forked process's stdout through UNDECORATED: sbt's default
// LoggedOutput prefixes every line with [info]/[error], which breaks the
// driver's parse of Bench's one-line JSON (BENCH_r02 "parsed": null).
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
scalacOptions ++= Seq("-deprecation")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // managed-table root for bucketing tests (static conf; keep out of the repo)
  "-Dspark.sql.warehouse.dir=/tmp/graft_spark_warehouse",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Whole-stage codegen emits one+ compiled class per query shape; a
  // Bench/Verify JVM runs ~280 query shapes and the JDK's default
  // 240 MB code cache SATURATES mid-run, silently falling hot loops
  // back to the interpreter (round 12, measured: q192's sf1 rep
  // burned 186 s process-CPU inside the full bench vs 66 s in a fresh
  // JVM on the identical binary and corpus — the "in-bench slower
  // than isolated" mystery of three rounds). 1 GB keeps every
  // generated kernel JIT-resident.
  "-XX:ReservedCodeCacheSize=1g",
)
