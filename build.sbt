ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gostreamingspark"
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
// Forked program stdout passes through UNPREFIXED (no "[info] ") so the
// driver can parse graft.Bench's single JSON metrics line directly.
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
  // RocksDB state-store JNI calls pin GCLocker critical sections; on
  // JDK 17-21 the default GCLockerRetryAllocationCount=2 makes a tiny
  // allocation (measured: 3 words) throw OutOfMemoryError on a mostly
  // EMPTY heap once ~32 store instances commit concurrently. 100 is the
  // widely-deployed mitigation (GCLocker is gone in JDK 22+ G1).
  // Measured in SCALE.md's large-state section: the rocksdb ingest at
  // 5.4M live keys dies without this flag and completes with it.
  // (Diagnostic flag on JDK 17 — needs the unlock switch first.)
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
)
