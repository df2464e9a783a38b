ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gminerdemospark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // ContextCleaner frees unreferenced persisted/localCheckpoint blocks
  // only after a driver GC surfaces their weak references; with a 24g
  // heap a long query sweep can run for many minutes between full GCs,
  // so dead blocks from hundreds of finished queries pile up in the
  // block manager and slow later queries. The default periodic-GC
  // interval (30min) is longer than a whole sweep — tighten it so
  // cleanup keeps pace (engine-level session hygiene, not a bench knob).
  // 10min, NOT 2min: the flag is inherited by Bench's short-lived
  // (2-4 min) fresh-JVM kernel legs, and a 2min timer could fire a full
  // GC INSIDE a cold TC/scaling kernel (observed as 70-120 s cold-TC
  // draws with quiet controls); at 10min the timer never fires within a
  // leg's lifetime and still fires during the long session's query
  // sweep, which is where the cleanup is needed.
  "-Dspark.cleaner.periodicGC.interval=10min",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
